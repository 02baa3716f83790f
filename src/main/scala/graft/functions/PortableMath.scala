package graft.functions

/** Engine-portable natural log for md5-coin uniforms.
  *
  * `Math.log` (JVM) and `ln` (DuckDB) are each faithfully-rounded but
  * neither is CORRECTLY rounded, so the same input can produce doubles
  * 1 ulp apart across engines — enough to flip a rank-ordering hash gate
  * on a priority tie (round-9 advice #4). [[lnCoinSql]] eliminates the
  * libm dependence: ln(x / 2^32) evaluated with ONLY correctly-rounded
  * IEEE-754 operations (+, −, ×, ÷, comparisons, CASE), which every
  * engine computes bit-identically. The SAME generated string runs as a
  * Spark `expr(...)` and inside the DuckDB oracle — one text, zero drift
  * surface.
  *
  * Method: for integer x ∈ [1, 2^32], split x = m·2^j with m ∈ [1, 2)
  * (j via a threshold cascade, m via an EXACT power-of-two scale), then
  *   ln(x/2^32) = lnSeries(m) + (j − 32)·ln 2
  * with lnSeries the atanh form ln(m) = 2z·Σ z^2k/(2k+1), z=(m−1)/(m+1).
  * z ≤ 1/3, so [[Terms]] Horner terms reach full double precision
  * (3^-(2·18+1) < 2^-57). The (j−32)·ln2 biases and 1/(2k+1)
  * coefficients are plan-time Scala doubles printed with shortest
  * round-trip formatting — both engines parse them to identical bits.
  * Accuracy vs true ln: ≤ ~1 ulp of argument-splitting error, which is
  * IDENTICAL in both engines — parity is what the gate needs, closeness
  * to libm is only needed for the sampling distribution (1e-15 relative
  * is far beyond any statistical relevance).
  */
object PortableMath {

  /** Correctly-rounded double nearest ln 2 (fixed literal — NOT
    * Math.log(2), which would re-introduce the libm dependence). */
  val Ln2: Double = 0.6931471805599453

  /** atanh-series terms: z ≤ 1/3 ⇒ 18 terms give < 2^-57 tail. */
  val Terms: Int = 18

  /** Exact 2^-j for j ∈ [0, 32] (power-of-two division is exact). */
  private val Scale: Array[Double] = Array.tabulate(33)(j => 1.0 / (1L << j).toDouble)

  /** (j − 32)·ln2 as plan-time doubles shared verbatim with the SQL. */
  private val Bias: Array[Double] = Array.tabulate(33)(j => (j - 32).toDouble * Ln2)

  /** 1/(2k+1) Horner coefficients, highest k first at the seed. */
  private val Coef: Array[Double] = Array.tabulate(Terms)(k => 1.0 / (2 * k + 1).toDouble)

  /** Shortest round-trip literal, exponent-forced: a bare `0.5` parses
    * as DECIMAL in Spark SQL (and would silently change the arithmetic
    * type); `0.5E0` is a DOUBLE literal in both dialects. */
  /** Round-trip double → SQL literal (exponent suffix forced so neither
    * engine parses it as DECIMAL). Shared with the graph ops' wide-ln
    * callers — a private copy there would drift. */
  private[graft] def fmt(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.contains("E")) s else s + "E0"
  }

  /** Scala twin of [[lnCoinSql]] — same scales, biases, coefficients,
    * and operation order, so `PortableMathSpec` can bit-compare the
    * Spark-evaluated SQL against this loop. */
  def lnCoin(x: Long): Double = {
    require(x >= 1L && x <= (1L << 32), s"x out of [1, 2^32]: $x")
    val j = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val m = x.toDouble * Scale(j)
    val z = (m - 1.0) / (m + 1.0)
    val zz = z * z
    var h = Coef(Terms - 1)
    var k = Terms - 2
    while (k >= 0) { h = Coef(k) + zz * h; k -= 1 }
    2.0 * z * h + Bias(j)
  }

  /** The CASE cascade `f(j(x))` for msb j of x: branch thresholds are
    * exact long literals, branch values are [[fmt]]-printed doubles. */
  private def msbCase(x: String, value: Int => Double): String =
    (32 to 1 by -1).map { j =>
      s"WHEN $x >= ${1L << j} THEN ${fmt(value(j))}"
    }.mkString("(CASE ", " ", s" ELSE ${fmt(value(0))} END)")

  // ---- wide-domain variant: x ∈ [1, 2^62] ------------------------------
  // The coin fragments above cap at 2^32 because md5 coins are 32-bit.
  // COUNT arguments (token totals, bucket frequencies) outgrow that at
  // corpus scale — a 100 TB corpus holds ~10^13 tokens — so the wide
  // cascade extends the same construction to every positive long a count
  // column can hold (2^62 headroom; the +1-smoothed count of anything
  // that fits in storage). For x > 2^53 the mantissa split rounds
  // x·2^-j once in CAST(x AS DOUBLE) — identically in both engines, so
  // parity is unaffected and the absolute error stays ≤ 1 ulp.

  private val ScaleW: Array[Double] = Array.tabulate(63)(j => 1.0 / (1L << j).toDouble)
  private val BiasW: Array[Double] = Array.tabulate(63)(j => (j - 32).toDouble * Ln2)

  private def msbCaseWide(x: String, value: Int => Double): String =
    (62 to 1 by -1).map { j =>
      s"WHEN $x >= ${1L << j} THEN ${fmt(value(j))}"
    }.mkString("(CASE ", " ", s" ELSE ${fmt(value(0))} END)")

  /** Wide-domain mantissa stage: compose with [[biasWideSql]], [[zSql]],
    * and [[lnFromPartsSql]] exactly like the coin chain; the result is
    * ln(x) − 32·ln 2 (the constant offset cancels in the log-RATIO uses
    * these fragments exist for, and would otherwise be `+ 32·Ln2`). */
  def mWideSql(x: String): String =
    s"(CAST($x AS DOUBLE) * ${msbCaseWide(x, ScaleW)})"

  def biasWideSql(x: String): String = msbCaseWide(x, BiasW)

  /** Scala twin of the wide chain — bit-identical to the SQL fragments
    * in either engine (only correctly-rounded IEEE ops). */
  def lnWide(x: Long): Double = {
    require(x >= 1L && x <= (1L << 62), s"x out of [1, 2^62]: $x")
    val j = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val m = x.toDouble * ScaleW(j)
    val z = (m - 1.0) / (m + 1.0)
    val zz = z * z
    var h = Coef(Terms - 1)
    var k = Terms - 2
    while (k >= 0) { h = Coef(k) + zz * h; k -= 1 }
    2.0 * z * h + BiasW(j)
  }

  /** `Column` twin of [[lnWide]] for use INSIDE array lambdas, where the
    * hoisted-projection SQL chain ([[mWideSql]] + CTE columns) has no
    * projection to hoist into. Built from only correctly-rounded IEEE-754
    * ops (long comparisons, CASE, +, −, ×, ÷) over plan-time double
    * literals — the exact operation sequence of [[lnWide]] — so the value
    * is bit-identical to the Scala twin and to the SQL chain in either
    * engine. Returns ln(x) − 32·ln 2 (the wide chain's shared bias; it
    * cancels in the log-ratio/entropy uses these fragments exist for).
    * Caller guarantees x ∈ [1, 2^62] (e.g. `greatest(x, 1)`). */
  def lnWideCol(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // the kernel expression IS the while-loop twin (one static call even
    // inside lambda interpretation) — strictly better than the previous
    // 63-branch when-cascade + inline Horner this helper used to build,
    // and bit-identical by PortableMathSpec's pins
    PortableLn.wide(x)

  /** The four COMMON-dialect fragments below compose to ln(x / 2^32).
    * Naively inlining them into one expression would repeat the 33-branch
    * cascade ~70× (the Horner references zz 17 times), so callers hoist
    * each stage as a column — `withColumn` on the Spark side, a CTE
    * SELECT on the oracle side — and the fragment STRINGS stay shared
    * verbatim between both engines:
    *
    *   __m  = [[mSql]](x)      mantissa in [1, 2)
    *   __b  = [[biasSql]](x)   (msb − 32)·ln2
    *   __z  = [[zSql]](__m)    atanh argument
    *   __zz = (__z * __z)
    *   __ln = [[lnFromPartsSql]](__z, __zz, __b)
    *
    * Catalyst may collapse the projection chain and re-inline the
    * sub-expressions — harmless: every op is deterministic, so the VALUE
    * is bit-identical however often it is recomputed. */
  def mSql(x: String): String =
    s"(CAST($x AS DOUBLE) * ${msbCase(x, Scale)})"

  def biasSql(x: String): String = msbCase(x, Bias)

  def zSql(m: String): String = s"(($m - 1.0E0) / ($m + 1.0E0))"

  def lnFromPartsSql(z: String, zz: String, bias: String): String = {
    // Horner, seeded with the highest-order coefficient — matches the
    // while-loop in [[lnCoin]] exactly
    val horner = (0 until Terms - 1).reverse.foldLeft(fmt(Coef(Terms - 1))) {
      (acc, k) => s"(${fmt(Coef(k))} + $zz * ($acc))"
    }
    s"(2.0E0 * $z * ($horner) + $bias)"
  }
}
