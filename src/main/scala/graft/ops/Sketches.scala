package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Mergeable sketches with EXACT cross-engine reproducibility — the
  * bounded-memory observability a 100 TB corpus needs: HyperLogLog for
  * distinct counts (distinct shingles/urls/fingerprints per source,
  * where exact `count(DISTINCT …)` would shuffle every occurrence) and
  * count-min for item frequencies (track heavy keys online where an
  * exact per-item count would hold unbounded state).
  *
  * Unlike `approx_count_distinct` (whose HLL++ internals no other engine
  * reproduces), every ingredient here is md5-derived and integer-exact:
  * the 60-bit [[Hashing.h64]] splits into a 6-bit register index and a
  * 54-bit suffix whose leading-zero rank comes from a generated
  * threshold CASE (identical in both engines); register maxima are
  * integer aggregation (order-free); the indicator sum Σ2^(−M_j) scales
  * by 2^56 into an exact integer; only the final estimate is fp, in one
  * shared expression shape. So the DuckDB oracle re-derives the ENTIRE
  * sketch — registers, sum, and estimate — bit-for-bit.
  *
  * Merge law (what makes it a sketch): registers combine by element-wise
  * max — associative/commutative, so partial sketches from any partition
  * layout agree, the same contract every trained artifact here follows.
  */
object Sketches {

  val HllP = 6
  val HllM = 64 // 2^HllP registers
  private val HashBits = 60 // Hashing.h64 = 15 hex chars
  private val W = HashBits - HllP // suffix bits: 54
  private val SumScale = 56 // Σ 2^(SumScale − r): ranks ≤ 55, 64·2^55 < 2^62

  /** α_m · m² for m = 64 (the standard HLL bias constant), computed once
    * in Scala and embedded as the SAME literal in the oracle SQL. */
  val AlphaM2: Double = 0.7213 / (1 + 1.079 / HllM) * HllM * HllM

  /** Leading-zero rank of the 54-bit suffix `x`: 1 for a set top bit,
    * W+1 for zero — a descending threshold chain, first match wins. */
  private def rankCol(x: Column): Column =
    (0 until W).foldLeft(lit(W + 1): Column) { case (acc, b) =>
      when(x >= (1L << b), lit(W - b)).otherwise(acc)
    }

  /** The same chain as DuckDB SQL over suffix expression `x`. */
  def rankSql(x: String): String =
    (0 until W).reverse.map(b => s"WHEN $x >= ${1L << b} THEN ${W - b}")
      .mkString("CASE ", " ", s" ELSE ${W + 1} END")

  /** Per-item (register index, leading-zero rank) columns for `item` —
    * the sketch's only per-row ingredients, shared by the batch
    * [[hllDistinct]] and the streaming windowed distinct
    * ([[graft.streaming.WindowedAggs.windowedDistinct]]). */
  def regRank(item: Column, salt: String): (Column, Column) = {
    val h = Hashing.h64(item.cast("string"), salt)
    (h.bitwiseAND(lit((HllM - 1).toLong)).cast("int"),
      rankCol(shiftright(h, HllP)))
  }

  /** registers_joined over 64 named register-max columns `r_0..r_63`
    * (rank 0 = absent register — the merge identity). */
  def registersJoinedExpr: Column =
    concat_ws(",", (0 until HllM).map(j => col(s"r_$j").cast("string")): _*)

  /** est_q3 over the same named register columns: the identical math as
    * [[hllDistinct]] (exact-integer indicator sum, α·m²·2^56/S, linear
    * counting under 2.5m with zero registers, ×10³ quantization) in one
    * Spark-SQL expression — an absent register (r_j = 0) contributes
    * 2^56 to S exactly like the batch path's (m − n_present) term. */
  def estQ3Expr: Column = {
    val s = (0 until HllM).map(j => s"shiftleft(1L, $SumScale - r_$j)")
      .mkString("(", " + ", ")")
    val zeros = (0 until HllM).map(j => s"(CASE WHEN r_$j = 0 THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
    val estRaw = s"(${AlphaM2}d * ${math.pow(2.0, SumScale)}d / cast($s as double))"
    expr(s"""cast(floor((CASE WHEN $estRaw <= ${2.5 * HllM}d AND $zeros > 0
      THEN ${HllM.toDouble}d * ln(${HllM.toDouble}d / cast($zeros as double))
      ELSE $estRaw END) * 1000.0d + 0.5d) as bigint)""")
  }

  // ---- Count-min sketch (Cormode/Muthukrishnan): the FREQUENCY twin of
  // the HLL distinct sketch — point-estimate item counts with bounded
  // memory when the item domain is unbounded. Same portability rules:
  // indexes are md5+affine-derived, counters are integer sums (order-
  // free), so the DuckDB oracle re-derives the ENTIRE sketch. Merge law:
  // counters add element-wise — the streaming twin
  // ([[graft.streaming.WindowedAggs.windowedHeavyProbes]]) is therefore
  // a plain sum aggregation. Estimates NEVER underestimate (each row's
  // cell ≥ the true count; min over rows tightens collisions):
  // est(x) = min_d C[d][i_d(x)], overestimate ≤ e/W of total mass w.h.p.

  val CmsD = 4 // hash rows
  val CmsW = 64 // counters per row

  /** Per-item CMS row indexes i_0..i_{D−1}: affine hashes of the item's
    * 32-bit md5 value, masked to the row width. */
  def cmsIdx(item: Column, salt: String): Seq[Column] = {
    val x = Hashing.h32(item.cast("string"), salt)
    (0 until CmsD).map(d =>
      Hashing.affine(x, d).bitwiseAND(lit((CmsW - 1).toLong)).cast("int"))
  }

  /** Plan-time twin of [[cmsIdx]] for a LITERAL probe item — probes
    * resolve to fixed counter coordinates at plan time, so a point
    * estimate is `least` over D named columns, no per-row hashing. */
  def cmsIdxLiteral(item: String, salt: String): Seq[Int] = {
    val x = Hashing.planTimeH64(s"$salt:$item") & 0xFFFFFFFFL
    (0 until CmsD).map(d =>
      (((Hashing.affineA(d) * x + Hashing.affineB(d)) % Hashing.P32) &
        (CmsW - 1)).toInt)
  }

  /** The same index expression as DuckDB SQL over a pre-computed 32-bit
    * column `x`. */
  def cmsIdxSql(x: String, d: Int): String =
    s"(((${Hashing.affineA(d)} * $x + ${Hashing.affineB(d)}) % ${Hashing.P32}) & ${CmsW - 1})"

  /** Per-group count-min sketch of `item` occurrences (multiplicities
    * count — this is a frequency sketch) + point estimates for `probes`.
    *
    * Plan shape: D index columns per row (no explode), ONE aggregation
    * with D·W conditional sums — the sketch rides the same single
    * shuffle a groupBy-count would use, but its state is D·W longs per
    * group regardless of item cardinality.
    *
    * @return (group, cms_joined, est_<probe>…) — the D·W counters
    *   row-major comma-joined (full-sketch parity exhibit) and one
    *   `least`-over-rows estimate per probe */
  def cmsCounts(df: DataFrame, groupCol: String, item: Column, salt: String,
                probes: Seq[String]): DataFrame = {
    val idx = cmsIdx(item, salt)
    val perItem = df.select(
      col(groupCol).as("group") +: idx.zipWithIndex.map { case (c, d) => c.as(s"i$d") }: _*)
    val aggs = for (d <- 0 until CmsD; j <- 0 until CmsW)
      yield sum(when(col(s"i$d") === j, 1L).otherwise(0L)).as(s"c_${d}_$j")
    val wide = perItem.groupBy(col("group")).agg(aggs.head, aggs.tail: _*)
    val joined = concat_ws(",",
      (for (d <- 0 until CmsD; j <- 0 until CmsW)
        yield col(s"c_${d}_$j").cast("string")): _*)
    val estCols = probes.map { p =>
      val coords = cmsIdxLiteral(p, salt)
      least(coords.zipWithIndex.map { case (j, d) => col(s"c_${d}_$j") }: _*)
        .as(s"est_$p")
    }
    wide.select(col("group") +: joined.as("cms_joined") +: estCols: _*)
  }

  /** EXACT heavy hitters through a CMS pre-filter — the two-pass shape
    * for frequency thresholds over an unbounded key domain.
    *
    * Pass 1 reduces the whole input to ONE global CMS: D·W = 256
    * integer counters via constant-width partial aggregation — no
    * per-key state, no keyed shuffle, the driver holds 256 longs.
    * Pass 2 re-scans, keeping only rows whose CMS point estimate clears
    * `minCount` — a scan-stage `least` over D literal-array lookups
    * (CMS never underestimates, so the kept keys are a SUPERSET of the
    * true heavy hitters) — then exact-counts the survivors and trims
    * collision-inflated keys with the exact HAVING.
    *
    * Result is therefore EXACTLY `GROUP BY item HAVING count(*) >=
    * minCount` (the oracle needs no sketch), but the keyed shuffle
    * carries only candidate keys: at 100 TB the long tail — most of the
    * distinct-key mass, the part that makes a plain groupBy spill —
    * never shuffles. Collision mass is bounded (≤ e/W of total count
    * per row w.h.p.), so candidates stay near the true heavy set.
    *
    * INPUT CONTRACT: `df` is EVALUATED TWICE — once for the CMS pass,
    * once for the candidate pass (inherent to the two-pass shape). A
    * cheap derivation (scan + tokenize/explode, the common case) should
    * simply recompute: two scans of source bytes beat materializing an
    * exploded token stream that is many times the input size. Reserve
    * `cache()`/`localCheckpoint()` for inputs whose derivation is
    * genuinely expensive relative to a scan (an upstream join or
    * aggregation) — and mind that caching 100 TB of derived rows is
    * usually the greater cost. */
  def heavyHitters(df: DataFrame, item: Column, minCount: Long,
                   salt: String): DataFrame = {
    require(minCount > 0, "minCount must be positive")
    val idx = cmsIdx(item, salt)
    val perItem = df.select(
      idx.zipWithIndex.map { case (c, d) => c.as(s"i$d") }: _*)
    val aggs = for (d <- 0 until CmsD; j <- 0 until CmsW)
      yield sum(when(col(s"i$d") === j, 1L).otherwise(0L)).as(s"c_${d}_$j")
    val row = perItem.agg(aggs.head, aggs.tail: _*).head()
    val counters: Seq[Seq[Long]] = (0 until CmsD).map(d =>
      (0 until CmsW).map(j =>
        if (row.isNullAt(d * CmsW + j)) 0L else row.getLong(d * CmsW + j)))
    val est = least((0 until CmsD).map { d =>
      element_at(array(counters(d).map(lit): _*), idx(d) + 1)
    }: _*)
    // null keys hash to null indexes (invisible to the CMS) — keep them
    // unconditionally and let the exact HAVING decide: nulls are ONE
    // group, so partial aggregation shuffles at most a row per partition
    df.filter(est.geq(lit(minCount)) || item.isNull)
      .groupBy(item.as("item")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  // ---- Log-histogram quantile sketch: the third sketch family —
  // bounded-memory QUANTILES (p50/p95/p99 of latencies, doc lengths,
  // quality scores) where exact percentiles need a full sort. Values
  // quantize to q20 fixed-point integers; buckets are (bit-length ×
  // 16 sub-buckets) of |q| with the sign folded in — an ORDER-PRESERVING
  // integer bucket id computed from integer compares only, so both
  // engines agree bit-for-bit (no fp log2 at bucket boundaries). Each
  // (group, bucket) carries (count, min_q, max_q); counts ADD and
  // min/max merge, so partial sketches from any partitioning agree and
  // the streaming twin is a plain aggregation. A quantile answer is an
  // INTERVAL [lo, hi] — the straddling bucket's exact min/max, which
  // provably brackets the true quantile; relative width ≤ 1/16 by
  // construction (16 sub-buckets per octave).

  val QScale = 1L << 20 // q20 fixed point — the repo-wide quantization
  val QSub = 16 // sub-buckets per octave

  /** q20 integer image of a double value. */
  def qVal(x: Column): Column =
    floor(x.cast("double") * lit(QScale.toDouble) + lit(0.5)).cast("long")

  /** Order-preserving bucket id of a q20 integer `q`:
    * sign(q) · (bitlen(|q|)·16 + top-4-bits-after-leading(|q|)) — the
    * [[graft.functions.QBucket]] codegen kernel (the equivalent nested
    * CASE chain exceeded Janino's 64 KB method limit). The oracle's CASE
    * form lives in [[qBitlenSqlOverQ]]/[[qBucketSqlOverQL]]; the gate
    * proves the formulations identical. */
  def qBucketOfQ(q: Column): Column = graft.functions.QBucket.of(q)

  /** DuckDB twins, staged over CTE-bound columns (inlining the bitlen
    * CASE into every sub-bucket branch would square the SQL): bind `q`
    * first, then `L` = [[qBitlenSqlOverQ]], then the id over (q, L). */
  def qBitlenSqlOverQ: String =
    (1 to 63).reverse
      .map(b => s"WHEN abs(q) >= ${1L << (b - 1)} THEN $b")
      .mkString("(CASE ", " ", " ELSE 0 END)")

  def qBucketSqlOverQL: String = {
    val sub = (6 to 63).reverse
      .map(l => s"WHEN L = $l THEN (abs(q) >> ${l - 5}) & 15")
      .mkString("(CASE ", " ", " ELSE abs(q) & 15 END)")
    s"(CASE WHEN q < 0 THEN -(L * $QSub + $sub) ELSE (L * $QSub + $sub) END)"
  }

  /** Per-(group, bucket) sketch rows of `value`: (group, bucket, cnt,
    * min_q, max_q). One aggregation; null values are skipped. */
  def quantileBuckets(df: DataFrame, groupCol: String, value: Column): DataFrame = {
    val q = qVal(value)
    df.select(col(groupCol).as("group"), q.as("q"))
      .filter(col("q").isNotNull)
      .select(col("group"), col("q"), qBucketOfQ(col("q")).as("bucket"))
      .groupBy(col("group"), col("bucket"))
      .agg(count(lit(1)).as("cnt"), min(col("q")).as("min_q"), max(col("q")).as("max_q"))
  }

  /** Bucket rows → per-group quantile intervals + the full-sketch parity
    * string. For each p the answer is the straddling bucket's exact
    * [min_q, max_q]: the bucket where the bucket-ordered cumulative
    * count first reaches ceil(p·n). Window is per GROUP (bucket count
    * is bounded by construction — never a global single-partition
    * window).
    * @return (group, n, buckets_joined, p<P>_lo_q20, p<P>_hi_q20 …) */
  def quantilesFromBuckets(buckets: DataFrame, groupCol: String,
                           ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(col(groupCol))
    val cum = buckets
      .withColumn("cum", sum(col("cnt")).over(byGroup.orderBy(col("bucket"))))
      .withColumn("n", sum(col("cnt")).over(byGroup))
    def pname(p: Double) = (p * 100).round.toString
    val sel = ps.map { p =>
      min(when(col("cum") >= ceil(lit(p) * col("n").cast("double")).cast("long"),
        struct(col("bucket"), col("min_q"), col("max_q")))).as(s"s${pname(p)}")
    }
    val joined = concat_ws(",", transform(
      array_sort(collect_list(struct(col("bucket"), col("cnt")))),
      e => concat(e.getField("bucket").cast("string"), lit(":"),
        e.getField("cnt").cast("string"))))
    cum.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), (sel :+ joined.as("buckets_joined")): _*)
      .select(col(groupCol) +: col("n") +: col("buckets_joined") +:
        ps.flatMap(p => Seq(
          col(s"s${pname(p)}").getField("min_q").as(s"p${pname(p)}_lo_q20"),
          col(s"s${pname(p)}").getField("max_q").as(s"p${pname(p)}_hi_q20"))): _*)
  }

  /** Per-group HLL distinct estimate of `item`.
    * @return (group, registers_joined, est_q3) — the 64 register values
    *   comma-joined (the full-sketch parity exhibit) and the estimate as
    *   floor(est·10³ + 0.5), small-range linear-counting correction
    *   included */
  def hllDistinct(df: DataFrame, groupCol: String, item: Column,
                  salt: String): DataFrame = {
    val (reg, r) = regRank(item, salt)
    val perItem = df.select(col(groupCol).as("group"), reg.as("reg"), r.as("r"))
    val maxed = perItem.groupBy(col("group"), col("reg")).agg(max(col("r")).as("r"))
    // present registers carry rank ≥ 1; absent ones are the HLL zeros
    val wide = maxed.groupBy(col("group")).agg(
      map_from_entries(collect_list(struct(col("reg"), col("r")))).as("m"),
      sum(expr(s"shiftleft(1L, $SumScale - r)")).as("sp"),
      count(lit(1)).as("np"))
    val regs = transform(sequence(lit(0), lit(HllM - 1)),
      j => coalesce(element_at(col("m"), j), lit(0)).cast("string"))
    val s = col("sp") + (lit(HllM.toLong) - col("np")) * lit(1L << SumScale)
    val zeros = lit(HllM.toLong) - col("np")
    val estRaw = lit(AlphaM2) * lit(math.pow(2.0, SumScale)) / col("S").cast("double")
    val est = when(col("est_raw") <= 2.5 * HllM && col("zeros") > 0,
        lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros").cast("double")))
      .otherwise(col("est_raw"))
    wide
      .withColumn("S", s)
      .withColumn("zeros", zeros)
      .withColumn("est_raw", estRaw)
      .select(col("group"),
        concat_ws(",", regs).as("registers_joined"),
        floor(est * 1000.0 + 0.5).cast("long").as("est_q3"))
  }

  /** 2^60 as a double — the hash-space width of [[graft.functions.Hashing.h64]];
    * exactly representable, so the literal is engine-identical. */
  val KmvSpace: Double = 1.152921504606846976e18

  /** Per-set KMV (theta) sketch: the k smallest distinct values of `hash`
    * (a 60-bit [[graft.functions.Hashing.h64]] column), sorted ascending.
    *
    * Plan shape: ONE aggregation whose map-side partial
    * ([[graft.functions.KMinHashAgg]], a bounded `TypedImperativeAggregate`)
    * consumes raw rows inside the scan stage — the exchange carries at
    * most k longs per (set, partition), never the items, and no
    * pre-`distinct` shuffle exists because the buffer dedups by
    * construction. At 100 TB the sketch relation is |sets| rows of ≤ k
    * longs: trivially broadcastable into any downstream set-algebra join.
    *
    * @return (set, hs array&lt;long&gt; ascending, |hs| ≤ k) */
  def kmvSketches(df: DataFrame, setCol: String, hash: Column, k: Int): DataFrame =
    df.select(col(setCol).as("set"), hash.as("h"))
      .groupBy(col("set"))
      .agg(graft.functions.KMinHash.of(col("h"), k).as("hs"))

  /** Pairwise set-cardinality estimates from KMV sketches (Beyer et al.
    * 2007): for every set pair (a < b), distinct-count estimates of A, B,
    * A∪B, A∩B, A∖B plus the sketch-space Jaccard — the sketch-estimate
    * twin of an exact overlap join that would shuffle both corpora.
    *
    * Union law: the k smallest of (sketch_A ∪ sketch_B) IS the KMV sketch
    * of A∪B; intersection: the fraction of that union sketch present in
    * both input sketches, scaled by the union estimate. When a sketch
    * holds fewer than k hashes it is the complete hash set and every
    * estimate degrades to the EXACT count (`< k` regimes below).
    *
    * All arithmetic is integers until four double ops spelled identically
    * in [[kmvPairwiseSql]], then floor-rounded to q3/q6 — so the DuckDB
    * oracle matches bit-for-bit. The pair join is a deliberate
    * nested-loop over the sketch relation (|sets| rows of ≤ k longs —
    * broadcast-scale by construction, never data-scale), so the output
    * AND the join cost are O(|sets|²): the operator is for a HANDFUL of
    * named corpora/shards (its |sets|² output is the point), never a
    * data-scale grouping column. `maxSets` makes that contract loud —
    * the sketch relation is materialized (localCheckpoint) and counted,
    * and a caller passing a high-cardinality set column fails with the
    * bound in the message instead of silently planning an O(n²)
    * nested-loop over the corpus. The checkpoint also means the
    * upstream sketch aggregation runs ONCE, not once per join side.
    *
    * @param sketches output of [[kmvSketches]]
    * @param maxSets  loud upper bound on |sets| (default 4096 ⇒ ≤ ~8.4M
    *                 output pairs); raise it consciously, not by accident
    * @return (set_a, set_b, n_a, n_b, n_union_sk, n_common,
    *         est_a_q3, est_b_q3, est_union_q3, est_isect_q3,
    *         est_diff_ab_q3, jaccard_q6) */
  def kmvPairwise(sketches: DataFrame, k: Int,
                  maxSets: Int = 4096): DataFrame = {
    val sk = sketches.localCheckpoint()
    val nSets = sk.count()
    require(nSets <= maxSets,
      s"kmvPairwise: $nSets sets exceeds maxSets=$maxSets — the pairwise " +
        "nested-loop is O(|sets|^2) by design; pass a coarser set column " +
        "or raise maxSets deliberately")
    kmvPairwiseOn(sk, k)
  }

  /** Shared KMV pair-estimate column builders — used VERBATIM by both
    * [[kmvPairwise]] and the streaming twin
    * [[graft.streaming.WindowedAggs.thetaWindowOverlap]], so the two
    * surfaces (and their DuckDB oracles) can never drift apart (the
    * splitLabel precedent). All double arithmetic lives here and only
    * here. */
  private[graft] def kmvUnionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)
  private[graft] def kmvCommon(su: Column, a: Column, b: Column): Column =
    size(filter(su, h => array_contains(a, h) && array_contains(b, h)))
  private[graft] def kmvEstOf(arr: Column, n: Column, k: Int): Column =
    when(n < k, n.cast("double"))
      .otherwise(lit((k - 1).toDouble * KmvSpace) /
        element_at(arr, k).cast("double"))
  private[graft] def kmvIsectEst(com: Column, nu: Column, eu: Column,
                                 k: Int): Column =
    when(nu < k, com.cast("double"))
      .otherwise(com.cast("double") / lit(k.toDouble) * eu)
  private[graft] def kmvQ3(x: Column): Column =
    floor(x * 1000.0 + 0.5).cast("long")
  private[graft] def kmvJaccardQ6(com: Column, nu: Column): Column =
    when(nu === 0, lit(0L)).otherwise(
      floor(com.cast("double") / nu.cast("double") * 1000000.0 + 0.5)
        .cast("long"))

  private def kmvPairwiseOn(sketches: DataFrame, k: Int): DataFrame = {
    val a = sketches.select(col("set").as("set_a"), col("hs").as("ha"))
    val b = sketches.select(col("set").as("set_b"), col("hs").as("hb"))
    a.join(b, col("set_a") < col("set_b"))
      .withColumn("su", kmvUnionSketch(col("ha"), col("hb"), k))
      .withColumn("na", size(col("ha")))
      .withColumn("nb", size(col("hb")))
      .withColumn("nu", size(col("su")))
      .withColumn("com", kmvCommon(col("su"), col("ha"), col("hb")))
      .withColumn("ea", kmvEstOf(col("ha"), col("na"), k))
      .withColumn("eb", kmvEstOf(col("hb"), col("nb"), k))
      .withColumn("eu", kmvEstOf(col("su"), col("nu"), k))
      .withColumn("ei", kmvIsectEst(col("com"), col("nu"), col("eu"), k))
      .select(col("set_a"), col("set_b"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        col("nu").cast("long").as("n_union_sk"), col("com").cast("long").as("n_common"),
        kmvQ3(col("ea")).as("est_a_q3"), kmvQ3(col("eb")).as("est_b_q3"),
        kmvQ3(col("eu")).as("est_union_q3"), kmvQ3(col("ei")).as("est_isect_q3"),
        greatest(lit(0L), kmvQ3(col("eu")) - kmvQ3(col("eb"))).as("est_diff_ab_q3"),
        kmvJaccardQ6(col("com"), col("nu")).as("jaccard_q6"))
  }

  /** DuckDB oracle twin of [[kmvSketches]] + [[kmvPairwise]]: CTE chain
    * over a prior `hh` CTE holding (grp, h) distinct hashes per set.
    * Terminal CTE `kmvp` has the same twelve columns. Generated here so
    * the oracle can never drift from the operator. */
  def kmvPairwiseSql(k: Int): String = {
    val numer = (k - 1).toDouble * KmvSpace
    s"""rk AS (
       |  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM hh
       |), sk AS MATERIALIZED (
       |  SELECT grp, list(h ORDER BY h) AS hs FROM rk WHERE rn <= $k GROUP BY grp
       |), pr AS (
       |  SELECT a.grp AS set_a, a.hs AS ha, b.grp AS set_b, b.hs AS hb
       |  FROM sk a JOIN sk b ON a.grp < b.grp
       |), c1 AS (
       |  SELECT set_a, set_b, ha, hb,
       |    list_slice(list_sort(list_distinct(list_concat(ha, hb))), 1, $k) AS su
       |  FROM pr
       |), c2 AS (
       |  SELECT set_a, set_b, ha, hb, su,
       |    len(ha) AS na, len(hb) AS nb, len(su) AS nu,
       |    len(list_filter(su, x -> list_contains(ha, x) AND list_contains(hb, x))) AS com
       |  FROM c1
       |), c3 AS (
       |  SELECT set_a, set_b, na, nb, nu, com,
       |    CASE WHEN na < $k THEN CAST(na AS DOUBLE) ELSE $numer / CAST(ha[$k] AS DOUBLE) END AS ea,
       |    CASE WHEN nb < $k THEN CAST(nb AS DOUBLE) ELSE $numer / CAST(hb[$k] AS DOUBLE) END AS eb,
       |    CASE WHEN nu < $k THEN CAST(nu AS DOUBLE) ELSE $numer / CAST(su[$k] AS DOUBLE) END AS eu
       |  FROM c2
       |), c4 AS (
       |  SELECT set_a, set_b, na, nb, nu, com, ea, eb, eu,
       |    CASE WHEN nu < $k THEN CAST(com AS DOUBLE)
       |      ELSE CAST(com AS DOUBLE) / ${k.toDouble} * eu END AS ei
       |  FROM c3
       |), kmvp AS (
       |  SELECT set_a, set_b,
       |    CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       |    CAST(nu AS BIGINT) AS n_union_sk, CAST(com AS BIGINT) AS n_common,
       |    CAST(floor(ea * 1000.0 + 0.5) AS BIGINT) AS est_a_q3,
       |    CAST(floor(eb * 1000.0 + 0.5) AS BIGINT) AS est_b_q3,
       |    CAST(floor(eu * 1000.0 + 0.5) AS BIGINT) AS est_union_q3,
       |    CAST(floor(ei * 1000.0 + 0.5) AS BIGINT) AS est_isect_q3,
       |    greatest(CAST(0 AS BIGINT),
       |      CAST(floor(eu * 1000.0 + 0.5) AS BIGINT)
       |        - CAST(floor(eb * 1000.0 + 0.5) AS BIGINT)) AS est_diff_ab_q3,
       |    CASE WHEN nu = 0 THEN CAST(0 AS BIGINT)
       |      ELSE CAST(floor(CAST(com AS DOUBLE) / CAST(nu AS DOUBLE) * 1000000.0 + 0.5)
       |        AS BIGINT) END AS jaccard_q6
       |  FROM c4
       |)""".stripMargin
  }
}
