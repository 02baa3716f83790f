package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PortableMath contract: the generated SQL fragments and the Scala
  * twin produce bit-identical doubles (that is the whole point — the
  * DuckDB side runs the SAME fragment strings, so Spark↔Scala parity
  * plus the sample_weighted_k hash gate covers all three evaluators),
  * and the series tracks true ln to full double precision. */
class PortableMathSpec extends SparkSpec {
  import spark.implicits._

  private val boundary: Seq[Long] =
    Seq(1L, 2L, 3L, (1L << 31) - 1, 1L << 31, (1L << 31) + 1, (1L << 32) - 1, 1L << 32) ++
      (0 to 32).map(j => 1L << j) ++ (1 to 31).map(j => (1L << j) + 1)

  private val random: Seq[Long] = {
    val r = new scala.util.Random(42)
    Seq.fill(2000)((r.nextLong() & 0xFFFFFFFFL) + 1L)
  }

  test("lnCoin tracks Math.log to ~1e-15 ABSOLUTE over boundaries and random coins") {
    // absolute, not relative: just above a power of two the reduction
    // ln(x/2^32) = ln(m) + (j-32)·ln2 cancels to ~1e-10 and the series'
    // ~1-ulp-of-ln(m) error dominates RELATIVELY while staying ~1e-16
    // absolute — identical in both engines (parity unaffected), and
    // priorities ln(u)/w only need absolute accuracy
    (boundary ++ random).foreach { x =>
      val got = PortableMath.lnCoin(x)
      val want = math.log(x.toDouble / 4294967296.0)
      if (x == (1L << 32)) assert(got === 0.0)
      else assert(math.abs(got - want) < 1e-13,
        s"x=$x got=$got want=$want absErr=${math.abs(got - want)}")
    }
  }

  test("Spark-evaluated fragments bit-match the Scala twin on every coin") {
    val P = PortableMath
    val xs = (boundary ++ random).distinct
    val rows = xs.toDF("__x")
      .withColumn("__m", expr(P.mSql("__x")))
      .withColumn("__b", expr(P.biasSql("__x")))
      .withColumn("__z", expr(P.zSql("__m")))
      .withColumn("__zz", expr("(__z * __z)"))
      .withColumn("__ln", expr(P.lnFromPartsSql("__z", "__zz", "__b")))
      .select(col("__x"), col("__ln"))
      .collect()
    rows.foreach { r =>
      val x = r.getLong(0)
      val sparkBits = java.lang.Double.doubleToLongBits(r.getDouble(1))
      val scalaBits = java.lang.Double.doubleToLongBits(P.lnCoin(x))
      assert(sparkBits === scalaBits,
        s"x=$x spark=${java.lang.Double.longBitsToDouble(sparkBits)} scala=${P.lnCoin(x)}")
    }
  }

  test("PortableLn expression bit-matches twins and SQL chain, both domains") {
    val P = PortableMath
    val xs = (boundary ++ random).distinct
    // coin domain — codegen path (many rows per partition → wholestage)
    xs.toDF("__x")
      .withColumn("__k", PortableLn.coin(col("__x")))
      .collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
          java.lang.Double.doubleToLongBits(P.lnCoin(r.getLong(0))))
      }
    // wide domain, including past 2^53
    val wides = Seq(1L, 2L, (1L << 33) - 1, 1L << 33, (1L << 53) + 1,
      (1L << 62) - 1, 1L << 62) ++ random.map(x => x * 1024L + 7L)
    wides.distinct.toDF("__x")
      .withColumn("__k", PortableLn.wide(col("__x")))
      .collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
          java.lang.Double.doubleToLongBits(P.lnWide(r.getLong(0))))
      }
    // interpreted path too (the expression must not depend on codegen)
    val e = PortableLn(org.apache.spark.sql.catalyst.expressions.Literal(77L),
      wide = false)
    assert(e.eval(null) === P.lnCoin(77L))
  }

  test("the series is monotone: more coin, more ln") {
    val sorted = (boundary ++ random).distinct.sorted
    sorted.sliding(2).foreach { case Seq(a, b) =>
      assert(PortableMath.lnCoin(a) <= PortableMath.lnCoin(b),
        s"monotonicity broke between $a and $b")
    }
  }

  private val wideBoundary: Seq[Long] =
    Seq(1L, 2L, 3L, (1L << 32) - 1, 1L << 32, (1L << 32) + 1,
      (1L << 53) - 1, 1L << 53, (1L << 53) + 1, (1L << 62) - 1, 1L << 62) ++
      (0 to 62).map(j => 1L << j) ++ (1 to 61).map(j => (1L << j) + 1)

  private val wideRandom: Seq[Long] = {
    val r = new scala.util.Random(7)
    Seq.fill(2000)((r.nextLong() & ((1L << 62) - 1)) + 1L)
  }

  test("wide chain tracks Math.log − 32·ln2 absolutely over the count domain") {
    (wideBoundary ++ wideRandom).foreach { x =>
      val got = PortableMath.lnWide(x)
      val want = math.log(x.toDouble) - 32.0 * PortableMath.Ln2
      assert(math.abs(got - want) < 1e-12,
        s"x=$x got=$got want=$want absErr=${math.abs(got - want)}")
    }
  }

  test("Spark-evaluated WIDE fragments bit-match lnWide, including past 2^53") {
    val P = PortableMath
    val xs = (wideBoundary ++ wideRandom).distinct
    val rows = xs.toDF("__x")
      .withColumn("__m", expr(P.mWideSql("__x")))
      .withColumn("__b", expr(P.biasWideSql("__x")))
      .withColumn("__z", expr(P.zSql("__m")))
      .withColumn("__zz", expr("(__z * __z)"))
      .withColumn("__ln", expr(P.lnFromPartsSql("__z", "__zz", "__b")))
      .select(col("__x"), col("__ln"))
      .collect()
    rows.foreach { r =>
      val x = r.getLong(0)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(P.lnWide(x)),
        s"x=$x spark=${r.getDouble(1)} scala=${P.lnWide(x)}")
    }
  }
}
