package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sketch contracts. HLL: estimate accuracy within the m=64 error
  * bound, bit-identical results across partitionings (register max is
  * order-free), and the small-range linear-counting branch. CMS: never
  * underestimates, exact on light sketches, partitioning-independent
  * (counter sums are order-free). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("cmsCounts never underestimates; exact here; partitioning-independent") {
    // 10 distinct items with known multiplicities 1..10 — far below the
    // 4x64 sketch's collision regime, so estimates should be EXACT for
    // present items unless two of the 10 items collide in all 4 rows
    // (probability ~(10/64)^4 per pair — and the fixed md5 coordinates
    // make the outcome deterministic, so this spec is not flaky)
    val rows = for (i <- 1 to 10; _ <- 1 to i) yield ("g", s"tok-$i")
    val df = rows.toDF("g", "it")
    val probes = Seq("tok-1", "tok-7", "tok-10", "absent")
    val out = Sketches.cmsCounts(df, "g", col("it"), "t", probes).collect().head
    assert(out.getAs[Long]("est_tok-1") === 1L)
    assert(out.getAs[Long]("est_tok-7") === 7L)
    assert(out.getAs[Long]("est_tok-10") === 10L)
    // an absent item's estimate is collision mass only: 0 <= est <= total
    val absent = out.getAs[Long]("est_absent")
    assert(absent >= 0L && absent < 55L, s"absent-probe estimate $absent")
    // counter array sums to D * total occurrences (every item increments
    // one counter per row)
    val counters = out.getAs[String]("cms_joined").split(",").map(_.toLong)
    assert(counters.length === Sketches.CmsD * Sketches.CmsW)
    assert(counters.sum === Sketches.CmsD.toLong * 55L)
    // order-free: any partitioning yields the identical sketch
    for (parts <- Seq(1, 7, 32)) {
      val again = Sketches.cmsCounts(df.repartition(parts), "g", col("it"), "t", probes)
        .collect().head
      assert(again.getAs[String]("cms_joined") === out.getAs[String]("cms_joined"),
        s"counters differ under repartition($parts)")
    }
  }

  test("hllDistinct estimates within the standard error; partitioning-independent") {
    // 2000 distinct items per group, duplicated 3x (dups must not matter)
    val df = (0 until 6000).map(i => ("g1", s"item-${i % 2000}")).toDF("g", "it")
    val out = Sketches.hllDistinct(df, "g", col("it"), "t").collect().head
    val est = out.getAs[Long]("est_q3") / 1000.0
    // 1.04/sqrt(64) ≈ 13% standard error; allow 3 sigma
    assert(math.abs(est - 2000.0) / 2000.0 < 0.39, s"estimate $est vs 2000")
    for (parts <- Seq(1, 7, 32)) {
      val again = Sketches.hllDistinct(df.repartition(parts), "g", col("it"), "t")
        .collect().head
      assert(again.getAs[String]("registers_joined") === out.getAs[String]("registers_joined"),
        s"registers differ under repartition($parts)")
      assert(again.getAs[Long]("est_q3") === out.getAs[Long]("est_q3"))
    }
  }

  test("hllDistinct small-range correction: tiny sets fall back to linear counting") {
    val df = (0 until 5).map(i => ("g", s"only-$i")).toDF("g", "it")
    val out = Sketches.hllDistinct(df, "g", col("it"), "t").collect().head
    val est = out.getAs[Long]("est_q3") / 1000.0
    // linear counting is near-exact at n << m
    assert(math.abs(est - 5.0) < 1.5, s"small-range estimate $est vs 5")
    // most registers empty
    assert(out.getAs[String]("registers_joined").split(",").count(_ == "0") >= 59)
  }
}
