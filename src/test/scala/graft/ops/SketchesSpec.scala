package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** HLL sketch contracts: estimate accuracy within the m=64 error bound,
  * bit-identical results across partitionings (register max is
  * order-free), and the small-range linear-counting branch. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

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
