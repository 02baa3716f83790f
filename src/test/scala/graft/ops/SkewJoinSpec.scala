package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** saltedJoin must be row-for-row identical to the plain join while
  * actually splitting hot keys across salt values. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // one pathological key (0) holding 80% of rows + a long tail
  private lazy val left = ((1L to 800L).map(i => (i, 0L)) ++
    (801L to 1000L).map(i => (i, i % 50 + 1))).toDF("row_id", "k")
  private lazy val right = (0L to 50L).map(k => (k, s"dim$k")).toDF("k", "payload")

  test("inner salted join equals the plain join row-for-row") {
    val plain = left.join(right, Seq("k")).select("row_id", "k", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedJoin(left, right, "k", "row_id", salts = 16)
      .select("row_id", "k", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(plain.size === 1000)
  }

  test("left salted join keeps unmatched left rows exactly once") {
    val withOrphans = left.union(Seq((2000L, 999L)).toDF("row_id", "k"))
    val plain = withOrphans.join(right, Seq("k"), "left")
      .select("row_id", "payload")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val salted = SkewJoin.saltedJoin(withOrphans, right, "k", "row_id", 8, "left")
      .select("row_id", "payload")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(salted === plain)
    assert(salted.contains((2000L, None)))
  }

  test("the hot key actually spreads across salts; salt is deterministic") {
    val salts = 16
    val dist = left.filter(col("k") === 0L)
      .withColumn("s", pmod(graft.functions.Hashing.h64(col("row_id").cast("string"), "salt"),
        lit(salts)))
      .groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist.size === salts, s"hot key not spread: $dist")
    // no salt bucket hoards the hot key (800 rows over 16 salts ~ 50 each)
    assert(dist.values.max < 800L / 4)
    assertThrows[IllegalArgumentException](
      SkewJoin.saltedJoin(left, right, "k", "row_id", 4, "right"))
    assertThrows[IllegalArgumentException](
      SkewJoin.saltedJoin(left, right, "k", "row_id", 0))
  }
}
