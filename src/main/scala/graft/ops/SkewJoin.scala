package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the standard fix when one hot key
  * (the null-ish user, the default domain, the empty-string bucket) drags
  * a whole shuffle partition while 999 executors idle.
  *
  * Mechanics: the LEFT (large, skewed) side gets a deterministic salt in
  * [0, salts) per row; the RIGHT side is replicated once per salt value
  * via a small literal explode. Joining on (key, salt) splits every hot
  * key's rows across `salts` partitions. Row-for-row identical to the
  * unsalted join (each left row meets exactly the one right replica with
  * its salt), which the spec pins.
  *
  * When to use: AQE's skew-join split (on by default in GraftSession)
  * already handles MOST skew by splitting oversized partitions — use this
  * when a single KEY exceeds what partition-splitting can fix (a split
  * partition still replays the same right-side build for one key) or
  * when AQE is unavailable (streaming joins). The right side grows
  * `salts`×: keep salts modest (8–64) and the right side slim.
  *
  * The salt is md5-derived from the left row's `saltBy` column (a unique
  * id), never Spark's RNG — deterministic across retries and speculative
  * tasks (a nondeterministic salt re-deals rows between attempts, which
  * breaks exactly-once sinks downstream).
  */
object SkewJoin {

  /** @param left    large skewed side
    * @param right   smaller side, replicated `salts`× into the join
    * @param keyCol  equi-join key present on both sides
    * @param saltBy  left column whose md5 picks the salt (a unique id)
    * @param salts   number of splits per key
    * @param joinType "inner" or "left" (left rows with no match survive) */
  def saltedJoin(left: DataFrame, right: DataFrame, keyCol: String,
                 saltBy: String, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType: a right/full " +
        "join over a replicated right side would duplicate unmatched right rows")
    val cols = (left.columns ++ right.columns).toSet
    require(!cols.contains("__salt"), "saltedJoin reserves the column name __salt")
    val l = left.withColumn("__salt",
      pmod(graft.functions.Hashing.h64(col(saltBy).cast("string"), "salt"), lit(salts))
        .cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(keyCol, "__salt"), joinType).drop("__salt")
  }
}
