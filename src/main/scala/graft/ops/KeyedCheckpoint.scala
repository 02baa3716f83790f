package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions.col

/** Keyed localCheckpoint that PRESERVES the materialized partitioning.
  *
  * `Dataset.localCheckpoint()` under AQE snapshots the RDD with
  * `UnknownPartitioning`, so a frame that was explicitly repartitioned
  * (and sorted) on its iteration join key is re-exchanged — and re-sorted
  * — on every keyed use downstream, defeating the entire point of
  * materializing loop invariants once (pageRank-style iterative ops pay
  * one |E| exchange + sort PER ROUND for a frame that never changes).
  *
  * This helper performs the shuffle/sort BEFORE the checkpoint with an
  * explicit partition count (an explicit-N keyed repartition is never
  * AQE-coalesced, so the physical layout is exactly
  * `HashPartitioning(keys, n)` + per-partition ascending key order), then
  * re-declares those physically-true properties on the checkpointed
  * LogicalRDD — the same seam Spark's own `Dataset.checkpoint`
  * used before AQE. Purely a plan-cost device: values, row sets, and
  * partition contents are untouched.
  *
  * Lives under org.apache.spark.sql for the private[sql]
  * `Dataset.ofRows`/`LogicalRDD` access, like [[StreamBridge]]. */
object KeyedCheckpoint {

  /** Repartition `df` by `keys` into the session's shuffle-partition
    * count, sort within partitions by `keys`, localCheckpoint eagerly,
    * and return a frame whose plan DECLARES that partitioning and
    * ordering (so downstream keyed joins/aggregations on `keys` insert
    * no exchange and no sort). */
  def apply(df: DataFrame, keys: String*): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val n = cs.sessionState.conf.numShufflePartitions
    val cp = df.repartition(n, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .localCheckpoint()
    val lr = cp.queryExecution.analyzed match {
      case l: LogicalRDD => l
      case other => throw new IllegalStateException(
        s"localCheckpoint did not yield a LogicalRDD plan: $other")
    }
    val attrs = keys.map { k =>
      lr.output.find(_.name == k).getOrElse(throw new IllegalArgumentException(
        s"key column '$k' not in checkpointed output ${lr.output.map(_.name)}"))
    }
    val partitioning = HashPartitioning(attrs, n)
    val ordering = attrs.map(a => SortOrder(a, Ascending)).toSeq
    org.apache.spark.sql.classic.Dataset.ofRows(cs,
      LogicalRDD(lr.output, lr.rdd, partitioning, ordering,
        isStreaming = false)(cs))
  }
}
