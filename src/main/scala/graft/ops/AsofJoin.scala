package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the most recent right
  * row with `rightTime <= leftTime` within the same key — the canonical
  * time-series enrichment operator, absent from Spark's builtin joins.
  *
  * Plan shape (the 100 TB story): NOT a range self-join (quadratic within
  * key groups) — both sides are tagged and UNIONED, then a single
  * running `last(ignoreNulls)` window carries the latest right payload
  * forward in time order. One shuffle on the key, one sort, linear in
  * |L|+|R|; skewed keys split fine under AQE because the window is a
  * running frame, not a whole-partition buffer.
  *
  * Determinism: rows are ordered by (time, side, tieBreak) with right
  * rows first at equal times, so a right row at exactly leftTime IS
  * visible (>= semantics, matching DuckDB's ASOF JOIN, which the oracle
  * uses). The right side must be unique per (key, time) — pre-aggregate
  * it otherwise.
  */
object AsofJoin {

  /** @param left       left rows (must contain keyCol + leftTimeCol)
    * @param right      right rows, unique per (key, time)
    * @param keyCol     equi-join key
    * @param leftTime   event-time column name on the left
    * @param rightTime  event-time column name on the right
    * @param payloadCol right column to carry to the matching left rows
    * @return left rows + `asof_<payloadCol>` (null when no right row ≤ t)
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String,
           leftTime: String, rightTime: String, payloadCol: String): DataFrame = {
    val leftCols = left.columns
    require(!leftCols.contains("_t") && !leftCols.contains("_side"),
      "asof join reserves the column names _t and _side")
    require(!leftCols.contains(s"asof_$payloadCol"),
      s"left side already has a column named asof_$payloadCol")
    val payload = s"asof_$payloadCol"
    // the payload rides in a one-field struct: `last(ignoreNulls)` must
    // skip only the LEFT sentinel rows, not right rows whose payload is
    // legitimately null — a bare column would carry a stale older value
    // over a newer null
    val pType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", right.schema(payloadCol).dataType)))
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn(payload, lit(null).cast(pType))
    val r = right.select(
      col(keyCol),
      col(rightTime).as("_t"),
      lit(0).as("_side"),
      struct(col(payloadCol).as("v")).as(payload))
    val unioned = l.select((col(keyCol) +: col("_t") +: col("_side") +: col(payload) +:
        leftCols.filterNot(c => c == keyCol).map(col)).toSeq: _*)
      .unionByName(r, allowMissingColumns = true)

    // right rows (side 0) sort before left rows at equal _t → visible to them
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((leftCols.map(col) :+ col(payload).getField("v").as(payload)).toSeq: _*)
  }
}
