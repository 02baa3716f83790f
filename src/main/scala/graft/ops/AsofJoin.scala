package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the right row with
  * the matching key that is latest-before (`backward`), earliest-after
  * (`forward`), or closest-in-time (`nearest`) — the pandas
  * `merge_asof` direction surface, absent from Spark's builtin joins.
  *
  * Plan shape (the 100 TB story): NOT a range self-join (quadratic within
  * key groups) — both sides are tagged and UNIONED, then a single
  * running `last(ignoreNulls)` window carries the latest right payload
  * forward in time order (and, for forward/nearest, a second window
  * running the other way). One shuffle on the key, one sort per
  * direction, linear in |L|+|R|; skewed keys split fine under AQE
  * because the window is a running frame, not a whole-partition buffer.
  *
  * Determinism: rows are ordered by (time, side) with right rows first
  * at equal times, so a right row at exactly leftTime IS visible to
  * both directions (>= / <= semantics, matching DuckDB's ASOF JOIN,
  * which the backward oracle uses). `nearest` breaks equal-distance
  * ties BACKWARD (documented; the oracle replays the same rule). The
  * right side must be unique per (key, time) — pre-aggregate it
  * otherwise.
  */
object AsofJoin {

  /** @param left       left rows (must contain keyCol + leftTimeCol)
    * @param right      right rows, unique per (key, time)
    * @param keyCol     equi-join key
    * @param leftTime   event-time column name on the left
    * @param rightTime  event-time column name on the right
    * @param payloadCol right column to carry to the matching left rows
    * @param direction  "backward" (default) | "forward" | "nearest"
    * @return left rows + `asof_<payloadCol>` (null when no right row
    *         exists in the chosen direction)
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String,
           leftTime: String, rightTime: String, payloadCol: String,
           direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    val leftCols = left.columns
    Seq("_t", "_side", "_pb", "_pf").foreach(c => require(!leftCols.contains(c),
      s"asof join reserves the column name $c"))
    require(!leftCols.contains(s"asof_$payloadCol"),
      s"left side already has a column named asof_$payloadCol")
    val payload = s"asof_$payloadCol"
    // the payload rides in a struct: `last(ignoreNulls)` must skip only
    // the LEFT sentinel rows, not right rows whose payload is
    // legitimately null — a bare column would carry a stale older value
    // over a newer null. The right TIME rides along for the nearest
    // distance compare.
    val pType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", right.schema(payloadCol).dataType),
      org.apache.spark.sql.types.StructField("t", right.schema(rightTime).dataType)))
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_pb", lit(null).cast(pType))
    val r = right.select(
      col(keyCol),
      col(rightTime).as("_t"),
      lit(0).as("_side"),
      struct(col(payloadCol).as("v"), col(rightTime).as("t")).as("_pb"))
    val unioned = l.select((col(keyCol) +: col("_t") +: col("_side") +: col("_pb") +:
        leftCols.filterNot(c => c == keyCol).map(col)).toSeq: _*)
      .unionByName(r, allowMissingColumns = true)

    // right rows (side 0) sort before left rows at equal _t → visible to
    // them in EITHER direction's running frame
    def running(ord: Column) = Window.partitionBy(col(keyCol))
      .orderBy(ord, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wb = running(col("_t").asc)
    val wf = running(col("_t").desc)

    // epoch-linear view of a time value for the nearest distance compare;
    // a left/right type mismatch would compare incompatible units
    if (direction == "nearest")
      require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
        s"nearest needs matching time types, got ${left.schema(leftTime).dataType} " +
          s"vs ${right.schema(rightTime).dataType}")
    def tl(c: Column): Column = right.schema(rightTime).dataType match {
      case _: org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case org.apache.spark.sql.types.DateType => unix_date(c).cast("long")
      case _ => c.cast("long")
    }
    val chosen: Column = direction match {
      case "backward" => col("_pb").getField("v")
      case "forward" => col("_pf").getField("v")
      case "nearest" =>
        when(col("_pb").isNull, col("_pf").getField("v"))
          .when(col("_pf").isNull, col("_pb").getField("v"))
          // equal distances break BACKWARD
          .when(tl(col("_t")) - tl(col("_pb").getField("t")) <=
            tl(col("_pf").getField("t")) - tl(col("_t")),
            col("_pb").getField("v"))
          .otherwise(col("_pf").getField("v"))
    }
    val withBack =
      if (direction == "forward") unioned
      else unioned.withColumn("_pb", last(col("_pb"), ignoreNulls = true).over(wb))
    val withBoth =
      if (direction == "backward") withBack.withColumn("_pf", lit(null).cast(pType))
      else {
        val seeded = if (direction == "forward")
          withBack.withColumn("_pf", col("_pb"))
            .withColumn("_pb", lit(null).cast(pType))
        else withBack.withColumn("_pf", col("_pb"))
        // the forward window must aggregate the RAW right payloads, not
        // the backward-filled column — reuse the union's original struct
        seeded.withColumn("_pf",
          last(when(col("_side") === 0, col("_pf")), ignoreNulls = true).over(wf))
      }
    withBoth
      .filter(col("_side") === 1)
      .select((leftCols.map(col) :+ chosen.as(payload)).toSeq: _*)
  }
}
