package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-16 2D Hilbert-curve index of two long columns' low 16 bits — the
  * clustering key behind [[graft.delta.DeltaTable.optimizeHilbert]], and
  * the modern upgrade of [[ZValue]]'s Morton key: consecutive Hilbert
  * indexes are always GRID-ADJACENT cells (no Morton "seam jumps"), so a
  * contiguous index range maps to a tighter spatial region and per-file
  * min/max stats prune harder on both dimensions.
  *
  * Contract (mirrors [[ZValue]]): inputs must already be non-negative and
  * < 2^16 — ids, day numbers, bucketed/ranked values; callers rank or
  * bucket first. The expression masks to the documented 16-bit window
  * rather than hashing (hashing would destroy the locality that is the
  * whole point). 16 bits per dimension keeps the oracle's unrolled
  * 16-step CTE chain tractable while far exceeding any sane file-count
  * clustering resolution (2^32 cells).
  */
case class HilbertValue(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_value"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertValue.index(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertValue.index($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HilbertValue =
    copy(left = newLeft, right = newRight)
}

object HilbertValue {

  val Order = 16

  /** Standard xy2d walk, top bit down: accumulate s²·quadrant, then
    * reflect+swap into the quadrant's frame when ry = 0. The reflection
    * `s-1-x` may go negative mid-walk — harmless, later steps only read
    * bits below s, and two's-complement low bits match the no-borrow
    * complement (the DuckDB twin relies on the same fact). */
  def index(x0: Long, y0: Long): Long = {
    var x = x0 & 0xFFFFL
    var y = y0 & 0xFFFFL
    var d = 0L
    var s = 1L << (Order - 1)
    while (s > 0) {
      val rx = (x >> java.lang.Long.numberOfTrailingZeros(s)) & 1L
      val ry = (y >> java.lang.Long.numberOfTrailingZeros(s)) & 1L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column API: Hilbert index of two non-negative 16-bit-range longs. */
  def of(a: Column, b: Column): Column =
    ColumnBridge.wrap(HilbertValue(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))

  /** DuckDB twin as a generated CTE chain (per-step state can't be one
    * scalar expression): `hilbertCtes(src, carry, x, y)` emits
    * `h0 AS (...), …, h$Order AS (...)` where `h$Order` holds the carried
    * columns plus `hd` — the Hilbert index. The quadrant term
    * (3·rx) XOR ry is spelled arithmetically (3·rx + ry − 2·rx·ry, equal
    * on {0,1}²) to avoid engine-specific XOR spellings; every step's
    * rx/ry re-derive from the PREVIOUS step's columns, exactly like the
    * JVM walk. */
  def hilbertCtes(srcSql: String, carryCols: Seq[String],
                  xExpr: String, yExpr: String): String = {
    val carry = if (carryCols.isEmpty) "" else carryCols.mkString("", ", ", ", ")
    val steps = (0 until Order).map { i =>
      val k = Order - 1 - i
      val s = 1L << k
      val rx = s"((hx >> $k) & 1)"
      val ry = s"((hy >> $k) & 1)"
      s"""h${i + 1} AS (
         |  SELECT $carry
         |    CASE WHEN $ry = 1 THEN hx
         |         WHEN $rx = 1 THEN ${s - 1} - hy
         |         ELSE hy END AS hx,
         |    CASE WHEN $ry = 1 THEN hy
         |         WHEN $rx = 1 THEN ${s - 1} - hx
         |         ELSE hx END AS hy,
         |    hd + ${s * s} * (3 * $rx + $ry - 2 * $rx * $ry) AS hd
         |  FROM h$i)""".stripMargin
    }.mkString(",\n")
    s"""h0 AS (
       |  SELECT $carry CAST(($xExpr) & 65535 AS BIGINT) AS hx,
       |    CAST(($yExpr) & 65535 AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd
       |  FROM $srcSql),
       |$steps""".stripMargin
  }
}
