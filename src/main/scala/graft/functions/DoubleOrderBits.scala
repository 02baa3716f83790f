package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Monotone total-order bit image of a double: a long `m` such that
  * `m(a) < m(b)` ⇔ `a` sorts before `b` in Spark's double ordering.
  * The standard IEEE-754 trick — raw bits for non-negatives, low-63-bit
  * complement for negatives — with Spark's two equalities preserved:
  * `-0.0` is normalized to `+0.0` first (Spark compares them equal) and
  * NaN canonicalizes to the quiet pattern, which lands ABOVE every finite
  * value exactly like Spark's NaN-greatest sort order.
  *
  * This makes arbitrary double columns refinable by BIT PREFIX: the top
  * k bits of `m` are a value-derived histogram bucket whose order equals
  * the double order — the primitive [[graft.ops.Sampling.percentileGate]]
  * uses for distributed selection without partition-id coupling.
  */
case class DoubleOrderBits(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "double_order_bits"

  override protected def nullSafeEval(v: Any): Any =
    DoubleOrderBits.order(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.DoubleOrderBits.order($v)")

  override protected def withNewChildInternal(newChild: Expression): DoubleOrderBits =
    copy(child = newChild)
}

object DoubleOrderBits {

  /** Order-preserving long image of `d` (see class doc). */
  def order(d: Double): Long = {
    val n = if (d == 0.0d) 0.0d else d // normalize -0.0 == +0.0
    val b = java.lang.Double.doubleToLongBits(n)
    if (b < 0) b ^ Long.MaxValue else b
  }

  def of(c: Column): Column =
    ColumnBridge.wrap(DoubleOrderBits(ColumnBridge.toExpr(c)))
}
