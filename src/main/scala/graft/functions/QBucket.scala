package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-preserving log-histogram bucket id of a q20 integer (the
  * quantile-sketch primitive, [[graft.ops.Sketches]]):
  * `sign(q) · (bitlen(|q|)·16 + top-4-bits-after-leading(|q|))` — 16
  * sub-buckets per octave, so a bucket's value range is ≤ 1/16 relative
  * width. A branch-free kernel beats the equivalent 63+58-branch CASE
  * chain, which blew Janino's 64 KB method limit and fell back to
  * interpreted eval; the DuckDB oracle keeps the CASE form
  * ([[graft.ops.Sketches.qBitlenSqlOverQ]]) and the driver gate proves
  * the two formulations value-identical.
  *
  * Contract: |input value| < 2^43 (the q20 quantization bound every q20
  * op in this repo shares — |q| then fits 63 bits and abs never
  * overflows). */
case class QBucket(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "q_bucket"

  override protected def nullSafeEval(v: Any): Any =
    QBucket.bucket(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.QBucket.bucket($v)")

  override protected def withNewChildInternal(newChild: Expression): QBucket =
    copy(child = newChild)
}

object QBucket {

  /** bitlen(|q|)·16 + 4-bit mantissa prefix, negated for q < 0. */
  def bucket(q: Long): Long = {
    val a = math.abs(q)
    val len = 64 - java.lang.Long.numberOfLeadingZeros(a)
    val sub = if (len <= 5) a & 15L else (a >>> (len - 5)) & 15L
    val mag = len * 16L + sub
    if (q < 0) -mag else mag
  }

  def of(c: Column): Column =
    ColumnBridge.wrap(QBucket(ColumnBridge.toExpr(c)))
}
