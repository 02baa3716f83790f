package graft.delta

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** TRUE when row `pos` of the data file keyed `fileKey` is deleted by the
  * snapshot's deletion vectors. The scan path filters on its negation —
  * a membership probe against BROADCAST serialized bitmaps
  * ([[DvLookup]]/[[BitmapView]]) instead of an anti-join against a
  * driver-exploded position list, so DV subtraction stays inside the
  * scan's whole-stage codegen and per-executor memory is the COMPRESSED
  * bitmap bytes, never 8 bytes × deleted rows on the driver.
  *
  * Codegen calls straight into [[DvLookup.deleted]] with the scan's
  * UTF8String (no per-row String allocation). Null inputs cannot occur on
  * the metadata columns that feed this ([[DeltaTable.rawFor]] projects
  * `_metadata.file_path`/`row_index`, which are never null), but
  * nullSafeCodeGen keeps the standard contract anyway. */
case class DvDeleted(left: Expression, right: Expression,
                     lookup: Broadcast[DvLookup])
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "dv_deleted"

  override protected def nullSafeEval(f: Any, p: Any): Any =
    lookup.value.deleted(f.asInstanceOf[UTF8String], p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvLookup", lookup,
      classOf[Broadcast[DvLookup]].getName)
    nullSafeCodeGen(ctx, ev, (f, p) =>
      s"${ev.value} = ((graft.delta.DvLookup)$ref.value()).deleted($f, $p);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DvDeleted =
    copy(left = newLeft, right = newRight)
}
