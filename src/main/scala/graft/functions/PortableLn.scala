package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Branch-free portable-ln kernel: calls the [[PortableMath.lnCoin]] /
  * [[PortableMath.lnWide]] while-loop twins instead of macro-expanding
  * the 33/63-branch MSB cascade + 18-term Horner into SQL. The expanded
  * chain, fused by whole-stage codegen into a window's sort stage, blew
  * Janino's 64 KB method limit and dropped the ENTIRE stage (scan
  * included) to interpreted eval — the QBucket lesson again. The DuckDB
  * oracle keeps the SQL-macro form ([[PortableMath.mSql]] chain);
  * PortableMathSpec pins the twins bit-identical over the full domain,
  * and the driver's hash gate proves it end to end. */
case class PortableLn(child: Expression, wide: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = if (wide) "portable_ln_wide" else "portable_ln_coin"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Long]
    if (wide) PortableMath.lnWide(x) else PortableMath.lnCoin(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      if (wide) s"graft.functions.PortableMath.lnWide($v)"
      else s"graft.functions.PortableMath.lnCoin($v)")

  override protected def withNewChildInternal(newChild: Expression): PortableLn =
    copy(child = newChild)
}

object PortableLn {
  /** ln(x) − 32·ln 2 for x ∈ [1, 2^32] (the coin chain). */
  def coin(c: Column): Column =
    ColumnBridge.wrap(PortableLn(ColumnBridge.toExpr(c), wide = false))

  /** ln(x) − 32·ln 2 for x ∈ [1, 2^62] (the wide-count chain). */
  def wide(c: Column): Column =
    ColumnBridge.wrap(PortableLn(ColumnBridge.toExpr(c), wide = true))
}
