package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave of two long columns' low 32 bits: bit i of
  * `a` lands at position 2i+1, bit i of `b` at 2i. Sorting by the z-value
  * clusters BOTH dimensions simultaneously, so per-file min/max stats
  * tighten on each column and [[graft.delta.DataSkipping]] prunes files
  * for predicates on either one — the multi-dimensional generalization of
  * sort-by-one-column clustering ([[graft.delta.DeltaTable.optimizeZOrder]]).
  *
  * Contract: inputs must already be non-negative and < 2^32 (ids, day
  * numbers, bucketed/ranked values). Values outside that range would make
  * the interleave non-monotone in the raw inputs — callers rank or bucket
  * first; this expression refuses silently wrong output by masking and
  * DOCUMENTING the 32-bit window rather than hashing (a hash would destroy
  * the range-clustering property that is the whole point).
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZValue.interleave($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

object ZValue {

  /** Morton-interleave the low 32 bits of `a` (odd positions) and `b`
    * (even positions) via the standard mask-spread sequence. */
  def interleave(a: Long, b: Long): Long =
    (spread(a & 0xFFFFFFFFL) << 1) | spread(b & 0xFFFFFFFFL)

  /** Spread the low 32 bits of x to even bit positions of a 64-bit long. */
  private def spread(x0: Long): Long = {
    var x = x0
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Column API: z-order value of two non-negative 32-bit-range longs. */
  def of(a: Column, b: Column): Column =
    ColumnBridge.wrap(ZValue(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))

  /** DuckDB twin of [[of]] for the oracle: the 64-term bit-gather sum —
    * ugly but exact, same trick as OracleSql.simhashExpr. The a-bit-31
    * term lands on the SIGN bit: DuckDB raises an overflow error for
    * `BIGINT << 63`, so that one term is spelled as a CASE to the
    * precomputed Long.MinValue literal instead of a shift (Java's `<< 63`
    * wraps to the same value, so the engines agree bit-for-bit). */
  def sql(a: String, b: String): String = {
    val terms =
      (0 until 31).map(i => s"((((($a) >> $i) & 1)) << ${2 * i + 1})") ++
        Seq(s"(CASE WHEN ((($a) >> 31) & 1) = 1 THEN ${Long.MinValue} ELSE 0 END)") ++
        (0 until 32).map(i => s"((((($b) >> $i) & 1)) << ${2 * i})")
    terms.mkString("(", " | ", ")")
  }
}
