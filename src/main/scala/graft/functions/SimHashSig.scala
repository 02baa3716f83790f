package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** JVM kernel for [[SimHashSig]]: the per-bit majority vote in one pass over
  * the token-hash array. The higher-order-function formulation this replaces
  * (`transform(sequence(0, bits-1), bit -> aggregate(hashes, ...))`) is
  * interpreted and walks the hash array once PER BIT — 60 × tokens Catalyst
  * evaluations per row; this loop touches each hash once and stays inside
  * the scan's whole-stage-codegen span.
  */
object SimHashKernel {
  /** Per-bit majority vote over `bits` low bits of each hash: bit b of the
    * result is set iff strictly more hashes have bit b set than clear.
    * Value-identical to [[graft.ops.Dedup.simhashFromHashes]] (and the
    * DuckDB oracle mirror, OracleSql.simhashExpr) including the edge cases:
    * empty array → 0, null element → a −1 vote on every bit (the
    * interpreted `when(...).otherwise(-1)` sends null conditions to the
    * otherwise branch). */
  def sig(hashes: ArrayData, bits: Int): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i)) {
        var b = 0
        while (b < bits) { votes(b) -= 1; b += 1 }
      } else {
        val h = hashes.getLong(i)
        var b = 0
        while (b < bits) {
          votes(b) += (((h >>> b) & 1L).toInt << 1) - 1 // +1 if set, -1 if clear
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}

/** 60-bit (configurable) SimHash of an `array<long>` token-hash column.
  * Codegen emits a single static call, so the signature rides the scan
  * stage; values are bit-for-bit those of the interpreted
  * `Dedup.simhashFromHashes`, so the DuckDB oracle is unchanged
  * (DedupSpec pins the kernel ≡ interpreted identity).
  */
case class SimHashSig(child: Expression, bits: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")

  // misuse (non-array<long> child) is an analysis error, not a kernel
  // ClassCastException; array<int> upcasts for free
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.sig(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashKernel.sig($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  /** Column API: per-bit-majority SimHash of a token-hash array. */
  def of(hashes: Column, bits: Int = 60): Column =
    ColumnBridge.wrap(SimHashSig(ColumnBridge.toExpr(hashes), bits))
}
