package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** JVM kernel for [[MinHashSig]]: all k affine minima in one pass over the
  * hash array. The groupBy-explode formulation this replaces shuffled one
  * row per (doc, shingle) and ran k interpreted `min` aggregates —
  * measured ~4 s of the sf0.1 bench; this loop is ~2 ms for the same data
  * and keeps the signature inside the scan's codegen span (no shuffle).
  */
object MinHashKernel {
  /** k affine minima over the low 32 bits of each 60-bit hash:
    * min_i((a_j * x_i + b_j) mod P32) for j in [0, k). Value-identical to
    * min(Hashing.affine(x, j)) over exploded rows, so the DuckDB oracle
    * (OracleSql.minhashAggArray) is unchanged. */
  def sig(hsh: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = hsh.numElements()
    val k = as.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = hsh.getLong(i) & 0xFFFFFFFFL
      var j = 0
      while (j < k) {
        // a < 2^30 and x < 2^32 keep a*x + b under 2^63 — no overflow,
        // same bound the SQL mirror relies on (Hashing.P32 scaladoc)
        val v = (as(j) * x + bs(j)) % Hashing.P32
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<long>` MinHash signature of an `array<long>` shingle-hash column
  * (one value per affine hash function, [[Hashing.affine]] family). Codegen
  * emits a single static call — the whole signature computation rides the
  * scan stage.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  private val as: Array[Long] = Array.tabulate(numHashes)(Hashing.affineA)
  private val bs: Array[Long] = Array.tabulate(numHashes)(Hashing.affineB)

  // misuse (e.g. array<string> child) is an analysis error, not a kernel
  // ClassCastException; array<int> upcasts for free
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // empty-array inputs yield null (not a [MaxValue x k] sentinel that would
  // band every empty doc into one bucket at any unguarded call site)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else MinHashKernel.sig(arr, as, bs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("as", as, "long[]")
    val bRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.MinHashKernel.sig($c, $aRef, $bRef);
         |}""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column API: MinHash signature (k affine minima) of shingle hashes. */
  def of(hsh: Column, numHashes: Int): Column =
    ColumnBridge.wrap(MinHashSig(ColumnBridge.toExpr(hsh), numHashes))
}
