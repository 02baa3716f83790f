package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd product-quantization kernels for IVF-PQ. The declarative
  * forms (M × ksub `aggregate(zip_with(...))` structs per row) are
  * higher-order functions Spark evaluates INTERPRETED — the corpus
  * encode pass paid ~64 interpreted lambda folds per row; these run the
  * identical arithmetic (same fp op order, same strict-< tie-break to
  * the smallest code) in one compiled pass, so results are bit-identical
  * and the shared sim_topk_ivf oracle still gates them.
  */
object PqKernel {

  /** PQ codes of a FLOAT vector: residual vs its cell centroid computed
    * on the fly, then per-subspace argmin squared-L2 (left-associative
    * element order, first-wins ties = smallest code id). */
  def encode(v: ArrayData, cell: Long, cents: Array[Array[Double]],
             pq: Array[Array[Array[Double]]]): ArrayData = {
    val cent = cents(cell.toInt)
    val out = new Array[Int](pq.length)
    var m = 0
    var off = 0
    while (m < pq.length) {
      val cws = pq(m)
      val dsub = cws(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cws.length) {
        val w = cws(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val d = (v.getFloat(off + i).toDouble - cent(off + i)) - w(i)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(m) = best
      off += dsub
      m += 1
    }
    ArrayData.toArrayData(out)
  }

  /** ADC distance: per-subspace squared-L2 of the query residual to the
    * coded codeword, subspace sums added in m order (the exact grouping
    * the declarative reduceLeft used). `qres` is fp64. */
  def adc(qres: ArrayData, codes: ArrayData, pq: Array[Array[Array[Double]]]): Double = {
    var total = 0.0
    var m = 0
    var off = 0
    while (m < pq.length) {
      val w = pq(m)(codes.getInt(m))
      var acc = 0.0
      var i = 0
      while (i < w.length) {
        val d = qres.getDouble(off + i) - w(i)
        acc += d * d
        i += 1
      }
      total += acc
      off += w.length
      m += 1
    }
    total
  }
}

/** codes = pq_encode(vec: array<float>, cell: bigint) under plan-time
  * (cents, pq) reference objects. */
case class PqEncodeCodes(left: Expression, right: Expression,
                         cents: Array[Array[Double]], pq: Array[Array[Array[Double]]])
    extends BinaryExpression with org.apache.spark.sql.graft.FloatArrayLongInputs {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(v: Any, cell: Any): Any =
    PqKernel.encode(v.asInstanceOf[ArrayData], cell.asInstanceOf[Long], cents, pq)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val pRef = ctx.addReferenceObj("pq", pq, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, cell) =>
      s"${ev.value} = graft.functions.PqKernel.encode($v, $cell, $cRef, $pRef);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncodeCodes =
    copy(left = l, right = r)
}

/** approx = pq_adc(qres: array<double>, codes: array<int>) under the
  * plan-time pq reference object. */
case class PqAdcDistance(left: Expression, right: Expression,
                         pq: Array[Array[Array[Double]]])
    extends BinaryExpression with org.apache.spark.sql.graft.DoubleArrayIntArrayInputs {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override protected def nullSafeEval(q: Any, codes: Any): Any =
    PqKernel.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], pq)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("pq", pq, "double[][][]")
    nullSafeCodeGen(ctx, ev, (q, codes) =>
      s"${ev.value} = graft.functions.PqKernel.adc($q, $codes, $pRef);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcDistance =
    copy(left = l, right = r)
}

object PqExprs {
  def encode(vec: Column, cell: Column, cents: Array[Array[Double]],
             pq: Array[Array[Array[Double]]]): Column =
    ColumnBridge.wrap(PqEncodeCodes(ColumnBridge.toExpr(vec), ColumnBridge.toExpr(cell), cents, pq))
  def adc(qres: Column, codes: Column, pq: Array[Array[Array[Double]]]): Column =
    ColumnBridge.wrap(PqAdcDistance(ColumnBridge.toExpr(qres), ColumnBridge.toExpr(codes), pq))
}
