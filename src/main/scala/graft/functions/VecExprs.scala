package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Codegen'd vector kernels for embedding similarity. The declarative
  * alternatives (`aggregate(zip_with(...))`, 512-term projection trees)
  * are higher-order functions Spark evaluates INTERPRETED — measured
  * ~46 µs/row on 64-dim floats; these run the same left-to-right IEEE
  * fold in a compiled loop (~0.2 µs), bit-identical to the DuckDB oracle's
  * spelled-out sums (graft.queries.OracleSql).
  */
object VecKernel {
  /** 0.0 + a1·b1 + a2·b2 + … (left-associative, fp64) over float arrays. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  /** cosine = dot/(‖a‖·‖b‖), 0 when a norm is 0 — mirrors
    * Similarity.cosine / OracleSql.cosine exactly (same op order). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val d = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
    if (d == 0) 0.0 else dot(a, b) / d
  }

  /** Packed sign-bit signature under a ±1 hyperplane matrix: bit p set iff
    * the left-associative projection of v onto row p is ≥ 0 — mirrors
    * Similarity.signature / OracleSql.signature. */
  def signature(v: ArrayData, m: Array[Array[Double]]): Long = {
    var sig = 0L
    var p = 0
    while (p < m.length) {
      val w = m(p)
      val n = math.min(v.numElements(), w.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getFloat(i).toDouble * w(i); i += 1 }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.graft.FloatArrayInputs {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernel.cosine($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

case class HyperplaneSignature(child: Expression, m: Array[Array[Double]])
    extends UnaryExpression with org.apache.spark.sql.graft.FloatArrayInputs {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_signature"
  override protected def nullSafeEval(v: Any): Any =
    VecKernel.signature(v.asInstanceOf[ArrayData], m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("planes", m, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VecKernel.signature($v, $mRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object VecExprs {
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.wrap(CosineSimilarity(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))
  def signature(v: Column, m: Array[Array[Double]]): Column =
    ColumnBridge.wrap(HyperplaneSignature(ColumnBridge.toExpr(v), m))
}
