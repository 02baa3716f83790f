package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** JVM kernel for the pruned-bigram LM scorer
  * ([[graft.ops.LanguageModel]]): one pass over a document's token array,
  * summing integer-scaled per-token NLLs. Replaces the interpreted
  * higher-order `aggregate` + map-literal `element_at` formulation, whose
  * lookups scan the literal arrays per token (measured ~3.8 s at sf0.1 →
  * hash-map lookups in a single kernel call). Arithmetic is
  * value-identical: same `Math.log`, same floor(x·10⁶ + 0.5) scaling, so
  * the DuckDB oracle and the hand-pinned spec are unchanged.
  */
object LmScoreKernel {

  val Unk = "<unk>"
  val Bos = "<s>"

  def nllQ6(ts: ArrayData, vocab: java.util.HashSet[String],
            ctx: java.util.HashMap[String, java.lang.Long],
            big: java.util.HashMap[String, java.lang.Long], v: Double): Long = {
    val n = ts.numElements()
    var acc = 0L
    var prev = Bos
    var i = 0
    while (i < n) {
      val t = ts.getUTF8String(i)
      val w =
        if (t == null) Unk
        else { val s = t.toString; if (vocab.contains(s)) s else Unk }
      val c2 = big.get(prev + " " + w)
      val c1 = ctx.get(prev)
      val pr = ((if (c2 == null) 0L else c2.longValue()) + 1.0) /
        ((if (c1 == null) 0L else c1.longValue()) + v)
      acc += math.floor(-math.log(pr) * 1e6 + 0.5).toLong
      prev = w
      i += 1
    }
    acc
  }
}

/** `long` integer-scaled NLL of an `array<string>` token column under a
  * pruned bigram LM (vocab membership, context counts, bigram counts, V).
  * The LM folds into the plan as reference objects — scoring rides the
  * scan stage, one kernel call per row.
  */
case class LmNllQ6(child: Expression, vocab: Seq[String],
                   contexts: Seq[(String, Long)], bigrams: Seq[(String, Long)],
                   v: Double)
    extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val vocabSet = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val ctxMap = {
    val m = new java.util.HashMap[String, java.lang.Long](contexts.size * 2)
    contexts.foreach { case (k, n) => m.put(k, n) }
    m
  }
  @transient private lazy val bigMap = {
    val m = new java.util.HashMap[String, java.lang.Long](bigrams.size * 2)
    bigrams.foreach { case (k, n) => m.put(k, n) }
    m
  }

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "lm_nll_q6"

  override protected def nullSafeEval(input: Any): Any =
    LmScoreKernel.nllQ6(input.asInstanceOf[ArrayData], vocabSet, ctxMap, bigMap, v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("vocab", vocabSet, "java.util.HashSet")
    val ctxRef = ctx.addReferenceObj("ctx", ctxMap, "java.util.HashMap")
    val bigRef = ctx.addReferenceObj("big", bigMap, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LmScoreKernel.nllQ6($c, $vocabRef, $ctxRef, $bigRef, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): LmNllQ6 =
    copy(child = newChild)
}

object LmNllQ6 {
  def of(tokens: Column, vocab: Seq[String], contexts: Seq[(String, Long)],
         bigrams: Seq[(String, Long)], v: Double): Column =
    ColumnBridge.wrap(LmNllQ6(ColumnBridge.toExpr(tokens), vocab, contexts, bigrams, v))
}
