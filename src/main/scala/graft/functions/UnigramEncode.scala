package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel for [[UnigramEncode]]: Viterbi segmentation of a word under
  * a unigram piece model (Kudo 2018, "Subword Regularization" — the
  * SentencePiece unigram tokenizer's inference step): pick the
  * segmentation minimizing the total integer piece cost (a quantized
  * −log p). Exact DP, not greedy — the property BPE's merge walk lacks.
  *
  * Determinism contract (the oracle replays it): costs are integers;
  * best[i] scans split points j ascending and replaces only on STRICTLY
  * smaller cost, so cost ties resolve to the smallest j (the longest
  * final piece). Characters absent from the vocabulary fall back to a
  * single-char piece at `unkCost`. The first piece of each word carries
  * the SentencePiece word-boundary marker '▁', keeping the flat piece
  * stream losslessly decodable.
  */
object UnigramKernel {

  val WordMark = "▁" // '▁'

  def costsOf(vocab: Seq[(String, Long)]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) =>
      require(c > 0, s"piece cost must be positive: $p -> $c")
      m.put(p, c)
    }
    m
  }

  /** Viterbi-segment one word; pieces in order, first piece ▁-marked. */
  def segmentWord(word: String,
                  costs: java.util.HashMap[String, java.lang.Long],
                  unkCost: Long): java.util.ArrayList[String] = {
    val n = word.length
    val out = new java.util.ArrayList[String](n)
    if (n == 0) return out
    val best = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Long.MaxValue)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = 0
      while (j < i) {
        if (best(j) != Long.MaxValue) {
          val c = costs.get(word.substring(j, i))
          val cost: Long =
            if (c != null) c.longValue()
            else if (i - j == 1) unkCost
            else -1L
          if (cost >= 0L) {
            val cand = best(j) + cost
            if (cand < best(i)) { best(i) = cand; bp(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    // backtrace (single-char fallback guarantees best(n) is finite)
    var pos = n
    val rev = new java.util.ArrayList[String](n)
    while (pos > 0) {
      val j = bp(pos)
      rev.add(word.substring(j, pos))
      pos = j
    }
    var k = rev.size - 1
    while (k >= 0) {
      val p = rev.get(k)
      out.add(if (k == rev.size - 1) WordMark + p else p)
      k -= 1
    }
    out
  }

  /** Segment a token array to one flat ▁-marked piece array. */
  def encode(tokens: ArrayData,
             costs: java.util.HashMap[String, java.lang.Long],
             unkCost: Long): ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.ArrayList[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      if (w != null) {
        val pieces = segmentWord(w.toString, costs, unkCost)
        var j = 0
        while (j < pieces.size) { out.add(UTF8String.fromString(pieces.get(j))); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `array<string>` unigram-LM pieces of an `array<string>` token column
  * under a fixed (piece → integer cost) vocabulary. The cost table folds
  * into the plan as a reference object ([[BpeEncode]]'s pattern), so
  * segmentation is one codegen'd kernel call riding the scan stage —
  * zero shuffle, no UDF registry. */
case class UnigramEncode(child: Expression, vocab: Seq[(String, Long)],
                         unkCost: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(unkCost > 0, s"unkCost must be positive, got $unkCost")

  @transient private lazy val costs = UnigramKernel.costsOf(vocab)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.encode(input.asInstanceOf[ArrayData], costs, unkCost)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val costsRef = ctx.addReferenceObj("costs", costs, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramKernel.encode($c, $costsRef, ${unkCost}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {
  def of(tokens: Column, vocab: Seq[(String, Long)], unkCost: Long): Column =
    ColumnBridge.wrap(UnigramEncode(ColumnBridge.toExpr(tokens), vocab, unkCost))
}
