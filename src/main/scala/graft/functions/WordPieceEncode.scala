package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel for [[WordPieceEncode]]: greedy LONGEST-MATCH-FIRST
  * subword tokenization under a fixed piece vocabulary (Wu et al. 2016;
  * the BERT tokenizer family — continuation pieces carry the standard
  * `##` prefix). Per word: take the longest vocabulary piece matching at
  * the current position (unprefixed pieces at position 0, `##`-prefixed
  * after), advance, repeat; any position with NO match — or a word
  * longer than `maxWordChars` code points (the HF
  * max_input_chars_per_word guard) — renders the WHOLE word as `[UNK]`.
  * Unlike BPE's merge replay, encoding depends only on the vocab SET,
  * which is what [[graft.ops.TextAnalysis.trainWordPieceFromCounts]]
  * produces. */
object WordPieceKernel {

  val Unk = "[UNK]"
  val ContinuationPrefix = "##"

  final class Vocab(pieces: Seq[String], val maxWordChars: Int) extends Serializable {
    // start-position pieces keyed by effective text; continuation pieces
    // keyed by effective text (the part after ##). Classification is by
    // the STORED prefix, so it can never depend on corpus content.
    val start = new java.util.HashSet[String]()
    val cont = new java.util.HashSet[String]()
    var maxPieceChars = 1
    pieces.foreach { p =>
      if (p.startsWith(ContinuationPrefix)) {
        val eff = p.substring(ContinuationPrefix.length)
        if (eff.nonEmpty) { cont.add(eff); maxPieceChars = math.max(maxPieceChars, eff.length) }
      } else if (p.nonEmpty) {
        start.add(p); maxPieceChars = math.max(maxPieceChars, p.length)
      }
    }
  }

  /** Encode one word; the result list holds STORED pieces (## prefixes
    * on continuations) or the single `[UNK]`. */
  def encodeWord(word: String, v: Vocab): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String](4)
    // code-point count guard (DuckDB's length() counts code points)
    if (word.codePointCount(0, word.length) > v.maxWordChars) {
      out.add(Unk); return out
    }
    var start = 0
    while (start < word.length) {
      val set = if (start == 0) v.start else v.cont
      // longest match first; end bounds move by CHARS but candidate
      // lengths are capped by maxPieceChars (stored pieces are plain
      // strings, so char-substring comparison is exact)
      var end = math.min(word.length, start + v.maxPieceChars)
      var matched: String = null
      while (matched == null && end > start) {
        val cand = word.substring(start, end)
        if (set.contains(cand)) matched = cand else end -= 1
      }
      if (matched == null) {
        out.clear(); out.add(Unk); return out
      }
      out.add(if (start == 0) matched else ContinuationPrefix + matched)
      start = end
    }
    if (out.isEmpty) out.add(Unk) // empty word: nothing matchable
    out
  }

  /** Encode straight to ids (pieces → positions in `[UNK] +: vocab`) —
    * the fused form [[WordPieceEncodeIds]] calls. */
  def encodeIds(tokens: ArrayData, v: Vocab,
                ids: java.util.HashMap[String, java.lang.Long]): ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.ArrayList[java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      if (w != null) {
        val pieces = encodeWord(w.toString, v)
        var j = 0
        while (j < pieces.size) {
          val id = ids.get(pieces.get(j))
          out.add(if (id == null) 0L else id) // unknown piece ≡ [UNK]
          j += 1
        }
      }
      i += 1
    }
    val arr = new Array[Long](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }

  def encode(tokens: ArrayData, v: Vocab): ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.ArrayList[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      if (w != null) {
        val pieces = encodeWord(w.toString, v)
        var j = 0
        while (j < pieces.size) { out.add(UTF8String.fromString(pieces.get(j))); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `array<string>` WordPiece pieces of an `array<string>` token column
  * under a fixed vocabulary. Like [[BpeEncode]], the vocab folds into
  * the plan as a reference object, so encoding is one codegen'd kernel
  * call riding the scan stage — zero shuffle, no UDF registry. */
case class WordPieceEncode(child: Expression, vocab: Seq[String], maxWordChars: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val v = new WordPieceKernel.Vocab(vocab, maxWordChars)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  override protected def nullSafeEval(input: Any): Any =
    WordPieceKernel.encode(input.asInstanceOf[ArrayData], v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("vocab", v, "graft.functions.WordPieceKernel.Vocab")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordPieceKernel.encode($c, $vRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}

object WordPieceEncode {
  /** Column API: WordPiece pieces of a token-array column. */
  def of(tokens: Column, vocab: Seq[String], maxWordChars: Int = 20): Column =
    ColumnBridge.wrap(WordPieceEncode(ColumnBridge.toExpr(tokens), vocab, maxWordChars))
}

/** `array<long>` WordPiece piece IDS: encode and vocabulary lookup fused
  * into one kernel pass ([[BpeEncodeIds]]'s counterpart). Id space is
  * `[UNK]` at 0 followed by the vocab pieces in order — the standard
  * reserved-special layout — so unknown words land on id 0 through the
  * SAME lookup as every other piece. */
case class WordPieceEncodeIds(child: Expression, vocab: Seq[String], maxWordChars: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val v = new WordPieceKernel.Vocab(vocab, maxWordChars)
  @transient private lazy val ids = {
    val m = new java.util.HashMap[String, java.lang.Long]((vocab.size + 1) * 2)
    (WordPieceKernel.Unk +: vocab).zipWithIndex.foreach { case (p, i) =>
      m.putIfAbsent(p, i.toLong)
    }
    m
  }

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "wordpiece_encode_ids"

  override protected def nullSafeEval(input: Any): Any =
    WordPieceKernel.encodeIds(input.asInstanceOf[ArrayData], v, ids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("vocab", v, "graft.functions.WordPieceKernel.Vocab")
    val idsRef = ctx.addReferenceObj("ids", ids, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordPieceKernel.encodeIds($c, $vRef, $idsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncodeIds =
    copy(child = newChild)
}

object WordPieceEncodeIds {
  def of(tokens: Column, vocab: Seq[String], maxWordChars: Int = 20): Column =
    ColumnBridge.wrap(WordPieceEncodeIds(ColumnBridge.toExpr(tokens), vocab, maxWordChars))
}
