package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel for [[BpeEncode]]: greedy byte-pair-encoding of a word under
  * a learned merge-rank table (Sennrich et al. 2016 — the standard
  * subword tokenizer; merges learned by
  * [[graft.ops.TextAnalysis.trainBpe]]). Repeatedly merges the
  * LOWEST-RANK adjacent symbol pair (all its occurrences, left to right)
  * until no adjacent pair is in the table — exactly the reference
  * algorithm, so pieces match any standard implementation given the same
  * merge list.
  */
object BpeKernel {

  /** End-of-word marker appended as a symbol — lets a merge learn
    * word-final pieces ("est&lt;/w&gt;") distinct from word-internal ones,
    * and makes the piece stream losslessly decodable back to words. */
  val EndOfWord = "</w>"

  /** Separator for the pair-key encoding in the rank map: U+0000 keeps
    * pair keys unambiguous even for callers whose tokens contain spaces
    * (whitespace-split tokens never do, but the kernel is generic). */
  val Sep = "\u0000"

  def ranksOf(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + Sep + b, i) }
    m
  }

  /** Encode one word to its BPE pieces. */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): java.util.ArrayList[String] = {
    var syms = new java.util.ArrayList[String](word.length + 1)
    var i = 0
    // split by code point, not char, so surrogate pairs stay intact
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(word.substring(i, i + n))
      i += n
    }
    syms.add(EndOfWord)
    var done = syms.size <= 1
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + Sep + syms.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; best = j }
        j += 1
      }
      if (best < 0) done = true
      else {
        val a = syms.get(best)
        val b = syms.get(best + 1)
        val out = new java.util.ArrayList[String](syms.size - 1)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == a && syms.get(k + 1) == b) {
            out.add(a + b); k += 2
          } else { out.add(syms.get(k)); k += 1 }
        }
        syms = out
        done = syms.size <= 1
      }
    }
    syms
  }

  /** Encode a token array to one flat piece array (word order preserved;
    * the EndOfWord markers keep word boundaries recoverable). */
  def encode(tokens: ArrayData, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.ArrayList[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      if (w != null) {
        val pieces = encodeWord(w.toString, ranks)
        var j = 0
        while (j < pieces.size) { out.add(UTF8String.fromString(pieces.get(j))); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Encode straight to vocabulary ids (one pass, OOV → -1) — the fused
    * form of encode + per-piece map lookup. */
  def encodeIds(tokens: ArrayData, ranks: java.util.HashMap[String, Integer],
                ids: java.util.HashMap[String, java.lang.Long]): ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.ArrayList[java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      if (w != null) {
        val pieces = encodeWord(w.toString, ranks)
        var j = 0
        while (j < pieces.size) {
          val id = ids.get(pieces.get(j))
          out.add(if (id == null) -1L else id)
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
}

/** `array<string>` BPE pieces of an `array<string>` token column under a
  * fixed merge list. The merge table folds into the plan (a reference
  * object, like [[MinHashSig]]'s hash coefficients), so encoding is a
  * single kernel call riding the scan stage — zero shuffle, no UDF
  * registry, no per-token explode.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val ranks = BpeKernel.ranksOf(merges)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.encode(input.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernel.encode($c, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** Column API: BPE pieces of a token-array column under `merges`. */
  def of(tokens: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.wrap(BpeEncode(ColumnBridge.toExpr(tokens), merges))
}

/** `array<long>` BPE piece IDS of an `array<string>` token column: encode
  * and vocabulary lookup fused into one kernel pass (OOV pieces → -1).
  * `vocab` is the piece list in id order (ids = positions), e.g.
  * `graft.ops.TextAnalysis.bpeVocab`. */
case class BpeEncodeIds(child: Expression, merges: Seq[(String, String)],
                        vocab: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val ranks = BpeKernel.ranksOf(merges)
  @transient private lazy val ids = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.zipWithIndex.foreach { case (p, i) => m.putIfAbsent(p, i.toLong) }
    m
  }

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_encode_ids"

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.encodeIds(input.asInstanceOf[ArrayData], ranks, ids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
    val idsRef = ctx.addReferenceObj("ids", ids, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernel.encodeIds($c, $ranksRef, $idsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}

object BpeEncodeIds {
  def of(tokens: Column, merges: Seq[(String, String)], vocab: Seq[String]): Column =
    ColumnBridge.wrap(BpeEncodeIds(ColumnBridge.toExpr(tokens), merges, vocab))
}
