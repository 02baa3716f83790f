package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** JVM kernel for [[ShingleHashes]]: one compiled loop per row instead of
  * ~10 interpreted Catalyst expression evaluations per shingle (the
  * higher-order-function path costs ~1 ms/doc; this runs at ~20 µs/doc).
  */
object ShingleHash {
  private val mdPool: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of an md5 digest, equal to parsing its first 15 hex
    * digits base-16 — the JVM twin of [[Hashing.h64]]. */
  def h60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xF0L) >>> 4)
  }

  /** Distinct md5-derived 60-bit hashes of the word n-grams of `tokens`,
    * hashing the same "seed:tok1 tok2 …" byte strings as
    * [[Hashing.h64]](concat_ws(" ", shingle), seed) — so the DuckDB oracle
    * reproduces every value from the shingle STRINGS. When fewer than n
    * tokens exist, the single shingle is all tokens joined (matching
    * [[graft.ops.Dedup.shingles]]). */
  def hashes(tokens: ArrayData, n: Int, seedBytes: Array[Byte]): ArrayData = {
    val md = mdPool.get()
    val raw = tokens.numElements()
    // null elements are SKIPPED (array<string> permits them even though
    // TextAnalysis.tokens never produces one) — dereferencing would NPE
    // the whole task
    val toks = new Array[Array[Byte]](raw)
    var sz = 0
    var i = 0
    while (i < raw) {
      val s = tokens.getUTF8String(i)
      if (s != null) { toks(sz) = s.getBytes; sz += 1 }
      i += 1
    }

    def digestOf(from: Int, len: Int): Long = {
      md.reset()
      md.update(seedBytes)
      var j = 0
      while (j < len) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks(from + j))
        j += 1
      }
      h60(md.digest())
    }

    if (sz < n) {
      new GenericArrayData(Array(digestOf(0, sz)))
    } else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var p = 0
      while (p <= sz - n) { seen.add(digestOf(p, n)); p += 1 }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }
}

/** Fused shingle+hash Catalyst expression: `array<long>` of distinct
  * 60-bit hashes of the word n-grams of a token-array column. Codegen
  * emits a single static call, so the operator stays inside the
  * whole-stage-codegen span; the hash values are exactly
  * [[Hashing.h64]]("seed", shingle-string) and therefore DuckDB-oracle
  * reproducible.
  */
case class ShingleHashes(child: Expression, n: Int, seed: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  private val seedBytes: Array[Byte] = (seed + ":").getBytes("UTF-8")

  // misuse (non-array<string> child) fails at analysis, not inside the kernel
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.hashes(input.asInstanceOf[ArrayData], n, seedBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedRef = ctx.addReferenceObj("seedBytes", seedBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHash.hashes($c, $n, $seedRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Column API: distinct 60-bit hashes of word n-grams of `tokens`. */
  def of(tokens: Column, n: Int, seed: String): Column =
    ColumnBridge.wrap(ShingleHashes(ColumnBridge.toExpr(tokens), n, seed))
}
