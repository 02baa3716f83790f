package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a scan-stage kernel — the
  * normalize-before-hash step every exact/near dedup pipeline needs:
  * "café" typed with a precomposed é (U+00E9) and with e + combining
  * acute (U+0301) are byte-DIFFERENT, so digests, shingle hashes, and
  * minhash signatures all miss the duplicate unless text is canonically
  * composed first. Spark ships no normalization function; this wraps
  * `java.text.Normalizer` (canonical composition — stable across
  * Unicode versions for assigned characters) as one static call per
  * row inside whole-stage codegen.
  *
  * Fast path: ASCII-only strings (the overwhelming majority in web
  * corpora) return the INPUT object without allocating — NFC is the
  * identity on ASCII, and `Normalizer.isNormalized` rechecks the rest
  * before any rewrite. NULL in, NULL out. */
object NfcNormalize {

  def normalized(s: UTF8String): UTF8String = {
    if (s == null) return null
    // ASCII fast path: all bytes < 0x80 are untouched by NFC
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if ((s.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def of(c: Column): Column =
    ColumnBridge.wrap(NfcNormalizeExpr(ColumnBridge.toExpr(c)))
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalized(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.normalized($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}
