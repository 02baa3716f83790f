package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel for [[WsTokensExpr]]: one compiled byte scan per row in
  * place of `filter(split(lower(trim(text)), "\\s+"), t => t <> '')` —
  * the tokenization prelude of ~12 text operators. The composed form
  * pays three hidden costs per row: the Java-regex NFA walk of
  * `split`, the intermediate token array WITH empties, and the
  * higher-order `filter`, which is evaluated INTERPRETED (HOF lambdas
  * never enter whole-stage codegen). This kernel is one pass over the
  * UTF-8 bytes.
  *
  * Bit-equivalence argument (pinned by WsTokensSpec's fuzz gate against
  * the composed Spark expression itself):
  *  - trim delegates to `UTF8String.trim` (what `StringTrim` calls) and
  *    lower to `CollationAwareUTF8String.toLowerCase` — the
  *    `Lower.execBinaryICU` path Spark 4 takes for UTF8_BINARY under
  *    the default `spark.sql.icu.caseMappings.enabled=true`; NOT
  *    `UTF8String.toLowerCase`, whose `String.toLowerCase` delegate
  *    applies a laxer Final_Sigma rule (treats `_` as case-ignorable,
  *    so `ς_Σ` diverges — caught by the fuzz gate) — never
  *    reimplemented;
  *  - Java's `\s` (no UNICODE flag) is exactly {0x09..0x0D, 0x20}, all
  *    single-byte in UTF-8 and never continuation bytes, so a byte scan
  *    splits on exactly the boundaries the regex does;
  *  - `split` with limit -1 keeps leading/trailing empties and the
  *    filter drops them, so the composed result is exactly the maximal
  *    runs of non-whitespace bytes, which is what the scan emits.
  */
object WsTokens {
  def tokens(s: UTF8String): ArrayData = {
    val t = org.apache.spark.sql.catalyst.util.CollationAwareUTF8String
      .toLowerCase(s.trim())
    val bytes = t.getBytes
    val n = bytes.length
    var count = 0
    var i = 0
    var inTok = false
    while (i < n) {
      val ws = isWs(bytes(i))
      if (!ws && !inTok) { count += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    if (count == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var k = 0
    i = 0
    while (i < n) {
      if (!isWs(bytes(i))) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        out(k) = UTF8String.fromBytes(bytes, start, i - start)
        k += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Column API: lowercased whitespace tokens, empties dropped. */
  def of(text: Column): Column =
    ColumnBridge.wrap(WsTokensExpr(ColumnBridge.toExpr(text)))
}

/** Whitespace tokenizer as a single codegen expression —
  * `array<string>` of the lowercased whitespace-delimited tokens of a
  * string, empties dropped. Equals
  * `filter(split(lower(trim(text)), "\\s+"), t => t <> '')` value-for-
  * value (see [[WsTokens]] for the argument and the fuzz pin). */
case class WsTokensExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"

  override protected def nullSafeEval(input: Any): Any =
    WsTokens.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WsTokens.tokens($c);")

  override protected def withNewChildInternal(newChild: Expression): WsTokensExpr =
    copy(child = newChild)
}
