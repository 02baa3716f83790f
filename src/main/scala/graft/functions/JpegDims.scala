package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.{shiftright, when}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** JPEG dimensions WITHOUT decode (the [[graft.ops.Multimodal.pngDims]]
  * twin for the variable-layout format): walk the marker segments to the
  * first SOF frame header and read (height, width) straight from it — at
  * a billion images a metadata pass must not touch pixel data, and JPEG
  * (unlike PNG's fixed IHDR offset) needs a real segment walk (APPn/EXIF
  * blobs and quantization tables precede the frame header at arbitrary
  * lengths; each skips in O(1) via its length field). PNG's dims are
  * pure fixed-offset Columns; this one is a codegen kernel — one static
  * call per row inside the scan stage.
  *
  * NULL for anything that is not a parseable JPEG: wrong magic, lost
  * marker sync, truncated header, or scan data / EOI reached before any
  * SOF. All SOF variants count (baseline C0, progressive C2, … CF minus
  * DHT C4, JPG C8, DAC CC — the standard exclusion set). */
object JpegDims {

  /** `(width << 24) | height` of the first SOF, or -1 when not a JPEG. */
  def packedDims(b: Array[Byte]): Long = {
    if (b == null || b.length < 4) return -1L
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return -1L
    var pos = 2
    while (pos + 1 < b.length) {
      if ((b(pos) & 0xFF) != 0xFF) return -1L // lost marker sync
      var m = b(pos + 1) & 0xFF
      // any number of 0xFF fill bytes may precede the marker id
      while (m == 0xFF && pos + 2 < b.length) { pos += 1; m = b(pos + 1) & 0xFF }
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) pos += 2 // bare markers
      else if (m == 0xD9 || m == 0xDA) return -1L // EOI / scan data before SOF
      else {
        if (pos + 3 >= b.length) return -1L
        val len = ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
        if (len < 2) return -1L
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (pos + 8 >= b.length) return -1L
          val h = ((b(pos + 5) & 0xFF) << 8) | (b(pos + 6) & 0xFF)
          val w = ((b(pos + 7) & 0xFF) << 8) | (b(pos + 8) & 0xFF)
          return (w.toLong << 24) | h.toLong
        }
        pos += 2 + len
      }
    }
    -1L
  }

  /** The packed-dims column (NULL for non-JPEG bytes). */
  def packed(bytes: Column): Column =
    ColumnBridge.wrap(JpegDimsExpr(ColumnBridge.toExpr(bytes)))

  /** (width, height) columns — one walk, split from the packed long. */
  def dims(bytes: Column): (Column, Column) = {
    val p = packed(bytes)
    (when(p.isNotNull, shiftright(p, 24)).cast("long"),
     when(p.isNotNull, p.bitwiseAND(org.apache.spark.sql.functions.lit(0xFFFFFFL)))
       .cast("long"))
  }
}

case class JpegDimsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_dims"

  override protected def nullSafeEval(input: Any): Any = {
    val v = JpegDims.packedDims(input.asInstanceOf[Array[Byte]])
    if (v < 0) null else java.lang.Long.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val packed = ctx.freshName("jpegPacked")
      s"""long $packed = graft.functions.JpegDims.packedDims($c);
         |if ($packed < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $packed; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegDimsExpr =
    copy(child = newChild)
}
