package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** JVM kernel for [[BandBuckets]]: all LSH band bucket hashes in one pass
  * over the signature. The Catalyst formulation this replaces built, per
  * band, a slice copy + per-element long→string cast + array_join + md5
  * through generic string machinery — ~1.5 s of the sf0.1 bench for 32
  * bands; this loop renders the same "band$b:v1,v2,…" bytes directly into
  * one digest buffer per band.
  */
object BandBucketKernel {
  private val mdPool: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Bucket hash per band: [[ShingleHash.h60]](md5("band$b:" + join(slice)))
    * where the slice values render as decimal longs joined by "," — byte-
    * identical input to Hashing.h64(array_join(slice.cast(array<string>)))
    * and to the oracle's array_to_string(mh[a:b], ','), so the DuckDB
    * mirror (OracleSql.bandedUnion) is unchanged. */
  def buckets(sig: ArrayData, bands: Int, rows: Int, seeds: Array[Array[Byte]]): ArrayData = {
    val md = mdPool.get()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      md.reset()
      md.update(seeds(b))
      var j = 0
      while (j < rows) {
        if (j > 0) md.update(','.toByte)
        md.update(java.lang.Long.toString(sig.getLong(b * rows + j)).getBytes)
        j += 1
      }
      out(b) = ShingleHash.h60(md.digest())
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<long>` of LSH band bucket hashes of an `array<long>` MinHash
  * signature column: element b = 60-bit md5 hash of the b-th r-row band
  * slice, seeded "band$b". Codegen emits a single static call so banding
  * rides the scan stage's codegen span.
  */
case class BandBuckets(child: Expression, bands: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(bands >= 1, s"bands must be >= 1, got $bands")

  // misuse (non-array<long> child) fails at analysis, not inside the kernel
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_buckets"

  private def seedBytes: Array[Array[Byte]] =
    Array.tabulate(bands)(b => s"band$b:".getBytes("UTF-8"))

  override protected def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    BandBuckets.checkLen(sig.numElements(), bands)
    BandBucketKernel.buckets(sig, bands, sig.numElements() / bands, seedBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedRef = ctx.addReferenceObj("seeds", seedBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""graft.functions.BandBuckets.checkLen($c.numElements(), $bands);
         |${ev.value} = graft.functions.BandBucketKernel.buckets(
         |  $c, $bands, $c.numElements() / $bands, $seedRef);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BandBuckets =
    copy(child = newChild)
}

object BandBuckets {
  /** A signature whose length doesn't band evenly would silently drop
    * hashes from the last band — fail the task instead. */
  def checkLen(n: Int, bands: Int): Unit =
    if (n == 0 || n % bands != 0)
      throw new IllegalArgumentException(
        s"signature length $n is not a positive multiple of bands=$bands")

  /** Column API: per-band bucket hashes of a MinHash signature. */
  def of(sig: Column, bands: Int): Column =
    ColumnBridge.wrap(BandBuckets(ColumnBridge.toExpr(sig), bands))
}
