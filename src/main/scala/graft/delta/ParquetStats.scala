package graft.delta

import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.LogicalTypeAnnotation.{StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** Per-file Delta `stats` JSON from parquet footers (reference ST1/ST2,
  * /root/reference/src/writer.rs:657-991): numRecords + per-leaf min/max +
  * nullCount, aggregated over row groups.
  *
  *  - array descendants (repetition level > 0) get nullCount only, no
  *    min/max — the reference's explicit rule (src/writer.rs:1137-1147);
  *  - timestamps render as `%Y-%m-%dT%H:%M:%S%.3fZ` (src/writer.rs:947-960),
  *    dates as ISO `yyyy-MM-dd` (delta-spark's rendering);
  *  - decimals render SCALED (int/FLBA/binary-backed alike — the footer's
  *    unscaled integer would make readers prune matching rows), with the
  *    cross-row-group fold comparing two's-complement bytes SIGNED.
  *    NOTE: logs written by engine versions that rendered unscaled
  *    decimal or epoch-day date stats: dates read back fine (the reader
  *    accepts both forms), decimals need `recomputeStats(onlyMissing =
  *    false)` — the two renderings are indistinguishable JSON numbers;
  *  - Int96 and non-decimal fixed-len binaries are skipped like the
  *    reference (src/writer.rs:878-886).
  */
object ParquetStats {

  /** Delta stats timestamp rendering: ISO-8601 truncated to milliseconds
    * (also consumed by [[DataSkipping]] — fixed width, so lexicographic
    * order = chronological order). */
  val tsFmt: java.time.format.DateTimeFormatter = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  def forFile(fs: FileSystem, file: Path, partitionCols: Set[String]): Option[String] =
    forFile(fs, file, partitionCols, Int.MaxValue)

  /** As above, bounded by `delta.dataSkippingNumIndexedCols` (delta's
    * documented property, default 32 at the call sites): only the first
    * `numIndexedCols` LEAF columns in parquet schema order carry
    * min/max/nullCount; `numRecords` is always emitted. The 100 TB
    * rationale: stats JSON rides every add action through every commit,
    * checkpoint, and snapshot replay — on a 1000-column table, unbounded
    * stats turn the log itself into the scan problem, while predicates
    * beyond the indexed prefix simply skip pruning (correct, just
    * unpruned). */
  def forFile(fs: FileSystem, file: Path, partitionCols: Set[String],
              numIndexedCols: Int): Option[String] = {
    try {
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(file, fs.getConf))
      try {
        val footer = reader.getFooter
        val schema = footer.getFileMetaData.getSchema
        val mapper = Actions.mapper
        val root = mapper.createObjectNode()
        var numRecords = 0L

        val mins = mapper.createObjectNode()
        val maxs = mapper.createObjectNode()
        val nulls = mapper.createObjectNode()

        // accumulate across row groups per leaf path
        case class Acc(var min: Option[Comparable[Any]], var max: Option[Comparable[Any]],
                       var nullCount: Long, var hasMinMax: Boolean,
                       var hasNullCount: Boolean,
                       tpe: PrimitiveType, repeated: Boolean)
        val accs = scala.collection.mutable.LinkedHashMap.empty[Seq[String], Acc]

        import scala.jdk.CollectionConverters._
        // the indexed prefix: first numIndexedCols leaves in schema order
        val indexed: Set[Seq[String]] =
          if (numIndexedCols == Int.MaxValue) null // unbounded: skip the set
          else schema.getColumns.asScala.take(math.max(0, numIndexedCols))
            .map(_.getPath.toSeq).toSet
        footer.getBlocks.asScala.foreach { block =>
          numRecords += block.getRowCount
          block.getColumns.asScala.foreach { chunk =>
            val pathParts = chunk.getPath.toArray.toSeq
            if (!partitionCols.contains(pathParts.head) &&
                (indexed == null || indexed.contains(pathParts))) {
              val colDesc = schema.getColumnDescription(pathParts.toArray)
              val repeated = colDesc.getMaxRepetitionLevel > 0
              val acc = accs.getOrElseUpdate(pathParts,
                Acc(None, None, 0L, hasMinMax = true, hasNullCount = true,
                  chunk.getPrimitiveType, repeated))
              val st = chunk.getStatistics
              if (st != null && !st.isEmpty) {
                // getNumNulls returns -1 when the writer omitted the null
                // count; adding it would emit a negative/undercounted
                // nullCount and let readers prune IS NULL incorrectly
                if (st.isNumNullsSet) acc.nullCount += st.getNumNulls
                else acc.hasNullCount = false
                if (!repeated && st.hasNonNullValue) {
                  // the cross-row-group fold must use the LOGICAL order:
                  // Binary.compareTo is UNSIGNED lexicographic, but
                  // BINARY/FLBA decimals are big-endian TWO'S COMPLEMENT
                  // — a negative would fold as greater than any positive
                  // and emit bounds that prune matching rows
                  val decimalBinary = (chunk.getPrimitiveType.getPrimitiveTypeName == BINARY ||
                    chunk.getPrimitiveType.getPrimitiveTypeName == FIXED_LEN_BYTE_ARRAY) &&
                    chunk.getPrimitiveType.getLogicalTypeAnnotation
                      .isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation]
                  def cmp(a: Any, b: Any): Int =
                    if (decimalBinary)
                      new java.math.BigInteger(a.asInstanceOf[Binary].getBytes)
                        .compareTo(new java.math.BigInteger(b.asInstanceOf[Binary].getBytes))
                    else a.asInstanceOf[Comparable[Any]].compareTo(b)
                  val mn = st.genericGetMin.asInstanceOf[Comparable[Any]]
                  val mx = st.genericGetMax.asInstanceOf[Comparable[Any]]
                  acc.min = Some(acc.min.fold(mn)(m =>
                    if (cmp(mn, m) < 0) mn else m))
                  acc.max = Some(acc.max.fold(mx)(m =>
                    if (cmp(mx, m) > 0) mx else m))
                } else if (repeated) acc.hasMinMax = false
              } else {
                // a statless row group: min/max unknown AND the accumulated
                // nullCount is a lower bound — emitting it would let readers
                // prune IS NULL queries incorrectly (round-1 advice #4)
                acc.hasMinMax = false
                acc.hasNullCount = false
              }
            }
          }
        }

        def put(node: ObjectNode, pathParts: Seq[String], f: (ObjectNode, String) => Unit): Unit = {
          // struct leaves nest; array internals (list/element) collapse to
          // the array column name like the reference's stats tree
          val cleaned = pathParts.filterNot(p => p == "list" || p == "element" || p == "key_value")
          val parents = cleaned.dropRight(1)
          val leafNode = parents.foldLeft(node)((n, seg) =>
            n.get(seg) match {
              case o: ObjectNode => o
              case _ => n.putObject(seg)
            })
          f(leafNode, cleaned.last)
        }

        accs.foreach { case (pathParts, acc) =>
          val isArrayLeaf = acc.repeated
          if (acc.hasNullCount)
            put(nulls, pathParts, (n, leaf) => n.put(leaf, acc.nullCount))
          if (!isArrayLeaf) {
            (acc.min, acc.max) match {
              case (Some(mn), Some(mx)) if acc.hasMinMax =>
                // NB: ObjectNode.set is generic in its return type — an
                // inferred Unit type parameter turns it into a runtime
                // ClassCastException, so pin JsonNode explicitly.
                render(acc.tpe, mn).foreach(v => put(mins, pathParts,
                  (n, leaf) => { n.set[com.fasterxml.jackson.databind.JsonNode](leaf, v); () }))
                render(acc.tpe, mx).foreach(v => put(maxs, pathParts,
                  (n, leaf) => { n.set[com.fasterxml.jackson.databind.JsonNode](leaf, v); () }))
              case _ =>
            }
          }
        }

        root.put("numRecords", numRecords)
        root.set[com.fasterxml.jackson.databind.JsonNode]("minValues", mins)
        root.set[com.fasterxml.jackson.databind.JsonNode]("maxValues", maxs)
        root.set[com.fasterxml.jackson.databind.JsonNode]("nullCount", nulls)
        Some(mapper.writeValueAsString(root))
      } finally reader.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        if (sys.props.contains("graft.stats.debug")) e.printStackTrace()
        None
    }
  }

  private def render(tpe: PrimitiveType, v: Any): Option[com.fasterxml.jackson.databind.JsonNode] = {
    val mapper = Actions.mapper
    val nf = mapper.getNodeFactory
    // DECIMAL logical types carry the UNSCALED integer in the footer —
    // rendering that raw would make readers compare 25 against 0.25 and
    // prune files that DO match (wrong results, not a missed
    // optimization); emit the SCALED value like delta-spark
    def scaled(unscaled: java.math.BigInteger, d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =
      Some(nf.numberNode(new java.math.BigDecimal(unscaled, d.getScale)))
    tpe.getPrimitiveTypeName match {
      case BOOLEAN => Some(nf.booleanNode(v.asInstanceOf[Boolean]))
      case INT32 =>
        tpe.getLogicalTypeAnnotation match {
          case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            scaled(java.math.BigInteger.valueOf(v.asInstanceOf[Int].toLong), d)
          case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
            // ISO text, like delta-spark and like our partition values —
            // a foreign reader parsing against the table schema would get
            // null from a raw epoch-day integer and lose all date
            // skipping on tables this engine writes. (Our own readers
            // accept BOTH forms for logs written before this rendering.)
            Some(nf.textNode(
              java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString))
          case _ => Some(nf.numberNode(v.asInstanceOf[Int]))
        }
      case INT64 =>
        tpe.getLogicalTypeAnnotation match {
          case ts: TimestampLogicalTypeAnnotation =>
            val micros = ts.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => v.asInstanceOf[Long] * 1000L
              case LogicalTypeAnnotation.TimeUnit.MICROS => v.asInstanceOf[Long]
              case LogicalTypeAnnotation.TimeUnit.NANOS => v.asInstanceOf[Long] / 1000L
            }
            val inst = java.time.Instant.ofEpochSecond(
              Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
            Some(nf.textNode(tsFmt.format(inst)))
          case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            scaled(java.math.BigInteger.valueOf(v.asInstanceOf[Long]), d)
          case _ => Some(nf.numberNode(v.asInstanceOf[Long]))
        }
      case FLOAT => Some(nf.numberNode(v.asInstanceOf[Float]))
      case DOUBLE => Some(nf.numberNode(v.asInstanceOf[Double]))
      case BINARY =>
        tpe.getLogicalTypeAnnotation match {
          case _: StringLogicalTypeAnnotation =>
            Some(nf.textNode(v.asInstanceOf[Binary].toStringUsingUTF8))
          case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            scaled(new java.math.BigInteger(v.asInstanceOf[Binary].getBytes), d)
          case _ => None
        }
      case FIXED_LEN_BYTE_ARRAY =>
        // wide decimals (precision > 18) back onto FLBA; other FLBA
        // (uuid etc.) stays skipped like the reference
        tpe.getLogicalTypeAnnotation match {
          case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            scaled(new java.math.BigInteger(v.asInstanceOf[Binary].getBytes), d)
          case _ => None
        }
      case _ => None // INT96 skipped (reference rule)
    }
  }
}
