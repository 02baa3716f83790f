package graft.sql

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL *statement* surface for graft Delta table operations — the layer a
  * SQL-only user (thrift server, notebook `%sql`, BI tool) parks at.
  * Installed by [[graft.GraftExtensions]] via `injectParser`, so
  * `spark.sql.extensions=graft.GraftExtensions` turns on both the
  * `graft_*` functions and these statements with zero code change.
  *
  * Grammar (tables are PATH-based, named as a string literal `'<path>'`
  * or delta-style ``delta.`<path>` ``):
  *
  * {{{
  * OPTIMIZE '<path>' [FULL] [WHERE <partition predicate>] [ZORDER BY (c1, ..., cn)]
  * VACUUM '<path>' [USING INVENTORY (<subquery>) | LITE] [RETAIN <n> HOURS] [DRY RUN]
  * COPY INTO '<path>' FROM '<src>' FILEFORMAT = PARQUET|JSON|CSV|AVRO [PATTERN = '<glob>'] [FORMAT_OPTIONS (...)] [COPY_OPTIONS (...)]
  * DESCRIBE DETAIL '<path>'
  * DESCRIBE HISTORY '<path>' [LIMIT <n>]
  * RESTORE [TABLE] '<path>' TO VERSION AS OF <n> | TO TIMESTAMP AS OF '<ts>'
  * CONVERT TO DELTA parquet.`<path>` [PARTITIONED BY (c1 [type], ...)]
  * CREATE TABLE '<dst>' SHALLOW|DEEP CLONE '<src>' [VERSION AS OF <n> | TIMESTAMP AS OF '<ts>']
  * REORG TABLE '<path>' APPLY (PURGE)
  * FSCK REPAIR TABLE '<path>' [DRY RUN]
  * GENERATE symlink_format_manifest FOR TABLE '<path>'
  * ALTER TABLE '<path>' SET TBLPROPERTIES ('k' = 'v', ...)
  * ALTER TABLE '<path>' UNSET TBLPROPERTIES ('k', ...)
  * ALTER TABLE '<path>' DROP FEATURE <name> [TRUNCATE HISTORY]
  * COMMENT ON TABLE '<path>' IS '<text>' | NULL
  * }}}
  *
  * SELECT / DELETE / UPDATE / MERGE INTO / INSERT over `delta.`<path>``
  * relations are NOT parsed here — Spark's own grammar covers them and
  * [[GraftPathRules]] resolves the relations during analysis.
  *
  * Everything else — including every statement Spark itself understands —
  * delegates verbatim to the session's default parser, so installing this
  * parser can only ADD statements, never change one. Each statement
  * resolves to the SAME Scala API the programmatic surface uses
  * (`optimizeZOrder`/`compact`/`vacuum`/`detail`/`setProperties`), so
  * semantics, protocol handling, and concurrency behavior are identical
  * whichever surface runs the operation. Reference: the reference engine
  * exposes these levers as CLI flags (src/main.rs:351-487); a Spark-native
  * engine exposes them as SQL. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseGraftStatement(sqlText, delegate)
      .getOrElse(CreateTableRewrite(delegate.parsePlan(sqlText)))

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  // `'path'` or delta-style `delta.`path``
  private val Tbl = """(?:'([^']+)'|delta\.`([^`]+)`)"""
  private def pat(re: String): Pattern =
    Pattern.compile(re, Pattern.CASE_INSENSITIVE | Pattern.DOTALL)

  // FULL (delta-spark's clustered-table syntax): force a complete
  // re-cluster, final ZCubes included — the lever after changing
  // clustering columns or curve, when incremental maintenance would
  // correctly skip everything
  private val OptimizeRx = pat(
    s"""\\s*OPTIMIZE\\s+$Tbl(\\s+FULL)?(?:\\s+WHERE\\s+(.+?))?(?:\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\))?\\s*;?\\s*""")
  // COPY INTO (delta-spark's idempotent batch loader): FILEFORMAT is a
  // bare word; PATTERN and FORMAT_OPTIONS optional
  private val CopyIntoRx = pat(
    s"""\\s*COPY\\s+INTO\\s+$Tbl\\s+FROM\\s+'([^']+)'\\s+FILEFORMAT\\s*=\\s*(\\w+)(?:\\s+PATTERN\\s*=\\s*'([^']+)')?(?:\\s+FORMAT_OPTIONS\\s*\\(([^)]*)\\))?(?:\\s+COPY_OPTIONS\\s*\\(([^)]*)\\))?\\s*;?\\s*""")
  // USING INVENTORY's subquery captures greedily to its closing paren
  // (the subquery is the only paren group in the clause; RETAIN/DRY RUN
  // follow it) — delta-spark's inventory-vacuum syntax
  private val VacuumRx = pat(
    s"""\\s*VACUUM\\s+$Tbl(?:\\s+USING\\s+INVENTORY\\s*\\((.+)\\))?(\\s+LITE)?(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS)?(\\s+DRY\\s+RUN)?\\s*;?\\s*""")
  private val DetailRx = pat(s"""\\s*(?:DESCRIBE|DESC)\\s+DETAIL\\s+$Tbl\\s*;?\\s*""")
  private val HistoryRx = pat(
    s"""\\s*(?:DESCRIBE|DESC)\\s+HISTORY\\s+$Tbl(?:\\s+LIMIT\\s+(\\d+))?\\s*;?\\s*""")
  private val RestoreRx = pat(
    s"""\\s*RESTORE\\s+(?:TABLE\\s+)?$Tbl\\s+TO\\s+(?:VERSION\\s+AS\\s+OF\\s+(\\d+)|TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)')\\s*;?\\s*""")
  // CONVERT's source is a parquet directory: `parquet.`path`` (Delta
  // proper's naming), bare delta-style, or a string literal all accepted
  private val ConvTbl = """(?:'([^']+)'|(?:parquet|delta)\.`([^`]+)`)"""
  private val ConvertRx = pat(
    s"""\\s*CONVERT\\s+TO\\s+DELTA\\s+$ConvTbl(?:\\s+PARTITIONED\\s+BY\\s*\\(([^)]*)\\))?\\s*;?\\s*""")
  private val CloneRx = pat(
    s"""\\s*CREATE\\s+TABLE\\s+$Tbl\\s+(SHALLOW|DEEP)\\s+CLONE\\s+$Tbl(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)|\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)')?\\s*;?\\s*""")
  private val ReorgRx = pat(
    s"""\\s*REORG\\s+TABLE\\s+$Tbl\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*""")
  private val FsckRx = pat(
    s"""\\s*FSCK\\s+REPAIR\\s+TABLE\\s+$Tbl(\\s+DRY\\s+RUN)?\\s*;?\\s*""")
  private val CommentRx = pat(
    s"""\\s*COMMENT\\s+ON\\s+TABLE\\s+$Tbl\\s+IS\\s+(?:'([^']*)'|(NULL))\\s*;?\\s*""")
  private val DropFeatureRx = pat(
    s"""\\s*ALTER\\s+TABLE\\s+$Tbl\\s+DROP\\s+FEATURE\\s+(\\w+)(\\s+TRUNCATE\\s+HISTORY)?\\s*;?\\s*""")
  private val GenerateRx = pat(
    s"""\\s*GENERATE\\s+(\\w+)\\s+FOR\\s+TABLE\\s+$Tbl\\s*;?\\s*""")
  // liquid re-clustering: CLUSTER BY (cols) changes the clustering
  // columns in one metadata commit; CLUSTER BY NONE clears them
  private val AlterClusterRx = pat(
    s"""\\s*ALTER\\s+TABLE\\s+$Tbl\\s+CLUSTER\\s+BY\\s+(?:\\(([^)]*)\\)|(NONE))\\s*;?\\s*""")
  private val SetPropsRx = pat(
    s"""\\s*ALTER\\s+TABLE\\s+$Tbl\\s+SET\\s+TBLPROPERTIES\\s*\\((.*)\\)\\s*;?\\s*""")
  private val UnsetPropsRx = pat(
    s"""\\s*ALTER\\s+TABLE\\s+$Tbl\\s+UNSET\\s+TBLPROPERTIES\\s*\\((.*)\\)\\s*;?\\s*""")

  private def tblOf(m: java.util.regex.Matcher): String =
    Option(m.group(1)).getOrElse(m.group(2))

  /** The graft statement plan for `sqlText`, or None when it is not one
    * of ours (the caller then delegates — unknown text NEVER errors
    * here, even `OPTIMIZE my_catalog_table`, which stays the default
    * parser's business). */
  def parseGraftStatement(sqlText: String,
                          delegate: ParserInterface): Option[LogicalPlan] = {
    val opt = OptimizeRx.matcher(sqlText)
    if (opt.matches()) {
      val full = opt.group(3) != null
      val zcols = Option(opt.group(5)).map(_.split(",").map(stripId).toSeq)
        .filter(_.nonEmpty)
      // the WHERE text parse-checks through the DELEGATE parser (typos
      // fail at parse time like any SQL) but rides as TEXT — it resolves
      // against the TARGET TABLE when the command runs
      val where = Option(opt.group(4)).map(_.trim).filter(_.nonEmpty)
      where.foreach(delegate.parseExpression)
      return Some(OptimizeTableCommand(tblOf(opt), where, zcols.getOrElse(Nil),
        full = full))
    }
    val cpy = CopyIntoRx.matcher(sqlText)
    if (cpy.matches()) {
      return Some(CopyIntoCommand(tblOf(cpy), source = cpy.group(3),
        format = cpy.group(4).toLowerCase,
        pattern = Option(cpy.group(5)),
        options = Option(cpy.group(6)).map(parsePropList).getOrElse(Map.empty),
        copyOptions = Option(cpy.group(7)).map(parsePropList).getOrElse(Map.empty)))
    }
    val vac = VacuumRx.matcher(sqlText)
    if (vac.matches()) {
      val inventorySql = Option(vac.group(3)).map(_.trim).filter(_.nonEmpty)
      inventorySql.foreach(delegate.parsePlan) // typos fail at parse time
      val lite = vac.group(4) != null
      require(!(lite && inventorySql.isDefined),
        "VACUUM LITE needs no inventory — it reads only the delta log")
      val hours = Option(vac.group(5)).map(_.toLong)
      return Some(VacuumTableCommand(tblOf(vac), hours,
        dryRun = vac.group(6) != null, inventorySql = inventorySql,
        lite = lite))
    }
    val det = DetailRx.matcher(sqlText)
    if (det.matches()) return Some(DescribeDetailCommand(tblOf(det)))
    val hist = HistoryRx.matcher(sqlText)
    if (hist.matches())
      return Some(DescribeHistoryCommand(tblOf(hist),
        Option(hist.group(3)).map(_.toInt)))
    val rst = RestoreRx.matcher(sqlText)
    if (rst.matches())
      return Some(RestoreTableCommand(tblOf(rst),
        Option(rst.group(3)).map(_.toLong), Option(rst.group(4))))
    val cln = CloneRx.matcher(sqlText)
    if (cln.matches())
      return Some(CloneTableCommand(
        target = Option(cln.group(1)).getOrElse(cln.group(2)),
        source = Option(cln.group(4)).getOrElse(cln.group(5)),
        version = Option(cln.group(6)).map(_.toLong),
        deep = cln.group(3).equalsIgnoreCase("DEEP"),
        timestamp = Option(cln.group(7))))
    val conv = ConvertRx.matcher(sqlText)
    if (conv.matches()) {
      // Delta proper's PARTITIONED BY takes `name type` pairs; the type
      // is redundant here (convertFrom types partition columns from the
      // directory reader) — accept and drop it
      val parts = Option(conv.group(3)).map(_.split(",").toSeq
        .map(c => stripId(c.trim.split("\\s+")(0))).filter(_.nonEmpty))
        .getOrElse(Nil)
      return Some(ConvertToDeltaCommand(tblOf(conv), parts))
    }
    val rg = ReorgRx.matcher(sqlText)
    if (rg.matches()) return Some(ReorgTableCommand(tblOf(rg)))
    val fsck = FsckRx.matcher(sqlText)
    if (fsck.matches())
      return Some(FsckRepairCommand(tblOf(fsck), dryRun = fsck.group(3) != null))
    val gen = GenerateRx.matcher(sqlText)
    if (gen.matches())
      // mode is group 1, so the table path sits in groups 2/3 (not tblOf's 1/2)
      return Some(GenerateManifestCommand(
        Option(gen.group(2)).getOrElse(gen.group(3)), gen.group(1)))
    val cmt = CommentRx.matcher(sqlText)
    if (cmt.matches())
      return Some(CommentOnTableCommand(tblOf(cmt), Option(cmt.group(3))))
    val dropf = DropFeatureRx.matcher(sqlText)
    if (dropf.matches())
      return Some(DropFeatureCommand(tblOf(dropf), dropf.group(3),
        truncateHistory = dropf.group(4) != null))
    val acb = AlterClusterRx.matcher(sqlText)
    if (acb.matches()) {
      val cols =
        if (acb.group(4) != null) Nil // CLUSTER BY NONE
        else acb.group(3).split(",").map(c => stripId(c.trim))
          .filter(_.nonEmpty).toSeq
      return Some(AlterClusterByCommand(tblOf(acb), cols))
    }
    val setp = SetPropsRx.matcher(sqlText)
    if (setp.matches())
      return Some(AlterPropertiesCommand(tblOf(setp),
        parsePropList(setp.group(3)), unset = false))
    val unset = UnsetPropsRx.matcher(sqlText)
    if (unset.matches())
      return Some(AlterPropertiesCommand(tblOf(unset),
        parseKeyList(unset.group(3)).map(_ -> "").toMap, unset = true))
    None
  }

  private def stripId(s: String): String = {
    val t = s.trim
    if (t.startsWith("`") && t.endsWith("`") && t.length >= 2)
      t.substring(1, t.length - 1)
    else t
  }

  /** `'k' = 'v', ...` (unquoted keys tolerated for user properties). */
  private[sql] def parsePropList(s: String): Map[String, String] = {
    val pair = pat("""\s*(?:'([^']*)'|([\w.\-]+))\s*=\s*'([^']*)'\s*""")
    s.split(",").map { item =>
      val m = pair.matcher(item)
      require(m.matches(),
        s"cannot parse TBLPROPERTIES entry '$item' — expected 'key' = 'value'")
      Option(m.group(1)).getOrElse(m.group(2)) -> m.group(3)
    }.toMap
  }

  private[sql] def parseKeyList(s: String): Seq[String] = {
    val key = pat("""\s*(?:'([^']*)'|([\w.\-]+))\s*""")
    s.split(",").toSeq.map { item =>
      val m = key.matcher(item)
      require(m.matches(),
        s"cannot parse TBLPROPERTIES key '$item' — expected 'key'")
      Option(m.group(1)).getOrElse(m.group(2))
    }
  }
}
