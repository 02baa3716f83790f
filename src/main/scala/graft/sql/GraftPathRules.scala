package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.AliasIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

import graft.delta.DeltaTable

/** Analyzer rule that resolves `delta.`<path>`` table references — the
  * SELECT and DML halves of the SQL surface ([[GraftSqlParser]] owns the
  * maintenance statements):
  *
  * {{{
  * SELECT … FROM delta.`/data/events`               -- batch read
  * SELECT … FROM delta.`/p` VERSION AS OF 3          -- time travel
  * SELECT … FROM delta.`/p` TIMESTAMP AS OF '…'      -- time travel
  * DELETE FROM delta.`/p` WHERE …
  * UPDATE delta.`/p` SET c = e, … [WHERE …]
  * MERGE INTO delta.`/p` t USING src s ON t.k = s.k
  *   WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  * INSERT INTO / INSERT OVERWRITE delta.`/p` SELECT …
  * }}}
  *
  * An identifier is OURS only when it is two-part `delta`.`<p>`, `<p>`
  * looks like a path (contains a slash) and a Delta log exists there —
  * anything else (including a catalog database literally named `delta`)
  * falls through untouched, so the rule can only ADD resolutions.
  * Matching happens BEFORE child resolution (transformDown on the raw
  * statement nodes), so DML conditions re-render to SQL text and
  * re-resolve inside the command against the target table — the same
  * expressions either way, without carrying cross-plan attribute ids.
  * Each DML statement resolves to the Scala API (`delete`/`update`/
  * `merge`/`append`/`overwrite`), so stats-index candidate pruning,
  * protocol handling, and concurrency guards are identical from SQL. */
case class GraftPathRules(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Bare `delta`.`<path>` reference — the SELECT replacement target.
    * Deliberately NOT alias-tolerant: a user's `FROM delta.`p` a` keeps
    * its SubqueryAlias node and only the relation underneath swaps. */
  private object GraftPathBare {
    def unapply(plan: LogicalPlan): Option[String] = plan match {
      case u: UnresolvedRelation if u.multipartIdentifier.size == 2 &&
        u.multipartIdentifier.head.equalsIgnoreCase("delta") =>
        Some(u.multipartIdentifier(1))
          .filter(p => (p.contains("/") || p.contains("\\")) &&
            DeltaTable.forPath(spark, p).exists)
      case _ => None
    }
  }

  /** Alias-tolerant form for the DML statement matchers (Spark wraps
    * `DELETE FROM t AS x` targets in a SubqueryAlias). */
  private object GraftPath {
    def unapply(plan: LogicalPlan): Option[String] = plan match {
      case GraftPathBare(p) => Some(p)
      case SubqueryAlias(_, GraftPathBare(p)) => Some(p)
      case _ => None
    }
  }

  /** The batch-read plan, aliased so both bare and qualified column
    * references resolve (delta-spark's `delta`.`<path>` qualifier). */
  private def readPlan(path: String, df: org.apache.spark.sql.DataFrame): LogicalPlan =
    SubqueryAlias(AliasIdentifier(path, Seq("delta")),
      df.queryExecution.analyzed)

  private def noSubquery(e: Expression, stmt: String): Expression = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      s"$stmt over a path table does not support subqueries in conditions — " +
        "rewrite as a MERGE or a join")
    e
  }

  /** Unresolved condition → SQL text that re-resolves against the target
    * table inside the command (plain column names survive `.sql`). */
  private def sqlOf(e: Expression): String = e.sql

  private def nameOf(e: Expression, what: String): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case other => throw new IllegalArgumentException(
      s"$what must be a plain column reference, got ${other.sql}")
  }

  /** ON t.k1 = s.k1 AND t.k2 = s.k2 → Seq(k1, k2); anything else refuses
    * (this engine's MERGE is the key-equality upsert). */
  private def mergeKeys(cond: Expression): Seq[String] = cond match {
    case And(l, r) => mergeKeys(l) ++ mergeKeys(r)
    case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
      if l.nameParts.last == r.nameParts.last => Seq(l.nameParts.last)
    case other => throw new IllegalArgumentException(
      "MERGE INTO a path table needs an equality condition on same-named " +
        s"key columns (t.k = s.k [AND …]), got: ${other.sql}")
  }

  /** `delta`.`<path>` as an ALTER-style UnresolvedTable/TableOrView
    * target (the column/constraint DDL statements). */
  private object GraftTable {
    private def ok(parts: Seq[String]): Option[String] = parts match {
      case Seq(d, p) if d.equalsIgnoreCase("delta") &&
        (p.contains("/") || p.contains("\\")) &&
        DeltaTable.forPath(spark, p).exists => Some(p)
      case _ => None
    }
    def unapply(plan: LogicalPlan): Option[String] = plan match {
      case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        ok(t.multipartIdentifier)
      case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
        ok(t.multipartIdentifier)
      case _ => None
    }
  }

  /** Alias/table names a qualified column reference may use for a side
    * of the merge (`USING src s` → {src, s}). */
  private def aliasNamesOf(plan: LogicalPlan): Set[String] = plan match {
    case SubqueryAlias(id, child) => aliasNamesOf(child) + id.name
    case u: UnresolvedRelation => Set(u.multipartIdentifier.last)
    case _ => Set.empty
  }

  /** Re-render a merge-clause expression with the user's aliases
    * canonicalized to `t.`/`s.` — [[DeltaTable.mergeClauses]]'s contract
    * (bare names stay bare: target in matched/by-source contexts, source
    * in insert contexts, resolved inside the engine). */
  private def canonSql(e: Expression, srcNames: Set[String], tgtNames: Set[String],
                       what: String): String =
    noSubquery(e, what).transformUp {
      case a: UnresolvedAttribute if a.nameParts.size == 2 =>
        val q = a.nameParts.head
        val n = a.nameParts.last
        if (srcNames.exists(_.equalsIgnoreCase(q)) || q.equalsIgnoreCase("s"))
          UnresolvedAttribute(Seq("s", n))
        else if (tgtNames.exists(_.equalsIgnoreCase(q)) || q.equalsIgnoreCase("t"))
          UnresolvedAttribute(Seq("t", n))
        else throw new IllegalArgumentException(
          s"$what: unknown qualifier '$q' in ${a.sql} — use the merge's " +
            "target/source aliases")
    }.sql

  /** The full WHEN-clause list of a SQL MERGE INTO, as the engine's
    * clause ADT ([[DeltaTable.mergeClauses]]). */
  private def mergeClausesOf(m: MergeIntoTable): Seq[DeltaTable.MergeClause] = {
    import graft.delta.DeltaTable._
    val tgtNames = aliasNamesOf(m.targetTable)
    val srcNames = aliasNamesOf(m.sourceTable)
    def cond(c: Option[Expression], what: String): Option[String] =
      c.map(x => canonSql(x, srcNames, tgtNames, what))
    def sets(as: Seq[Assignment], what: String): Map[String, String] =
      as.map(a => nameOf(a.key, s"$what SET column") ->
        canonSql(a.value, srcNames, tgtNames, what)).toMap
    m.matchedActions.map {
      case UpdateStarAction(c) => WhenMatchedUpdate(Map.empty, cond(c, "WHEN MATCHED"))
      case UpdateAction(c, as, _) =>
        WhenMatchedUpdate(sets(as, "WHEN MATCHED"), cond(c, "WHEN MATCHED"))
      case DeleteAction(c) => WhenMatchedDelete(cond(c, "WHEN MATCHED"))
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN MATCHED action: $other")
    } ++ m.notMatchedActions.map {
      case InsertStarAction(c) => WhenNotMatchedInsert(Map.empty, cond(c, "WHEN NOT MATCHED"))
      case InsertAction(c, as) =>
        WhenNotMatchedInsert(
          as.map(a => nameOf(a.key, "INSERT column") ->
            canonSql(a.value, srcNames, tgtNames, "WHEN NOT MATCHED")).toMap,
          cond(c, "WHEN NOT MATCHED"))
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED action: $other")
    } ++ m.notMatchedBySourceActions.map {
      case UpdateAction(c, as, _) =>
        WhenNotMatchedBySourceUpdate(sets(as, "WHEN NOT MATCHED BY SOURCE"),
          cond(c, "WHEN NOT MATCHED BY SOURCE"))
      case DeleteAction(c) => WhenNotMatchedBySourceDelete(cond(c, "WHEN NOT MATCHED BY SOURCE"))
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case DeleteFromTable(GraftPath(p), cond) =>
      DeltaDeleteCommand(p, sqlOf(noSubquery(cond, "DELETE")))

    case UpdateTable(GraftPath(p), assignments, cond) =>
      DeltaUpdateCommand(p,
        assignments.map(a => nameOf(a.key, "UPDATE SET column") ->
          sqlOf(noSubquery(a.value, "UPDATE"))),
        cond.map(c => sqlOf(noSubquery(c, "UPDATE"))))

    case m: MergeIntoTable if GraftPath.unapply(m.targetTable).isDefined =>
      val p = GraftPath.unapply(m.targetTable).get
      if (m.notMatchedBySourceActions.isEmpty &&
        m.matchedActions == Seq(UpdateStarAction(None)) &&
        m.notMatchedActions == Seq(InsertStarAction(None)))
        // the bare star-upsert keeps its dedicated fast path
        DeltaMergeCommand(p, mergeKeys(m.mergeCondition), m.sourceTable)
      else
        DeltaMergeClausesCommand(p, mergeKeys(m.mergeCondition), m.sourceTable,
          mergeClausesOf(m))

    // ---- column DDL (metadata-only commits on the Delta side) ----
    case AddColumns(GraftTable(p), cols) =>
      val fields = cols.map { c =>
        require(c.path.isEmpty,
          "ADD COLUMNS supports top-level columns (nested adds: evolve via mergeSchema)")
        require(c.position.isEmpty,
          "column position is not supported — new columns append at the end")
        require(c.default.isEmpty,
          "ADD COLUMNS with DEFAULT is not supported — declare defaults at CREATE TABLE")
        (c.colName, c.dataType, c.nullable, c.comment)
      }
      DeltaAddColumnsCommand(p, fields)

    case RenameColumn(GraftTable(p), field, newName) =>
      require(field.name.size == 1,
        "RENAME COLUMN supports top-level columns only")
      DeltaRenameColumnCommand(p, field.name.head, newName)

    case DropColumns(GraftTable(p), fields, ifExists) =>
      DeltaDropColumnsCommand(p, fields.map { f =>
        require(f.name.size == 1, "DROP COLUMN supports top-level columns only")
        f.name.head
      }, ifExists)

    case AlterColumns(GraftTable(p), specs) =>
      DeltaAlterColumnTypeCommand(p, specs.map { s =>
        require(s.newDataType.isDefined && s.newNullability.isEmpty &&
          s.newComment.isEmpty && s.newPosition.isEmpty &&
          s.newDefaultExpression.isEmpty && !s.dropDefault,
          "ALTER COLUMN supports TYPE widening only " +
            "(delta type widening — nullability/comment/position/default do not apply)")
        require(s.column.name.size == 1, "ALTER COLUMN supports top-level columns only")
        s.column.name.head -> s.newDataType.get
      })

    case a: AddCheckConstraint =>
      val pOpt = a.child.collectFirst { case GraftPath(pp) => pp }
      pOpt match {
        case Some(p) =>
          val cc = a.checkConstraint
          require(cc.userProvidedName != null,
            "ADD CONSTRAINT needs an explicit constraint name")
          DeltaAddConstraintCommand(p, cc.userProvidedName, cc.condition)
        case None => a
      }

    case DropConstraint(GraftTable(p), name, ifExists, cascade) =>
      require(!cascade, "DROP CONSTRAINT CASCADE does not apply to CHECK constraints")
      DeltaDropConstraintCommand(p, name, ifExists)

    case ShowTableProperties(GraftTable(p), key, _) =>
      DeltaShowPropertiesCommand(p, key)

    case i: InsertIntoStatement if GraftPath.unapply(i.table).isDefined =>
      require(i.partitionSpec.isEmpty,
        "static PARTITION clauses are not supported — the table's own " +
          "partitioning lays out the write")
      DeltaInsertCommand(GraftPath.unapply(i.table).get, i.query,
        i.userSpecifiedCols, overwrite = i.overwrite)

    case RelationTimeTravel(GraftPath(p), ts, version) =>
      val t = DeltaTable.forPath(spark, p)
      val df = (ts, version) match {
        case (None, Some(v)) => t.toDF(v.toLong)
        case (Some(e), None) =>
          val ms = e match {
            case Literal(v, org.apache.spark.sql.types.StringType) =>
              java.time.Instant.parse(v.toString.replace(" ", "T") +
                (if (v.toString.contains("Z") || v.toString.contains("+")) "" else "Z"))
                .toEpochMilli
            case other => throw new IllegalArgumentException(
              s"TIMESTAMP AS OF needs a literal ISO-8601 string, got ${other.sql}")
          }
          t.toDFAsOf(ms)
        case _ => throw new IllegalArgumentException(
          "time travel needs exactly one of VERSION AS OF / TIMESTAMP AS OF")
      }
      readPlan(p, df)

    case GraftPathBare(p) =>
      readPlan(p, DeltaTable.forPath(spark, p).toDF)

    // table_changes('<path>', start [, end]) — delta-spark's CDF
    // table-valued function: the change feed as a RELATION, composable
    // with any SELECT (filters, joins, aggregation over the
    // _change_type/_commit_version columns). start/end accept version
    // numbers or ISO timestamp strings (resolved through the same
    // versionAt rule as time travel); end defaults to the latest
    // version. Only claims path-shaped first arguments over an existing
    // Delta log — anything else falls through to Spark's resolution.
    case tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
        if tvf.name.size == 1 &&
          tvf.name.head.equalsIgnoreCase("table_changes") &&
          tvf.functionArgs.size >= 2 && tvf.functionArgs.size <= 3 &&
          (tvf.functionArgs.head match {
            case Literal(s, org.apache.spark.sql.types.StringType) =>
              val p = s.toString
              (p.contains("/") || p.contains("\\")) &&
                DeltaTable.forPath(spark, p).exists
            case _ => false
          }) =>
      val p = tvf.functionArgs.head.asInstanceOf[Literal].value.toString
      val t = DeltaTable.forPath(spark, p)
      def bound(e: Expression, what: String): Long = e match {
        case Literal(v, org.apache.spark.sql.types.IntegerType) =>
          v.asInstanceOf[Int].toLong
        case Literal(v, org.apache.spark.sql.types.LongType) =>
          v.asInstanceOf[Long]
        case Literal(s, org.apache.spark.sql.types.StringType) =>
          val iso = s.toString.replace(" ", "T") +
            (if (s.toString.contains("Z") || s.toString.contains("+")) "" else "Z")
          t.log.versionAt(java.time.Instant.parse(iso).toEpochMilli)
        case other => throw new IllegalArgumentException(
          s"table_changes $what must be a version number or ISO timestamp " +
            s"literal, got ${other.sql}")
      }
      val from = bound(tvf.functionArgs(1), "start")
      val to =
        if (tvf.functionArgs.size == 3) bound(tvf.functionArgs(2), "end")
        else t.log.latestVersion()
      readPlan(p, t.changes(from, to))
  }
}

/** Parse-time rewrite of `CREATE TABLE delta.`<path>`` statements —
  * applied by [[GraftSqlParser.parsePlan]] right after Spark's grammar
  * produces the `CreateTable`/`CreateTableAsSelect` node. CREATE must be
  * claimed at PARSE time, not analysis: Spark's own ResolveSessionCatalog
  * runs earlier in the resolution batch and throws `dataSourceNotFound`
  * for provider `delta` before an injected resolution rule ever sees the
  * node. The full CREATE grammar (column types, GENERATED/DEFAULT/
  * IDENTITY, PARTITIONED BY, CLUSTER BY, TBLPROPERTIES, IF NOT EXISTS,
  * CTAS) comes from Spark's parser for free — only the resulting node is
  * re-pointed at [[DeltaCreateTableCommand]]/
  * [[DeltaCreateTableAsSelectCommand]]. A non-delta `USING` provider or a
  * non-path identifier leaves the node untouched for Spark's catalogs. */
object CreateTableRewrite {

  private def pathOf(plan: LogicalPlan): Option[String] = plan match {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
      if u.nameParts.size == 2 && u.nameParts.head.equalsIgnoreCase("delta") &&
        (u.nameParts(1).contains("/") || u.nameParts(1).contains("\\")) =>
      Some(u.nameParts(1))
    case _ => None
  }

  /** Claim only the delta provider (or none — delta.`path` implies it);
    * `USING parquet` etc. falls through to Spark. */
  private def deltaProvider(spec: TableSpecBase): Boolean = {
    val prov = spec match {
      case s: TableSpec => s.provider
      case s: UnresolvedTableSpec => s.provider
      case _ => None
    }
    prov.forall(p => Set("delta", "graft-delta")(p.toLowerCase(java.util.Locale.ROOT)))
  }

  private def propsOf(spec: TableSpecBase): Map[String, String] = spec match {
    case s: TableSpec => s.properties
    case s: UnresolvedTableSpec => s.properties
    case _ => Map.empty
  }

  /** PARTITIONED BY / CLUSTER BY transforms → (partition cols, cluster
    * cols); any other transform (bucket, days, …) refuses loudly. */
  private def splitTransforms(ts: Seq[org.apache.spark.sql.connector.expressions.Transform]): (Seq[String], Seq[String]) = {
    import org.apache.spark.sql.connector.expressions.ClusterByTransform
    // IdentityTransform's extractor is private[sql]; the public Transform
    // surface (name + references) identifies it just as well
    def isIdentity(t: org.apache.spark.sql.connector.expressions.Transform) =
      t.name == "identity" && t.references.length == 1
    val parts = ts.collect {
      case t if isIdentity(t) => t.references.head.fieldNames.mkString(".")
    }
    val cluster = ts.collect {
      case ClusterByTransform(cols) => cols.map(_.fieldNames.mkString("."))
    }.flatten
    val other = ts.filterNot(t =>
      isIdentity(t) || ClusterByTransform.unapply(t).isDefined)
    require(other.isEmpty,
      s"unsupported partition transform(s) on a path table: ${other.mkString(", ")} — " +
        "only PARTITIONED BY (col, …) and CLUSTER BY (col, …) are supported")
    (parts, cluster)
  }

  /** Column DDL → the engine's schema-field encodings (generated /
    * identity / default columns use the same metadata keys as the Scala
    * helpers, so CREATE TABLE SQL gets identical write-time semantics). */
  private def colDefToField(c: ColumnDefinition): org.apache.spark.sql.types.StructField = {
    (c.generationExpression, c.identityColumnSpec, c.defaultValue) match {
      case (Some(g), _, _) => DeltaTable.generatedField(c.name, c.dataType, g)
      case (_, Some(i), _) =>
        require(c.dataType == org.apache.spark.sql.types.LongType,
          s"identity column '${c.name}' must be BIGINT")
        DeltaTable.identityField(c.name, i.getStart, i.getStep, i.isAllowExplicitInsert)
      case (_, _, Some(d)) => DeltaTable.defaultField(c.name, c.dataType, d.originalSQL)
      case _ => org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case c: CreateTable if pathOf(c.name).isDefined && deltaProvider(c.tableSpec) =>
      val (parts, cluster) = splitTransforms(c.partitioning)
      DeltaCreateTableCommand(pathOf(c.name).get,
        org.apache.spark.sql.types.StructType(c.columns.map(colDefToField)),
        parts, cluster, propsOf(c.tableSpec), c.ignoreIfExists)
    case c: CreateTableAsSelect if pathOf(c.name).isDefined && deltaProvider(c.tableSpec) =>
      val (parts, cluster) = splitTransforms(c.partitioning)
      DeltaCreateTableAsSelectCommand(pathOf(c.name).get,
        parts, cluster, propsOf(c.tableSpec), c.query, c.ignoreIfExists)
    // [CREATE OR] REPLACE TABLE — same grammar, swap-in semantics:
    // DeltaTable.replaceAs (history-preserving metadata swap + removes)
    case c: ReplaceTable if pathOf(c.name).isDefined && deltaProvider(c.tableSpec) =>
      val (parts, cluster) = splitTransforms(c.partitioning)
      DeltaCreateTableCommand(pathOf(c.name).get,
        org.apache.spark.sql.types.StructType(c.columns.map(colDefToField)),
        parts, cluster, propsOf(c.tableSpec), ignoreIfExists = false,
        replace = true, orCreate = c.orCreate)
    case c: ReplaceTableAsSelect if pathOf(c.name).isDefined && deltaProvider(c.tableSpec) =>
      val (parts, cluster) = splitTransforms(c.partitioning)
      DeltaCreateTableAsSelectCommand(pathOf(c.name).get,
        parts, cluster, propsOf(c.tableSpec), c.query, ignoreIfExists = false,
        replace = true, orCreate = c.orCreate)
    case other => other
  }
}
