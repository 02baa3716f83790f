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
      require(m.notMatchedBySourceActions.isEmpty &&
        m.matchedActions == Seq(UpdateStarAction(None)) &&
        m.notMatchedActions == Seq(InsertStarAction(None)),
        "MERGE INTO a path table supports exactly " +
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
          "(the upsert shape; conditional/delete clauses are not supported)")
      DeltaMergeCommand(p, mergeKeys(m.mergeCondition), m.sourceTable)

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
  }
}
