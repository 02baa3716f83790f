package graft.delta

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Row, SparkSession}

/** Partition-predicate derivation for GENERATED partition columns —
  * delta-spark's "generated column partition filters" optimization,
  * the read-side payoff of the 100 TB layout where tables partition by
  * `day GENERATED AS (CAST(ts AS DATE))` but queries filter on `ts`:
  * a bound on the SOURCE column implies a bound on the generated
  * partition column whenever the generation expression is MONOTONIC
  * (non-decreasing), so the scan prunes to the matching partitions
  * without the query ever naming them.
  *
  * Soundness: derivation is pruning-only — [[DeltaTable.scan]] still
  * applies the exact original predicate to every surviving row, and
  * strict bounds weaken to non-strict on the derived side (E monotone
  * non-decreasing maps c < v into E(c) <= E(v), never <). Expressions
  * outside the recognized monotone whitelist derive nothing (scan stays
  * correct, just unpruned), which is also why non-monotone generation
  * like `month(ts)` is deliberately absent.
  *
  * Recognized shapes (all checked on the ANALYZED tree, so aliases and
  * implicit casts resolve first): the source column itself; prefix
  * `substring(c, 1, n)` of a string column (lexicographic order is
  * prefix-monotone); chronological casts (timestamp↔date);
  * `year(c)`; `date_trunc(unit, c)` / `trunc(c, unit)` with a constant
  * unit. */
object GeneratedPruning {
  import DataSkipping.ColPred

  /** Derived partition predicates implied by `preds` through the
    * generated partition columns of (`partitionColumns`,
    * `generatedColumns`). Returns only NEW conjuncts to add for
    * pruning; may be empty. */
  def derive(spark: SparkSession, schema: StructType,
             partitionColumns: Seq[String], generatedColumns: Map[String, String],
             preds: Seq[ColPred]): Seq[ColPred] = {
    val genParts = partitionColumns.filter(generatedColumns.contains)
    if (genParts.isEmpty || preds.isEmpty) return Nil
    genParts.flatMap { g =>
      val sql = generatedColumns(g)
      monotoneSource(spark, schema, sql).toSeq.flatMap { src =>
        // IN-lists don't derive (evalAt takes one scalar; a derived
        // g IN (f(v)…) adds little — the direct conjunct already prunes)
        preds.filter(p => p.column == src && p.op != "in").flatMap { p =>
          evalAt(spark, schema, src, sql, p.value).map { gv =>
            val op = p.op match { case "<" => "<="; case ">" => ">="; case o => o }
            ColPred(g, op, gv)
          }
        }
      }
    }
  }

  /** The single source column `sql` is monotone non-decreasing over, if
    * the analyzed expression matches the whitelist; None otherwise. */
  private[delta] def monotoneSource(spark: SparkSession, schema: StructType,
                                    sql: String): Option[String] = {
    val analyzed = try {
      val dummy = spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)
      dummy.select(expr(sql)).queryExecution.analyzed.expressions.head match {
        case Alias(child, _) => child
        case e => e
      }
    } catch { case _: Exception => return None }
    if (analyzed.references.size != 1) return None
    def walk(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case c: Cast =>
        (c.child.dataType, c.dataType) match {
          // chronological casts are order-preserving; string/numeric
          // casts are NOT (lexicographic vs parsed order, overflow wrap)
          case (TimestampType | TimestampNTZType | DateType,
                TimestampType | TimestampNTZType | DateType) => walk(c.child)
          case _ => None
        }
      case s: Substring if s.str.dataType == StringType &&
          s.pos.foldable && s.len.foldable &&
          Option(s.pos.eval()).exists(p => p == 0 || p == 1) &&
          Option(s.len.eval()).exists(_.asInstanceOf[Int] >= 0) =>
        walk(s.str) // prefix: lexicographically monotone
      case y: Year => walk(y.child)
      case t: TruncTimestamp if t.format.foldable => walk(t.timestamp)
      case t: TruncDate if t.format.foldable => walk(t.date)
      case _ => None
    }
    walk(analyzed)
  }

  /** Evaluate the generation expression at source value `v` (one-row
    * local eval — public API only, ~ms, bounded by predicate count).
    * None when the expression yields null at `v`. */
  private def evalAt(spark: SparkSession, schema: StructType, src: String,
                     sql: String, v: Any): Option[Any] = {
    val srcType = schema.fields.find(_.name == src).map(_.dataType).getOrElse(return None)
    try {
      val out = spark.range(1)
        .select(lit(v).cast(srcType).as(src))
        .select(expr(sql)).head()
      if (out.isNullAt(0)) None else Some(out.get(0))
    } catch { case _: Exception => None }
  }
}
