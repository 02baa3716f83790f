package graft.delta

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

/** File-level data skipping from `add.stats` — the read-path payoff of
  * writing per-file min/max/nullCount (reference ST1/ST2): a conjunction
  * of simple column predicates is evaluated against each file's stats
  * (and `partitionValues` for partition columns), and files whose stats
  * PROVE no row can match are skipped before any parquet is opened.
  *
  * Soundness: pruning only ever drops a file on proof; files without
  * stats, with an un-stats'd column, or with a non-comparable type are
  * kept, and [[graft.delta.DeltaTable.scan]] re-applies the exact
  * predicate to surviving rows — so results never depend on pruning.
  *
  * Scale: this is the difference between "read 100 TB and filter" and
  * "open the 3 files whose range overlaps" on time-ordered ingest.
  */
object DataSkipping {

  /** One conjunct: `column op value`, op ∈ {=, <, <=, >, >=}. */
  final case class ColPred(column: String, op: String, value: Any) {
    require(Set("=", "<", "<=", ">", ">=").contains(op), s"unsupported op $op")
    def toColumn: Column = op match {
      case "=" => col(column) === lit(value)
      case "<" => col(column) < lit(value)
      case "<=" => col(column) <= lit(value)
      case ">" => col(column) > lit(value)
      case ">=" => col(column) >= lit(value)
    }
  }

  def exprFor(preds: Seq[ColPred]): Column =
    preds.map(_.toColumn).reduce(_ && _)

  /** Files of `snap` that MAY contain a matching row. */
  def prune(snap: Snapshot, preds: Seq[ColPred]): Seq[Actions.AddFile] = {
    val partCols = snap.metadata.map(_.partitionColumns.toSet).getOrElse(Set.empty)
    snap.files.filter(f => preds.forall(p => mayMatch(f, p, partCols)))
  }

  private def mayMatch(f: Actions.AddFile, p: ColPred, partCols: Set[String]): Boolean = {
    if (partCols.contains(p.column)) {
      f.partitionValues.get(p.column) match {
        case Some(pv) if pv != null => satisfiable(pv, pv, p) // point interval
        case _ => true // null / unknown partition value: keep
      }
    } else {
      f.stats.map(Actions.mapper.readTree) match {
        case Some(node) =>
          val min = Option(node.get("minValues")).flatMap(m => Option(m.get(p.column)))
          val max = Option(node.get("maxValues")).flatMap(m => Option(m.get(p.column)))
          (min, max) match {
            case (Some(lo), Some(hi)) if lo.isValueNode && hi.isValueNode =>
              satisfiable(lo, hi, p)
            case _ => true // column not stats'd (or nested): keep
          }
        case None => true // no stats: keep
      }
    }
  }

  // interval [lo, hi] vs predicate; cmp(a,b) < 0 iff a < b, None = incomparable
  private def satisfiable(lo: Any, hi: Any, p: ColPred): Boolean = {
    (cmp(lo, p.value), cmp(hi, p.value)) match {
      case (Some(l), Some(h)) =>
        p.op match {
          case "=" => l <= 0 && h >= 0 // value inside [lo, hi]
          case "<" => l < 0            // some element below value
          case "<=" => l <= 0
          case ">" => h > 0            // some element above value
          case ">=" => h >= 0
        }
      case _ => true // incomparable types: never prune
    }
  }

  /** Three-way compare of a stats bound against the predicate value.
    * Numerics compare as BigDecimal; strings lexicographically (correct
    * for ISO dates, the common ingest partition key). */
  private def cmp(bound: Any, value: Any): Option[Int] = {
    def num(a: Any): Option[BigDecimal] = a match {
      case n: JsonNode if n.isNumber => Some(BigDecimal(n.decimalValue()))
      case n: JsonNode => None
      case n: Number => Some(BigDecimal(n.toString))
      case s: String => try Some(BigDecimal(s)) catch { case _: NumberFormatException => None }
      case _ => None
    }
    def str(a: Any): Option[String] = a match {
      case n: JsonNode if n.isTextual => Some(n.asText())
      case n: JsonNode => None
      case s: String => Some(s)
      case _ => None
    }
    (num(bound), num(value)) match {
      case (Some(b), Some(v)) => Some(b.compare(v))
      case _ => (str(bound), str(value)) match {
        case (Some(b), Some(v)) => Some(b.compareTo(v))
        case _ => None
      }
    }
  }
}
