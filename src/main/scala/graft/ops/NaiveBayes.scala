package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes document classifier — the cheap trainable
  * domain/quality classifier every curation pipeline keeps next to its
  * heuristic filters (fastText fills this role in CCNet; NB is the same
  * bag-of-words shape with closed-form training, which makes it exactly
  * re-derivable by the DuckDB oracle — train AND score hash-gateable,
  * like [[LanguageModel]]).
  *
  * Model: class score(c, doc) = −ln P(c) + Σ_tokens −ln P(t | c), with
  * P(t | c) = (n_c(t) + 1) / (N_c + V′) add-one smoothed over a global
  * top-`maxVocab` vocabulary (OOV pools into `<unk>`; V′ = |vocab| + 1).
  * Prediction = argmin score, ties to the lexicographically smallest
  * class.
  *
  * Scale design (the [[LanguageModel]] contract):
  *  - Training is two bounded aggregations — the global vocab top-k and
  *    the (class × mapped-token) count table (≤ classes · (V+1) rows) —
  *    plus a per-class doc count; only those bounded tables reach the
  *    driver.
  *  - Scoring folds the per-class cost maps into the plan as literals and
  *    runs in the scan stage: one fold over the token array per class,
  *    zero shuffle. Class count is bounded by contract (a label set, not
  *    data-scale).
  *  - Determinism: per-token costs are INTEGER-scaled (floor(−ln p · 10⁶
  *    + 0.5)) at train time, so document scores are exact integer sums —
  *    partition-order independent, and comparable across engines without
  *    fp summation hazards. The only fp step is the per-cost ln, computed
  *    from the same integer ratio in both engines.
  */
object NaiveBayes {

  val Unk: String = LanguageModel.Unk

  /** Trained model: per-class prior cost and per-class token-cost maps
    * (keys = vocab tokens plus [[Unk]]; every map has identical key set). */
  final case class NbModel(classes: Seq[String], priorQ6: Map[String, Long],
                           costQ6: Map[String, Map[String, Long]])

  private def q6(p: Double): Long = math.floor(-math.log(p) * 1e6 + 0.5).toLong

  /** Train on `df(labelCol, textCol)`. */
  def train(df: DataFrame, labelCol: String, textCol: String, maxVocab: Int): NbModel = {
    require(maxVocab >= 1, s"bad maxVocab=$maxVocab")
    val toks = df.select(col(labelCol).cast("string").as("c"),
      TextAnalysis.tokens(col(textCol)).as("ts"))
    // vocab + unk pooling: the ONE shared definition
    // (LanguageModel.topVocabMapped) — the literal token "<unk>" pools
    // into the unk class like any OOV token
    val (vocab, mapped) = LanguageModel.topVocabMapped(toks, maxVocab)
    val counts = mapped
      .groupBy(col("c"), col("w")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val docCounts = df.groupBy(col(labelCol).cast("string").as("c"))
      .agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(docCounts.nonEmpty, "empty training frame")
    val classes = docCounts.keys.toSeq.sorted
    val ndocs = docCounts.values.sum
    val vPrime = vocab.size + 1
    val keys = vocab :+ Unk
    val cost = classes.map { c =>
      val nC = counts.collect { case ((`c`, _), n) => n }.sum
      val denom = (nC + vPrime).toDouble
      c -> keys.map(t => t -> q6((counts.getOrElse((c, t), 0L) + 1L).toDouble / denom)).toMap
    }.toMap
    val prior = classes.map(c => c -> q6(docCounts(c).toDouble / ndocs.toDouble)).toMap
    NbModel(classes, prior, cost)
  }

  /** The integer score of a token-array column under class `c` — prior
    * cost plus the fold of per-token costs (OOV → the `<unk>` cost). */
  def scoreQ6Col(ts: Column, m: NbModel, c: String): Column = {
    val mapLit = typedlit[Map[String, Long]](m.costQ6(c))
    val unkCost = m.costQ6(c)(Unk)
    aggregate(ts, lit(m.priorQ6(c)),
      (acc, t) => acc + coalesce(element_at(mapLit, t), lit(unkCost)))
  }

  /** Classify every row: argmin class score, ties to the smallest class.
    * @return (idCol, pred, score_q6) */
  def classify(df: DataFrame, idCol: String, textCol: String, m: NbModel): DataFrame = {
    val structs = m.classes.sorted.map(c =>
      struct(scoreQ6Col(col("ts"), m, c).as("score"), lit(c).as("cls")))
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("ts"))
      .select(col(idCol), array_min(array(structs: _*)).as("best"))
      .select(col(idCol), col("best.cls").as("pred"), col("best.score").as("score_q6"))
  }
}
