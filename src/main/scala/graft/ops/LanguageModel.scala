package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model quality filtering: train a pruned
  * add-one-smoothed bigram LM on a (reference or in-domain) corpus, score
  * every document by its negative log-likelihood, gate on the score — the
  * classic "perplexity filter" every web-scale pretraining pipeline runs
  * (CCNet uses a KenLM 5-gram; the bigram here is the same shape with a
  * smaller context, and the train/score/gate plumbing is identical).
  *
  * Scale design:
  *  - Training is two bounded aggregations: top-`maxVocab` unigrams and
  *    top-`maxBigrams` (unk-mapped) bigrams, each a map-side-partial
  *    count + distributed TakeOrdered — never a global sort; only the
  *    pruned tables reach the driver (the bounded-codebook contract every
  *    trained artifact here follows). Zipf makes the pruned tables carry
  *    almost the whole probability mass — exactly why KenLM models are
  *    prunable.
  *  - Scoring folds the pruned LM into the plan as map literals and runs
  *    entirely in the scan stage: per-token lookups + one sequential fold
  *    per document, zero shuffle.
  *
  * Determinism/oracle story: counts are exact integers with (count desc,
  * key asc) tie-breaks, and each document's score is a sum of per-token
  * INTEGER-scaled NLLs (floor(-ln(p)·10⁶ + 0.5) — the groupMeanEmbedding
  * idiom), so aggregation is order-free exact integer arithmetic; the
  * only fp step is the per-token ln, evaluated in identical expression
  * shape on both engines (the text_bm25 precedent).
  *
  * Model: P(w | p) = (C2(p,w) + 1) / (C1(p) + V), where C1 is the
  * context's corpus frequency (docs count for BOS), V = |vocab| + 1
  * (the unk class; BOS is never a predicted outcome), tokens outside the
  * vocab map to [[Unk]], and bigrams pruned out of the top-`maxBigrams`
  * count as 0 (standard pruned-LM behavior).
  */
object LanguageModel {

  val Unk: String = graft.functions.LmScoreKernel.Unk
  val Bos: String = graft.functions.LmScoreKernel.Bos

  /** Pruned bigram LM. `contexts` = C1 per context token (vocab + Unk +
    * Bos); `bigrams` keys are "p w" (tokens never contain spaces). */
  final case class BigramLm(vocab: Map[String, Long], contexts: Map[String, Long],
                            bigrams: Map[String, Long], vocabSize: Int)

  private def mapUnk(vocabLit: Column, t: Column): Column =
    when(element_at(vocabLit, t).isNotNull, t).otherwise(lit(Unk))

  /** Train on `df(textCol)`. Two passes: unigram top-k, then unk-mapped
    * bigram top-k (the unk mapping must happen BEFORE bigram counting, or
    * rare-word pairs would fragment instead of pooling into `<unk>`). */
  def train(df: DataFrame, textCol: String, maxVocab: Int,
            maxBigrams: Int): BigramLm = {
    require(maxVocab >= 1 && maxBigrams >= 1,
      s"bad maxVocab=$maxVocab / maxBigrams=$maxBigrams")
    // tokenized ONCE: the vocab top-k, the totals row, and the bigram
    // top-k are three separate actions, and without the checkpoint each
    // re-runs the corpus scan + tokenize — the train path's dominant CPU
    val toks = df.select(TextAnalysis.tokens(col(textCol)).as("ts"))
      .localCheckpoint()
    // the literal tokens "<unk>"/"<s>" are excluded from the vocab (they
    // pool into the unk class like any OOV token): letting them in would
    // collide with the special entries in `contexts` — the Spark map
    // would silently overwrite while a SQL twin would fan out the join
    val vocab = toks.select(explode(col("ts")).as("w"))
      .filter(!col("w").isin(Unk, Bos))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val statRow = toks.agg(
      coalesce(sum(size(col("ts")).cast("long")), lit(0L)).as("total"),
      coalesce(sum(when(size(col("ts")) > 0, 1L).otherwise(0L)), lit(0L)).as("ndocs")).head()
    val (total, ndocs) = (statRow.getLong(0), statRow.getLong(1))
    val vocabLit = typedlit[Map[String, Long]](vocab)
    // pair strings "p w" per position (1-based element_at; i=1 pairs BOS)
    val pairCol = transform(sequence(lit(1), size(col("ts"))), i =>
      concat(
        when(i === 1, lit(Bos)).otherwise(mapUnk(vocabLit, element_at(col("ts"), i - 1))),
        lit(" "),
        mapUnk(vocabLit, element_at(col("ts"), i))))
    val bigrams = toks.filter(size(col("ts")) > 0)
      .select(explode(pairCol).as("pw"))
      .groupBy(col("pw")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pw")).limit(maxBigrams)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val contexts = vocab ++ Map(Unk -> (total - vocab.values.sum), Bos -> ndocs)
    BigramLm(vocab, contexts, bigrams, vocab.size + 1)
  }

  /** Per-document NLL under `lm`, integer-scaled: `nll_q6` =
    * Σ_positions floor(−ln P(w_i | w_{i−1}) · 10⁶ + 0.5) (0 for empty
    * docs). Exact integer output → partition-order independent; gate with
    * `nll_q6 <= threshold · n_tokens` downstream. One codegen'd kernel
    * call per row ([[graft.functions.LmNllQ6]]) riding the scan stage —
    * the interpreted map-literal formulation scanned the literal arrays
    * per token (~2.4× slower at sf0.1). */
  def scoreNll(df: DataFrame, idCol: String, textCol: String,
               lm: BigramLm): DataFrame =
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("ts"))
      .select(col(idCol), size(col("ts")).cast("long").as("n_tokens"),
        nllQ6Col(col("ts"), lm).as("nll_q6"))

  /** The integer-scaled NLL of a token-array column under `lm`, as a
    * composable Column (the kernel behind [[scoreNll]]) — for recipes
    * that carry other columns alongside the score. */
  def nllQ6Col(tokensCol: Column, lm: BigramLm): Column =
    graft.functions.LmNllQ6.of(tokensCol,
      lm.vocab.keys.toSeq.sorted,
      lm.contexts.toSeq.sortBy(_._1),
      lm.bigrams.toSeq.sortBy(_._1),
      lm.vocabSize.toDouble)

  /** Global top-`maxVocab` vocabulary ((count desc, token) tie-break,
    * `<unk>` excluded) plus the unk-pooled (label, mapped-token) frame —
    * the ONE definition of the vocab/OOV contract shared by
    * [[klBySource]] and [[NaiveBayes.train]]; both oracles re-derive
    * exactly this rule, so it must never fork between them.
    * @param toks frame with columns (`c` label, `ts` token array) */
  private[ops] def topVocabMapped(toks: DataFrame, maxVocab: Int)
      : (Seq[String], DataFrame) = {
    val vocab: Seq[String] = toks.select(explode(col("ts")).as("w"))
      .filter(col("w") =!= Unk)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(maxVocab)
      .collect().map(_.getString(0)).toSeq
    val vocabLit = typedlit[Map[String, Long]](vocab.map(_ -> 1L).toMap)
    val mapped = toks.select(col("c"), explode(col("ts")).as("w"))
      .select(col("c"),
        when(element_at(vocabLit, col("w")).isNotNull, col("w"))
          .otherwise(lit(Unk)).as("w"))
    (vocab, mapped)
  }

  /** Per-class KL divergence from the corpus distribution — the
    * data-mixing diagnostic ("how far is source X's unigram distribution
    * from the blend?") that decides reweighting before any training run.
    * KL(p_class ‖ p_corpus) over a global top-`maxVocab` vocabulary with
    * OOV pooled into `<unk>` and add-one smoothing on BOTH sides (so no
    * term divides by zero and the measure is finite by construction).
    *
    * Scale/determinism: the only corpus-scale work is the (class ×
    * mapped-token) count aggregation (bounded output ≤ classes·(V+1)
    * rows); the divergence itself is arithmetic on that bounded grid.
    * Each term integerizes FIRST (floor(p·ln(p/q)·10⁹ + 0.5) — terms can
    * be negative; floor(x+0.5) rounds identically in both engines) and
    * the per-class sum is then exact integer addition — order-free, so
    * the oracle can re-derive it without fp-summation hazards.
    *
    * @return (class, n_tokens, kl_q9) one row per class */
  def klBySource(df: DataFrame, labelCol: String, textCol: String,
                 maxVocab: Int): DataFrame = {
    require(maxVocab >= 1, s"bad maxVocab=$maxVocab")
    val spark = df.sparkSession
    val toks = df.select(col(labelCol).cast("string").as("c"),
      TextAnalysis.tokens(col(textCol)).as("ts"))
    val (vocab, mapped) = topVocabMapped(toks, maxVocab)
    val cnt = mapped.groupBy(col("c"), col("w")).agg(count(lit(1)).as("n"))
    // bounded grids from here on: every frame is ≤ classes · (V+1) rows
    val classes = cnt.select(col("c")).distinct()
    val ctot = cnt.groupBy(col("c")).agg(sum(col("n")).as("nt"))
    val wtot = cnt.groupBy(col("w")).agg(sum(col("n")).as("nw"))
    val total = cnt.agg(sum(col("n")).as("nall")).select(col("nall"))
    import spark.implicits._
    val vkeys = (vocab :+ Unk).toDF("w")
    val vPrime = (vocab.size + 1).toDouble
    val grid = classes.crossJoin(vkeys)
      .join(cnt, Seq("c", "w"), "left")
      .join(ctot, Seq("c"))
      .join(wtot, Seq("w"), "left")
      .crossJoin(broadcast(total))
    val pS = (coalesce(col("n"), lit(0L)).cast("double") + 1.0) /
      (col("nt").cast("double") + vPrime)
    val pC = (coalesce(col("nw"), lit(0L)).cast("double") + 1.0) /
      (col("nall").cast("double") + vPrime)
    grid
      .select(col("c"), col("nt"),
        floor(pS * log(pS / pC) * 1e9 + 0.5).cast("long").as("term_q9"))
      .groupBy(col("c"))
      .agg(min(col("nt")).cast("long").as("n_tokens"),
        sum(col("term_q9")).cast("long").as("kl_q9"))
  }
}
