package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** The batch curation gates composed on an UNBOUNDED stream: line-level
  * boilerplate cleaning → token/quality thresholds → exact dedup on the
  * cleaned-text fingerprint — i.e. "clean the firehose before it lands",
  * so a crawler feed can flow straight into a training-data Delta table
  * through the same operators the batch pipeline is gated on.
  *
  * Plan shape: every gate is a scan-stage Column expression (no UDFs);
  * the only state is the dedup store, which
  * `dropDuplicatesWithinWatermark` evicts past the watermark — memory is
  * bounded by (arrival rate × watermark), never by corpus size. Exact
  * streaming dedup over ALL history is impossible with bounded state;
  * the watermark window is the honest contract (late replays beyond it
  * are a batch-dedup concern, same as the reference's offset semantics).
  */
object StreamingCuration {

  /** @param docs streaming DataFrame with `textCol` and event-time `tsCol`
    * @return curated stream: original columns + clean_text + quality */
  def curate(docs: DataFrame, textCol: String, tsCol: String,
             watermark: String, minTokens: Int = 5, minQuality: Double = 0.3,
             minWords: Int = 3, maxDigitRatio: Double = 0.5): DataFrame = {
    val cleaned = docs
      .withColumn("clean_text",
        TextAnalysis.cleanLines(col(textCol), minWords, maxDigitRatio))
      .withColumn("quality", TextAnalysis.qualityScore(col("clean_text")))
      .filter(size(TextAnalysis.tokens(col("clean_text"))) >= minTokens &&
        col("quality") >= minQuality)
      .withColumn("__fp", TextAnalysis.fingerprint(col("clean_text")))
    cleaned
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }

  /** Streaming exact decontamination: drop stream docs whose bag-of-words
    * fingerprint appears in a STATIC probe corpus (eval/benchmark suites)
    * — the stream-static form of [[graft.ops.Sampling.decontaminate]].
    * The probe side reduces to distinct 16-byte digests once and
    * broadcasts into every micro-batch's scan: no stream-side state, no
    * shuffle, and the probe set can be swapped only by restarting the
    * query (static side is planned once — the same contract as any
    * stream-static join). */
  def decontaminate(stream: DataFrame, probes: DataFrame,
                    textCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val probeFps = broadcast(probes.select(fp.as("__fp")).distinct())
    stream.withColumn("__fp", fp)
      .join(probeFps, Seq("__fp"), "left_anti")
      .drop("__fp")
  }
}
