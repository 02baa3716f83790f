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

  /** The full streaming curation recipe with NEAR-duplicate dedup:
    * [[curate]]'s cleaning and quality gates composed with
    * [[dedupNearWithinWatermark]] over the CLEANED text — so a reworded
    * boilerplate wrapper can't sneak a near-copy past the exact
    * fingerprint stage. Inherits the near-dedup's contracts: bounded
    * state, candidate-level dedup, emission at watermark close. */
  def curateNear(docs: DataFrame, textCol: String, tsCol: String,
                 watermark: String, minTokens: Int = 5, minQuality: Double = 0.3,
                 minWords: Int = 3, maxDigitRatio: Double = 0.5,
                 shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val cleaned = docs
      .withColumn("clean_text",
        TextAnalysis.cleanLines(col(textCol), minWords, maxDigitRatio))
      .withColumn("quality", TextAnalysis.qualityScore(col("clean_text")))
      .filter(size(TextAnalysis.tokens(col("clean_text"))) >= minTokens &&
        col("quality") >= minQuality)
    dedupNearWithinWatermark(cleaned, "clean_text", tsCol, watermark,
      shingleN, numHashes, bands)
  }

  /** Streaming NEAR-duplicate dedup: the fuzzy counterpart of [[curate]]'s
    * exact-fingerprint gate. Each doc's MinHash signature is banded into
    * LSH buckets (the same codegen kernels as the batch
    * [[graft.ops.Dedup.minhashLsh]] — one shared definition or the
    * stream and batch passes would disagree on what "near" means), the
    * band rows dedup through `dropDuplicatesWithinWatermark`, and a doc
    * survives only when ALL of its bands were unseen — i.e. sharing ANY
    * band bucket with a doc seen inside the watermark drops it.
    *
    * The honest bounded-state contract (same spirit as [[curate]]):
    *  - State is one entry per band bucket plus one open group per doc,
    *    both evicted at the watermark — memory is arrival rate ×
    *    watermark × bands, never corpus size. A near-dup arriving AFTER
    *    its original's bands evicted is emitted again; history beyond
    *    the watermark is the batch pass's job.
    *  - CANDIDATE-level dedup: no exact-Jaccard verify (that would need
    *    both docs' shingle sets in state). With the default 128/32
    *    banding a collision implies likely-high similarity, and a
    *    false-positive drop is the conservative failure for a corpus
    *    feed. The batch clusterers remain the precise tool.
    *  - Fresh bands of a DROPPED doc still enter state, so a doc
    *    near-duplicating only dropped docs is dropped too — usually the
    *    keep-one-per-cluster outcome of batch clustering. One honest
    *    deviation: IDENTICAL docs landing in one micro-batch collapse
    *    deterministically (an exact-fingerprint dedup stage runs before
    *    banding — one key per doc, one winner), but NEAR-identical docs
    *    in the SAME batch can split band wins between themselves and all
    *    be dropped (band winners are chosen per key, not per doc). At a
    *    crawler's batch cadence that window is seconds wide; when it
    *    matters, run [[verifyNearWithinBatch]] in a `foreachBatch` stage
    *    upstream ([[verifiedNearDedupSink]]) — it keeps exactly one
    *    exact-verified representative per same-batch cluster.
    *  - Emission defers to watermark close: two chained stateful stages
    *    (band dedup → all-bands-fresh count grouped on the watermarked
    *    event-time column) only emit in append mode once the group is
    *    final.
    *  - Docs with an empty token set carry no signature and are dropped
    *    (matching the batch base); length-gate with [[curate]] first.
    */
  def dedupNearWithinWatermark(docs: DataFrame, textCol: String, tsCol: String,
                               watermark: String, shingleN: Int = 3,
                               numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(bands >= 1 && numHashes >= bands && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val cols = docs.columns.toSeq
    Seq("__band", "__bucket", "__fresh", "__hsh", "__fp").foreach(c => require(!cols.contains(c),
      s"dedupNearWithinWatermark reserves column name '$c'"))
    val banded = docs
      .withWatermark(tsCol, watermark)
      // exact duplicates first: one fingerprint key per doc → one winner,
      // so identical same-batch copies can't split band wins and all drop
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
      .withColumn("__hsh", graft.functions.ShingleHashes.of(
        TextAnalysis.tokens(col(textCol)), shingleN, "mh"))
      .filter(size(col("__hsh")) > 0)
      .select(cols.map(col) :+
        posexplode(graft.functions.BandBuckets.of(
          graft.functions.MinHashSig.of(col("__hsh"), numHashes), bands))
          .as(Seq("__band", "__bucket")): _*)
    banded
      .dropDuplicatesWithinWatermark("__band", "__bucket")
      // all rows of one doc share every original column value, so the
      // original row IS the group key (text rides a bounded micro-batch
      // shuffle — the batch digests-only rule trades against state size
      // here, and the watermark bounds both)
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__fresh"))
      .filter(col("__fresh") === bands)
      .drop("__fresh")
  }

  /** Streaming EMBEDDING near-dup dedup — the vector-space twin of
    * [[dedupNearWithinWatermark]] and the streaming end of
    * [[graft.ops.Dedup.embeddingNearDups]] (same hyperplane-LSH
    * kernels — one shared definition of "near"). A doc's signature is
    * its sign pattern over `planes` md5-derived hyperplanes; the batch
    * operator's candidate condition is Hamming(sigA, sigB) ≤ 1 (the
    * 1-bit multiprobe), reproduced here EXACTLY with per-plane key
    * pairs: each doc emits, for every plane p, the keys `(sig, p)` and
    * `(sig XOR 2^p, p)`. Two docs share a key iff their signatures are
    * within Hamming distance 1 — `(sigA,p)=(sigB,p)` ⟺ equal;
    * `(flip_p(sigA),p)=(sigB,p)` ⟺ they differ exactly at p;
    * `(flip_p(sigA),p)=(flip_p(sigB),p)` ⟺ equal (flip is an
    * involution) — so no Hamming-2 pair ever collides (a naive
    * {sig} ∪ flips probe set would drop those too, silently widening
    * "near"). Keys dedup through `dropDuplicatesWithinWatermark`; a doc
    * survives only when ALL `2·planes` of its keys are fresh.
    *
    * The honest bounded-state contract (the [[dedupNearWithinWatermark]]
    * one, restated for vectors):
    *  - State is `2·planes` key entries per doc inside the watermark
    *    plus one open group per doc — arrival rate × watermark sized,
    *    never corpus sized. A near-dup arriving after its original's
    *    keys evicted is emitted again; deep history is the batch pass.
    *  - CANDIDATE-level dedup: no exact-cosine verify (that would hold
    *    `dims` floats per doc in state). A signature collision at 16
    *    planes implies likely-high cosine, and a false drop is the
    *    conservative failure for a corpus feed; the batch operator's
    *    cosine-verified pairs remain the precise tool.
    *  - Keys of a DROPPED doc still enter state (chains collapse to
    *    one survivor); sig-IDENTICAL docs in one micro-batch collapse
    *    deterministically (an exact-signature dedup stage runs before
    *    the key fan-out — one winner per signature), but Hamming-1
    *    same-batch pairs can split key wins and all drop — the same
    *    documented deviation as the text twin.
    *  - Docs whose vector yields no signature (null/short vector) are
    *    dropped, matching the batch base's behavior on empty inputs —
    *    validate vectors upstream.
    */
  def dedupEmbeddingWithinWatermark(docs: DataFrame, vecCol: String,
                                    tsCol: String, watermark: String,
                                    planes: Int = 16, dims: Int = 64): DataFrame = {
    require(planes >= 1 && planes <= 62, s"bad planes: $planes")
    val cols = docs.columns.toSeq
    Seq("__sig", "__key", "__fresh").foreach(c => require(!cols.contains(c),
      s"dedupEmbeddingWithinWatermark reserves column name '$c'"))
    val m = graft.ops.Similarity.hyperplaneMatrix(planes, dims)
    val keyed = docs
      .withWatermark(tsCol, watermark)
      .withColumn("__sig", graft.ops.Similarity.signature(col(vecCol), m))
      .filter(col("__sig").isNotNull)
      // exact (signature-identical) duplicates first: one key per doc →
      // one winner, so identical same-batch copies can't split key wins
      .dropDuplicatesWithinWatermark("__sig")
      .select(cols.map(col) :+
        explode(array((0 until planes).flatMap(p => Seq(
          struct(col("__sig").as("s"), lit(p).as("p")),
          struct(col("__sig").bitwiseXOR(lit(1L << p)).as("s"),
            lit(p).as("p")))): _*)).as("__key"): _*)
    keyed
      .dropDuplicatesWithinWatermark("__key")
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__fresh"))
      .filter(col("__fresh") === 2L * planes)
      .drop("__fresh")
  }

  /** WITHIN-batch verified near-dedup — the precise counterpart of
    * [[dedupNearWithinWatermark]]'s candidate-level contract, for the one
    * case that contract documents as lossy: NEAR-identical docs landing
    * in the SAME micro-batch can split band wins and all drop. This runs
    * the full batch machinery on the (bounded) micro-batch instead: LSH
    * candidates → exact-Jaccard verify ≥ `threshold` → min-label
    * clustering → keep exactly the min-id representative per cluster.
    * Same kernels as the batch ops — one shared "near" definition.
    *
    * A pure batch→batch function so it is directly testable and usable
    * inside any `foreachBatch` callback ([[verifiedNearDedupSink]] is the
    * ready-made mount). */
  def verifyNearWithinBatch(batch: DataFrame, idCol: String, textCol: String,
                            shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
                            threshold: Double = 0.5): DataFrame = {
    val pairs = graft.ops.Dedup.minhashLsh(batch, idCol, textCol,
      shingleN, numHashes, bands, threshold)
    val losers = graft.ops.Dedup.duplicateClusters(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    batch.join(losers, Seq(idCol), "left_anti")
  }

  /** `foreachBatch` sink running [[verifyNearWithinBatch]] on every
    * micro-batch before handing survivors to `write`:
    *
    * {{{
    * stream.writeStream
    *   .foreachBatch(StreamingCuration.verifiedNearDedupSink("doc_id", "text")(
    *     b => b.write.mode("append").parquet(out)))
    * }}}
    *
    * Composition with the cross-batch stage: mount this sink FIRST
    * (writing to an intermediate table) and stream that table through
    * [[dedupNearWithinWatermark]] in a second query — within-batch
    * exactness here, watermark-bounded cross-batch candidate dedup
    * there. Mounting the orders the other way is too late: the stateful
    * stage would have dropped both same-batch near-dups before any sink
    * ran. */
  def verifiedNearDedupSink(idCol: String, textCol: String,
                            shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
                            threshold: Double = 0.5)
                           (write: DataFrame => Unit): (DataFrame, Long) => Unit =
    (batch, _) => write(verifyNearWithinBatch(batch, idCol, textCol,
      shingleN, numHashes, bands, threshold))

  /** `foreachBatch` sink growing a Delta corpus with EXACT dedup against
    * everything ever ingested — [[graft.ops.Dedup.appendNovel]] per
    * micro-batch, so duplicates are dropped across batches, across
    * restarts, and across arbitrarily long horizons (the corpus table IS
    * the state; nothing lives in the state store, unlike the watermark-
    * bounded [[dedupNearWithinWatermark]] whose memory of a text expires
    * with the watermark). Content idempotence makes the usual foreachBatch
    * at-least-once contract exactly-once in effect: a replayed batch
    * re-derives digests that now all exist and appends nothing.
    *
    * {{{
    * stream.writeStream.foreachBatch(
    *   StreamingCuration.incrementalDedupSink(table, "doc_id", "text"))
    * }}}
    */
  def incrementalDedupSink(table: graft.delta.DeltaTable, idCol: String,
                           textCol: String): (DataFrame, Long) => Unit =
    (batch, _) => { graft.ops.Dedup.appendNovel(table, batch, idCol, textCol): Unit }

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

  /** `foreachBatch` decontamination by n-gram OVERLAP — the NEAR/partial
    * variant of [[decontaminate]] (which only catches exact whole-doc
    * fingerprint matches): drops micro-batch docs sharing at least
    * `minHits` distinct word n-grams with the static benchmark suite
    * ([[graft.ops.Dedup.contamination]] per batch). Contamination is a
    * per-doc computation against a static set, so the result is
    * micro-batch-split independent, and there is NO stream-side state —
    * the benchmark's broadcast shingle hashes are the only reader-held
    * data, per executor, per batch.
    *
    * {{{
    * stream.writeStream.foreachBatch(
    *   StreamingCuration.contaminationFilterSink(benchDf, "doc_id", "text")(
    *     clean => clean.write.mode("append").parquet(out)))
    * }}}
    */
  def contaminationFilterSink(bench: DataFrame, idCol: String, textCol: String,
                              shingleN: Int = 8, minHits: Long = 1L)
                             (write: DataFrame => Unit): (DataFrame, Long) => Unit =
    (batch, _) => {
      val flagged = graft.ops.Dedup.contamination(batch, bench, idCol,
          textCol, shingleN)
        .filter(col("hits") >= minHits).select(col("doc_id").as(idCol))
      write(batch.join(flagged, Seq(idCol), "left_anti"))
    }

  /** Verbatim-passage ingest filter ([[graft.ops.PassageIndex]]'s
    * streaming twin — the takedown-list shape): drop micro-batch docs
    * containing ANY listed passage word-for-word. POSITIONAL matching,
    * not n-gram overlap: a doc sharing every n-gram of a passage in
    * scrambled order passes, an exact quote drops — the complement of
    * [[contaminationFilterSink]]'s overlap test. The passage shingles
    * compute ONCE (localCheckpoint) and broadcast into every batch;
    * per-doc decision, micro-batch-split independent, zero stream
    * state. `passages` carries the same (`idCol`, `textCol`) columns as
    * the stream. */
  def passageFilterSink(passages: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3)
                       (write: DataFrame => Unit): (DataFrame, Long) => Unit = {
    val ps = graft.ops.PassageIndex.probeShingles(
      passages, idCol, textCol, shingleN, numBands = 1)
    (batch, _) => {
      val hit = graft.ops.PassageIndex.aligned(
          graft.ops.PassageIndex.postings(batch, idCol, textCol, shingleN,
            numBands = 1), ps)
        .select(col("doc_id").as(idCol)).distinct()
      write(batch.join(hit, Seq(idCol), "left_anti"))
    }
  }

  /** `foreachBatch` sink maintaining a per-node DEGREE feature table
    * from a CDF STREAM of edge changes (`format("graft-delta")` with
    * `readChangeFeed=true` on the edge table) — the streaming end of
    * [[graft.ops.Graph.degreeDelta]]'s IVM story: each micro-batch folds
    * to signed degree deltas (cost ∝ batch, never the edge set) and
    * MERGEs into the feature table — matched nodes add, unmatched
    * insert, zero-degree folds delete their row. The (appId, batchId)
    * txn guard turns foreachBatch's at-least-once contract into
    * exactly-once, which MATTERS here: a degree fold, unlike a
    * content-idempotent append, would double-count on replay. Negative
    * folds (a corrupt feed) raise in the merge expressions.
    *
    * Feature table schema: `(node long, deg long)`, keyed on node.
    *
    * {{{
    * spark.readStream.format("graft-delta")
    *   .option("readChangeFeed", "true").load(edgeTablePath)
    *   .writeStream.foreachBatch(
    *     StreamingCuration.degreeMaintenanceSink(featureTable))
    * }}}
    */
  def degreeMaintenanceSink(features: graft.delta.DeltaTable,
                            appId: String = "graft-degree-sink",
                            aCol: String = "a", bCol: String = "b")
                           : (DataFrame, Long) => Unit =
    (batch, batchId) => {
      // a node whose batch delta NETS to zero (insert+delete of its edge
      // in one catch-up batch) must not touch the table — an
      // unconditional merge would insert a phantom deg=0 row the batch
      // fold (applyDegreeDelta) and a recompute both omit
      val delta = graft.ops.Graph.degreeDelta(batch, aCol, bCol)
        .where(col("deg") =!= 0L)
        .select(col("node"), col("deg").as("dt"))
      val D = graft.delta.DeltaTable
      features.mergeClauses(delta, Seq("node"), Seq(
          D.WhenMatchedDelete(condition = Some("t.deg + s.dt = 0")),
          D.WhenMatchedUpdate(set = Map("deg" ->
            ("CASE WHEN t.deg + s.dt < 0 THEN CAST(raise_error(" +
              "'degreeMaintenanceSink: negative degree fold - corrupt " +
              "change feed') AS BIGINT) ELSE t.deg + s.dt END"))),
          D.WhenNotMatchedInsert(values = Map(
            "node" -> "s.node",
            "deg" -> ("CASE WHEN s.dt < 0 THEN CAST(raise_error(" +
              "'degreeMaintenanceSink: delete of unknown node - corrupt " +
              "change feed') AS BIGINT) ELSE s.dt END")))),
        txnAppId = Some(appId), txnVersion = batchId): Unit
    }

  /** `foreachBatch` sink maintaining a per-node TRIANGLE-count feature
    * table from a CDF stream of edge changes —
    * [[degreeMaintenanceSink]]'s heavier sibling and the streaming end
    * of [[graft.ops.Graph.triangleDeltaBucketed]]. Triangle deltas need
    * the PRE-batch edge set, which the change feed alone cannot provide,
    * so the sink also maintains a BUCKETED ADJACENCY MIRROR table
    * (both orientations `(m, x)` Hive-partitioned by `m mod numBuckets`
    * — create it with [[graft.ops.Graph.createAdjacencyMirror]]) in the
    * same foreachBatch: per micro-batch it
    *
    *  1. computes [[graft.ops.Graph.triangleDeltaBucketed]] of the batch
    *     against the mirror (compute ∝ batch × degree AND mirror I/O
    *     partition-pruned to the batch endpoints' buckets — never a full
    *     mirror scan; the feed-corruption guards raise here, BEFORE
    *     anything commits) and MERGEs it into `features`;
    *  2. advances the mirror by the batch's netted inserts/deletes
    *     ([[graft.ops.Graph.advanceAdjacencyMirror]] — the (bkt, m, x)
    *     merge key keeps the matched-file search pruned too).
    *
    * Both merges carry the same `(appId, batchId)` txn guard, and the
    * MIRROR advances LAST — so its recorded txn marks the whole batch
    * complete, and the sink skips such batches up front. The ordering is
    * load-bearing: the features merge re-derives its delta from the
    * mirror, so the mirror must still hold the PRE state on any replay
    * that re-runs it (a crash between the two merges replays into
    * "features guarded-skip, mirror applies"; the reverse order would
    * re-derive deltas from a corrupted pre state — or raise spuriously
    * on a re-seen delete).
    *
    * Feature table schema: `(node long, triangles long)`, keyed on node.
    * Seed both tables to match the stream's `startingVersion` (empty
    * tables for a from-genesis feed; a one-time
    * [[graft.ops.Graph.triangles]] count +
    * [[graft.ops.Graph.seedAdjacencyMirror]] pair snapshot to adopt an
    * existing graph). */
  def triangleMaintenanceSink(features: graft.delta.DeltaTable,
                              edgeMirror: graft.delta.DeltaTable,
                              appId: String = "graft-triangle-sink",
                              aCol: String = "a", bCol: String = "b")
                             : (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val D = graft.delta.DeltaTable
      if (!edgeMirror.txnVersion(appId).exists(_ >= batchId)) {
        // eager (checkpointed) inside triangleDeltaBucketed: the
        // membership and multiplicity guards fire NOW, before either
        // table commits
        val delta = graft.ops.Graph.triangleDeltaBucketed(
            edgeMirror, batch, aCol, bCol)
          .where(col("dt") =!= 0L)
          .select(col("node"), col("dt"))
        features.mergeClauses(delta, Seq("node"), Seq(
            D.WhenMatchedDelete(condition = Some("t.triangles + s.dt = 0")),
            D.WhenMatchedUpdate(set = Map("triangles" ->
              ("CASE WHEN t.triangles + s.dt < 0 THEN CAST(raise_error(" +
                "'triangleMaintenanceSink: negative triangle fold - corrupt " +
                "change feed') AS BIGINT) ELSE t.triangles + s.dt END"))),
            D.WhenNotMatchedInsert(values = Map(
              "node" -> "s.node",
              "triangles" -> ("CASE WHEN s.dt < 0 THEN CAST(raise_error(" +
                "'triangleMaintenanceSink: negative triangles for unknown " +
                "node - corrupt change feed') AS BIGINT) ELSE s.dt END")))),
          txnAppId = Some(appId), txnVersion = batchId): Unit
        // mirror advance: the same per-edge netting triangleDeltaBucketed
        // applied (insert+delete of one edge in a catch-up batch
        // cancels). The corrupt shapes — matched insert, unmatched
        // delete, |net| > 1 — already raised in its guards above.
        graft.ops.Graph.advanceAdjacencyMirror(edgeMirror, batch, aCol, bCol,
          txnAppId = Some(appId), txnVersion = batchId): Unit
      }
    }
}
