package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Exact phrase/passage lookup index — contamination FORENSICS, the
  * inverse of [[Dedup.contamination]]: given a leaked passage (an eval
  * answer found in the wild, a copyrighted paragraph, a PII string),
  * find WHICH corpus documents contain it and WHERE. Decontamination
  * answers "which docs overlap the benchmark"; this answers "who has
  * this exact passage", after the fact, without rescanning the corpus.
  *
  * Design (the classic positional inverted index, Spark-shaped):
  *  - [[postings]] materializes word n-gram postings `(band, hsh,
  *    doc_id, pos)` — one row per shingle POSITION (not distinct: phrase
  *    matching needs every occurrence), `hsh` the portable 60-bit
  *    [[Hashing.h64]] of the shingle, `band = hsh % numBands`.
  *  - [[build]] writes them to a Delta table Hive-partitioned by `band`,
  *    so a probe opens ONLY the partition directories its own shingles
  *    hash into — at 100 TB the index is itself big data, and the band
  *    partitioning is what keeps a probe from touching it all. The
  *    postings shuffle carries (int, long, long, long) rows only; text
  *    never leaves the scan stage.
  *  - [[probe]] shingles the passage ON THE DRIVER (a passage is bytes,
  *    not data), scans one partition per distinct probe band through the
  *    stats/partition pruning path, and aligns positions: a match at
  *    anchor `a` means every probe shingle `i` appears at `pos = a + i`
  *    — the standard positional phrase-query join, grouped to
  *    `(doc_id, occurrences, first_pos)`.
  *
  * Probe cost ∝ (passage shingles) × (band selectivity), never corpus
  * size; the only aggregation is over candidate alignments. The DuckDB
  * oracle replays postings construction AND the probe from the same
  * md5-derived hashes, so the gate pins full output equality. */
object PassageIndex {

  /** Positional word n-gram shingles of a token array: element i covers
    * tokens [i, i+n). NOT distinct — every occurrence matters for phrase
    * matching. Callers guard `size(ts) >= n`. */
  def positionalShingles(ts: Column, n: Int): Column =
    transform(sequence(lit(0), size(ts) - n), i =>
      concat_ws(" ", (1 to n).map(j => element_at(ts, i + j)): _*))

  /** The postings frame: `(band, hsh, doc_id, pos)`, one row per shingle
    * position. Shared by [[build]] and the oracle gate (which replays it
    * in SQL). */
  def postings(docs: DataFrame, idCol: String, textCol: String,
               shingleN: Int = 3, numBands: Int = 16,
               seed: String = "passage"): DataFrame = {
    val ts = TextAnalysis.tokens(col(textCol))
    docs.select(col(idCol).cast("long").as("doc_id"), ts.as("ts"))
      .filter(size(col("ts")) >= shingleN)
      .select(col("doc_id"),
        posexplode(positionalShingles(col("ts"), shingleN)).as(Seq("pos", "sh")))
      .withColumn("hsh", Hashing.h64(col("sh"), seed))
      .select(pmod(col("hsh"), lit(numBands.toLong)).cast("int").as("band"),
        col("hsh"), col("doc_id"), col("pos").cast("long").as("pos"))
  }

  /** Create (if needed) and load the postings index table, partitioned by
    * band. Returns the committed version. Rebuild-from-scratch form; an
    * incremental pipeline appends new docs' postings the same way. */
  def build(index: graft.delta.DeltaTable, docs: DataFrame,
            idCol: String, textCol: String,
            shingleN: Int = 3, numBands: Int = 16,
            seed: String = "passage"): Long = {
    val p = postings(docs, idCol, textCol, shingleN, numBands, seed)
    index.create(p.schema, partitionColumns = Seq("band"))
    // cluster by the partition column before the write: whatever the
    // compute parallelism upstream, each band lands as one file instead
    // of (input partitions x bands) shards (guide-standard write layout;
    // the probe side prunes and lists per band)
    index.append(p.repartition(col("band")))
  }

  /** Batch forensics: probe a whole TABLE of passages (an eval suite, a
    * takedown list) in one pass — `(probe_id, doc_id, occurrences,
    * first_pos)`, one row per (passage, containing doc). Passages
    * shingle in Spark (probe sets can exceed driver-string scale), their
    * distinct bands collect (≤ numBands ints — bounded) to drive the
    * partition-pruned scans, and the probe shingles BROADCAST into the
    * alignment join — the index side never shuffles. Passages shorter
    * than `shingleN` tokens are ignored; duplicate probe_ids dedupe to
    * one row. */
  def probeAll(index: graft.delta.DeltaTable, passages: DataFrame,
               idCol: String, textCol: String,
               shingleN: Int = 3, numBands: Int = 16,
               seed: String = "passage"): DataFrame = {
    val ps = probeShingles(passages, idCol, textCol, shingleN, numBands, seed)
    val spark = ps.sparkSession
    import spark.implicits._
    val bands = ps.select(col("band")).distinct().as[Int].collect().sorted
    if (bands.isEmpty)
      return ps.sparkSession.emptyDataset[(Long, Long, Long, Long)]
        .toDF("probe_id", "doc_id", "occurrences", "first_pos")
    val scanned = index.scan(Seq(
      graft.delta.DataSkipping.ColPred("band", "in", bands.toSeq)))
    aligned(scanned, ps)
  }

  /** `(probe_id, i, hsh, band)` shingles of a passages table —
    * localCheckpointed so its several consumers (band collect, alignment
    * join, k counts, every streaming micro-batch) share one execution.
    * Passages shorter than `shingleN` tokens drop; duplicate probe_ids
    * dedupe. */
  def probeShingles(passages: DataFrame, idCol: String, textCol: String,
                    shingleN: Int = 3, numBands: Int = 16,
                    seed: String = "passage"): DataFrame = {
    val ts = TextAnalysis.tokens(col(textCol))
    passages.dropDuplicates(idCol)
      .select(col(idCol).cast("long").as("probe_id"), ts.as("ts"))
      .filter(size(col("ts")) >= shingleN)
      .select(col("probe_id"),
        posexplode(positionalShingles(col("ts"), shingleN)).as(Seq("i", "sh")))
      .withColumn("hsh", Hashing.h64(col("sh"), seed))
      .select(col("probe_id"), col("i").cast("long").as("i"), col("hsh"),
        pmod(col("hsh"), lit(numBands.toLong)).cast("int").as("band"))
      .localCheckpoint()
  }

  /** Positional phrase alignment of postings rows `(hsh, doc_id, pos)`
    * against probe shingles `(probe_id, i, hsh)`: all k probe shingles
    * at one anchor = a verbatim occurrence. The probe side broadcasts —
    * the postings side never shuffles. */
  private[graft] def aligned(post: DataFrame, ps: DataFrame): DataFrame = {
    val k = ps.groupBy(col("probe_id")).agg(count(lit(1)).as("k"))
    post.join(broadcast(ps.select(col("probe_id"), col("i"), col("hsh"))), Seq("hsh"))
      .withColumn("anchor", col("pos") - col("i"))
      .filter(col("anchor") >= 0)
      .groupBy(col("probe_id"), col("doc_id"), col("anchor"))
      .agg(countDistinct(col("i")).as("m"))
      .join(broadcast(k), Seq("probe_id"))
      .filter(col("m") === col("k"))
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(count(lit(1)).as("occurrences"), min(col("anchor")).as("first_pos"))
      .select(col("probe_id"), col("doc_id"), col("occurrences"), col("first_pos"))
  }

  /** Index-free one-shot form: which `docs` contain which `passages`
    * verbatim — [[probeAll]]'s alignment with postings computed in-flight
    * (ad-hoc scans, streaming micro-batches) instead of read from a
    * Delta index. Both frames use (`idCol`, `textCol`). */
  def matches(docs: DataFrame, passages: DataFrame,
              idCol: String, textCol: String,
              shingleN: Int = 3, seed: String = "passage"): DataFrame =
    aligned(postings(docs, idCol, textCol, shingleN, numBands = 1, seed),
      probeShingles(passages, idCol, textCol, shingleN, 1, seed))

  /** Which docs contain `passage` verbatim (token-level): `(doc_id,
    * occurrences, first_pos)`. Opens only the distinct bands the
    * passage's shingles hash into — ONE IN-list partition-pruned scan. */
  def probe(index: graft.delta.DeltaTable, passage: String,
            shingleN: Int = 3, numBands: Int = 16,
            seed: String = "passage"): DataFrame = {
    val toks = passage.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    require(toks.length >= shingleN,
      s"passage has ${toks.length} tokens; need at least shingleN=$shingleN")
    val probes: Seq[(Long, Long)] = toks.sliding(shingleN)
      .map(w => w.mkString(" ")).zipWithIndex
      .map { case (sh, i) => (i.toLong, Hashing.planTimeH64(s"$seed:$sh")) }
      .toSeq
    val k = probes.size
    val bands = probes.map { case (_, h) => ((h % numBands) + numBands) % numBands }
      .distinct.sorted.map(_.toInt)
    // ONE partition-pruned scan over the probe's bands (IN-list pred) —
    // the index's other bands are never opened
    val scanned = index.scan(Seq(
      graft.delta.DataSkipping.ColPred("band", "in", bands)))
    val spark = scanned.sparkSession
    import spark.implicits._
    val probeDf = probes.toDF("i", "hsh")
    scanned.join(broadcast(probeDf), Seq("hsh"))
      .withColumn("anchor", col("pos") - col("i"))
      .filter(col("anchor") >= 0)
      .groupBy(col("doc_id"), col("anchor"))
      // distinct probe positions matched at this alignment: all k = the
      // passage occurs verbatim at `anchor` (countDistinct, not count —
      // a repeated shingle inside the passage matches several i at
      // DIFFERENT anchors, but 60-bit collisions could double-count one)
      .agg(countDistinct(col("i")).as("m"))
      .filter(col("m") === k)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("occurrences"), min(col("anchor")).as("first_pos"))
      .select(col("doc_id"), col("occurrences"), col("first_pos"))
  }
}
