package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deduplication operators for training-data pipelines at 100 TB scale.
  *
  * Scale strategy (the three rules every operator here follows):
  *  1. Shuffle digests and IDs, never documents. Candidate generation emits
  *     (key, id) rows only, and verification COUNTS shared hashed shingles
  *     per pair (o/(|A|+|B|−o)) instead of re-joining shingle arrays — no
  *     text or array payload ever crosses a shuffle.
  *  2. Candidate generation keys are bounded by design (LSH band buckets,
  *     signature chunk pairs, multiprobe cells) — never an all-pairs or
  *     size-bucket join whose buckets grow with the corpus; the one exact
  *     operator (ngramJaccardPairs) documents its Σdf² regime explicitly.
  *  3. Hash bits come from md5 via [[graft.functions.Hashing]] so the
  *     DuckDB oracle reproduces every signature and bucket exactly; the
  *     k-fold fan-out uses the affine family on ONE md5 per token.
  */
object Dedup {

  import TextAnalysis.tokens

  /** Exact dedup: keep the smallest id per identical text. One shuffle on a
    * 16-byte digest — never on the text itself. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("h"), col(idCol))
      .groupBy(col("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** URL-level dedup — the FIRST pass of a web-crawl pipeline, before
    * any content bytes are read: canonicalize ([[UrlOps.normalizeUrl]]:
    * case, www, userinfo, default ports, tracking params, param order,
    * fragments, trailing slashes) and keep the lowest id per canonical
    * URL. Scale shape identical to [[exact]]: scan-stage string
    * canonicalization, one groupBy whose exchange carries only
    * (canonical url, id). */
  def byUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(UrlOps.normalizeUrl(col(urlCol)).as("canon_url"), col(idCol))
      .groupBy(col("canon_url"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** The batch rows that are NOVEL against a live Delta corpus: in-batch
    * exact-deduped (smallest id per digest), then anti-joined on the
    * corpus table's stored `digest` column. The corpus side of the
    * anti-join reads ONLY that 32-char column (column pruning reaches the
    * parquet scan — DedupSpec pins the ReadSchema), and the shuffle
    * carries digests, never text: the [[exact]] scale rules, against a
    * table instead of a frame. */
  def novelAgainst(table: graft.delta.DeltaTable, docs: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    require(table.toDF.columns.contains("digest"),
      "incremental dedup requires the corpus table to carry the 'digest' " +
        "column appendNovel writes (create the table with it)")
    require(!docs.columns.contains("digest"),
      "'digest' is derived from the text — the input must not carry one")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("digest")).orderBy(col(idCol))
    docs.withColumn("digest", md5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .join(table.toDF.select(col("digest")), Seq("digest"), "left_anti")
      // digest last, matching the create-schema convention (input ++ digest)
      .select(docs.columns.map(col) :+ col("digest"): _*)
  }

  /** Incremental exact dedup into a Delta corpus: append only
    * [[novelAgainst]] rows. CONTENT-idempotent — replaying a batch after
    * a successful commit appends nothing (every digest now exists), so
    * retries are safe without transaction bookkeeping, and growing the
    * corpus never rewrites it. Returns the committed version, or -1 when
    * the batch contained nothing new (no empty commit is written).
    *
    * The novelty frame is materialized ONCE (localCheckpoint): the
    * emptiness probe and the appended rows observe the same execution,
    * so the probe's decision can't diverge from what gets committed
    * under a concurrent writer, and a single-writer run pays the corpus
    * anti-join scan once instead of twice.
    *
    * Concurrency: two simultaneous writers carrying the SAME novel digest
    * can both commit (row-level intent is invisible to the commit guard —
    * same as Delta proper's blind appends); serialize writers per corpus
    * or route through one streaming sink when that matters. */
  def appendNovel(table: graft.delta.DeltaTable, docs: DataFrame,
                  idCol: String, textCol: String): Long = {
    val novel = novelAgainst(table, docs, idCol, textCol).localCheckpoint()
    if (novel.isEmpty) -1L else table.append(novel)
  }

  /** [[appendNovel]] with the documented two-writer same-digest race
    * CLOSED: every writer of a corpus that passes the same `writerGroup`
    * serializes its novelty-check→commit window through the Delta txn
    * seam. Each commit carries `txn(writerGroup, lastGroupTxn + 1)`;
    * [[graft.delta.DeltaLog.commit]] re-checks the txn predicate against
    * the winning snapshot on every attempt, so of two concurrent group
    * writers exactly ONE lands — the other's attempt is skipped and this
    * method RECOMPUTES novelty against the advanced corpus and retries
    * (its batch may hold digests the winner's didn't; returning the
    * skip would lose them). Terminates: every retry means the corpus
    * advanced, and a batch's novel set only shrinks against a grown
    * corpus.
    *
    * Contract: ALL dedup writers of the corpus must use the same group —
    * a writer appending digests outside it is invisible to this guard
    * (exactly the blind-append semantics of [[appendNovel]]). */
  def appendNovelSerialized(table: graft.delta.DeltaTable, docs: DataFrame,
                            idCol: String, textCol: String,
                            writerGroup: String = "graft-dedup",
                            maxAttempts: Int = 50): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = table.txnVersion(writerGroup).getOrElse(-1L)
      val novel = novelAgainst(table, docs, idCol, textCol).localCheckpoint()
      if (novel.isEmpty) return -1L
      val committed = table.append(novel,
        txnAppId = Some(writerGroup), txnVersion = base + 1)
      if (committed >= 0) return committed
      attempt += 1 // lost the txn race — another group writer landed first
    }
    throw new java.util.ConcurrentModificationException(
      s"appendNovelSerialized lost $maxAttempts txn races in a row on " +
        s"group '$writerGroup' — writer contention is pathological")
  }

  /** Incremental NEAR-duplicate dedup into a Delta corpus — the MinHash
    * analog of [[appendNovel]]: the corpus persists each kept doc's
    * minhash SIGNATURE (`corpus`: id, text, sig) and its exploded LSH
    * band buckets (`bandsTable`: band, bucket, id), so deduplicating a
    * new batch against a grown corpus joins the batch's ~bands rows per
    * doc against the stored buckets instead of re-running LSH over the
    * whole corpus.
    *
    * A batch doc is dropped when it has a verified near-dup (exact
    * shingle-set Jaccard ≥ `threshold`) with a SMALLER id in its own
    * batch (chain-kill: the smaller side need not itself survive —
    * deterministic and order-free), or with ANY doc already in the
    * corpus. Survivors append to BOTH tables; empty-shingle docs never
    * collide (always novel).
    *
    * Scale shape: the band join's batch side is (band, bucket, id) —
    * ~17 bytes × bands per doc; the corpus side reads its OWN 3-column
    * table (partition `bandsTable` by `band` at create to prune the
    * join's scan). Candidate verification ships corpus TEXT only for
    * the candidate pairs (rare by construction), never for the corpus.
    *
    * Crash contract: bands append FIRST. An orphaned bands row (crash
    * between the two commits) can only create candidates whose corpus
    * join finds no row — dropped at verification, never a false kill —
    * and a batch REPLAY after any crash is content-idempotent: each
    * previously-appended survivor collides with itself at Jaccard 1.
    *
    * @return corpus version committed, or -1 when nothing was novel */
  def appendNovelNear(corpus: graft.delta.DeltaTable,
                      bandsTable: graft.delta.DeltaTable, docs: DataFrame,
                      idCol: String, textCol: String, shingleN: Int = 2,
                      numHashes: Int = 128, bands: Int = 32,
                      threshold: Double = 0.5): Long = {
    require(corpus.toDF.columns.toSeq == Seq("id", "text", "sig"),
      "near-dup corpus schema must be (id, text, sig)")
    require(bandsTable.toDF.columns.toSeq == Seq("band", "bucket", "id"),
      "bands table schema must be (band, bucket, id)")
    val base = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .withColumn("hsh", graft.functions.ShingleHashes.of(
        tokens(col("text")), shingleN, "mh"))
      .withColumn("sig", when(size(col("hsh")) > 0,
        graft.functions.MinHashSig.of(col("hsh"), numHashes))
        .otherwise(array().cast("array<bigint>")))
      .localCheckpoint() // one execution feeds banding, verify, and append
    // in-batch chain-kill: any verified pair's larger id drops
    val inBatchKill = minhashLsh(docs, idCol, textCol, shingleN, numHashes,
        bands, threshold)
      .select(col("id_b").cast("long").as("id"))
    // cross-corpus candidates: stored buckets × batch buckets
    val batchBands = base.filter(size(col("sig")) > 0).select(col("id"),
      posexplode(graft.functions.BandBuckets.of(col("sig"), bands))
        .as(Seq("band", "bucket")))
    val cand = batchBands
      .join(bandsTable.toDF.withColumnRenamed("id", "corpus_id"),
        Seq("band", "bucket"))
      .select(col("id"), col("corpus_id")).dropDuplicates("id", "corpus_id")
    // exact-Jaccard verify on shingle-hash sets; corpus text joins in for
    // CANDIDATES only
    val corpusH = corpus.toDF
      .select(col("id").as("corpus_id"), graft.functions.ShingleHashes.of(
        tokens(col("text")), shingleN, "mh").as("chsh"))
    val crossKill = cand
      .join(base.select(col("id"), col("hsh")), Seq("id"))
      .join(corpusH, Seq("corpus_id"))
      .filter(jaccard(col("hsh"), col("chsh")) >= threshold)
      .select(col("id"))
    val survivors = base
      .join(inBatchKill.union(crossKill).distinct(), Seq("id"), "left_anti")
      .select(col("id"), col("text"), col("sig"))
      .localCheckpoint() // both appends and the emptiness probe see one execution
    if (survivors.isEmpty) return -1L
    bandsTable.append(survivors.filter(size(col("sig")) > 0).select(
      posexplode(graft.functions.BandBuckets.of(col("sig"), bands))
        .as(Seq("band", "bucket")), col("id")))
    corpus.append(survivors)
  }

  /** Word n-gram shingles from a MATERIALIZED token-array column. Uses n
    * O(1) element_at lookups per position, not slice() (which copies the
    * array per call). `ts` must be a real column attribute, not a
    * `tokens(text)` expression: higher-order lambdas are interpreted and
    * re-evaluate captured EXPRESSIONS per element — tokens() inside the
    * lambda made shingling O(tokens²) per doc (measured 11 s / 5000 docs;
    * 2 s hoisted). */
  def shinglesFromTokens(ts: Column, n: Int): Column = {
    val idx = sequence(lit(0), greatest(size(ts) - n, lit(0)))
    when(size(ts) < n, array(concat_ws(" ", ts)))
      .otherwise(array_distinct(transform(idx, i =>
        concat_ws(" ", (1 to n).map(j => element_at(ts, i + j)): _*))))
  }

  /** Word n-gram shingles of the text — convenience wrapper; hot paths
    * hoist tokens into their own projection and call
    * [[shinglesFromTokens]]. */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** (id, hsh) — distinct 60-bit shingle hashes via the codegen'd
    * [[graft.functions.ShingleHashes]] kernel (≈50× the interpreted
    * higher-order-function path). Tokenization is hoisted into its own
    * projection so it evaluates once per row. */
  private def hashedShingleBase(df: DataFrame, idCol: String, textCol: String,
                                n: Int, seed: String): DataFrame =
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
      .select(col("id"), graft.functions.ShingleHashes.of(col("ts"), n, seed).as("hsh"))

  /** Exact Jaccard similarity of two token-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** MinHash-LSH near-duplicate pairs.
    *
    * Plan shape (100 TB story): band rows are (bucket, band, id) — 17 bytes
    * of shuffle per band per doc, independent of document size; the
    * exact-Jaccard verify counts shared hashed shingles per candidate
    * pair, so shingle content never crosses a shuffle at all.
    *
    * @param bands     LSH bands; Pr[candidate] = 1-(1-j^r)^b, r = numHashes/bands
    * @param threshold exact-Jaccard verification threshold on shingle sets
    * @return (id_a, id_b, jaccard) with id_a < id_b, verified pairs only
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
                 threshold: Double = 0.5): DataFrame = {
    require(bands >= 1 && numHashes >= bands && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands): " +
        "a remainder silently drops hashes from banding, and rows-per-band 0 " +
        "would hash empty slices — collapsing every doc into one bucket")
    val rows = numHashes / bands
    val base = hashedShingleBase(df, idCol, textCol, shingleN, "mh")
    // verify side still needs one row per (doc, shingle hash)
    val exH = base.select(col("id"), size(col("hsh")).cast("long").as("sz"),
      explode(col("hsh")).as("h"))
    // signature via the single-pass codegen kernel — all numHashes affine
    // minima inside the scan stage; the explode + numHashes-way min-agg
    // shuffle this replaces was ~4 s of the sf0.1 bench. Value-identical
    // to min-over-exploded-rows, so the oracle is unchanged. Docs with an
    // empty hash set are dropped, matching the agg path (no rows → no
    // group); ShingleHashes never emits one, but guard the general input.
    val withSig = base.filter(size(col("hsh")) > 0)
      .select(col("id"), graft.functions.MinHashSig.of(col("hsh"), numHashes).as("mh"))

    // one (band, bucket) key per band; bucket = h64 of the band's slice,
    // computed by the codegen'd BandBuckets kernel (same "band$b:v1,v2,…"
    // md5 input as the oracle's bandedUnion — value-identical, ~1.5 s of
    // Catalyst string machinery off the sf0.1 bench). posexplode's pos IS
    // the band index, matching the kernel's element order.
    val banded = withSig.select(col("id"),
      posexplode(graft.functions.BandBuckets.of(col("mh"), bands))
        .as(Seq("band", "bucket")))

    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    // Verify by counting shared hashed shingles per candidate pair — the
    // shingle arrays never cross a shuffle (same trick as
    // ngramJaccardPairs; the oracle mirrors the hashed-count form). The
    // count joins on the FULL 60-bit hash: two distinct shingle hashes in
    // one doc can collide in the low 32 bits used by the signature path,
    // which would double-count overlap and let jaccard exceed 1.
    cand
      .join(exH.select(col("id").as("id_a"), col("sz").as("sz_a"), col("h")), Seq("id_a"))
      .join(exH.select(col("id").as("id_b"), col("sz").as("sz_b"), col("h")), Seq("id_b", "h"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("o"), min(col("sz_a")).as("sz_a"), min(col("sz_b")).as("sz_b"))
      .withColumn("jaccard",
        col("o").cast("double") / (col("sz_a") + col("sz_b") - col("o")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 60-bit SimHash from a PRE-HASHED token column (array<long> of
    * [[Hashing.h64]] values): per-bit majority vote over token hashes.
    *
    * Interpreted reference formulation — kept as the executable spec that
    * DedupSpec pins bit-for-bit against the codegen'd
    * [[graft.functions.SimHashSig]] kernel the hot path uses (the
    * higher-order aggregate walks the hash array once per bit, 60 ×
    * tokens interpreted evals per row; the kernel is one pass). */
  def simhashFromHashes(hashed: Column, bits: Int = 60): Column = {
    val votes = transform(sequence(lit(0), lit(bits - 1)), bit =>
      aggregate(hashed, lit(0L), (acc, h) =>
        acc + when(call_function("shiftright", h, bit).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(bits - 1)), (v, i) =>
        when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs: 60-bit signature split into 6 10-bit chunks;
    * candidates share a PAIR of chunks (15 blocks of 20-bit keys). Hamming
    * distance ≤ 3 dirties ≤ 3 chunks, leaving ≥ 3 clean ones → some clean
    * pair exists → recall 1 for d ≤ 3.
    *
    * Scale: 2^20 buckets per block (×15 blocks) vs the 2^16 ceiling of
    * 4×16-bit single-chunk blocking — bucket population at a given corpus
    * size drops 16× and the ceiling moves to ~15M effective buckets.
    * Shuffle per doc = 15 × (block, key, id, sig) ≈ 28 bytes — constant,
    * never the text. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sig = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
      .select(col("id"), transform(col("ts"), t => Hashing.h64(t, "sh")).as("hx"))
      .select(col("id"), graft.functions.SimHashSig.of(col("hx")).as("sig"))
    val chunkPairs = for { j <- 0 until 6; k <- j + 1 until 6 } yield (j, k)
    val chunked = sig.select(col("id"), col("sig"),
      posexplode(array(chunkPairs.map { case (j, k) =>
        shiftright(col("sig"), j * 10).bitwiseAND(1023L) * 1024L +
          shiftright(col("sig"), k * 10).bitwiseAND(1023L)
      }: _*)).as(Seq("blk", "key")))
    val a = chunked.select(col("blk"), col("key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("blk"), col("key"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("blk", "key"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** EXACT n-gram Jaccard similarity join via inverted-index co-occurrence
    * counting — no blocking, no recall caveat: every pair sharing ≥ 1
    * shingle is scored, and J ≥ t > 0 implies a shared shingle, so recall
    * is 1 by construction (closes the size-bucket recall hole from the
    * round-1 advice).
    *
    * Plan shape: explode to (shingle, id, sz) rows [16-byte keys — the
    * shingle ARRAYS never cross a shuffle], self-join on shingle, count
    * rows per (id_a, id_b) → overlap o, then J = o/(szA+szB-o). One
    * shuffled count aggregation replaces the candidate-pair × payload
    * re-join entirely.
    *
    * Scale regime: enumeration cost is Σ_s df(s)² — proportional to the
    * number of actually-co-occurring pairs. On natural (Zipfian) corpora
    * the hot-shingle head dominates; cap it with `maxDf` (excluding
    * shingles seen in > maxDf docs from ENUMERATION only — a pair at
    * J ≥ 0.5 sharing solely stop-shingles is then missed, the standard
    * stop-word tradeoff, off by default) or switch to [[minhashLsh]],
    * whose candidate count tracks true near-duplicates instead.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, J ≥ threshold
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 2, threshold: Double = 0.5,
                        maxDf: Option[Long] = None): DataFrame = {
    val base = hashedShingleBase(df, idCol, textCol, shingleN, "cooc")
    // One shingle pass total: sz rides along on every exploded row (8
    // bytes) so no second pass / sizes join is needed, and the join key is
    // the 60-bit shingle hash, not the string. The self-join uses aliases
    // over the IDENTICAL subplan so Spark's ReuseExchange computes the
    // explode+shuffle once for both sides.
    // The self-join's work is OUTPUT-proportional (Σdf² pair rows) while
    // its input is one small row per (doc, shingle) — AQE sizes partitions
    // by input bytes, so it under-partitions the join and a few tasks do
    // all the pair enumeration. Hash-partitioning the join key 4× finer
    // than the session default rebalances that output work across cores
    // (measured 9.1 s → ~3.5 s on the sf0.1 bench corpus, whose 931-bigram
    // vocabulary makes every shingle hot); the extra exchange moves only
    // the narrow pre-join rows and is shared by both sides via
    // ReuseExchange.
    val fanout = df.sparkSession.sessionState.conf.numShufflePartitions * 4
    val ex0 = base.select(col("id"), size(col("hsh")).cast("long").as("sz"),
        explode(col("hsh")).as("hs"))
      .select(col("hs"), col("id"), col("sz"))
      .repartition(fanout, col("hs"))
    val ex = maxDf match {
      case None => ex0
      case Some(cap) =>
        // broadcast the HOT set (df > cap — a handful of stop-shingles by
        // construction) and anti-join; broadcasting the kept set would
        // collect nearly every distinct shingle in the corpus to the
        // driver and OOM at exactly the scale this cap exists for
        val hot = ex0.groupBy(col("hs")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("hs"))
        ex0.join(broadcast(hot), Seq("hs"), "left_anti")
    }

    // size-ratio prune (lossless): J ≥ t implies o ≥ t(|A|+|B|)/(1+t) and
    // o ≤ min, hence min ≥ t·max — pairs with incompatible sizes are
    // dropped BEFORE the count aggregation (measured ~60% of the
    // co-occurrence rows on uniform size distributions).
    val o = ex.alias("a")
      .join(ex.alias("b").hint("shuffle_hash"),
        col("a.hs") === col("b.hs") && col("a.id") < col("b.id") &&
          col("a.sz").cast("double") >= lit(threshold) * col("b.sz") &&
          col("b.sz").cast("double") >= lit(threshold) * col("a.sz"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("o"), min(col("a.sz")).as("sz_a"), min(col("b.sz")).as("sz_b"))

    o.withColumn("jaccard",
        col("o").cast("double") / (col("sz_a") + col("sz_b") - col("o")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** EXACT n-gram CONTAINMENT join: pairs where the smaller shingle set
    * is mostly inside the other — C = o / min(|A|, |B|) ≥ threshold.
    * Jaccard misses exactly these (a 50-token license block inside a
    * 5000-token page has J ≈ 0.01 but C = 1.0); this is the
    * quote/subset/wrapper-page detector that complements
    * [[ngramJaccardPairs]].
    *
    * Same plan skeleton as the Jaccard join — one explode, ReuseExchange
    * self-join on the 60-bit shingle hash, count-based verify, digests
    * and ids only in every shuffle — but NO size-ratio prune: a tiny doc
    * inside a huge one is precisely the target, so size-incompatible
    * pairs must survive candidate generation. That widens the Σdf²
    * regime vs Jaccard (every co-occurrence row reaches the count);
    * `maxDf` is the documented relief valve, and a prefix variant is
    * unsound here (prefix filtering's lossless guarantee needs the
    * Jaccard size bound).
    *
    * @return (id_a, id_b, containment) with id_a < id_b, C ≥ threshold */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
                            shingleN: Int = 2, threshold: Double = 0.5,
                            maxDf: Option[Long] = None): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val base = hashedShingleBase(df, idCol, textCol, shingleN, "cooc")
    val fanout = df.sparkSession.sessionState.conf.numShufflePartitions * 4
    val ex0 = base.select(col("id"), size(col("hsh")).cast("long").as("sz"),
        explode(col("hsh")).as("hs"))
      .select(col("hs"), col("id"), col("sz"))
      .repartition(fanout, col("hs"))
    val ex = maxDf match {
      case None => ex0
      case Some(cap) =>
        val hot = ex0.groupBy(col("hs")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("hs"))
        ex0.join(broadcast(hot), Seq("hs"), "left_anti")
    }
    ex.alias("a")
      .join(ex.alias("b").hint("shuffle_hash"),
        col("a.hs") === col("b.hs") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("o"), min(col("a.sz")).as("sz_a"), min(col("b.sz")).as("sz_b"))
      .withColumn("containment",
        col("o").cast("double") / least(col("sz_a"), col("sz_b")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("containment"), 6).as("containment"))
  }

  /** EXACT n-gram Jaccard join with PREFIX FILTERING (PPJoin-family,
    * Chaudhuri/Xiao et al.): each doc's shingles are ordered by global
    * rarity (ascending document frequency) and only the first
    * |d| − ⌈t·|d|⌉ + 1 are indexed; two sets with J ≥ t MUST share a
    * prefix element under any common total order, so enumerating
    * candidates from prefix co-occurrence alone is lossless — the output
    * is bit-identical to [[ngramJaccardPairs]] and shares its oracle.
    *
    * Scale: enumeration drops from Σ_s df(s)² to Σ_s dfₚ(s)², and the
    * rarity order evicts exactly the hot head from the prefixes — on a
    * Zipfian corpus the stop-shingles that dominate the brute join
    * disappear from candidate generation WITHOUT the `maxDf` recall
    * caveat. Verification counts shared hashes per candidate pair (the
    * minhashLsh trick): digests and ids only in every shuffle.
    *
    * Regime (both directions MEASURED at sf0.1, min-of-3 quiet host):
    *  - bench corpus (~931-bigram vocabulary — the ADVERSARIAL case:
    *    every df huge and uniform, prefixes concentrate no rarity, the
    *    candidate set must be materialized for verification while the
    *    brute join aggregates co-occurrence rows directly): this path
    *    runs ~12× SLOWER than [[ngramJaccardPairs]].
    *  - [[ZipfCorpus]] fixture (large power-law vocabulary — real text's
    *    shape; headline rows dedup_zipf_{brute,prefix}): Σdf² ≈ 52M vs
    *    Σdfₚ² ≈ 0.7M, and this path runs ~3× FASTER (1.8 s vs 5.6 s) —
    *    rarity ordering evicts exactly the hot head that dominates the
    *    brute join's enumeration.
    * Prefer it when the shingle vocabulary is large and Zipfian (real
    * text at scale); prefer the brute join when the vocabulary is tiny
    * or df is near-uniform.
    */
  def ngramJaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
                              shingleN: Int = 2, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold: prefix length " +
        "|d| - ceil(t*|d|) + 1 is only a valid filter for positive t")
    val base = hashedShingleBase(df, idCol, textCol, shingleN, "cooc")
    // materialized ONCE, as per-doc ARRAYS: every consumer (document
    // frequency, the prefix window, both verify sides) derives from this
    // checkpoint, so the corpus scan + tokenize + shingle-hash chain —
    // the dominant CPU of this operator (measured ~9 s of stage CPU at
    // sf0.1 was repeated hashing) — runs exactly once. The array form
    // is strictly smaller than the exploded form (id/sz not repeated
    // per shingle) and lets verification read whole sets without a
    // re-explode. Rows are (long, array<long>) — digests only, never text.
    val arr = base.select(col("id"), col("hsh")).localCheckpoint()
    // exploded view for the frequency/prefix legs: a map-side explode
    // off the checkpoint (recomputing it per consumer is generator-only
    // work, no rescan/rehash)
    val ex = arr.select(col("id"), size(col("hsh")).cast("long").as("sz"),
      explode(col("hsh")).as("hs"))
    // global rarity: df(s) = number of docs containing shingle s (hsh is
    // per-doc distinct, so a plain row count is the document frequency)
    val dfreq = ex.groupBy(col("hs")).agg(count(lit(1)).as("df"))
    // per-doc rank by (df, hs) — hs tiebreak makes the order total, so
    // both docs of a pair agree on it; keep the rarest prefix
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("hs"))
    val prefix = ex.join(dfreq, Seq("hs"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - ceil(lit(threshold) * col("sz")).cast("long") + 1)
      .select(col("hs"), col("id"), col("sz"))
    val cand = prefix.alias("a")
      .join(prefix.alias("b"),
        col("a.hs") === col("b.hs") && col("a.id") < col("b.id") &&
          col("a.sz").cast("double") >= lit(threshold) * col("b.sz") &&
          col("b.sz").cast("double") >= lit(threshold) * col("a.sz"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // verification by whole-set intersection: fetch each side's hash
    // ARRAY once per candidate pair and count the overlap map-side —
    // |hsh_a ∩ hsh_b| equals the old exploded join's shared-hash row
    // count (hsh is per-doc distinct), but the per-pair work drops from
    // shuffling ~|d| matched rows through a (id_b, hs) exchange + hash
    // aggregate to two array lookups and an O(|a|+|b|) intersect
    // (round-20 A/B; VERDICT item 7).
    cand
      .join(arr.select(col("id").as("id_a"), col("hsh").as("ha")), Seq("id_a"))
      .join(arr.select(col("id").as("id_b"), col("hsh").as("hb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("ha"), col("hb"))).cast("long").as("o"),
        size(col("ha")).cast("long").as("sz_a"),
        size(col("hb")).cast("long").as("sz_b"))
      .withColumn("jaccard",
        col("o").cast("double") / (col("sz_a") + col("sz_b") - col("o")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Cross-document duplicate-PASSAGE profile (the window-granular
    * approximation of suffix-array substring dedup, Lee et al. 2022):
    * hash every `windowN`-token window, find windows appearing in ≥ 2
    * docs, and report per doc how much of it is duplicated elsewhere —
    * the RefinedWeb-style signal for cutting boilerplate and templated
    * spam that document-level dedup can't see (two docs 30% identical
    * pass every whole-doc gate).
    *
    * Plan shape: (digest, id) rows only, ONE shuffle — the doc frequency
    * is a count-over-window on the hash partition, so the exploded rows
    * shuffle once by digest and aggregate straight back by id (the
    * groupBy+join-back formulation scanned and shuffled the corpus
    * twice; measured 2.2 s → this at sf0.1). Window text never leaves the
    * scan stage. Output has one row per doc that CONTAINS a shared window.
    *
    * @return (id, n_windows, n_dup_windows, dup_ratio) */
  def dupPassages(df: DataFrame, idCol: String, textCol: String,
                  windowN: Int = 6): DataFrame = {
    val base = hashedShingleBase(df, idCol, textCol, windowN, "span")
    val ex = base.select(col("id"), size(col("hsh")).cast("long").as("n_windows"),
      explode(col("hsh")).as("h"))
    // hsh is per-doc distinct, so a plain row count is the doc frequency
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    ex.withColumn("ndocs", count(lit(1)).over(byHash))
      .filter(col("ndocs") >= 2)
      .groupBy(col("id"))
      .agg(min(col("n_windows")).as("n_windows"), count(lit(1)).as("n_dup_windows"))
      .withColumn("dup_ratio",
        round(col("n_dup_windows").cast("double") / col("n_windows").cast("double"), 6))
  }

  /** Edit-distance near-dup pairs over a SHORT string column — the
    * character-level metric for title/URL/prefix-style fields where
    * token-set Jaccard is too coarse (one-typo titles share every token
    * but one). Levenshtein is O(|a|·|b|) per pair, so the column must be
    * bounded by contract (a title, a normalized key, a fixed prefix) —
    * never whole documents; that is what [[minhashLsh]] is for.
    *
    * Lossless blocking: |len(a) − len(b)| ≤ maxDist is NECESSARY for
    * levenshtein(a, b) ≤ maxDist (each edit changes length by ≤ 1), and
    * with buckets of width maxDist+1 two such lengths land in the same
    * or adjacent buckets — one side probes (b−1, b, b+1) (the LSH
    * 1-bit-flip idiom), so the bucket equi-join misses nothing and each
    * pair joins exactly once (a fixed bucket matches at most one of the
    * three distinct probes). Verification is the exact distance.
    *
    * @return (id_a, id_b, dist) with id_a < id_b, dist ≤ maxDist */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"negative maxDist: $maxDist")
    val w = maxDist + 1
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"),
        length(col(strCol)).as("len"))
      .withColumn("bkt", floor(col("len") / w).cast("long"))
    val probes = base.select(col("id"), col("s"), col("len"),
      explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("bkt"))
    base.alias("a")
      .join(probes.alias("b"),
        col("a.bkt") === col("b.bkt") && col("a.id") < col("b.id"))
      .filter(abs(col("a.len") - col("b.len")) <= maxDist)
      .withColumn("dist", levenshtein(col("a.s"), col("b.s")))
      .filter(col("dist") <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("dist").cast("long").as("dist"))
  }

  /** Resolve near-dup PAIRS into duplicate CLUSTERS: connected components
    * by min-label propagation (each node repeatedly adopts the smallest
    * label among itself and its neighbors; fixpoint = per-component min
    * id). The step every dedup pipeline runs after candidate pairs, to
    * keep one canonical doc per cluster.
    *
    * Scale: converges in O(component diameter) rounds — near-dup clusters
    * are shallow (dup families, not social graphs), so a handful of
    * joins on (id, label) pairs; lineage is truncated every round so the
    * plan doesn't grow with iterations. For adversarially deep chains,
    * switch to large-star/small-star (O(log n) rounds) — same join shape.
    *
    * @param pairs (id_a, id_b) near-dup edges
    * @return (id, cluster_id) for every id appearing in pairs */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // plain (AQE-coalesced) checkpoints: near-dup cluster frames are
    // kilobytes — a declared fixed-width layout would pin every round to
    // numShufflePartitions tasks and cost more in task overhead than the
    // avoided exchanges (measured: the KeyedCheckpoint variant ran 1.6×
    // SLOWER here, while it wins on pageRank's MB-scale edge frames)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint()
    // One propagation step. The convergence signal rides the SAME
    // aggregation that computes the new labels: each id's own old label
    // is the unique `own` row in the union, so changed = min(all) < that
    // row's label — a second join-the-old-frame pass per iteration was
    // pure scheduler overhead (this loop runs on checkpointed kilobyte
    // frames; jobs, not data, are the cost at bench scale).
    def step(l: DataFrame): DataFrame = {
      val msgs = edges.join(l, edges("src") === l("id"))
        .select(edges("dst").as("id"), l("label"))
      l.select(col("id"), col("label"), lit(true).as("own"))
        .union(msgs.select(col("id"), col("label"), lit(false).as("own")))
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"),
          (min(col("label")) < max(when(col("own"), col("label")))).as("changed"))
    }
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // THREE fused steps per materialization + convergence probe:
      // min-label propagation is idempotent at the fixpoint, so probing
      // only the last step's changed flag converges to the identical
      // labels (no change in the last step = a one-step fixpoint)
      // while cutting the round-trip job count to a third
      val next = step(step(step(labels).select(col("id"), col("label")))
        .select(col("id"), col("label"))).localCheckpoint()
      converged = next.filter(col("changed")).isEmpty
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    require(converged,
      s"components did not converge in ${3 * maxIter} propagation steps")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** BEST-of-cluster survivor selection: one representative per near-dup
    * cluster, chosen by HIGHEST score (ties → smallest id) — what real
    * curation pipelines keep, where [[duplicateClusters]]' min-id rule is
    * only a canonical label. A near-dup set usually spans quality grades
    * (the clean original, the boilerplate-wrapped scrape, the truncated
    * mirror); keeping min-id throws away quality signal that the corpus
    * already paid to compute. Docs outside any cluster are singleton
    * survivors. One corpus-sized join + one keyed window (partitioned by
    * cluster rep — never a single-partition window); deterministic, so
    * within an UNCHANGED cluster re-selection after an append keeps the
    * previous survivor unless a strictly better member arrived. An
    * append that MERGES clusters re-selects over the merged membership
    * (one survivor where there were two) — the correct dedup outcome,
    * not an instability.
    *
    * @param clusters (id, cluster_id) — [[duplicateClusters]]' shape
    * @return the surviving rows of `docs`, one per cluster */
  def bestOfCluster(docs: DataFrame, idCol: String, scoreCol: String,
                    clusters: DataFrame): DataFrame = {
    Seq("cluster_id", "__rep", "__rn").foreach(c =>
      require(!docs.columns.contains(c),
        s"bestOfCluster reserves column name '$c' but the input already has it"))
    val reps = clusters.select(col("id").as(idCol), col("cluster_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__rep"))
      .orderBy(col(scoreCol).desc, col(idCol))
    docs.join(reps, Seq(idCol), "left")
      .withColumn("__rep", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rep", "__rn", "cluster_id")
  }

  /** [[duplicateClusters]] in O(log n) rounds: alternating large-star /
    * small-star (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) for ADVERSARIALLY deep pair graphs — million-hop
    * chains converge in ~log rounds where min-label propagation needs one
    * round per hop. Same output contract as [[duplicateClusters]]:
    * (id, cluster_id = component min).
    *
    * Each round is two local-ish steps over (u, v) edge pairs only:
    *  - large-star: every node's strictly-larger neighbors link to its
    *    current minimum (star edges toward small ids);
    *  - small-star: every node's smaller-or-equal neighbors link to the
    *    minimum — after which chains have halved in height.
    * Convergence = the edge multiset is a fixpoint of large-star (every
    * node already points at its component min). Shuffles carry 16-byte
    * id pairs; lineage is truncated per round like the propagation
    * variant. */
  def duplicateClustersLogRounds(pairs: DataFrame, maxIter: Int = 40): DataFrame = {
    def canon(df: DataFrame): DataFrame =
      df.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()
    // star steps need each node's min over its neighborhood INCLUDING
    // itself; self-loops at the root (u, u) are harmless and filtered by
    // canon, so track edges canonically as u > v
    def neighborMin(sym: DataFrame): DataFrame = sym
      .groupBy(col("u")).agg(least(min(col("v")), first(col("u"))).as("m"))

    var edges = canon(pairs.select(col("id_a").as("u"), col("id_b").as("v")))
      .localCheckpoint()
    val nodes = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct()
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = neighborMin(sym)
      // large-star: (v, m(u)) for every neighbor v > u
      val large = canon(sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
      // small-star over the large-star output: (v, m(u)) for v ≤ u
      val lsym = large.union(large.select(col("v").as("u"), col("u").as("v")))
      val lmins = neighborMin(lsym)
      val next = canon(lsym.join(lmins, Seq("u"))
        .filter(col("v") <= col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(lmins.select(col("u"), col("m").as("v"))))
        .localCheckpoint()
      // fixpoint: another large-star changes nothing ⇔ edge sets equal
      converged = next.exceptAll(edges).isEmpty && edges.exceptAll(next).isEmpty
      edges = next
      iter += 1
    }
    require(converged, s"components did not converge in $maxIter rounds")
    // stars point every non-root at the component min; roots label themselves
    nodes.join(edges.select(col("u").as("id"), col("v").as("cluster_id")), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** Benchmark-contamination check: corpus documents sharing ≥ `minShared`
    * word n-grams with any probe document (the test-set-leakage scan every
    * training corpus needs before release).
    *
    * Plan shape (100 TB story): the probe side (benchmark suites — MBs,
    * not TBs) is exploded to distinct shingle hashes and BROADCAST; the
    * corpus streams through a broadcast hash join inside its scan stage —
    * zero shuffle of corpus data, output only (doc_id, probe_id, counts).
    *
    * @return (doc_id, probe_id, shared, doc_ngrams) — one row per
    *         contaminated (corpus doc, probe doc) pair */
  def contaminationPairs(corpus: DataFrame, probes: DataFrame,
                         idCol: String, textCol: String,
                         shingleN: Int = 3, minShared: Long = 1L): DataFrame = {
    val c = hashedShingleBase(corpus, idCol, textCol, shingleN, "contam")
      .select(col("id").as("doc_id"), size(col("hsh")).cast("long").as("doc_ngrams"),
        explode(col("hsh")).as("h"))
    val p = hashedShingleBase(probes, idCol, textCol, shingleN, "contam")
      .select(col("id").as("probe_id"), explode(col("hsh")).as("h"))
    c.join(broadcast(p), Seq("h"))
      .groupBy(col("doc_id"), col("probe_id"))
      .agg(count(lit(1)).as("shared"), min(col("doc_ngrams")).as("doc_ngrams"))
      .filter(col("shared") >= minShared)
  }

  /** Embedding near-dup: cosine ≥ threshold via LSH bucketing (random
    * hyperplanes) with 1-bit MULTIPROBE + exact verify on candidates —
    * every vector also probes the `planes` buckets at Hamming distance 1,
    * so pairs disagreeing on a single plane are still candidates
    * (closes the unmeasured-recall note from round 1). The hyperplane
    * matrix is md5-derived at plan time (deterministic), so the oracle
    * inlines the identical ±1 literals and reproduces buckets, probes,
    * and cosines exactly; the verified-output contract is
    * "probe-collision pairs above threshold", mirrored by the oracle.
    *
    * Plan shape (module rule 1): candidate generation joins (id, sig/psig)
    * rows ONLY — 16 bytes/row through the multiprobe exchange, not the
    * `dims`-float vectors (which made each probe row `planes+1` × payload).
    * The vectors are re-joined ONCE per side after `dropDuplicates`, so a
    * vector crosses a shuffle once per candidate pair it verifies, never
    * per probe bucket. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, planes: Int = 16,
                        dims: Int = 64): DataFrame = {
    val m = Similarity.hyperplaneMatrix(planes, dims)
    val sig = Similarity.signature(col(vecCol), m)
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val idSig = df.select(col(idCol).as("id"), sig.as("sig"))
    val probeCols = col("sig") +: (0 until planes).map(p =>
      col("sig").bitwiseXOR(lit(1L << p)))
    val probed = idSig.select(col("id"), explode(array(probeCols: _*)).as("psig"))
    val cand = probed.alias("a")
      .join(idSig.alias("b"),
        col("a.psig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al., "SemDeDup", 2023):
    * k-means-cluster the embedding space with the exact-integer IVF
    * codebook ([[Similarity.trainIvfCentroids]]), generate candidate
    * pairs only WITHIN a cluster cell, connect pairs with
    * cosine ≥ 1 − eps, and keep the min-id representative of each
    * connected semantic-duplicate component.
    *
    * Output: (id, cluster_id, keep) for EVERY input row — singletons are
    * their own cluster; `keep` marks the representative (id == cluster
    * min), so `filter(keep)` is the pruned corpus and the rest is the
    * per-cluster lineage a curation pipeline logs.
    *
    * Plan shape (module rule 1): cell assignment is a plan-literal scan
    * expression — centroids fold into the plan, no join against a
    * centroid table — and the within-cell candidate self-join moves
    * (id, cell) rows ONLY; the `dims`-float vectors join back once per
    * side for the cosine verify (the [[embeddingNearDups]] idiom with
    * cells instead of probe signatures). Never all-pairs: candidates are
    * Σ n_cell², so `numClusters` scales with the corpus
    * (n / target-cell-size) exactly like IVF search. The codebook is
    * bit-stable across partitionings (integer Lloyd means), so the
    * assignment — and therefore the output — is deterministic and the
    * oracle can RETRAIN it in SQL. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    numClusters: Int, eps: Double, iters: Int = 2): DataFrame = {
    // spelled 1.0 - eps (not a pre-computed literal) so the oracle's
    // identical IEEE subtraction yields the identical threshold double
    val centroids = Similarity.trainIvfCentroids(df, idCol, vecCol, numClusters, iters)
    val edges = semanticPairs(df, idCol, vecCol, centroids, lit(1.0) - lit(eps))
    df.select(col(idCol).as("id"))
      .join(duplicateClusters(edges), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .withColumn("keep", col("id") === col("cluster_id"))
  }

  /** Exact duplicated-SPAN removal (the substring-level dedup of Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * ACL 2022): any `windowN`-token window whose hash occurs ≥ 2 times
    * ANYWHERE in the corpus (another document, or a repeat within the
    * same one) marks its token span for removal; surviving tokens
    * reassemble in order. Document-level dedup ([[exact]]/[[minhashLsh]])
    * misses the boilerplate/license/navigation passages that repeat
    * inside otherwise-distinct pages — this is the operator that cuts
    * them at the span level.
    *
    * Windows are positional (start index kept), so the corpus-wide
    * frequency needs one shuffle of (id, pos, h) rows — 20 bytes per
    * window, never window text. The count is a count-over-window on the
    * hash partition ([[dupPassages]]'s shape). Dup starts then aggregate
    * per doc into a sorted array (size ∝ that doc's duplicated windows —
    * doc-local, not corpus-proportional) and join back to the tokenized
    * frame by id; coverage and reassembly are index-lambda projections in
    * the scan stage. Total: two shuffles of id/pos pairs + the one
    * id-keyed join every per-document rewrite pays.
    *
    * Windows HASH 60 bits; a collision could remove a non-duplicated
    * span (never corrupts order). P(any collision) < n_windows²/2^61 —
    * at 10^9 windows ≈ 0.2, so 100 TB runs should raise windowN's hash
    * via double hashing; at test scale it is vanishing and the oracle
    * replays the identical hash, so the gate stays exact.
    *
    * @return (id, clean_text, n_tokens, n_removed) one row per doc */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
                     windowN: Int = 6): DataFrame = {
    require(windowN >= 2, s"windowN must be >= 2, got $windowN")
    val seed = s"spanrm$windowN"
    // tokenized ONCE: both the window-hash explode and the per-doc
    // reassembly join consume this frame, and without the checkpoint each
    // re-runs the corpus scan + tokenize (G3 in OPTIMIZATION_r19.md)
    val toks = df.select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
      .localCheckpoint()
    // positional window hashes: starts 0 .. n-windowN (empty when n < windowN
    // — sequence(0, negative) would DESCEND, so the short-doc branch is
    // explicit); slice is 1-based on the Spark side
    val winHashes = when(size(col("ts")) < windowN, array().cast("array<long>"))
      .otherwise(transform(
        sequence(lit(0), size(col("ts")) - windowN),
        i => Hashing.h64(concat_ws(" ", slice(col("ts"), i + 1, lit(windowN))), seed)))
    val wins = toks.select(col("id"), posexplode(winHashes).as(Seq("pos", "h")))
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val dupStarts = wins.withColumn("cnt", count(lit(1)).over(byHash))
      .filter(col("cnt") >= 2)
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("pos"))).as("ss"))
    toks.join(dupStarts, Seq("id"), "left")
      .select(col("id"), col("ts"),
        coalesce(col("ss"), array().cast("array<int>")).as("ss"))
      .select(
        col("id"),
        array_join(filter(col("ts"), (t, i) =>
          !exists(col("ss"), s => s <= i && i <= s + (windowN - 1))), " ")
          .as("clean_text"),
        size(col("ts")).cast("long").as("n_tokens"),
        (size(col("ts")) - size(filter(col("ts"), (t, i) =>
          !exists(col("ss"), s => s <= i && i <= s + (windowN - 1)))))
          .cast("long").as("n_removed"))
  }

  /** Benchmark DECONTAMINATION (the GPT-3/PaLM/Llama pipeline step):
    * flag training documents that share any word n-gram with a
    * benchmark/eval set, so downstream evaluation isn't inflated by
    * memorized test items. One row per CONTAMINATED training doc:
    * `(doc_id, doc_ngrams, hits, frac)` — hits = distinct shared
    * n-grams, frac = hits / doc_ngrams (the usual removal-threshold
    * knob).
    *
    * Plan (100 TB story): the benchmark side is SMALL by definition (an
    * eval suite — thousands of documents), so its distinct shingle
    * hashes reduce to one frame that broadcasts into a LEFT SEMI join
    * against the training scan's exploded shingles — the 100 TB side
    * never shuffles shingles; matching happens in the scan stage, and
    * the only keyed aggregation is over MATCHED rows, proportional to
    * contamination found, not corpus size. Hash space is the shared
    * 60-bit [[graft.functions.ShingleHashes]] kernel, so the overlap
    * test costs one long compare per (doc-shingle, probe).
    *
    * Complements [[contaminationPairs]] (per-(doc, probe) attribution —
    * WHICH benchmark item leaked): this is the removal-decision shape,
    * and its SEMI join means a doc overlapping a thousand probes costs
    * one row, not a thousand. */
  def contamination(docs: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, shingleN: Int = 8,
                    seed: String = "decon"): DataFrame = {
    val benchHs = hashedShingleBase(bench, idCol, textCol, shingleN, seed)
      .select(explode(col("hsh")).as("hs")).distinct()
    hashedShingleBase(docs, idCol, textCol, shingleN, seed)
      .select(col("id").as("doc_id"),
        size(col("hsh")).cast("long").as("doc_ngrams"),
        explode(col("hsh")).as("hs"))
      .join(broadcast(benchHs), Seq("hs"), "left_semi")
      .groupBy(col("doc_id"), col("doc_ngrams"))
      .agg(count(lit(1)).as("hits"))
      .select(col("doc_id"), col("doc_ngrams"), col("hits"),
        round(col("hits").cast("double") / col("doc_ngrams").cast("double"), 6)
          .as("frac"))
  }

  /** [[semanticDedup]]'s candidate stage: (id_a, id_b) pairs sharing an
    * IVF cell with cosine ≥ threshold. Split out so its plan shape is
    * pinnable (the clustering step localCheckpoints, truncating lineage)
    * and reusable with an externally-trained codebook. */
  def semanticPairs(df: DataFrame, idCol: String, vecCol: String,
                    centroids: Seq[Seq[Float]], threshold: Column): DataFrame = {
    val cents = centroids.zipWithIndex.map { case (cv, i) => (i.toLong, cv) }
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val idCell = base.select(col("id"), Similarity.cellOf(cents)(col("v")).as("cell"))
    val cand = idCell.alias("a")
      .join(idCell.alias("b"), col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    cand
      .join(base.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .filter(Similarity.cosine(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }
}
