package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Sampling, TextAnalysis}
import graft.queries.{OracleSql => O}

/** The whole training-data pipeline as ONE composed, oracle-gated query:
  * fabricate multi-line pages → line-level cleaning → length gate → exact
  * dedup (keep smallest id per identical cleaned text) → decontaminate
  * against a held-out probe slice → deterministic train/val split. Proves
  * the operators COMPOSE — every stage is the same `graft.ops` code the
  * individual gates check, and the DuckDB oracle chains the same generated
  * SQL fragments, so a semantics drift in any stage breaks this row too.
  *
  * Plan shape at 100 TB: stages 1–3 are scan-stage expressions; dedup is
  * one 16-byte-digest shuffle; decontamination broadcasts probe digests;
  * the split is a plan-literal predicate — the full recipe shuffles the
  * corpus ONCE (the dedup digest exchange).
  */
object PipelineRecipe extends QueryModule {

  private val MinTokens = 20
  private val Salt = "e2e"
  private val TrainFrac = 0.9
  // per-token mean NLL cutoff (q6 units): keeps ~half the sf0.01 corpus —
  // strict and non-empty, so the gate row can't go vacuous
  private val LmThresholdQ6 = 5400000L

  def defs: Map[String, QueryDef] = Map(
    // ---- WEB-CRAWL CURATION, composed: messy-URL canonicalization →
    // URL-level dedup (first pass, no content bytes) → token-length gate
    // → embedding join → greedy k-center diversity selection of the
    // final exemplar set. Every stage is the same graft.ops code its
    // individual gate checks; the oracle chains the same canonicalization
    // SQL and re-runs the greedy loop as a recursive CTE over exactly
    // the surviving candidate set — a drift in ANY stage (a URL variant
    // not collapsing, a filter boundary, a flipped argmax) moves the
    // selected ids. Plan shape at 100 TB: scan-stage URL + token
    // expressions, ONE (url,id) shuffle for the dedup, a broadcast-sized
    // winner join, then k distributed min-distance passes with only the
    // k centers on the driver. ------------------------------------------
    "pipeline_web_curate" -> QueryDef(
      (s, d) => {
        import graft.ops.Similarity
        val withUrl = Tables.documents(s, d).select(col("doc_id"),
          TextQueries.rawUrl(col("doc_id"), col("source")).as("raw"), col("text"))
        val winners = Dedup.byUrl(withUrl, "doc_id", "raw")
          .select(col("keep_id").as("doc_id"))
        val kept = withUrl.join(winners, Seq("doc_id"))
          .filter(TextAnalysis.tokenCount(col("text")).cast("long") >= 50L)
        val cand = kept.select(col("doc_id"))
          .join(Tables.embeddings(s, d).withColumnRenamed("vec_id", "doc_id"),
            Seq("doc_id"))
        Similarity.kCenterSelect(cand, "doc_id", "embedding", k = 6)
      },
      Some {
        import graft.ops.Similarity
        val prefix =
          s"""winners AS MATERIALIZED (
             |  SELECT min(doc_id) AS doc_id FROM documents
             |  GROUP BY ${graft.ops.UrlOps.normalizeUrlSql(TextQueries.rawUrlSql)}
             |),
             |kept AS MATERIALIZED (
             |  SELECT d.doc_id FROM documents d
             |  JOIN winners w ON d.doc_id = w.doc_id
             |  WHERE len(${O.T}) >= 50
             |),
             |""".stripMargin
        Similarity.kCenterSql(6,
          s"SELECT e.vec_id AS id, ${Similarity.quantizeSql("e.embedding")} AS qv " +
            "FROM embeddings e JOIN kept k ON e.vec_id = k.doc_id",
          prefixCtes = prefix)
      }),

    "pipeline_e2e" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val fab = docs.select(col("doc_id"),
          concat(
            regexp_replace(col("text"), " merge ", "\n"),
            lit("\n12 345 6789\npage "), col("doc_id").cast("string"),
            lit(" of 999\nkeep these three words")).as("t"))
        val cleaned = fab.select(col("doc_id"),
          TextAnalysis.cleanLines(col("t"), minWords = 3, maxDigitRatio = 0.3).as("clean"))
        val gated = cleaned
          .select(col("doc_id"), col("clean"),
            TextAnalysis.tokenCount(col("clean")).cast("long").as("n_tokens"))
          .filter(col("n_tokens") >= MinTokens)
        val keepIds = Dedup.exact(gated, "doc_id", "clean")
          .select(col("keep_id").as("doc_id"))
        val deduped = gated.join(keepIds, Seq("doc_id"))
        val decon = Sampling.decontaminate(
          deduped.filter(col("doc_id") % 13 =!= 0),
          deduped.filter(col("doc_id") % 13 === 0), "clean")
        Sampling.assignSplit(decon, "doc_id",
            Seq("train" -> TrainFrac, "val" -> (1.0 - TrainFrac)), Salt)
          .select(col("doc_id"), col("split"), col("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some {
        val toks = O.tokensSql("clean")
        val thr = Sampling.threshold32(TrainFrac)
        s"""WITH fab AS (
           |  SELECT doc_id, replace(text, ' merge ', chr(10))
           |    || chr(10) || '12 345 6789' || chr(10) || 'page '
           |    || CAST(doc_id AS VARCHAR) || ' of 999' || chr(10)
           |    || 'keep these three words' AS t
           |  FROM documents
           |), cleaned AS (
           |  SELECT doc_id, ${graft.ops.TextAnalysis.cleanLinesSql("t", 3, 0.3)} AS clean
           |  FROM fab
           |), gated AS (
           |  SELECT doc_id, clean, len($toks) AS n_tokens FROM cleaned
           |  WHERE len($toks) >= $MinTokens
           |), keep AS (
           |  SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(clean)
           |), deduped AS (
           |  SELECT g.* FROM gated g JOIN keep k ON g.doc_id = k.doc_id
           |), fp AS (
           |  SELECT doc_id, n_tokens,
           |    md5(array_to_string(list_sort(list_distinct($toks)), ' ')) AS f
           |  FROM deduped
           |), decon AS (
           |  SELECT * FROM fp c WHERE c.doc_id % 13 <> 0
           |  AND NOT EXISTS (SELECT 1 FROM fp p WHERE p.doc_id % 13 = 0 AND p.f = c.f)
           |)
           |SELECT doc_id,
           |  CASE WHEN ${O.h32Sql("CAST(doc_id AS VARCHAR)", Salt)} < $thr
           |       THEN 'train' ELSE 'val' END AS split,
           |  n_tokens
           |FROM decon ORDER BY doc_id""".stripMargin
      }),

    // The CURATION side of the pipeline, composed from this round's ops:
    // Gopher structural gate (word-count floor live on this corpus; the
    // symbol/bullet/ellipsis/alpha caps compose in the same predicate) →
    // quality scoring → per-source percentile gate (top 50% by quality)
    // → domain-mixture resampling (fractional epochs). Every stage is the
    // same ops code the individual gates check; the oracle chains the
    // same SQL fragments.
    //
    // Plan shape at 100 TB: the Gopher gate and scoring are scan-stage;
    // the percentile gate is a broadcast cutoff; the resample explode is
    // scan-stage — no added shuffle.
    "pipeline_curate" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"),
            TextAnalysis.tokens(col("text")).as("ts"))
          .filter(TextAnalysis.gopherKeep(col("text"), col("ts"),
            minWords = 30, maxWords = 10000))
        val scored = docs
          .select(col("doc_id"), col("source"),
            TextAnalysis.qualityScoreFromTokens(col("text"), col("ts")).as("quality"))
        val gated = Sampling.percentileGate(scored, "source", "doc_id",
          col("quality"), keepFrac = 0.5)
        Sampling.mixtureResample(gated, "source", "doc_id",
            Map("src3" -> 2.0, "src7" -> 0.5, "src1" -> 0.0),
            defaultWeight = 1.0, salt = "cur")
          .select(col("doc_id"), col("source"), col("quality"), col("epoch"))
          .orderBy(col("doc_id"), col("epoch"))
      },
      Some {
        val q = O.qualitySql("text")
        val gopher = TextAnalysis.gopherKeepSql("text", O.T, 30, 10000,
          3.0, 10.0, 0.1, 0.9, 0.3, 0.8)
        s"""WITH scored AS (
           |  SELECT doc_id, source, $q AS quality FROM documents
           |  WHERE $gopher
           |), ranked AS (
           |  SELECT doc_id, source, quality,
           |    CAST(row_number() OVER (PARTITION BY source
           |      ORDER BY quality DESC, ${O.h32Sql("doc_id", "pctl")}, doc_id) AS BIGINT) AS rk,
           |    count(*) OVER (PARTITION BY source) AS n
           |  FROM scored
           |), gated AS (
           |  SELECT doc_id, source, quality FROM ranked
           |  WHERE rk <= CAST(ceil(0.5 * CAST(n AS DOUBLE)) AS BIGINT)
           |), w AS (
           |  SELECT doc_id, source, quality,
           |    CASE WHEN source = 'src7' THEN 0.5
           |         WHEN source = 'src3' THEN 2.0
           |         WHEN source = 'src1' THEN 0.0 ELSE 1.0 END AS wt,
           |    CAST(${O.h32Sql("CAST(doc_id AS VARCHAR)", "cur")} AS DOUBLE) AS coin
           |  FROM gated
           |), r AS (
           |  SELECT doc_id, source, quality,
           |    CAST(floor(wt) AS BIGINT) +
           |      (CASE WHEN coin < (wt - floor(wt)) * 4294967296.0 THEN 1 ELSE 0 END) AS reps
           |  FROM w
           |)
           |SELECT doc_id, source, quality, unnest(range(0, reps)) AS epoch
           |FROM r WHERE reps > 0 ORDER BY doc_id, epoch""".stripMargin
      }),

    // LEAKAGE-SAFE train/val split: near-duplicate docs MUST land in the
    // same split, or val is contaminated by train's near-copies — so the
    // split coin is thrown on the doc's duplicate-CLUSTER id (min-label
    // component of the minhash pairs; unclustered docs are their own
    // cluster). Composes the same minhash/cluster machinery dedup_clusters
    // gates with the same split coin sample_split gates; the oracle
    // chains the recursive-CTE transitive closure with the split CASE.
    "pipeline_split_safe" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val clusters = graft.ops.Dedup.duplicateClusters(
          graft.ops.Dedup.minhashLsh(docs, "doc_id", "text",
            shingleN = 2, numHashes = 128, bands = 32, threshold = 0.5))
        val withCluster = docs.select(col("doc_id"))
          .join(clusters, docs("doc_id") === clusters("id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        Sampling.assignSplit(withCluster, "cluster_id",
            Seq("train" -> 0.9, "val" -> 0.1), salt = "safe")
          .select(col("doc_id"), col("cluster_id"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE ${DedupQueries.minhashCtes},
              |pairs AS MATERIALIZED (SELECT id_a, id_b FROM scored WHERE j >= 0.5),
              |edges AS (
              |  SELECT id_a AS a, id_b AS b FROM pairs
              |  UNION ALL SELECT id_b AS a, id_a AS b FROM pairs
              |), reach AS (
              |  SELECT a AS node, a AS r FROM edges
              |  UNION
              |  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON e.b = reach.node
              |), cl AS (
              |  SELECT node AS id, min(r) AS cluster_id FROM reach GROUP BY node
              |), wc AS (
              |  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
              |  FROM documents d LEFT JOIN cl ON cl.id = d.doc_id
              |)
              |SELECT doc_id, cluster_id,
              |  CASE WHEN ${O.h32Sql("cluster_id", "safe")} < ${Sampling.threshold32(0.9)}
              |       THEN 'train' ELSE 'val' END AS split
              |FROM wc ORDER BY doc_id""".stripMargin)),

    // The TOKENIZER-READY side of the pipeline, composed from the round-7
    // ops: corpus-trained LM perplexity gate (keep per-token mean NLL
    // under a cutoff) → BPE piece counts under the frozen fixture merges
    // → per-shard sequence packing over piece counts. The oracle chains
    // the shared LM CTEs (TextQueries.lmNllCtes), the generated BPE
    // replace-SQL, and the pack window — a drift in any stage breaks this
    // row AND the stage's own gate.
    //
    // Plan shape at 100 TB: LM scoring and BPE counting are one scan
    // stage (two kernel calls per row over one materialized token array);
    // the gate is a scan predicate; packing is one window per shard — the
    // whole recipe shuffles the corpus once.
    "pipeline_pretrain" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val lm = graft.ops.LanguageModel.train(docs, "text", maxVocab = 50, maxBigrams = 300)
        val merges = TextAnalysis.trainBpeFromCounts(TextQueries.BpeFixtureCounts, 24)
        val staged = docs
          .select(col("doc_id"), col("source"), TextAnalysis.tokens(col("text")).as("ts"))
          .select(col("doc_id"), col("source"),
            size(col("ts")).cast("long").as("n_tokens"),
            graft.ops.LanguageModel.nllQ6Col(col("ts"), lm).as("nll_q6"),
            size(graft.functions.BpeEncode.of(col("ts"), merges)).cast("long").as("n_pieces"))
        val kept = staged.filter(col("nll_q6") <= lit(LmThresholdQ6) * col("n_tokens"))
        Sampling.packChunks(kept, "source", "doc_id", col("n_pieces"),
            contextLen = 256, salt = "pp")
          .orderBy(col("shard"), col("id"))
      },
      Some {
        val merges = TextAnalysis.trainBpeFromCounts(TextQueries.BpeFixtureCounts, 24)
        val enc = TextAnalysis.bpeEncodeSql("w", merges)
        val tokensOfText = O.tokensSql("text")
        s"""WITH ${TextQueries.lmNllCtes(50, 300)},
           |lmdocs AS (
           |  SELECT d.doc_id, d.source, d.text,
           |    CAST(len($tokensOfText) AS BIGINT) AS n_tokens,
           |    coalesce(a.nll_q6, 0) AS nll_q6
           |  FROM documents d LEFT JOIN agg a USING (doc_id)),
           |kept AS (
           |  SELECT * FROM lmdocs WHERE nll_q6 <= $LmThresholdQ6 * n_tokens),
           |enc AS (
           |  SELECT doc_id, source,
           |    CAST(length(pw) - length(replace(pw, chr(31), '')) AS BIGINT) AS n_pieces
           |  FROM (SELECT doc_id, source,
           |          array_to_string(list_transform($tokensOfText, w -> $enc), '') AS pw
           |        FROM kept)),
           |t AS (
           |  SELECT source AS shard, doc_id AS id, n_pieces AS n_tokens,
           |    ${O.h32Sql("CAST(doc_id AS VARCHAR)", "pp")} AS coin
           |  FROM enc),
           |packed AS (
           |  SELECT shard, id, n_tokens,
           |    CAST(SUM(n_tokens) OVER (
           |      PARTITION BY shard ORDER BY coin, id
           |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_tok
           |  FROM t)
           |SELECT shard, id, n_tokens, start_tok,
           |  CAST(start_tok // 256 AS BIGINT) AS chunk_first,
           |  CAST((start_tok + greatest(n_tokens - 1, 0)) // 256 AS BIGINT) AS chunk_last
           |FROM packed ORDER BY shard, id""".stripMargin
      }),

    // The pretraining-SELECTION stack users actually run, composed:
    // LM-quality gate (nll/token threshold — the pipeline_pretrain
    // scorer) → DSIR importance selection toward a target domain
    // (sample_dsir, over the KEPT pool) → temperature-α=½ domain
    // mixture over the selected docs (sample_temperature) → packChunks
    // accounting (pack_chunks). Every stage is the same ops code its
    // individual gate checks; this row proves they COMPOSE, and the
    // oracle chains the same SQL fragments over the staged pools.
    //
    // Plan shape at 100 TB: the LM gate is a scan-stage expression;
    // DSIR shuffles exploded (id, bucket) longs once and broadcasts
    // bucket weights back; the k selected ids broadcast into the pool
    // join; mixture rates broadcast; packing shuffles (shard, id,
    // n_tokens) rows. NO exchange anywhere carries the text column —
    // PlanSpec pins that (the corpus is scanned, scored, and reduced to
    // ids + counts in the scan stage).
    "pipeline_select" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val lm = graft.ops.LanguageModel.train(docs, "text", maxVocab = 50,
          maxBigrams = 300)
        val staged = docs
          .select(col("doc_id"), col("source"), col("text"),
            TextAnalysis.tokens(col("text")).as("ts"))
          .select(col("doc_id"), col("source"), col("text"),
            size(col("ts")).cast("long").as("n_tokens"),
            graft.ops.LanguageModel.nllQ6Col(col("ts"), lm).as("nll_q6"))
        val kept = staged.filter(col("nll_q6") <= lit(LmThresholdQ6) * col("n_tokens"))
        val sel = Sampling.dsirSelect(kept, "doc_id", "text",
          col("source") === "src0", buckets = 512, k = 100)
        val pool = kept.join(broadcast(sel.select(col("id").as("doc_id"))),
          Seq("doc_id"))
        val mixed = Sampling.temperatureResample(pool, "source", "doc_id",
          col("n_tokens"), budget = 1500L, salt = "psm")
        Sampling.packChunks(mixed, "source", "doc_id", col("n_tokens"),
            contextLen = 256, salt = "psp")
          .orderBy(col("shard"), col("id"))
      },
      Some {
        val tokensOfText = O.tokensSql("text")
        val P = graft.functions.PortableMath
        val B = 512
        s"""WITH ${TextQueries.lmNllCtes(50, 300)},
           |lmdocs AS (
           |  SELECT d.doc_id, d.source, d.text,
           |    CAST(len($tokensOfText) AS BIGINT) AS n_tokens,
           |    coalesce(a.nll_q6, 0) AS nll_q6
           |  FROM documents d LEFT JOIN agg a USING (doc_id)),
           |kept AS MATERIALIZED (
           |  SELECT doc_id, source, text, n_tokens FROM lmdocs
           |  WHERE nll_q6 <= $LmThresholdQ6 * n_tokens),
           |dex AS MATERIALIZED (
           |  SELECT id, is_t, (${graft.functions.Hashing.h64Sql("tok", "dsir")}) % $B AS b
           |  FROM (SELECT doc_id AS id, source = 'src0' AS is_t,
           |          unnest($tokensOfText) AS tok FROM kept)
           |), dcounts AS MATERIALIZED (
           |  SELECT b,
           |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) + 1 AS xt,
           |    CAST(sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS BIGINT) + 1 AS xr
           |  FROM dex GROUP BY b
           |), dw1 AS (
           |  SELECT b, ${P.mWideSql("xt")} AS mt, ${P.biasWideSql("xt")} AS bt,
           |    ${P.mWideSql("xr")} AS mr, ${P.biasWideSql("xr")} AS br FROM dcounts
           |), dw2 AS (
           |  SELECT b, ${P.zSql("mt")} AS zt, bt, ${P.zSql("mr")} AS zr, br FROM dw1
           |), dw3 AS (
           |  SELECT b, zt, (zt * zt) AS zzt, bt, zr, (zr * zr) AS zzr, br FROM dw2
           |), dwq AS MATERIALIZED (
           |  SELECT b, CAST(floor((${P.lnFromPartsSql("zt", "zzt", "bt")}
           |    - ${P.lnFromPartsSql("zr", "zzr", "br")}) * 1.0E9 + 0.5E0) AS BIGINT) AS delta_q
           |  FROM dw3
           |), dtot0 AS (
           |  SELECT CAST(sum(xt - 1) AS BIGINT) + $B AS tt,
           |    CAST(sum(xr - 1) AS BIGINT) + $B AS tr FROM dcounts
           |), dg1 AS (
           |  SELECT ${P.mWideSql("tt")} AS mt, ${P.biasWideSql("tt")} AS bt,
           |    ${P.mWideSql("tr")} AS mr, ${P.biasWideSql("tr")} AS br FROM dtot0
           |), dg2 AS (
           |  SELECT ${P.zSql("mt")} AS zt, bt, ${P.zSql("mr")} AS zr, br FROM dg1
           |), dg3 AS (
           |  SELECT zt, (zt * zt) AS zzt, bt, zr, (zr * zr) AS zzr, br FROM dg2
           |), dcq AS MATERIALIZED (
           |  SELECT CAST(floor((${P.lnFromPartsSql("zr", "zzr", "br")}
           |    - ${P.lnFromPartsSql("zt", "zzt", "bt")}) * 1.0E9 + 0.5E0) AS BIGINT) AS const_q
           |  FROM dg3
           |), sel AS MATERIALIZED (
           |  SELECT id FROM (
           |    SELECT id, CAST(sum(delta_q + const_q) AS BIGINT) AS score_q9
           |    FROM dex JOIN dwq USING (b) CROSS JOIN dcq
           |    WHERE NOT is_t GROUP BY id
           |    ORDER BY score_q9 DESC, id LIMIT 100)
           |), pool AS MATERIALIZED (
           |  SELECT k.doc_id, k.source, k.n_tokens
           |  FROM kept k JOIN sel s ON s.id = k.doc_id
           |), tt AS (
           |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tt
           |  FROM pool GROUP BY source
           |), tw AS (
           |  SELECT source, tt,
           |    CAST(floor(sqrt(CAST(tt AS DOUBLE)) * 1.0E6 + 0.5E0) AS BIGINT) AS wq
           |  FROM tt
           |), tsw AS (
           |  SELECT CAST(sum(wq) AS BIGINT) AS sw FROM tw
           |), mixed AS MATERIALIZED (
           |  SELECT p.doc_id, p.source, p.n_tokens
           |  FROM pool p JOIN tw USING (source) CROSS JOIN tsw
           |  WHERE CAST(${O.h32Sql("doc_id", "psm")} AS DOUBLE) <
           |    (CASE WHEN tt > 0 THEN least(1.0, (1500.0E0 * CAST(wq AS DOUBLE)) /
           |      (CAST(sw AS DOUBLE) * CAST(tt AS DOUBLE))) ELSE 0.0E0 END) * 4294967296.0
           |), pt AS (
           |  SELECT source AS shard, doc_id AS id, n_tokens,
           |    ${O.h32Sql("CAST(doc_id AS VARCHAR)", "psp")} AS coin
           |  FROM mixed
           |), packed AS (
           |  SELECT shard, id, n_tokens,
           |    CAST(SUM(n_tokens) OVER (
           |      PARTITION BY shard ORDER BY coin, id
           |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_tok
           |  FROM pt)
           |SELECT shard, id, n_tokens, start_tok,
           |  CAST(start_tok // 256 AS BIGINT) AS chunk_first,
           |  CAST((start_tok + greatest(n_tokens - 1, 0)) // 256 AS BIGINT) AS chunk_last
           |FROM packed ORDER BY shard, id""".stripMargin
      }),

    // The incremental-corpus LIFECYCLE a production pipeline runs daily,
    // composed over the REAL Delta write path and replayed by the oracle
    // from the raw batches: create with a live CHECK constraint →
    // appendNovel day-1 batch → replay the same batch (content-idempotent
    // no-op) → day-2 batch → a poisoned ingest lands → restoreTo rolls
    // the corpus back (one commit) → day-3 batch proceeds against the
    // RESTORED digest set. Every stage is the same ops/delta code the
    // individual gates check (dedup_incremental, ref_constraints,
    // ref_restore); this row proves they compose — and that the rollback
    // actually forgets the poisoned digests (batch 3 must land in full).
    //
    // Plan shape at 100 TB: three digest-only anti-join shuffles (one per
    // batch), constraint checks fused into the write jobs, restore is a
    // metadata-only commit. Nothing here scans the corpus text twice.
    // The INCREMENTAL curation loop, end to end through the streaming
    // source: raw docs land in a Delta table in two generations; a
    // graft-delta stream tails it and each micro-batch quality-filters
    // then exact-dedups (appendNovel) into the curated table — the
    // delta→delta shape every continuously-growing 100 TB corpus
    // pipeline runs. Batch order is deterministic (the snapshot batch
    // drains before generation 2 is appended), so first-batch-wins
    // dedup is oracle-expressible: winner per digest = generation
    // order, then smallest id. --------------------------------------
    "pipeline_stream_curate" -> QueryDef(
      (s, d) => {
        val rawDir = graft.Scratch.dir("graft-pstream-raw") + "/t"
        val curDir = graft.Scratch.dir("graft-pstream-cur") + "/t"
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("text"))
        val raw = graft.delta.DeltaTable.forPath(s, rawDir).create(docs.schema)
        val cur = graft.delta.DeltaTable.forPath(s, curDir).create(
          org.apache.spark.sql.types.StructType(docs.schema.fields :+
            org.apache.spark.sql.types.StructField("digest",
              org.apache.spark.sql.types.StringType)))
        raw.append(docs.filter(col("doc_id") % 2 === 0)) // generation 1
        val q = s.readStream.format("graft-delta").option("path", rawDir).load()
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            Dedup.appendNovel(cur, batch.filter(length(col("text")) >= 100),
              "doc_id", "text")
            ()
          }
          .option("checkpointLocation", graft.Scratch.dir("graft-pstream-ck"))
          .start()
        try {
          q.processAllAvailable() // drain generation 1 first (determinism)
          raw.append(docs.filter(col("doc_id") % 2 =!= 0)) // generation 2
          q.processAllAvailable()
        } finally q.stop()
        graft.delta.DeltaTable.forPath(s, curDir).toDF
          .select(col("doc_id"), col("source")).orderBy(col("doc_id"))
      },
      Some("""WITH kept AS (
             |  SELECT doc_id, source, md5(text) AS dg FROM documents
             |  WHERE length(text) >= 100)
             |SELECT doc_id, source FROM kept
             |QUALIFY row_number() OVER (
             |  PARTITION BY dg ORDER BY doc_id % 2, doc_id) = 1
             |ORDER BY doc_id""".stripMargin)),

    "pipeline_incremental" -> QueryDef(
      (s, d) => {
        val dir = graft.Scratch.dir("graft-pincr")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val schema = org.apache.spark.sql.types.StructType(docs.schema.fields :+
          org.apache.spark.sql.types.StructField("digest",
            org.apache.spark.sql.types.StringType))
        val t = graft.delta.DeltaTable.forPath(s, dir).create(schema)
        // enforcement fuses into every append job below (a violating row
        // would fail its batch; DeltaSpec pins that behavior)
        t.addCheckConstraint("nonempty_text", "length(text) > 0")
        require(Dedup.appendNovel(t, docs.filter(col("doc_id") % 3 === 0),
          "doc_id", "text") >= 0, "day-1 batch must commit")
        require(Dedup.appendNovel(t, docs.filter(col("doc_id") % 3 === 0),
          "doc_id", "text") == -1L, "replayed day-1 batch must be a no-op")
        Dedup.appendNovel(t, docs.filter(col("doc_id") % 3 === 1), "doc_id", "text")
        val good = t.log.latestVersion()
        // the poison passes the CHECK (the damage is semantic, not
        // structural) — the recovery lever is the rollback, not the gate
        val bad = docs.filter(col("doc_id") % 3 === 2)
          .withColumn("text", concat(lit("POISONED "), col("text")))
        require(Dedup.appendNovel(t, bad, "doc_id", "text") >= 0,
          "poisoned batch must land before the rollback")
        t.restoreTo(good)
        Dedup.appendNovel(t, docs.filter(col("doc_id") % 3 === 2), "doc_id", "text")
        graft.delta.DeltaTable.forPath(s, dir).toDF
          .select(col("doc_id"), col("digest")).orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, md5(text) AS digest FROM documents),
             |b1 AS (
             |  SELECT digest, min(doc_id) AS doc_id FROM d
             |  WHERE doc_id % 3 = 0 GROUP BY digest),
             |b2 AS (
             |  SELECT digest, min(doc_id) AS doc_id FROM d
             |  WHERE doc_id % 3 = 1 AND digest NOT IN (SELECT digest FROM b1)
             |  GROUP BY digest),
             |b3 AS (
             |  SELECT digest, min(doc_id) AS doc_id FROM d
             |  WHERE doc_id % 3 = 2 AND digest NOT IN (
             |    SELECT digest FROM b1 UNION ALL SELECT digest FROM b2)
             |  GROUP BY digest)
             |SELECT doc_id, digest FROM (
             |  SELECT * FROM b1 UNION ALL SELECT * FROM b2
             |  UNION ALL SELECT * FROM b3)
             |ORDER BY doc_id""".stripMargin)),

    // The CDF consumption story: a per-source corpus report maintained
    // INCREMENTALLY from the change feed — inserts/update_postimages add,
    // deletes/update_preimages subtract — across a four-version lifecycle
    // (two appends, a length-based purge, a re-measure update). The query
    // require()s the folded feed equals a direct aggregate of the final
    // table (the incremental-view-maintenance identity), then returns
    // the fold; the oracle computes the final state analytically from
    // raw documents. At 100 TB the fold reads only the day's change
    // files — this row is the proof the feed carries exactly enough to
    // keep a downstream aggregate consistent without table rescans.
    "pipeline_cdf_report" -> QueryDef(
      (s, d) => {
        val dir = graft.Scratch.dir("graft-cdfpipe")
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val t = graft.delta.DeltaTable.forPath(s, dir).create(docs.schema,
          configuration = Map(graft.delta.DeltaTable.CdfConfigKey -> "true"))
        t.append(docs.filter(col("doc_id") % 2 === 0))
        t.append(docs.filter(col("doc_id") % 2 =!= 0))
        require(t.delete(col("n_chars") < 120) == 3L, "purge must commit at v3")
        require(t.update(col("doc_id") % 10 === 0,
          Map("n_chars" -> (col("n_chars") + 1000L))) == 4L, "re-measure must commit at v4")
        val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L)
        val folded = t.changes(1L, 4L)
          .groupBy(col("source"))
          .agg(sum(sign).as("n_docs"),
            sum(sign * col("n_chars")).cast("long").as("sum_chars"))
        val direct = t.toDF.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
        val fRows = folded.collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        val dRows = direct.collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        require(fRows == dRows,
          s"feed fold diverged from the table: fold=$fRows direct=$dRows")
        folded.orderBy(col("source"))
      },
      Some("""WITH fin AS (
             |  SELECT source,
             |    CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END AS nc
             |  FROM documents WHERE n_chars >= 120
             |)
             |SELECT source, count(*) AS n_docs, CAST(sum(nc) AS BIGINT) AS sum_chars
             |FROM fin GROUP BY source ORDER BY source""".stripMargin))
  )
}
