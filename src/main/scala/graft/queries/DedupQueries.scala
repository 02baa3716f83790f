package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Dedup
import graft.queries.{OracleSql => O}

/** Deduplication operators as verifiable queries over `documents` /
  * `embeddings`. ALL five variants — including the probabilistic ones —
  * carry full DuckDB oracles: signatures and buckets are md5-derived
  * (graft.functions.Hashing), so the oracle recomputes them exactly and
  * the driver's hash gate compares complete outputs. Small-n ground-truth
  * recall checks live in DedupSpec.
  */
object DedupQueries extends QueryModule {

  /** The dedup_passage_probe gate's probe passage: the 8-token PREFIX of
    * the smallest doc_id whose prefix recurs in the corpus — so the probe
    * provably finds docs BEYOND itself (a self-match-only gate would pin
    * one row). Shared by the QueryDef and the bench's split
    * build-vs-probe passage leg, so both time the same served path. */
  def passageProbeText(corpus: org.apache.spark.sql.DataFrame): String = {
    val pref = concat_ws(" ",
      slice(graft.ops.TextAnalysis.tokens(col("text")), 1, 8))
    val probeDoc = corpus
      .filter(size(graft.ops.TextAnalysis.tokens(col("text"))) >= 8)
      .select(col("doc_id"), pref.as("p"))
      .groupBy(col("p"))
      .agg(min(col("doc_id")).as("d"), count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .agg(min(col("d"))).head().getLong(0)
    corpus.filter(col("doc_id") === probeDoc)
      .select(concat_ws(" ",
        slice(graft.ops.TextAnalysis.tokens(col("text")), 1, 8)))
      .head().getString(0)
  }

  /** The minhash-LSH pipeline as a reusable CTE chain ending in
    * `scored(id_a, id_b, j)` — shared by the pair query and the cluster
    * query so both oracles stay in lockstep with Dedup.minhashLsh. */
  private[queries] val minhashCtes: String =
    s"""base AS (
       |  SELECT doc_id AS id, ${O.shingles(2)} AS sh FROM documents
       |), hashed AS (
       |  SELECT id, list_distinct(list_transform(sh, s -> ${graft.functions.Hashing.h64Sql("s", "mh")})) AS hsh
       |  FROM base
       |), ex0 AS MATERIALIZED (
       |  SELECT id, CAST(len(hsh) AS BIGINT) AS sz, unnest(hsh) AS h FROM hashed
       |), ex AS (
       |  SELECT id, sz, (h & 4294967295) AS x FROM ex0
       |), sigs AS MATERIALIZED (
       |  SELECT id, ${O.minhashAggArray("x", 128)} AS mh FROM ex GROUP BY id
       |), banded AS MATERIALIZED (
       |  ${O.bandedUnion(bands = 32, rows = 4)}
       |), cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
       |), o AS (
       |  SELECT c.id_a, c.id_b, count(*) AS o, min(xa.sz) AS sz_a, min(xb.sz) AS sz_b
       |  FROM cand c JOIN ex0 xa ON c.id_a = xa.id JOIN ex0 xb ON c.id_b = xb.id AND xa.h = xb.h
       |  GROUP BY c.id_a, c.id_b
       |), scored AS MATERIALIZED (
       |  SELECT id_a, id_b,
       |    CAST(o AS DOUBLE) / CAST(sz_a + sz_b - o AS DOUBLE) AS j FROM o
       |)""".stripMargin

  /** Exact-Jaccard pair SQL over the regenerated Zipf corpus — shared by
    * the brute and prefix rows (losslessness proof on the Zipf regime). */
  private val zipfPairsOracle: String =
    s"""WITH zipf AS (
       |  ${graft.ops.ZipfCorpus.corpusSql()}
       |), base AS (
       |  SELECT doc_id AS id, ${O.shingles(2)} AS sh FROM zipf
       |), hashed AS (
       |  SELECT id, list_distinct(list_transform(sh, s -> ${graft.functions.Hashing.h64Sql("s", "cooc")})) AS hsh
       |  FROM base
       |), ex AS MATERIALIZED (
       |  SELECT id, CAST(len(hsh) AS BIGINT) AS sz, unnest(hsh) AS hs FROM hashed
       |), o AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS o,
       |    min(a.sz) AS sz_a, min(b.sz) AS sz_b
       |  FROM ex a JOIN ex b ON a.hs = b.hs AND a.id < b.id
       |    AND CAST(a.sz AS DOUBLE) >= 0.5 * b.sz
       |    AND CAST(b.sz AS DOUBLE) >= 0.5 * a.sz
       |  GROUP BY a.id, b.id
       |), scored AS (
       |  SELECT id_a, id_b,
       |    CAST(o AS DOUBLE) / CAST(sz_a + sz_b - o AS DOUBLE) AS j
       |  FROM o
       |)
       |SELECT id_a, id_b, round(j, 6) AS jaccard FROM scored
       |WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin

  def defs: Map[String, QueryDef] = Map(
    // ---- URL dedup (keep lowest doc per canonical URL): the messy-URL
    // fixture from TextQueries (shared so the two gates cannot drift)
    // through Dedup.byUrl vs DuckDB's independent canonicalization +
    // GROUP BY. Param-order/tracking/port/case variants must land in ONE
    // group each. --------------------------------------------------------
    "dedup_url" -> QueryDef(
      (s, d) =>
        graft.ops.Dedup.byUrl(
          Tables.documents(s, d).select(col("doc_id"),
            TextQueries.rawUrl(col("doc_id"), col("source")).as("raw")),
          "doc_id", "raw")
          .orderBy(col("keep_id")),
      Some(s"""SELECT ${graft.ops.UrlOps.normalizeUrlSql(TextQueries.rawUrlSql)} AS canon_url,
              |  min(doc_id) AS keep_id, count(*) AS n_copies
              |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin),
      headline = true),

    // ---- the same URL dedup through the PURE SQL surface
    // (graft_url_normalize, installed by GraftExtensions): shares
    // dedup_url's oracle, so the SQL function and the Column API are
    // proven to build the same kernel end-to-end. ------------------------
    "dedup_url_sql" -> QueryDef(
      (s, d) => {
        Tables.documents(s, d).createOrReplaceTempView("graft_sql_docs_url")
        s.sql(s"""WITH raw AS (
                 |  SELECT doc_id, ${TextQueries.rawUrlSql.replace("AS VARCHAR", "AS STRING")} AS u
                 |  FROM graft_sql_docs_url
                 |)
                 |SELECT graft_url_normalize(u) AS canon_url,
                 |  min(doc_id) AS keep_id, count(1) AS n_copies
                 |FROM raw GROUP BY graft_url_normalize(u)
                 |ORDER BY keep_id""".stripMargin)
      },
      Some(s"""SELECT ${graft.ops.UrlOps.normalizeUrlSql(TextQueries.rawUrlSql)} AS canon_url,
              |  min(doc_id) AS keep_id, count(*) AS n_copies
              |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin)),

    "dedup_exact" -> QueryDef(
      (s, d) =>
        Dedup.exact(Tables.documents(s, d), "doc_id", "text")
          .orderBy(col("keep_id")),
      Some("""SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin),
      headline = true),

    "dedup_ngram_jaccard" -> QueryDef(
      (s, d) =>
        Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
            shingleN = 2, threshold = 0.5)
          .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH base AS (
              |  SELECT doc_id AS id, ${O.shingles(2)} AS sh FROM documents
              |), hashed AS (
              |  SELECT id, list_distinct(list_transform(sh, s -> ${graft.functions.Hashing.h64Sql("s", "cooc")})) AS hsh
              |  FROM base
              |), ex AS MATERIALIZED (
              |  SELECT id, CAST(len(hsh) AS BIGINT) AS sz, unnest(hsh) AS hs FROM hashed
              |), o AS (
              |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS o,
              |    min(a.sz) AS sz_a, min(b.sz) AS sz_b
              |  FROM ex a JOIN ex b ON a.hs = b.hs AND a.id < b.id
              |    AND CAST(a.sz AS DOUBLE) >= 0.5 * b.sz
              |    AND CAST(b.sz AS DOUBLE) >= 0.5 * a.sz
              |  GROUP BY a.id, b.id
              |), scored AS (
              |  SELECT id_a, id_b,
              |    CAST(o AS DOUBLE) / CAST(sz_a + sz_b - o AS DOUBLE) AS j
              |  FROM o
              |)
              |SELECT id_a, id_b, round(j, 6) AS jaccard FROM scored
              |WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    // Asymmetric containment: o / min(|A|,|B|) — the subset/quote
    // detector Jaccard misses. No size prune (size-incompatible pairs
    // are the point); oracle is the brute pair join with the containment
    // formula.
    "dedup_containment" -> QueryDef(
      (s, d) =>
        Dedup.ngramContainmentPairs(Tables.documents(s, d), "doc_id", "text",
            shingleN = 2, threshold = 0.6)
          .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH base AS (
              |  SELECT doc_id AS id, ${O.shingles(2)} AS sh FROM documents
              |), hashed AS (
              |  SELECT id, list_distinct(list_transform(sh, s -> ${graft.functions.Hashing.h64Sql("s", "cooc")})) AS hsh
              |  FROM base
              |), ex AS MATERIALIZED (
              |  SELECT id, CAST(len(hsh) AS BIGINT) AS sz, unnest(hsh) AS hs FROM hashed
              |), o AS (
              |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS o,
              |    min(a.sz) AS sz_a, min(b.sz) AS sz_b
              |  FROM ex a JOIN ex b ON a.hs = b.hs AND a.id < b.id
              |  GROUP BY a.id, b.id
              |), scored AS (
              |  SELECT id_a, id_b,
              |    CAST(o AS DOUBLE) / CAST(least(sz_a, sz_b) AS DOUBLE) AS c
              |  FROM o
              |)
              |SELECT id_a, id_b, round(c, 6) AS containment FROM scored
              |WHERE c >= 0.6 ORDER BY id_a, id_b""".stripMargin)),

    // Same exact-Jaccard contract via prefix filtering (rarity-ordered
    // prefixes, lossless) — output bit-identical to dedup_ngram_jaccard,
    // so the brute-force SQL above is reused verbatim: the driver's hash
    // gate doubles as the losslessness proof.
    "dedup_ngram_prefix" -> QueryDef(
      (s, d) =>
        Dedup.ngramJaccardPairsPrefix(Tables.documents(s, d), "doc_id", "text",
            shingleN = 2, threshold = 0.5)
          .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH base AS (
              |  SELECT doc_id AS id, ${O.shingles(2)} AS sh FROM documents
              |), hashed AS (
              |  SELECT id, list_distinct(list_transform(sh, s -> ${graft.functions.Hashing.h64Sql("s", "cooc")})) AS hsh
              |  FROM base
              |), ex AS MATERIALIZED (
              |  SELECT id, CAST(len(hsh) AS BIGINT) AS sz, unnest(hsh) AS hs FROM hashed
              |), o AS (
              |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS o,
              |    min(a.sz) AS sz_a, min(b.sz) AS sz_b
              |  FROM ex a JOIN ex b ON a.hs = b.hs AND a.id < b.id
              |    AND CAST(a.sz AS DOUBLE) >= 0.5 * b.sz
              |    AND CAST(b.sz AS DOUBLE) >= 0.5 * a.sz
              |  GROUP BY a.id, b.id
              |), scored AS (
              |  SELECT id_a, id_b,
              |    CAST(o AS DOUBLE) / CAST(sz_a + sz_b - o AS DOUBLE) AS j
              |  FROM o
              |)
              |SELECT id_a, id_b, round(j, 6) AS jaccard FROM scored
              |WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    // The SAME brute/prefix pair on the Zipf-vocabulary regime fixture
    // (graft.ops.ZipfCorpus): a large power-law shingle vocabulary — real
    // text's shape — where rarity-ordered prefixes evict the hot head
    // from candidate generation. Both rows share one oracle (the corpus
    // is regenerated bit-for-bit in SQL, then the brute pair join), so
    // the gate proves (a) cross-engine corpus determinism and (b) prefix
    // losslessness on this regime too. The brute legs (this row and
    // dedup_ngram_jaccard) are GATED but no longer headline: the
    // brute-vs-prefix crossover was MEASURED in rounds 8–9 (prefix 3×
    // faster here, 12× slower on the adversarial tiny-vocab corpus) and
    // recorded; re-measure any time with
    // SPARK_GRAFT_BENCH_ONLY=dedup_zipf_brute,dedup_zipf_prefix. Keeping
    // the intentionally-slow legs out of the default set cuts ~1/3 of
    // the bench wall-clock and its host-contention exposure.
    // Benchmark decontamination (GPT-3/PaLM pipeline step): training
    // docs sharing any word 3-gram with the "benchmark" slice
    // (doc_id % 97 = 0 — the eval-suite stand-in). The benchmark side's
    // distinct shingle hashes BROADCAST into a left-semi join against
    // the training scan, so the corpus side never shuffles shingles and
    // the keyed aggregation is proportional to contamination found.
    "dedup_decontaminate" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.contamination(
            docs.filter(col("doc_id") % 97 =!= 0),
            docs.filter(col("doc_id") % 97 === 0),
            "doc_id", "text", shingleN = 3)
          .orderBy(col("doc_id"))
      },
      Some {
        val h = graft.functions.Hashing.h64Sql("s", "decon")
        s"""WITH benchdocs AS (
           |  SELECT list_distinct(list_transform(${O.shingles(3)}, s -> $h)) AS hsh
           |  FROM documents WHERE doc_id % 97 = 0
           |), bench AS MATERIALIZED (
           |  SELECT DISTINCT unnest(hsh) AS hs FROM benchdocs
           |), ex AS MATERIALIZED (
           |  SELECT doc_id, CAST(len(hsh) AS BIGINT) AS doc_ngrams, unnest(hsh) AS hs
           |  FROM (SELECT doc_id,
           |          list_distinct(list_transform(${O.shingles(3)}, s -> $h)) AS hsh
           |        FROM documents WHERE doc_id % 97 <> 0)
           |)
           |SELECT ex.doc_id, any_value(ex.doc_ngrams) AS doc_ngrams,
           |  CAST(count(*) AS BIGINT) AS hits,
           |  round(CAST(count(*) AS DOUBLE) / any_value(ex.doc_ngrams), 6) AS frac
           |FROM ex JOIN bench ON ex.hs = bench.hs
           |GROUP BY ex.doc_id ORDER BY ex.doc_id""".stripMargin
      },
      headline = true),

    // Passage lookup — contamination FORENSICS, the inverse of
    // decontaminate: the positional n-gram postings of the corpus
    // materialize as a band-partitioned Delta index
    // (graft.ops.PassageIndex), and a probe passage (here: the first 8
    // tokens of the smallest corpus doc — self-match guarantees a
    // non-trivial result) finds every doc containing it VERBATIM by
    // opening only the probe's bands and aligning positions. The oracle
    // replays postings construction AND the positional phrase join from
    // the same md5 hashes.
    "dedup_passage_probe" -> QueryDef(
      (s, d) => {
        // kernel-parallelism floor: the postings build (tokenize + shingle
        // + hash over every doc) otherwise runs as one task at fixture
        // split counts (736 ms of the query's 2.9 s, measured)
        val docs = Tables.documentsKernelPar(s, d)
        val corpus = docs.filter(col("doc_id") % 97 =!= 0)
        val idx = graft.delta.DeltaTable.forPath(s,
          graft.Scratch.dir("passage-idx") + "/idx")
        graft.ops.PassageIndex.build(idx, corpus, "doc_id", "text",
          shingleN = 3, numBands = 16)
        graft.ops.PassageIndex.probe(idx, passageProbeText(corpus),
            shingleN = 3, numBands = 16)
          .orderBy(col("doc_id"))
      },
      Some {
        def h(e: String) =
          s"CAST(('0x' || substring(md5('passage:' || $e), 1, 15)) AS BIGINT)"
        s"""WITH ptoks AS (
           |  SELECT (${O.T})[1:8] AS pt FROM documents
           |  WHERE doc_id = (
           |    SELECT min(doc_id) FROM documents
           |    WHERE doc_id % 97 <> 0 AND len(${O.T}) >= 8
           |      AND array_to_string((${O.T})[1:8], ' ') IN (
           |      SELECT array_to_string((${O.T})[1:8], ' ') FROM documents
           |      WHERE doc_id % 97 <> 0 AND len(${O.T}) >= 8
           |      GROUP BY 1 HAVING count(*) >= 2))
           |), ps0 AS MATERIALIZED (
           |  SELECT unnest(list_transform(range(1, len(pt) - 1),
           |    i -> {'i': i - 1, 'hsh': ${h("array_to_string(pt[i:i+2], ' ')")}})) AS s
           |  FROM ptoks
           |), ps AS (SELECT CAST(s.i AS BIGINT) AS i, s.hsh AS hsh FROM ps0
           |), corpus AS (
           |  SELECT doc_id, ${O.T} AS ts FROM documents WHERE doc_id % 97 <> 0
           |), post0 AS MATERIALIZED (
           |  SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1),
           |    i -> {'pos': i - 1, 'hsh': ${h("array_to_string(ts[i:i+2], ' ')")}})) AS s
           |  FROM corpus WHERE len(ts) >= 3
           |), post AS (
           |  SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.hsh AS hsh FROM post0
           |), m AS (
           |  SELECT p.doc_id, p.pos - s.i AS anchor, s.i AS i
           |  FROM post p JOIN ps s ON p.hsh = s.hsh
           |  WHERE p.pos - s.i >= 0
           |), occ AS (
           |  SELECT doc_id, anchor, count(DISTINCT i) AS mm
           |  FROM m GROUP BY doc_id, anchor
           |)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS occurrences,
           |  CAST(min(anchor) AS BIGINT) AS first_pos
           |FROM occ WHERE mm = (SELECT count(*) FROM ps)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      },
      headline = true),

    // Batch forensics over the SAME index: every recurring 8-token
    // prefix in the corpus becomes a probe (probe_id = its smallest
    // holder), and one probeAll pass maps each passage to every doc
    // containing it verbatim with positions — the takedown-list shape.
    // Probe shingles broadcast; the index side never shuffles.
    "dedup_passage_probe_multi" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val corpus = docs.filter(col("doc_id") % 97 =!= 0)
        val idx = graft.delta.DeltaTable.forPath(s,
          graft.Scratch.dir("passage-idx-multi") + "/idx")
        graft.ops.PassageIndex.build(idx, corpus, "doc_id", "text",
          shingleN = 3, numBands = 16)
        val ts = graft.ops.TextAnalysis.tokens(col("text"))
        val passages = corpus.filter(size(ts) >= 8)
          .select(col("doc_id"), concat_ws(" ", slice(ts, 1, 8)).as("passage"))
          .groupBy(col("passage"))
          .agg(min(col("doc_id")).as("probe_id"), count(lit(1)).as("c"))
          .filter(col("c") >= 2)
          .select(col("probe_id"), col("passage"))
        graft.ops.PassageIndex.probeAll(idx, passages, "probe_id", "passage",
            shingleN = 3, numBands = 16)
          .orderBy(col("probe_id"), col("doc_id"))
      },
      Some {
        def h(e: String) =
          s"CAST(('0x' || substring(md5('passage:' || $e), 1, 15)) AS BIGINT)"
        s"""WITH corpus AS (
           |  SELECT doc_id, ${O.T} AS ts FROM documents WHERE doc_id % 97 <> 0
           |), probes AS MATERIALIZED (
           |  SELECT min(doc_id) AS probe_id, p FROM (
           |    SELECT doc_id, array_to_string(ts[1:8], ' ') AS p
           |    FROM corpus WHERE len(ts) >= 8)
           |  GROUP BY p HAVING count(*) >= 2
           |), ptoks AS (
           |  SELECT probe_id, ${graft.queries.OracleSql.tokensSql("p")} AS pt FROM probes
           |), ps0 AS MATERIALIZED (
           |  SELECT probe_id, unnest(list_transform(range(1, len(pt) - 1),
           |    i -> {'i': i - 1, 'hsh': ${h("array_to_string(pt[i:i+2], ' ')")}})) AS s
           |  FROM ptoks
           |), ps AS (
           |  SELECT probe_id, CAST(s.i AS BIGINT) AS i, s.hsh AS hsh FROM ps0
           |), kk AS (SELECT probe_id, count(*) AS k FROM ps GROUP BY probe_id
           |), post0 AS MATERIALIZED (
           |  SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1),
           |    i -> {'pos': i - 1, 'hsh': ${h("array_to_string(ts[i:i+2], ' ')")}})) AS s
           |  FROM corpus WHERE len(ts) >= 3
           |), post AS (
           |  SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.hsh AS hsh FROM post0
           |), m AS (
           |  SELECT s.probe_id, p.doc_id, p.pos - s.i AS anchor, s.i AS i
           |  FROM post p JOIN ps s ON p.hsh = s.hsh
           |  WHERE p.pos - s.i >= 0
           |), occ AS (
           |  SELECT probe_id, doc_id, anchor, count(DISTINCT i) AS mm
           |  FROM m GROUP BY probe_id, doc_id, anchor
           |)
           |SELECT o.probe_id, o.doc_id, CAST(count(*) AS BIGINT) AS occurrences,
           |  CAST(min(o.anchor) AS BIGINT) AS first_pos
           |FROM occ o JOIN kk ON o.probe_id = kk.probe_id
           |WHERE o.mm = kk.k
           |GROUP BY o.probe_id, o.doc_id
           |ORDER BY o.probe_id, o.doc_id""".stripMargin
      }),

    "dedup_zipf_brute" -> QueryDef(
      (s, d) =>
        Dedup.ngramJaccardPairs(
            graft.ops.ZipfCorpus.table(s, d),
            "doc_id", "text", shingleN = 2, threshold = 0.5)
          .orderBy(col("id_a"), col("id_b")),
      Some(zipfPairsOracle)),

    "dedup_zipf_prefix" -> QueryDef(
      (s, d) =>
        Dedup.ngramJaccardPairsPrefix(
            graft.ops.ZipfCorpus.table(s, d),
            "doc_id", "text", shingleN = 2, threshold = 0.5)
          .orderBy(col("id_a"), col("id_b")),
      Some(zipfPairsOracle),
      headline = true),

    // Passage-level duplication profile: which docs share 6-token windows
    // with any other doc, and how much of each such doc is duplicated.
    "text_dup_passages" -> QueryDef(
      (s, d) =>
        Dedup.dupPassages(Tables.documents(s, d), "doc_id", "text", windowN = 6)
          .orderBy(col("id")),
      Some(s"""WITH base AS (
              |  SELECT doc_id AS id, ${O.shingles(6)} AS sh FROM documents
              |), hashed AS (
              |  SELECT id, list_distinct(list_transform(sh, s -> ${graft.functions.Hashing.h64Sql("s", "span")})) AS hsh
              |  FROM base
              |), ex AS MATERIALIZED (
              |  SELECT id, CAST(len(hsh) AS BIGINT) AS n_windows, unnest(hsh) AS h FROM hashed
              |), shared AS (
              |  SELECT h FROM ex GROUP BY h HAVING count(*) >= 2
              |)
              |SELECT id, min(n_windows) AS n_windows,
              |  CAST(count(*) AS BIGINT) AS n_dup_windows,
              |  round(CAST(count(*) AS DOUBLE) / CAST(min(n_windows) AS DOUBLE), 6) AS dup_ratio
              |FROM ex JOIN shared USING (h)
              |GROUP BY id ORDER BY id""".stripMargin),
      headline = true),

    // Substring-level exact dedup (Lee et al. 2022): remove every
    // 6-token span whose window hash repeats anywhere in the corpus,
    // reassemble the survivors. The oracle replays the positional window
    // hashes, the corpus-wide frequency, per-doc covered starts, and the
    // index-lambda reassembly (DuckDB list lambdas are 1-based, Spark's
    // 0-based — the oracle shifts by one).
    "text_dedup_spans" -> QueryDef(
      (s, d) =>
        // kernel floor + the op's tokenize-once checkpoint: the floor
        // alone lost (both consumers re-paid the rebalance read); combined,
        // the rebalanced scan is read once into the checkpoint
        Dedup.removeDupSpans(Tables.documentsKernelPar(s, d), "doc_id", "text",
            windowN = 6)
          .orderBy(col("id")),
      Some(s"""WITH tok AS MATERIALIZED (
              |  SELECT doc_id AS id, ${O.tokensSql("text")} AS ts FROM documents
              |), wins AS MATERIALIZED (
              |  SELECT id, i - 1 AS pos,
              |    ${graft.functions.Hashing.h64Sql("array_to_string(ts[i:i+5], ' ')", "spanrm6")} AS h
              |  FROM (SELECT id, ts, unnest(range(1, greatest(len(ts) - 4, 1))) AS i FROM tok)
              |), dup AS (
              |  SELECT h FROM wins GROUP BY h HAVING count(*) >= 2
              |), ss AS MATERIALIZED (
              |  SELECT w.id, list_sort(list(w.pos)) AS ss
              |  FROM wins w JOIN dup USING (h) GROUP BY w.id
              |)
              |SELECT t.id,
              |  coalesce(array_to_string(list_filter(t.ts, (x, i) ->
              |    len(list_filter(coalesce(s.ss, CAST([] AS BIGINT[])),
              |        p -> p <= i - 1 AND i - 1 <= p + 5)) = 0), ' '), '') AS clean_text,
              |  CAST(len(t.ts) AS BIGINT) AS n_tokens,
              |  CAST(len(t.ts) - len(list_filter(t.ts, (x, i) ->
              |    len(list_filter(coalesce(s.ss, CAST([] AS BIGINT[])),
              |        p -> p <= i - 1 AND i - 1 <= p + 5)) = 0)) AS BIGINT) AS n_removed
              |FROM tok t LEFT JOIN ss s USING (id) ORDER BY t.id""".stripMargin),
      headline = true),

    "dedup_minhash_lsh" -> QueryDef(
      (s, d) =>
        Dedup.minhashLsh(Tables.documents(s, d), "doc_id", "text",
            shingleN = 2, numHashes = 128, bands = 32, threshold = 0.5)
          .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH $minhashCtes
              |SELECT id_a, id_b, round(j, 6) AS jaccard FROM scored
              |WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin),
      headline = true),

    // The SAME minhash pipeline written in pure Spark SQL through the
    // graft_* functions (GraftExtensions) — no Scala Column API at all.
    // Shares dedup_minhash_lsh's oracle: the hash gate proves the SQL
    // surface resolves to the identical kernels (signatures, bands,
    // verify counts) value-for-value.
    "dedup_minhash_sql" -> QueryDef(
      (s, d) => {
        Tables.documents(s, d).createOrReplaceTempView("graft_sql_documents")
        s.sql(
          """WITH base AS (
            |  SELECT doc_id AS id,
            |    graft_shingle_hashes(graft_tokens(text), 2, 'mh') AS hsh
            |  FROM graft_sql_documents
            |), exh AS (
            |  SELECT id, CAST(size(hsh) AS BIGINT) AS sz, explode(hsh) AS h FROM base
            |), sig AS (
            |  SELECT id, graft_minhash_sig(hsh, 128) AS mh FROM base WHERE size(hsh) > 0
            |), banded AS (
            |  SELECT id, posexplode(graft_band_buckets(mh, 32)) AS (band, bucket) FROM sig
            |), cand AS (
            |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
            |  FROM banded a JOIN banded b
            |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
            |), scored AS (
            |  SELECT c.id_a, c.id_b, count(1) AS o, min(ea.sz) AS sz_a, min(eb.sz) AS sz_b
            |  FROM cand c
            |  JOIN exh ea ON ea.id = c.id_a
            |  JOIN exh eb ON eb.id = c.id_b AND eb.h = ea.h
            |  GROUP BY c.id_a, c.id_b
            |)
            |SELECT id_a, id_b,
            |  round(CAST(o AS DOUBLE) / CAST(sz_a + sz_b - o AS DOUBLE), 6) AS jaccard
            |FROM scored
            |WHERE CAST(o AS DOUBLE) / CAST(sz_a + sz_b - o AS DOUBLE) >= 0.5
            |ORDER BY id_a, id_b""".stripMargin)
      },
      Some(s"""WITH $minhashCtes
              |SELECT id_a, id_b, round(j, 6) AS jaccard FROM scored
              |WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    // Incremental exact dedup through the REAL Delta write path: the
    // corpus grows in two batches (even ids, then odd ids) via
    // appendNovel; a replay of batch 1 must commit nothing (content
    // idempotence, require()'d in-query). The oracle derives the final
    // corpus from raw documents alone: per digest, the winner is the
    // smallest even id when the digest has one (batch 1 ran first), else
    // the smallest odd id.
    "dedup_incremental" -> QueryDef(
      (s, d) => {
        val dir = graft.Scratch.dir("graft-incr")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val schema = org.apache.spark.sql.types.StructType(docs.schema.fields :+
          org.apache.spark.sql.types.StructField("digest",
            org.apache.spark.sql.types.StringType))
        val t = graft.delta.DeltaTable.forPath(s, dir).create(schema)
        require(Dedup.appendNovel(t, docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text") >= 0)
        Dedup.appendNovel(t, docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
        require(Dedup.appendNovel(t, docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text") == -1L, "replayed batch must be a no-op")
        graft.delta.DeltaTable.forPath(s, dir).toDF
          .select(col("doc_id"), col("digest")).orderBy(col("doc_id"))
      },
      Some("""SELECT winner AS doc_id, digest FROM (
             |  SELECT md5(text) AS digest,
             |    coalesce(min(CASE WHEN doc_id % 2 = 0 THEN doc_id END),
             |             min(doc_id)) AS winner
             |  FROM documents GROUP BY md5(text))
             |ORDER BY doc_id""".stripMargin)),

    // Incremental NEAR-dup dedup through the real Delta write path: the
    // corpus + its LSH band-bucket table grow in two batches (even ids,
    // then odd ids) via appendNovelNear; batch-2 docs near a stored
    // batch-1 survivor drop without re-running LSH over the corpus. The
    // oracle replays the same banding+verify pipeline (minhashCtes) and
    // applies the operator's kill rules: chain-kill by smaller same-batch
    // id, then cross-kill by any SURVIVING batch-1 doc.
    "dedup_incremental_near" -> QueryDef(
      (s, d) => {
        val corpus = graft.delta.DeltaTable.forPath(s, graft.Scratch.dir("graft-nearc"))
          .create(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("sig", org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)))))
        val bandsT = graft.delta.DeltaTable.forPath(s, graft.Scratch.dir("graft-nearb"))
          .create(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))),
            partitionColumns = Seq("band"))
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        require(Dedup.appendNovelNear(corpus, bandsT,
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
          shingleN = 2, numHashes = 128, bands = 32, threshold = 0.5) >= 0)
        Dedup.appendNovelNear(corpus, bandsT,
          docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text",
          shingleN = 2, numHashes = 128, bands = 32, threshold = 0.5)
        require(Dedup.appendNovelNear(corpus, bandsT,
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
          shingleN = 2, numHashes = 128, bands = 32, threshold = 0.5) == -1L,
          "replayed batch must be a near-dup no-op")
        graft.delta.DeltaTable.forPath(s, corpus.path).toDF
          .select(col("id").as("doc_id")).orderBy(col("doc_id"))
      },
      Some(s"""WITH $minhashCtes, pairs AS MATERIALIZED (
              |  SELECT id_a, id_b FROM scored WHERE j >= 0.5
              |), surv_even AS MATERIALIZED (
              |  SELECT d.doc_id FROM documents d WHERE d.doc_id % 2 = 0
              |  AND NOT EXISTS (SELECT 1 FROM pairs p
              |    WHERE p.id_b = d.doc_id AND p.id_a % 2 = 0)
              |), surv_odd AS (
              |  SELECT d.doc_id FROM documents d WHERE d.doc_id % 2 = 1
              |  AND NOT EXISTS (SELECT 1 FROM pairs p
              |    WHERE p.id_b = d.doc_id AND p.id_a % 2 = 1)
              |  AND NOT EXISTS (SELECT 1 FROM pairs p JOIN surv_even e
              |    ON (p.id_a = e.doc_id AND p.id_b = d.doc_id)
              |    OR (p.id_b = e.doc_id AND p.id_a = d.doc_id))
              |)
              |SELECT doc_id FROM surv_even
              |UNION ALL SELECT doc_id FROM surv_odd
              |ORDER BY doc_id""".stripMargin)),

    // Pair→cluster resolution: connected components of the minhash pairs
    // (cluster_id = min doc id per component). Oracle computes the same
    // transitive closure with a recursive CTE.
    "dedup_clusters" -> QueryDef(
      (s, d) =>
        Dedup.duplicateClusters(
            Dedup.minhashLsh(Tables.documents(s, d), "doc_id", "text",
              shingleN = 2, numHashes = 128, bands = 32, threshold = 0.5))
          .orderBy(col("id")),
      Some(s"""WITH RECURSIVE $minhashCtes,
              |pairs AS MATERIALIZED (SELECT id_a, id_b FROM scored WHERE j >= 0.5),
              |edges AS (
              |  SELECT id_a AS a, id_b AS b FROM pairs
              |  UNION ALL SELECT id_b AS a, id_a AS b FROM pairs
              |), reach AS (
              |  SELECT a AS node, a AS r FROM edges
              |  UNION
              |  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON e.b = reach.node
              |)
              |SELECT node AS id, min(r) AS cluster_id FROM reach
              |GROUP BY node ORDER BY id""".stripMargin)),

    // LEAKAGE-SAFE train/val/test split: the split coin is flipped on
    // the near-dup CLUSTER representative (the gated minhash connected
    // components), so a test doc's near-duplicates can never sit in
    // train — the split-level twin of decontamination. Docs outside any
    // cluster are singletons (coin on their own id), so the query also
    // pins that the boundary CASE is byte-identical to sample_split's.
    "sample_leakage_split" -> QueryDef(
      (s, d) => {
        val clusters = Dedup.duplicateClusters(
          Dedup.minhashLsh(Tables.documents(s, d), "doc_id", "text",
            shingleN = 2, numHashes = 128, bands = 32, threshold = 0.5))
        graft.ops.Sampling.leakageSafeSplit(
            Tables.documents(s, d).select(col("doc_id")), "doc_id", clusters,
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "lsplit")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $minhashCtes,
              |pairs AS MATERIALIZED (SELECT id_a, id_b FROM scored WHERE j >= 0.5),
              |edges AS (
              |  SELECT id_a AS a, id_b AS b FROM pairs
              |  UNION ALL SELECT id_b AS a, id_a AS b FROM pairs
              |), reach AS (
              |  SELECT a AS node, a AS r FROM edges
              |  UNION
              |  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON e.b = reach.node
              |), clusters AS (
              |  SELECT node AS id, min(r) AS cluster_id FROM reach GROUP BY node
              |), assigned AS (
              |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS rep
              |  FROM documents d LEFT JOIN clusters c ON c.id = d.doc_id
              |)
              |SELECT doc_id,
              |  CASE WHEN ${O.h32Sql("rep", "lsplit")} < ${graft.ops.Sampling.threshold32(0.8)} THEN 'train'
              |       WHEN ${O.h32Sql("rep", "lsplit")} < ${graft.ops.Sampling.threshold32(0.9)} THEN 'val'
              |       ELSE 'test' END AS split
              |FROM assigned ORDER BY doc_id""".stripMargin)),

    // Best-of-cluster survivors: one representative per minhash near-dup
    // cluster chosen by HIGHEST quality (here: longest text, ties to the
    // smaller doc_id) — what production dedup keeps, vs the min-id
    // canonical label. Singletons survive as themselves; the oracle
    // replays the closure AND the argmax tie-break, so a survivor picked
    // by id instead of score fails the hash.
    "dedup_best_of_cluster" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), length(col("text")).cast("long").as("score"))
        val clusters = Dedup.duplicateClusters(
          Dedup.minhashLsh(Tables.documents(s, d), "doc_id", "text",
            shingleN = 2, numHashes = 128, bands = 32, threshold = 0.5))
        Dedup.bestOfCluster(docs, "doc_id", "score", clusters)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $minhashCtes,
              |pairs AS MATERIALIZED (SELECT id_a, id_b FROM scored WHERE j >= 0.5),
              |edges AS (
              |  SELECT id_a AS a, id_b AS b FROM pairs
              |  UNION ALL SELECT id_b AS a, id_a AS b FROM pairs
              |), reach AS (
              |  SELECT a AS node, a AS r FROM edges
              |  UNION
              |  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON e.b = reach.node
              |), clusters AS (
              |  SELECT node AS id, min(r) AS cluster_id FROM reach GROUP BY node
              |), scoredocs AS (
              |  SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS score,
              |    coalesce(c.cluster_id, d.doc_id) AS rep
              |  FROM documents d LEFT JOIN clusters c ON c.id = d.doc_id
              |)
              |SELECT doc_id, score FROM scoredocs
              |QUALIFY row_number() OVER (
              |  PARTITION BY rep ORDER BY score DESC, doc_id) = 1
              |ORDER BY doc_id""".stripMargin)),

    // Duplication-audit report: the cluster-SIZE histogram over the
    // whole corpus (singletons included as size-1 clusters) — the
    // number every dedup run reports first ("how much of the corpus is
    // duplicated, at what multiplicities"). Composes the gated minhash
    // clustering with a two-level aggregation; the oracle replays the
    // closure and the same histogram.
    "report_cluster_sizes" -> QueryDef(
      (s, d) => {
        val clusters = Dedup.duplicateClusters(
          Dedup.minhashLsh(Tables.documents(s, d), "doc_id", "text",
            shingleN = 2, numHashes = 128, bands = 32, threshold = 0.5))
        Tables.documents(s, d).select(col("doc_id").as("id"))
          .join(clusters, Seq("id"), "left")
          .select(col("id"),
            org.apache.spark.sql.functions.coalesce(
              col("cluster_id"), col("id")).as("cluster_id"))
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("sz"))
          .groupBy(col("sz").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"),
            org.apache.spark.sql.functions.sum(col("sz")).cast("long").as("n_docs"))
          .orderBy(col("cluster_size"))
      },
      Some(s"""WITH RECURSIVE $minhashCtes,
              |pairs AS MATERIALIZED (SELECT id_a, id_b FROM scored WHERE j >= 0.5),
              |edges AS (
              |  SELECT id_a AS a, id_b AS b FROM pairs
              |  UNION ALL SELECT id_b AS a, id_a AS b FROM pairs
              |), reach AS (
              |  SELECT a AS node, a AS r FROM edges
              |  UNION
              |  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON e.b = reach.node
              |), clusters AS (
              |  SELECT node AS id, min(r) AS cluster_id FROM reach GROUP BY node
              |), assigned AS (
              |  SELECT d.doc_id AS id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
              |  FROM documents d LEFT JOIN clusters c ON c.id = d.doc_id
              |), sizes AS (
              |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
              |  FROM assigned GROUP BY cluster_id
              |)
              |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
              |  CAST(sum(sz) AS BIGINT) AS n_docs
              |FROM sizes GROUP BY sz ORDER BY cluster_size""".stripMargin)),

    // same contract via the O(log n)-round large-star/small-star algorithm
    // (deep-chain-safe); output — and therefore oracle — identical to
    // dedup_clusters
    "dedup_clusters_logstar" -> QueryDef(
      (s, d) =>
        Dedup.duplicateClustersLogRounds(
            Dedup.minhashLsh(Tables.documents(s, d), "doc_id", "text",
              shingleN = 2, numHashes = 128, bands = 32, threshold = 0.5))
          .orderBy(col("id")),
      Some(s"""WITH RECURSIVE $minhashCtes,
              |pairs AS MATERIALIZED (SELECT id_a, id_b FROM scored WHERE j >= 0.5),
              |edges AS (
              |  SELECT id_a AS a, id_b AS b FROM pairs
              |  UNION ALL SELECT id_b AS a, id_a AS b FROM pairs
              |), reach AS (
              |  SELECT a AS node, a AS r FROM edges
              |  UNION
              |  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON e.b = reach.node
              |)
              |SELECT node AS id, min(r) AS cluster_id FROM reach
              |GROUP BY node ORDER BY id""".stripMargin)),

    "dedup_simhash" -> QueryDef(
      (s, d) =>
        // kernel-parallelism floor: measured 1.98 -> 1.60 s at sf0.1
        Dedup.simhashPairs(Tables.documentsKernelPar(s, d), "doc_id", "text",
            maxHamming = 3)
          .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH hx AS (
              |  SELECT doc_id AS id, list_transform(${O.T}, t -> ${graft.functions.Hashing.h64Sql("t", "sh")}) AS hs
              |  FROM documents
              |), sigs AS MATERIALIZED (
              |  SELECT id, ${O.simhashExpr("hs")} AS sig FROM hx
              |), chunked AS (
              |  ${O.simhashBlocksUnion}
              |), cand AS (
              |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sig AS sig_a, b.sig AS sig_b
              |  FROM chunked a JOIN chunked b ON a.blk = b.blk AND a.key = b.key AND a.id < b.id
              |)
              |SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
              |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
              |ORDER BY id_a, id_b""".stripMargin),
      headline = true),

    // Character-level fuzzy dedup on a bounded prefix key (title-style
    // field): lossless length-bucket blocking + exact levenshtein verify.
    // Both engines implement the classic Levenshtein, so dist is exact.
    "dedup_edit_distance" -> QueryDef(
      (s, d) =>
        Dedup.editDistancePairs(
            Tables.documents(s, d)
              .select(col("doc_id"), substring(lower(col("text")), 1, 32).as("k")),
            "doc_id", "k", maxDist = 3)
          .orderBy(col("id_a"), col("id_b")),
      Some("""WITH s AS (
             |  SELECT doc_id, substring(lower(text), 1, 32) AS k FROM documents
             |)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist
             |FROM s a JOIN s b ON a.doc_id < b.doc_id
             |WHERE abs(length(a.k) - length(b.k)) <= 3
             |  AND levenshtein(a.k, b.k) <= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    "dedup_embedding" -> QueryDef(
      (s, d) =>
        Dedup.embeddingNearDups(Tables.embeddings(s, d), "vec_id", "embedding",
            threshold = 0.3, planes = 10, dims = 64)
          .orderBy(col("id_a"), col("id_b")),
      {
        val m = O.hyperplanes(10, 64)
        val probeList = O.probeList(10, "sig")
        // candidate DISTINCT carries ids only (the old form hashed full
        // 64-float vector pairs); cosine uses per-row precomputed norms —
        // bit-identical doubles (OracleSql.cosineN), lean DuckDB gate
        Some(s"""WITH sigs AS MATERIALIZED (
                |  SELECT vec_id AS id, embedding AS v, ${O.norm("embedding", 64)} AS nrm,
                |    ${O.signature("embedding", m)} AS sig
                |  FROM embeddings
                |), probed AS (
                |  SELECT id, unnest($probeList) AS psig FROM sigs
                |), cand AS (
                |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
                |  FROM probed a JOIN sigs b ON a.psig = b.sig AND a.id < b.id
                |), scored AS (
                |  SELECT p.id_a, p.id_b, ${O.cosineN("a.v", "b.v", "a.nrm", "b.nrm", 64)} AS c
                |  FROM cand p JOIN sigs a ON a.id = p.id_a JOIN sigs b ON b.id = p.id_b
                |)
                |SELECT id_a, id_b, round(c, 6) AS cosine FROM scored
                |WHERE c >= 0.3 ORDER BY id_a, id_b""".stripMargin)
      },
      headline = true),

    // SemDeDup-style semantic dedup: the oracle RETRAINS the IVF codebook
    // in SQL (unrolled exact-integer Lloyd — the text_bpe_corpus
    // precedent), recomputes the argmax-cosine cell assignment, the
    // within-cell cosine pairs, and the min-label transitive closure —
    // a full independent re-derivation of training + assignment +
    // candidate generation + clustering.
    "dedup_semantic" -> QueryDef(
      (s, d) =>
        graft.ops.Dedup.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
            numClusters = 8, eps = 0.7, iters = 2)
          .orderBy(col("id")),
      {
        val O = OracleSql
        Some(s"WITH RECURSIVE ${O.ivfLloydCtes(k = 8, iters = 2, dims = 64)}, " +
          O.ivfAssignCte("fcells", "cents_2", 64) + ", " +
          "cand AS (SELECT a.id AS id_a, b.id AS id_b " +
          "FROM fcells a JOIN fcells b ON a.cell = b.cell AND a.id < b.id), " +
          // threshold spelled (1.0 - eps): the identical IEEE subtraction
          // Dedup.semanticDedup performs, not a rounded decimal literal
          "pairs AS MATERIALIZED (SELECT p.id_a, p.id_b FROM cand p " +
          "JOIN ebase va ON va.id = p.id_a JOIN ebase vb ON vb.id = p.id_b " +
          s"WHERE ${O.cosineN("va.v", "vb.v", "va.nrm", "vb.nrm", 64)} >= (1.0 - 0.7)), " +
          "edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION ALL SELECT id_b AS a, id_a AS b FROM pairs), " +
          "reach AS (SELECT a AS node, a AS r FROM edges UNION " +
          "SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON e.b = reach.node), " +
          "cl AS (SELECT node AS id, min(r) AS cluster_id FROM reach GROUP BY node) " +
          "SELECT b.id, COALESCE(cl.cluster_id, b.id) AS cluster_id, " +
          "(b.id = COALESCE(cl.cluster_id, b.id)) AS keep " +
          "FROM ebase b LEFT JOIN cl ON b.id = cl.id ORDER BY b.id")
      },
      headline = true)
  )
}
