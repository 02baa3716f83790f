package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TextAnalysis._

/** Text-analysis operators surfaced as verifiable queries over `documents`.
  * Oracle SQL mirrors the Column expressions with DuckDB list/regex
  * functions; token semantics pinned on both sides (lowercase, whitespace
  * split, empties dropped).
  */
object TextQueries extends QueryModule {

  // DuckDB fragment: the token list of `text` — the ONE shared definition
  // (duplicating it here desynchronizes text_* from dedup_* oracles).
  private val T = OracleSql.T

  /** Scalar DuckDB twin of TextAnalysis.langId(text): priority de < en <
    * es < fr on ties, 'und' on zero hits — shared by text_langid and
    * report_corpus so the two stay in lockstep. */
  private def langIdSql: String = {
    def hits(words: Seq[String]) =
      s"len(list_filter($T, t -> list_contains([${words.map("'" + _ + "'").mkString(",")}], t)))"
    val h = Seq("de", "en", "es", "fr")
      .map(l => l -> hits(graft.ops.TextAnalysis.LangStopwords(l))).toMap
    val m = s"greatest(${h("de")}, ${h("en")}, ${h("es")}, ${h("fr")})"
    s"""CASE WHEN $m = 0 THEN 'und'
       |  WHEN ${h("de")} = $m THEN 'de'
       |  WHEN ${h("en")} = $m THEN 'en'
       |  WHEN ${h("es")} = $m THEN 'es'
       |  ELSE 'fr' END""".stripMargin.replace("\n", " ")
  }

  /** Fixed word-frequency fixture for the BPE gate: vocabulary drawn from
    * the synthetic documents corpus so the trained merges actually fire
    * on real rows (every word below appears throughout the corpus). The
    * counts are arbitrary but FROZEN — the merge list must be a constant
    * so the oracle SQL (static by contract) can apply identical merges. */
  private[queries] val BpeFixtureCounts: Seq[(String, Long)] = Seq(
    "table" -> 50L, "value" -> 40L, "spark" -> 35L, "window" -> 30L,
    "batch" -> 28L, "merge" -> 25L, "scan" -> 22L, "hash" -> 20L,
    "sort" -> 18L, "fast" -> 15L, "slow" -> 12L, "line" -> 10L,
    "row" -> 9L, "key" -> 8L, "agg" -> 7L, "part" -> 6L)

  /** The winnowing selection CTE chain (tok → hst → `sel(id, s{p,h})`) —
    * shared by text_winnow and dedup_winnow so the k/w/tie-rule replay
    * cannot drift between the fingerprint gate and the pair gate. */
  private lazy val winnowCtes: String =
    s"""tok AS (
       |  SELECT doc_id AS id, $T AS ts FROM documents
       |), hst AS MATERIALIZED (
       |  SELECT id, CASE WHEN len(ts) < 3 THEN CAST([] AS BIGINT[])
       |    ELSE list_transform(range(1, len(ts) - 1),
       |      i -> ${graft.functions.Hashing.h64Sql("array_to_string(ts[i:i+2], ' ')", "winnow3")})
       |    END AS hs
       |  FROM tok
       |), sel AS MATERIALIZED (
       |  SELECT id, unnest(CASE
       |    WHEN len(hs) = 0 THEN CAST([] AS STRUCT(p INTEGER, h BIGINT)[])
       |    WHEN len(hs) < 4 THEN [list_reduce(
       |      list_transform(range(0, len(hs)), j -> {'p': CAST(j AS INTEGER), 'h': hs[j+1]}),
       |      (a, b) -> CASE WHEN b.h <= a.h THEN b ELSE a END)]
       |    ELSE list_transform(range(0, len(hs) - 3), i -> list_reduce(
       |      list_transform(range(i, i + 4), j -> {'p': CAST(j AS INTEGER), 'h': hs[j+1]}),
       |      (a, b) -> CASE WHEN b.h <= a.h THEN b ELSE a END))
       |    END) AS s
       |  FROM hst
       |)""".stripMargin

  /** Frozen unigram-LM piece vocabulary (piece → integer cost ≈ −ln p
    * ·10⁶) for the Viterbi segmentation gate: every lowercase letter as
    * a 2.0-cost fallback piece plus multi-char pieces tuned so corpus
    * words exercise whole-word wins ("table", "spark"), multi-piece
    * splits ("wind"+"ow", "cust"+"om"+"er") and char fallbacks. Frozen
    * by contract — the oracle SQL regenerates from this same list. */
  private[queries] val UnigramFixtureVocab: Seq[(String, Long)] =
    ('a' to 'z').map(c => c.toString -> 2000000L) ++ Seq(
      "table" -> 1100000L, "ta" -> 1400000L, "ble" -> 1500000L,
      "spark" -> 1000000L, "the" -> 900000L, "key" -> 1000000L,
      "agg" -> 1100000L, "row" -> 1000000L, "big" -> 1100000L,
      "slow" -> 1200000L, "small" -> 1300000L, "fast" -> 1200000L,
      "va" -> 1400000L, "lue" -> 1500000L,
      "wind" -> 1600000L, "ow" -> 1200000L,
      "mer" -> 1500000L, "ge" -> 1300000L,
      "ba" -> 1400000L, "tch" -> 1600000L,
      "sc" -> 1300000L, "an" -> 1200000L,
      "ha" -> 1300000L, "sh" -> 1300000L,
      "cust" -> 1700000L, "om" -> 1300000L, "er" -> 1100000L,
      "col" -> 1400000L, "umn" -> 1700000L,
      "fil" -> 1500000L, "ter" -> 1300000L,
      "jo" -> 1300000L, "in" -> 1100000L,
      "or" -> 1200000L, "der" -> 1400000L,
      "vec" -> 1500000L, "tor" -> 1400000L,
      "li" -> 1300000L, "ne" -> 1200000L, "da" -> 1300000L,
      "st" -> 1200000L, "re" -> 1200000L, "am" -> 1300000L,
      "gro" -> 1500000L, "up" -> 1200000L, "par" -> 1400000L,
      "so" -> 1300000L, "rt" -> 1300000L,
      "qu" -> 1400000L, "ery" -> 1500000L, "fa" -> 1300000L)

  private[queries] val UnigramUnkCost = 5000000L

  /** Generated DuckDB twin of UnigramKernel.segmentWord over the corpus:
    * distinct words → cost edges (substring ∈ vocab, or single-char unk)
    * → the Viterbi DP UNROLLED `maxLen` steps (argmin via
    * row_number(cost ASC, j ASC) — the kernel's strict-<, smallest-j tie
    * rule) → unrolled backtrace → ▁-marked pieces rejoined per doc.
    * `maxLen` must cover the longest corpus word (8 at sf0.01; 10 here). */
  private def unigramOracleSql(vocab: Seq[(String, Long)], unk: Long,
                               maxLen: Int): String = {
    val vals = vocab.map { case (p, c) => s"('$p', ${c})" }.mkString(", ")
    unigramOracleSqlWith(s"SELECT * FROM (VALUES $vals) t(p, c)", unk, maxLen)
  }

  /** The Viterbi-replay oracle parameterized by the vocabulary CTE body
    * (`SELECT … AS p, … AS c`) — shared by the fixture-vocab gate and
    * the corpus-trained gate so the DP replay cannot drift. */
  private def unigramOracleSqlWith(vocabSql: String, unk: Long,
                                   maxLen: Int): String = {
    val dp = (1 to maxLen).map { i =>
      if (i == 1)
        s"""d1 AS MATERIALIZED (
           |  SELECT w, CAST(1 AS BIGINT) AS pos, c AS best, CAST(0 AS BIGINT) AS bp
           |  FROM edges WHERE i = 1 AND j = 0
           |), a1 AS MATERIALIZED (SELECT * FROM d1)""".stripMargin
      else
        s"""d$i AS MATERIALIZED (
           |  SELECT w, CAST($i AS BIGINT) AS pos, best, bp FROM (
           |    SELECT e.w,
           |      (CASE WHEN e.j = 0 THEN 0 ELSE p.best END) + e.c AS best, e.j AS bp,
           |      row_number() OVER (PARTITION BY e.w
           |        ORDER BY (CASE WHEN e.j = 0 THEN 0 ELSE p.best END) + e.c ASC, e.j ASC) AS rn
           |    FROM edges e LEFT JOIN a${i - 1} p ON p.w = e.w AND p.pos = e.j
           |    WHERE e.i = $i AND (e.j = 0 OR p.best IS NOT NULL)
           |  ) WHERE rn = 1
           |), a$i AS MATERIALIZED (SELECT * FROM a${i - 1} UNION ALL SELECT * FROM d$i)""".stripMargin
    }.mkString(",\n")
    val bt = (1 to maxLen).map { i =>
      s"""bt$i AS MATERIALIZED (
         |  SELECT b.w,
         |    CASE WHEN b.pos = 0 THEN CAST(0 AS BIGINT) ELSE d.bp END AS pos,
         |    CASE WHEN b.pos = 0 THEN b.ps
         |         ELSE list_prepend(substring(b.w, CAST(d.bp AS INTEGER) + 1,
         |                CAST(b.pos - d.bp AS INTEGER)), b.ps) END AS ps
         |  FROM bt${i - 1} b LEFT JOIN a$maxLen d
         |    ON b.pos > 0 AND d.w = b.w AND d.pos = b.pos
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (SELECT doc_id, $T AS ts FROM documents),
       |u AS MATERIALIZED (
       |  SELECT doc_id, unnest(ts) AS w, unnest(range(1, len(ts) + 1)) AS i FROM toks),
       |words AS MATERIALIZED (SELECT DISTINCT w FROM u),
       |vocab AS MATERIALIZED ($vocabSql),
       |pos AS (SELECT w, unnest(range(1, len(w) + 1)) AS i FROM words),
       |ji AS (SELECT w, i, unnest(range(0, i)) AS j FROM pos),
       |edges AS MATERIALIZED (
       |  SELECT ji.w, ji.j, ji.i,
       |    coalesce(v.c, CASE WHEN ji.i - ji.j = 1 THEN $unk END) AS c
       |  FROM ji LEFT JOIN vocab v
       |    ON v.p = substring(ji.w, CAST(ji.j AS INTEGER) + 1, CAST(ji.i - ji.j AS INTEGER))
       |  WHERE coalesce(v.c, CASE WHEN ji.i - ji.j = 1 THEN $unk END) IS NOT NULL
       |),
       |$dp,
       |bt0 AS MATERIALIZED (
       |  SELECT w, CAST(len(w) AS BIGINT) AS pos, CAST([] AS VARCHAR[]) AS ps FROM words),
       |$bt,
       |seg AS MATERIALIZED (
       |  SELECT w, list_transform(ps, (x, ix) ->
       |    CASE WHEN ix = 1 THEN '▁' || x ELSE x END) AS ps
       |  FROM bt$maxLen
       |),
       |flat AS (
       |  SELECT doc_id, i AS wpos, unnest(range(1, len(s.ps) + 1)) AS pi, s.ps AS ps
       |  FROM u JOIN seg s ON s.w = u.w
       |),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pieces,
       |    string_agg(ps[CAST(pi AS INTEGER)], ' ' ORDER BY wpos, pi) AS pieces
       |  FROM flat GROUP BY doc_id
       |)
       |SELECT d.doc_id, coalesce(a.n_pieces, 0) AS n_pieces,
       |  coalesce(a.pieces, '') AS pieces
       |FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id""".stripMargin
  }

  /** Pruned-bigram-LM oracle CTE chain (toks → … → `agg(doc_id, nll_q6)`):
    * the DuckDB retraining + rescoring of graft.ops.LanguageModel with
    * identical counts, tie-breaks, and integer-scaled NLL arithmetic.
    * Shared by text_lm_score and pipeline_pretrain so the two gates can
    * never drift apart. */
  private[queries] def lmNllCtes(maxVocab: Int, maxBigrams: Int): String =
    s"""toks AS (SELECT doc_id, $T AS ts FROM documents),
       |u AS (
       |  SELECT doc_id, unnest(ts) AS t, unnest(range(1, len(ts) + 1)) AS i
       |  FROM toks),
       |vocab AS (
       |  SELECT t AS w, CAST(count(*) AS BIGINT) AS n FROM u
       |  WHERE t NOT IN ('<unk>', '<s>')
       |  GROUP BY t ORDER BY n DESC, w LIMIT $maxVocab),
       |stats AS (SELECT
       |  (SELECT CAST(coalesce(sum(len(ts)), 0) AS BIGINT) FROM toks) AS total,
       |  (SELECT CAST(count(*) AS BIGINT) FROM toks WHERE len(ts) > 0) AS ndocs,
       |  (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM vocab) AS vsum,
       |  (SELECT CAST(count(*) AS BIGINT) FROM vocab) AS vsize),
       |m AS (
       |  SELECT u.doc_id, u.i,
       |    CASE WHEN v.w IS NOT NULL THEN u.t ELSE '<unk>' END AS w
       |  FROM u LEFT JOIN vocab v ON v.w = u.t),
       |pairs AS (
       |  SELECT m.doc_id, m.i,
       |    CASE WHEN m.i = 1 THEN '<s>' ELSE prev.w END AS p, m.w
       |  FROM m LEFT JOIN m prev
       |    ON prev.doc_id = m.doc_id AND prev.i = m.i - 1),
       |bigtop AS (
       |  SELECT p, w, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY p, w
       |  ORDER BY n DESC, p || ' ' || w LIMIT $maxBigrams),
       |ctx AS (
       |  SELECT w, n FROM vocab
       |  UNION ALL SELECT '<unk>', total - vsum FROM stats
       |  UNION ALL SELECT '<s>', ndocs FROM stats),
       |scored AS (
       |  SELECT pr.doc_id,
       |    CAST(floor(-ln((CAST(coalesce(bt.n, 0) AS DOUBLE) + 1.0)
       |      / (CAST(coalesce(c.n, 0) AS DOUBLE) + (CAST(s.vsize AS DOUBLE) + 1.0)))
       |      * 1e6 + 0.5) AS BIGINT) AS q6
       |  FROM pairs pr
       |  LEFT JOIN bigtop bt ON bt.p = pr.p AND bt.w = pr.w
       |  LEFT JOIN ctx c ON c.w = pr.p
       |  CROSS JOIN stats s),
       |agg AS (SELECT doc_id, CAST(sum(q6) AS BIGINT) AS nll_q6
       |        FROM scored GROUP BY doc_id)""".stripMargin

  /** Deterministic messy-URL fixture derived from documents (doc_id
    * drives scheme case, www/userinfo noise, default/explicit ports,
    * trailing slashes, tracking params, param order, fragments) — the
    * SAME construction in Spark and DuckDB, so each engine canonicalizes
    * independently and the gate compares the results. */
  private[queries] def rawUrl(d: org.apache.spark.sql.Column,
                     src: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      when(d % 2 === 0, lit("http")).otherwise(lit("HTTPS")), lit("://"),
      when(d % 4 === 0, lit("WWW.")).otherwise(
        when(d % 4 === 1, lit("www.")).otherwise(lit(""))),
      when(d % 3 === 0, lit("user:pw@")).otherwise(lit("")),
      src, lit(".Example.COM"),
      when(d % 5 === 0, lit(":80")).otherwise(
        when(d % 5 === 1, lit(":443")).otherwise(
          when(d % 5 === 2, lit(":8080")).otherwise(lit("")))),
      lit("/p/"), (d % 50).cast("string"),
      when(d % 7 === 0, lit("/")).otherwise(lit("")),
      when(d % 3 === 0, lit("?b=2&utm_source=x&a=1")).otherwise(
        when(d % 3 === 1, lit("?a=1&b=2")).otherwise(lit(""))),
      when(d % 11 === 0, lit("#frag")).otherwise(lit("")))

  private[queries] val rawUrlSql: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'HTTPS' END || '://' ||
      | CASE WHEN doc_id % 4 = 0 THEN 'WWW.' WHEN doc_id % 4 = 1 THEN 'www.' ELSE '' END ||
      | CASE WHEN doc_id % 3 = 0 THEN 'user:pw@' ELSE '' END ||
      | source || '.Example.COM' ||
      | CASE WHEN doc_id % 5 = 0 THEN ':80' WHEN doc_id % 5 = 1 THEN ':443'
      |      WHEN doc_id % 5 = 2 THEN ':8080' ELSE '' END ||
      | '/p/' || CAST(doc_id % 50 AS VARCHAR) ||
      | CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END ||
      | CASE WHEN doc_id % 3 = 0 THEN '?b=2&utm_source=x&a=1'
      |      WHEN doc_id % 3 = 1 THEN '?a=1&b=2' ELSE '' END ||
      | CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END)"""
      .stripMargin.replace("\n", " ")

  def defs: Map[String, QueryDef] = Map(
    // ---- URL canonicalization (the first key of web-crawl curation):
    // each engine builds the identical messy URL from doc columns, then
    // canonicalizes with ITS OWN implementation — scheme/host case,
    // userinfo, www, default ports, trailing slash, tracking params,
    // param order, and fragments must all collapse identically, and the
    // host/registered-domain extractors must agree per row. ------------
    "text_url_canonical" -> QueryDef(
      (s, d) => {
        import graft.ops.UrlOps
        Tables.documents(s, d)
          .select(col("doc_id"), rawUrl(col("doc_id"), col("source")).as("raw"))
          .select(col("doc_id"),
            UrlOps.normalizeUrl(col("raw")).as("canon"),
            UrlOps.urlHost(col("raw")).as("host"),
            UrlOps.registeredDomain(UrlOps.urlHost(col("raw"))).as("domain"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |  ${graft.ops.UrlOps.normalizeUrlSql(rawUrlSql)} AS canon,
              |  ${graft.ops.UrlOps.urlHostSql(rawUrlSql)} AS host,
              |  ${graft.ops.UrlOps.registeredDomainSql(
                   graft.ops.UrlOps.urlHostSql(rawUrlSql))} AS domain
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Unicode-script profiling (the multilingual signal langid's
    // stopword heuristic can't give): both engines build the identical
    // mixed-script text (ASCII base + doc_id-driven Han/Cyrillic/Arabic
    // blocks), count per EXPLICIT codepoint range, and derive the
    // dominant script through the shared integer argmax key. -----------
    "text_script" -> QueryDef(
      (s, d) => {
        import graft.ops.TextAnalysis
        val mixed = concat(
          substring(col("text"), 1, 100),
          repeat(lit("世界"), ((col("doc_id") % 4) * 60).cast("int")),
          repeat(lit("Пр"), ((col("doc_id") % 3) * 80).cast("int")),
          repeat(lit("م"), ((col("doc_id") % 2) * 50).cast("int")))
        Tables.documents(s, d)
          .select(col("doc_id"), mixed.as("t"))
          .select(col("doc_id"),
            TextAnalysis.scriptCount(col("t"), "latin").cast("long").as("latin_n"),
            TextAnalysis.scriptCount(col("t"), "han").cast("long").as("han_n"),
            TextAnalysis.scriptCount(col("t"), "cyrillic").cast("long").as("cyrillic_n"),
            TextAnalysis.scriptCount(col("t"), "arabic").cast("long").as("arabic_n"),
            TextAnalysis.dominantScript(col("t")).as("script"))
          .orderBy(col("doc_id"))
      },
      Some {
        import graft.ops.TextAnalysis
        val mixed = "(substring(text, 1, 100) || repeat('世界', CAST((doc_id % 4) * 60 AS INT)) " +
          "|| repeat('Пр', CAST((doc_id % 3) * 80 AS INT)) " +
          "|| repeat('م', CAST((doc_id % 2) * 50 AS INT)))"
        s"""SELECT doc_id,
           |  ${TextAnalysis.scriptCountSql(mixed, "latin")} AS latin_n,
           |  ${TextAnalysis.scriptCountSql(mixed, "han")} AS han_n,
           |  ${TextAnalysis.scriptCountSql(mixed, "cyrillic")} AS cyrillic_n,
           |  ${TextAnalysis.scriptCountSql(mixed, "arabic")} AS arabic_n,
           |  ${TextAnalysis.dominantScriptSql(mixed)} AS script
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    "text_token_count" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            // BIGINT on both sides: DuckDB len() is int64, Spark size() int32
            tokenCount(col("text")).cast("long").as("n_tokens"),
            subwordCount(col("text")).cast("long").as("n_subwords"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, len($T) AS n_tokens,
              |  len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS n_subwords
              |FROM documents ORDER BY doc_id""".stripMargin)),

    "text_quality" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          // tokens materialized ONCE (hot-path hygiene, same rule as the
          // dedup operators). Measured neutral at sf0.1 — the per-row cost
          // is dominated by the regex scans and the interpreted stopword
          // filter itself, not by re-tokenization — but it keeps the
          // plan's token list single-sourced for the *FromTokens scores.
          .select(col("doc_id"), col("text"), tokens(col("text")).as("ts"))
          .select(col("doc_id"),
            round(punctRatio(col("text")), 6).as("punct_ratio"),
            round(stopwordRatioFromTokens(col("ts")), 6).as("stopword_ratio"),
            round(meanTokenLenFromTokens(col("text"), col("ts")), 6).as("mean_token_len"),
            qualityScoreFromTokens(col("text"), col("ts")).as("quality"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  round(CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS punct_ratio,
              |  round(CASE WHEN len($T) = 0 THEN 0.0 ELSE CAST(len(list_filter($T, t -> list_contains(['the','a','an','and','or','of','to','in','is','it','on','for','with','as','at','by','from','that','this','be'], t))) AS DOUBLE) / len($T) END, 6) AS stopword_ratio,
              |  round(CASE WHEN len($T) = 0 THEN 0.0 ELSE CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len($T) END, 6) AS mean_token_len,
              |  round(
              |    least(CAST(len($T) AS DOUBLE) / 100.0, 1.0) * 0.4
              |    + least((CASE WHEN len($T) = 0 THEN 0.0 ELSE CAST(len(list_filter($T, t -> list_contains(['the','a','an','and','or','of','to','in','is','it','on','for','with','as','at','by','from','that','this','be'], t))) AS DOUBLE) / len($T) END) * 4.0, 1.0) * 0.4
              |    + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text) END) * 5.0) * 0.2
              |  , 6) AS quality
              |FROM documents ORDER BY doc_id""".stripMargin),
      headline = true),

    // Unicode-lite normalization with per-doc dirt (the text_pii_scrub
    // pattern: the synthetic corpus is clean ASCII, so curly quotes,
    // em-dash, ellipsis, a tab and double spaces are appended on both
    // sides to make every replacement branch non-vacuous).
    "text_normalize" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            concat(substring(col("text"), 1, 60),
              lit("  “Quote” — it’s … END\t"),
              col("doc_id").cast("string")).as("dirty"))
          .select(col("doc_id"),
            graft.ops.TextAnalysis.normalizeText(col("dirty")).as("clean"))
          .orderBy(col("doc_id")),
      Some(s"""WITH dirty AS (
              |  SELECT doc_id, substring(text, 1, 60)
              |    || '  “Quote” — it’s … END' || chr(9) || doc_id AS dirty
              |  FROM documents)
              |SELECT doc_id, ${graft.ops.TextAnalysis.normalizeTextSql("dirty")} AS clean
              |FROM dirty ORDER BY doc_id""".stripMargin)),

    // Overlapping token-window chunking (RAG / embedding-prep shape):
    // 32-token chunks on a 24-token stride; the oracle regenerates every
    // chunk via list slicing, so a boundary slip, dropped tail, or
    // re-join drift breaks the hash.
    "text_chunks" -> QueryDef(
      (s, d) =>
        graft.ops.TextAnalysis.chunkTokens(Tables.documents(s, d),
            "doc_id", "text", chunkSize = 32, stride = 24)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"), col("chunk_idx")),
      Some(s"""WITH base AS (
              |  SELECT doc_id AS id, $T AS ts FROM documents),
              |nz AS (SELECT id, ts, CAST(len(ts) AS BIGINT) AS n FROM base WHERE len(ts) > 0),
              |ks AS (SELECT id, ts,
              |    greatest(CAST(0 AS BIGINT),
              |      CAST(ceil(CAST(n - 32 AS DOUBLE) / 24.0) AS BIGINT)) AS lastk
              |  FROM nz),
              |ch AS (SELECT id,
              |    unnest(range(0, lastk + 1)) AS chunk_idx,
              |    unnest(list_transform(range(0, lastk + 1),
              |      k -> array_to_string(ts[k * 24 + 1 : k * 24 + 32], ' '))) AS chunk_text
              |  FROM ks)
              |SELECT id AS doc_id, chunk_idx,
              |  CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_chunk_tokens,
              |  chunk_text
              |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Sentence-aligned chunking (the RAG-preferred sibling of
    // text_chunks): boundaries after [.!?]+whitespace via the
    // RE2-portable marker-insert (no lookbehind in either engine), 3
    // sentences per chunk, stride 2. The synthetic corpus contains NO
    // terminators, so the query synthesizes deterministic sentence
    // structure per doc (a terminator chosen by doc_id after every 7th
    // token — the text_normalize per-doc-dirt precedent) so every
    // branch of the split and the window arithmetic fires on real rows;
    // the oracle replays the construction AND the chain.
    "text_sentence_chunks" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("ts"))
        val term = element_at(
          org.apache.spark.sql.functions.array(lit("."), lit("!"), lit("?")),
          (col("doc_id") % 3 + 1).cast("int"))
        val sentenced = concat_ws(" ",
          transform(sequence(lit(1), size(col("ts"))), i =>
            concat(element_at(col("ts"), i),
              when(i % 7 === 0, term).otherwise(lit("")))))
        graft.ops.TextAnalysis.sentenceChunks(
            docs.select(col("doc_id"), sentenced.as("sentenced")),
            "doc_id", "sentenced", chunkSentences = 3, stride = 2)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id AS id, $T AS ts,
             |    CASE doc_id % 3 WHEN 0 THEN '.' WHEN 1 THEN '!' ELSE '?' END AS term
             |  FROM documents),
             |sent AS (
             |  SELECT id, array_to_string(list_transform(range(1, len(ts) + 1),
             |    i -> ts[i] || CASE WHEN i % 7 = 0 THEN term ELSE '' END), ' ') AS stext
             |  FROM toks),
             |base AS (
             |  SELECT id,
             |    list_filter(list_transform(
             |      string_split(regexp_replace(trim(stext), '([.!?])\\s+', '\\1' || chr(31), 'g'), chr(31)),
             |      x -> trim(x)), x -> x <> '') AS ss
             |  FROM sent),
             |nz AS (SELECT id, ss, CAST(len(ss) AS BIGINT) AS n FROM base WHERE len(ss) > 0),
             |ks AS (SELECT id, ss,
             |    greatest(CAST(0 AS BIGINT),
             |      CAST(ceil(CAST(n - 3 AS DOUBLE) / 2.0) AS BIGINT)) AS lastk
             |  FROM nz),
             |ch AS (SELECT id,
             |    unnest(range(0, lastk + 1)) AS chunk_idx,
             |    unnest(list_transform(range(0, lastk + 1),
             |      k -> ss[k * 2 + 1 : k * 2 + 3])) AS chunk
             |  FROM ks)
             |SELECT id AS doc_id, chunk_idx,
             |  CAST(len(chunk) AS BIGINT) AS n_sentences,
             |  array_to_string(chunk, ' ') AS chunk_text
             |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin)),

    "text_langid" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), langId(col("text")).as("lang_guess"))
          .orderBy(col("doc_id")),
      Some {
        def hits(words: Seq[String]) =
          s"len(list_filter($T, t -> list_contains([${words.map("'" + _ + "'").mkString(",")}], t)))"
        val hDe = hits(graft.ops.TextAnalysis.LangStopwords("de"))
        val hEn = hits(graft.ops.TextAnalysis.LangStopwords("en"))
        val hEs = hits(graft.ops.TextAnalysis.LangStopwords("es"))
        val hFr = hits(graft.ops.TextAnalysis.LangStopwords("fr"))
        s"""SELECT doc_id, CASE
           |  WHEN m = 0 THEN 'und'
           |  WHEN h_de = m THEN 'de'
           |  WHEN h_en = m THEN 'en'
           |  WHEN h_es = m THEN 'es'
           |  ELSE 'fr' END AS lang_guess
           |FROM (
           |  SELECT doc_id, h_de, h_en, h_es, h_fr,
           |    greatest(h_de, h_en, h_es, h_fr) AS m
           |  FROM (SELECT doc_id, $hDe AS h_de, $hEn AS h_en, $hEs AS h_es, $hFr AS h_fr FROM documents)
           |) ORDER BY doc_id""".stripMargin
      }),

    // PII is synthesized deterministically per doc (the corpus itself is
    // clean), so the gate proves each pattern actually masks: the oracle
    // recomputes the same injection and the same RE2-safe replacements.
    "text_pii_scrub" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            concat(substring(col("text"), 1, 40),
              lit(" contact user"), col("doc_id"), lit("@example.com or "),
              lit("10.0."), col("doc_id") % 256, lit(".7 tel +1 (555) 010-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("dirty"))
          .select(col("doc_id"),
            graft.ops.TextAnalysis.scrubPii(col("dirty")).as("clean"))
          .orderBy(col("doc_id")),
      Some(s"""WITH dirty AS (
              |  SELECT doc_id, substring(text, 1, 40)
              |    || ' contact user' || doc_id || '@example.com or '
              |    || '10.0.' || (doc_id % 256) || '.7 tel +1 (555) 010-'
              |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS dirty
              |  FROM documents
              |)
              |SELECT doc_id, ${graft.ops.TextAnalysis.scrubPiiSql("dirty")} AS clean
              |FROM dirty ORDER BY doc_id""".stripMargin)),

    // Luhn-VALIDATED card masking (the checksum upgrade of text_pii_scrub's
    // shape-only masking). Per-doc dirt exercises every branch: bare valid
    // PAN, spaced valid PAN, card-shaped-but-invalid number (must survive
    // unmasked — the whole point), dashed 13-digit valid PAN.
    "text_card_mask" -> QueryDef(
      (s, d) => {
        val dirt = when(col("doc_id") % 4 === 0, lit(" pay 4111111111111111 now"))
          .when(col("doc_id") % 4 === 1, lit(" pan 4111 1111 1111 1111 ok"))
          .when(col("doc_id") % 4 === 2, lit(" id 4111111111111112 ref"))
          .otherwise(lit(" visa 4222-2222-2222-2 x"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            concat(substring(col("text"), 1, 50), dirt).as("dirty"))
          .select(col("doc_id"),
            graft.ops.TextAnalysis.maskCardNumbers(col("dirty")).as("clean"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH dirty AS (
              |  SELECT doc_id, substring(text, 1, 50) ||
              |    CASE WHEN doc_id % 4 = 0 THEN ' pay 4111111111111111 now'
              |         WHEN doc_id % 4 = 1 THEN ' pan 4111 1111 1111 1111 ok'
              |         WHEN doc_id % 4 = 2 THEN ' id 4111111111111112 ref'
              |         ELSE ' visa 4222-2222-2222-2 x' END AS dirty
              |  FROM documents)
              |SELECT doc_id, ${graft.ops.TextAnalysis.maskCardNumbersSql("dirty")} AS clean
              |FROM dirty ORDER BY doc_id""".stripMargin)),

    // Gopher-style repetition filter: share of duplicate word 3-grams.
    "text_repetition" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("ts"))
          .select(col("doc_id"),
            graft.ops.TextAnalysis.repetitionRatio(col("ts"), 3).as("dup3_ratio"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  CASE WHEN len($T) - 2 <= 1 THEN 0.0
              |       ELSE round(1.0 - CAST(len(${graft.queries.OracleSql.shingles(3)}) AS DOUBLE)
              |                      / (len($T) - 2), 6) END AS dup3_ratio
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Gopher-completeness gate: symbol spam, bullet-list pages, ellipsis
    // truncation, non-alphabetic floods + word-count/mean-length bounds.
    // The synthetic corpus is uniformly clean, so (the text_pii_scrub
    // pattern) deterministic per-doc_id dirt is appended first — bullets
    // on %4=0, '#' runs on %4=1, ellipsis lines on %4=2, untouched
    // otherwise — making every branch of the gate non-vacuous. q6 values
    // are floor(x*1e6+0.5) on BOTH engines (the report_corpus rule).
    "text_gopher" -> QueryDef(
      (s, d) => {
        val spice = when(col("doc_id") % 4 === 0,
            lit("\n- item one\n- item two\n- item three\n- item four"))
          .when(col("doc_id") % 4 === 1, lit(" ## ### #"))
          .when(col("doc_id") % 4 === 2, lit("\nto be continued...\nread more...\nfin"))
          .otherwise(lit(""))
        def q6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
        // kernel-parallelism floor: measured 1.45 -> 1.16 s at sf0.1
        Tables.documentsKernelPar(s, d)
          .select(col("doc_id"), concat(col("text"), spice).as("dirty"))
          .select(col("doc_id"), col("dirty"), tokens(col("dirty")).as("ts"))
          .select(col("doc_id"),
            size(col("ts")).cast("long").as("n_words"),
            q6(meanTokenLenFromTokens(col("dirty"), col("ts"))).as("mean_len_q6"),
            q6(symbolToWordRatio(col("dirty"), col("ts"))).as("symbol_q6"),
            q6(bulletLineFraction(col("dirty"))).as("bullet_q6"),
            q6(ellipsisLineFraction(col("dirty"))).as("ellipsis_q6"),
            q6(alphaWordFraction(col("ts"))).as("alpha_q6"),
            gopherKeep(col("dirty"), col("ts"), minWords = 30, maxWords = 10000,
              maxSymbolRatio = 0.05, maxBulletFrac = 0.5).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some {
        val e = "dirty"
        val t = OracleSql.tokensSql("dirty")
        def q6(x: String) = s"CAST(floor(($x) * 1000000 + 0.5) AS BIGINT)"
        s"""WITH dirty AS (
           |  SELECT doc_id, text || CASE
           |    WHEN doc_id % 4 = 0 THEN chr(10)||'- item one'||chr(10)||'- item two'||chr(10)||'- item three'||chr(10)||'- item four'
           |    WHEN doc_id % 4 = 1 THEN ' ## ### #'
           |    WHEN doc_id % 4 = 2 THEN chr(10)||'to be continued...'||chr(10)||'read more...'||chr(10)||'fin'
           |    ELSE '' END AS dirty
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len($t) AS BIGINT) AS n_words,
           |  ${q6(meanTokenLenSql(e, t))} AS mean_len_q6,
           |  ${q6(symbolToWordRatioSql(e, t))} AS symbol_q6,
           |  ${q6(bulletLineFractionSql(e))} AS bullet_q6,
           |  ${q6(ellipsisLineFractionSql(e))} AS ellipsis_q6,
           |  ${q6(alphaWordFractionSql(t))} AS alpha_q6,
           |  ${gopherKeepSql(e, t, 30, 10000, 3.0, 10.0, 0.05, 0.5, 0.3, 0.8)} AS keep
           |FROM dirty ORDER BY doc_id""".stripMargin
      },
      headline = true),

    // Test-set-leakage scan: corpus docs sharing ≥2 3-grams with a probe
    // ("benchmark") subset. Probe side is broadcast — the corpus never
    // shuffles (PlanSpec pins the BroadcastHashJoin). Parameters chosen
    // against ground truth so the gate row is non-vacuous: 12 true pairs
    // at sf0.01 (5-grams yield zero — the round-1 dedup_embedding lesson).
    "text_contamination" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.ops.Dedup.contaminationPairs(
            docs.filter(col("doc_id") % 97 =!= 0),
            docs.filter(col("doc_id") % 97 === 0),
            "doc_id", "text", shingleN = 3, minShared = 2L)
          .orderBy(col("doc_id"), col("probe_id"))
      },
      Some(s"""WITH hashed AS (
              |  SELECT doc_id, list_distinct(list_transform(${graft.queries.OracleSql.shingles(3)},
              |    s -> ${graft.functions.Hashing.h64Sql("s", "contam")})) AS hsh
              |  FROM documents
              |), cex AS (
              |  SELECT doc_id, CAST(len(hsh) AS BIGINT) AS doc_ngrams, unnest(hsh) AS h
              |  FROM hashed WHERE doc_id % 97 <> 0
              |), pex AS (
              |  SELECT doc_id AS probe_id, unnest(hsh) AS h
              |  FROM hashed WHERE doc_id % 97 = 0
              |)
              |SELECT c.doc_id, p.probe_id, count(*) AS shared, min(c.doc_ngrams) AS doc_ngrams
              |FROM cex c JOIN pex p USING (h)
              |GROUP BY c.doc_id, p.probe_id
              |HAVING count(*) >= 2
              |ORDER BY doc_id, probe_id""".stripMargin)),

    // SentencePiece-style unigram-LM Viterbi segmentation (Kudo 2018
    // inference) under the frozen fixture piece model: exact min-cost
    // DP per word (not BPE's greedy merge walk), ▁ word marks, unk
    // fallback. The oracle REPLAYS the DP — unrolled argmin steps with
    // the kernel's tie rule — and re-joins pieces per doc.
    "text_unigram_encode" -> QueryDef(
      (s, d) => {
        val pieces = graft.functions.UnigramEncode.of(
          tokens(col("text")), UnigramFixtureVocab, UnigramUnkCost)
        Tables.documents(s, d)
          .select(col("doc_id"), pieces.as("ps"))
          .select(col("doc_id"), size(col("ps")).cast("long").as("n_pieces"),
            concat_ws(" ", col("ps")).as("pieces"))
          .orderBy(col("doc_id"))
      },
      Some(unigramOracleSql(UnigramFixtureVocab, UnigramUnkCost, maxLen = 10)),
      headline = true),

    // CORPUS-TRAINED unigram model, train AND encode hash-gated: piece
    // costs derived from corpus substring frequencies via the wide
    // portable-ln chain (SentencePiece's seed-vocabulary construction),
    // then the same Viterbi DP as text_unigram_encode. The oracle
    // RETRAINS the model in SQL — word counts, substring explode, top-V
    // selection with the same tie order, the same ln/quantize — and
    // replays the DP against it, so a drift anywhere in train or encode
    // breaks the row.
    "text_unigram_corpus" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val vocab = graft.ops.TextAnalysis.trainUnigramCosts(docs, "text",
          maxPieceLen = 6, topV = 80)
        val pieces = graft.functions.UnigramEncode.of(
          tokens(col("text")), vocab, 20000000L)
        docs.select(col("doc_id"), pieces.as("ps"))
          .select(col("doc_id"), size(col("ps")).cast("long").as("n_pieces"),
            concat_ws(" ", col("ps")).as("pieces"))
          .orderBy(col("doc_id"))
      },
      {
        val P = graft.functions.PortableMath
        val vocabSql =
          s"""SELECT p, GREATEST(1, CAST(floor((lnt - lnc) * 1.0E6 + 0.5E0) AS BIGINT)) AS c
             |  FROM (SELECT p, ${P.lnFromPartsSql("zt", "zzt", "bt")} AS lnt,
             |               ${P.lnFromPartsSql("zc", "zzc", "bc")} AS lnc
             |    FROM (SELECT p, zt, (zt * zt) AS zzt, bt, zc, (zc * zc) AS zzc, bc
             |      FROM (SELECT p, ${P.zSql("mt")} AS zt, bt, ${P.zSql("mc")} AS zc, bc
             |        FROM (SELECT p, ${P.mWideSql("t1")} AS mt, ${P.biasWideSql("t1")} AS bt,
             |                     ${P.mWideSql("cnt")} AS mc, ${P.biasWideSql("cnt")} AS bc
             |          FROM (SELECT p, cnt FROM (
             |                  SELECT substring(sw, CAST(si AS INTEGER), CAST(sl AS INTEGER)) AS p,
             |                         CAST(sum(sc) AS BIGINT) AS cnt
             |                  FROM (SELECT w AS sw, c AS sc,
             |                          unnest(range(1, length(w) + 1)) AS si
             |                        FROM (SELECT t AS w, CAST(count(*) AS BIGINT) AS c
             |                              FROM (SELECT unnest($T) AS t FROM documents)
             |                              GROUP BY t)),
             |                       unnest(range(1, 7)) ul(sl)
             |                  WHERE si + sl - 1 <= length(sw)
             |                  GROUP BY 1
             |                ) ORDER BY cnt DESC, p LIMIT 80)
             |               CROSS JOIN (SELECT CAST(sum(cnt) AS BIGINT) + 1 AS t1 FROM (
             |                  SELECT cnt FROM (
             |                    SELECT substring(sw, CAST(si AS INTEGER), CAST(sl AS INTEGER)) AS p,
             |                           CAST(sum(sc) AS BIGINT) AS cnt
             |                    FROM (SELECT w AS sw, c AS sc,
             |                            unnest(range(1, length(w) + 1)) AS si
             |                          FROM (SELECT t AS w, CAST(count(*) AS BIGINT) AS c
             |                                FROM (SELECT unnest($T) AS t FROM documents)
             |                                GROUP BY t)),
             |                         unnest(range(1, 7)) ul(sl)
             |                    WHERE si + sl - 1 <= length(sw)
             |                    GROUP BY 1
             |                  ) ORDER BY cnt DESC, p LIMIT 80))
             |        ))))""".stripMargin
        Some(unigramOracleSqlWith(vocabSql, 20000000L, maxLen = 10))
      },
      headline = false),

    // Winnowing (MOSS) fingerprints: k=3-gram hashes, w=4 windows,
    // rightmost-min selection per window, distinct (pos, hash). The
    // oracle replays the hash walk and the reduce-with-tie-break per
    // window (list_reduce left fold ≡ Spark's aggregate fold; DuckDB's
    // 1-based indexes shifted).
    "text_winnow" -> QueryDef(
      (s, d) =>
        graft.ops.TextAnalysis.winnowFingerprints(Tables.documents(s, d),
            "doc_id", "text", k = 3, w = 4)
          .orderBy(col("id"), col("pos")),
      Some(s"""WITH $winnowCtes
              |SELECT DISTINCT id, s.p AS pos, s.h AS fp FROM sel
              |ORDER BY id, pos""".stripMargin)),

    // The MOSS pipeline closed into candidate generation: winnow
    // fingerprints joined on the hash, >= 2 shared per pair. Shares the
    // winnow CTE chain with text_winnow so selection cannot drift.
    "dedup_winnow" -> QueryDef(
      (s, d) =>
        graft.ops.TextAnalysis.winnowPairs(Tables.documents(s, d),
            "doc_id", "text", k = 3, w = 4, minShared = 2)
          .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH $winnowCtes,
              |fpd AS MATERIALIZED (SELECT DISTINCT id, s.h AS fp FROM sel)
              |SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
              |FROM fpd a JOIN fpd b ON a.fp = b.fp AND a.id < b.id
              |GROUP BY a.id, b.id HAVING count(*) >= 2
              |ORDER BY id_a, id_b""".stripMargin)),

    // Unicode-normalized dedup (round 15): "café" with precomposed é and
    // with e + combining acute are byte-different — digests and shingle
    // hashes miss the duplicate unless text canonically composes first.
    // Both engines build BOTH variants of each doc (decomposed a+U+0300
    // vs precomposed U+00E0), NFC-normalize, and md5-group: every pair
    // must collapse to one group of two. Cross-engine NFC equality is
    // itself under test (JDK Normalizer vs DuckDB's utf8proc).
    "text_nfc_dedup" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 100)
        val decomposed = docs.select((col("doc_id") * 2).as("id"),
          regexp_replace(col("text"), "a", "a\u0300").as("t"))
        val composed = docs.select((col("doc_id") * 2 + 1).as("id"),
          regexp_replace(col("text"), "a", "\u00E0").as("t"))
        decomposed.unionByName(composed)
          .select(col("id"), md5(graft.functions.NfcNormalize.of(col("t"))).as("h"))
          .groupBy(col("h"))
          .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy(col("keep_id"))
      },
      Some("""WITH variants AS (
             |  SELECT doc_id * 2 AS id,
             |    replace(text, 'a', 'a' || chr(768)) AS t
             |  FROM documents WHERE doc_id < 100
             |  UNION ALL
             |  SELECT doc_id * 2 + 1 AS id, replace(text, 'a', chr(224)) AS t
             |  FROM documents WHERE doc_id < 100)
             |SELECT md5(nfc_normalize(t)) AS h, min(id) AS keep_id,
             |  count(*) AS n_copies
             |FROM variants GROUP BY 1 ORDER BY keep_id""".stripMargin)),

    "text_fingerprint" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), col("text"), tokens(col("text")).as("ts"))
          .select(col("doc_id"),
            fingerprint(col("text")).as("fp"),
            rollingHashFromHashes(
              transform(col("ts"), t => graft.functions.Hashing.h64(t, "rh"))).as("rh"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  md5(array_to_string(list_sort(list_distinct($T)), ' ')) AS fp,
              |  CASE WHEN len($T) = 0 THEN 0 ELSE list_reduce(
              |    list_transform($T, t -> (${graft.functions.Hashing.h64Sql("t", "rh")} & 2147483647)),
              |    (acc, h) -> (CAST(acc AS BIGINT) * 1000003 + h) % 2147483648) END AS rh
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Line-level boilerplate filtering. The synthetic docs are single-line,
    // so multi-line pages are FABRICATED deterministically (same pattern as
    // the wire-format roundtrips): newlines planted at ' merge ' word
    // boundaries plus three appended boilerplate lines — an all-digit line
    // (dropped: digit ratio), a 'page N of 999' line (dropped at the 0.3
    // ratio), and a clean 4-word line (kept).
    "text_clean_lines" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            concat(
              regexp_replace(col("text"), " merge ", "\n"),
              lit("\n12 345 6789\npage "), col("doc_id").cast("string"),
              lit(" of 999\nkeep these three words")).as("t"))
          .select(col("doc_id"),
            cleanLines(col("t"), minWords = 3, maxDigitRatio = 0.3).as("clean_text"),
            size(split(col("t"), "\n")).cast("long").as("n_lines"),
            size(filter(split(col("t"), "\n"),
              l => keepLine(l, 3, 0.3))).cast("long").as("n_kept"))
          .orderBy(col("doc_id")),
      Some(s"""WITH fab AS (
              |  SELECT doc_id, replace(text, ' merge ', chr(10))
              |    || chr(10) || '12 345 6789' || chr(10) || 'page '
              |    || CAST(doc_id AS VARCHAR) || ' of 999' || chr(10)
              |    || 'keep these three words' AS t
              |  FROM documents)
              |SELECT doc_id,
              |  ${graft.ops.TextAnalysis.cleanLinesSql("t", 3, 0.3)} AS clean_text,
              |  len(string_split(t, chr(10))) AS n_lines,
              |  len(list_filter(string_split(t, chr(10)),
              |    l -> ${graft.ops.TextAnalysis.keepLineSql("l", 3, 0.3)})) AS n_kept
              |FROM fab ORDER BY doc_id""".stripMargin)),

    // Per-source curation report — the dashboard an operator reads before
    // touching mixture weights: volume, token mass, mean quality, English
    // share, and exact-duplicate share per source. Exactness discipline:
    // quality is already rounded to 6dp, so summing quality·10⁶ as a LONG
    // makes the mean independent of partition order (no fp64 summation).
    // Pairwise source-overlap matrix: exact Jaccard of pooled distinct
    // bigram-hash sets per source pair — the cross-source contamination
    // diagnostic. Hash fan-out per shingle is bounded by |sources|.
    "report_source_overlap" -> QueryDef(
      (s, d) =>
        graft.ops.TextAnalysis.sourceOverlap(Tables.documents(s, d),
            "source", "text", shingleN = 2)
          .orderBy(col("src_a"), col("src_b")),
      Some(s"""WITH base AS (
              |  SELECT source AS src, ${OracleSql.shingles(2)} AS sh FROM documents
              |), hashed AS (
              |  SELECT src, list_distinct(list_transform(sh, x -> ${graft.functions.Hashing.h64Sql("x", "srcov")})) AS hsh
              |  FROM base
              |), sh AS MATERIALIZED (
              |  SELECT DISTINCT src, unnest(hsh) AS h FROM hashed
              |), sizes AS MATERIALIZED (
              |  SELECT src, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY src
              |), o AS (
              |  SELECT a.src AS src_a, b.src AS src_b, CAST(count(*) AS BIGINT) AS n_shared
              |  FROM sh a JOIN sh b ON a.h = b.h AND a.src < b.src
              |  GROUP BY a.src, b.src
              |)
              |SELECT src_a, src_b, n_shared,
              |  round(CAST(n_shared AS DOUBLE) /
              |    CAST(sa.sz + sb.sz - n_shared AS DOUBLE), 6) AS jaccard
              |FROM o JOIN sizes sa ON sa.src = o.src_a
              |       JOIN sizes sb ON sb.src = o.src_b
              |ORDER BY src_a, src_b""".stripMargin)),

    "report_corpus" -> QueryDef(
      (s, d) =>
        Tables.documents(s, d)
          // text is consumed HERE and not carried: the dup window below
          // shuffles by digest, and the module rule is digests/ids only
          // across exchanges (PlanSpec pins it)
          .select(col("doc_id"), col("source"),
            tokenCount(col("text")).cast("long").as("nt"),
            // round-half-up, not a bare cast: double→long cast TRUNCATES in
            // Spark while DuckDB's CAST rounds, and ~1% of 6-decimal quality
            // values sit just under their integer (0.000249·1e6 =
            // 248.99999…) — the same floor(x+0.5) idiom as groupMeanEmbedding
            floor(qualityScore(col("text")) * 1e6 + 0.5).cast("long").as("q6"),
            when(langId(col("text")) === "en", 1L).otherwise(0L).as("is_en"),
            md5(col("text")).as("h"))
          .withColumn("dup",
            when(count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("h"))) > 1, 1L).otherwise(0L))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nt")).as("n_tokens"),
            round(sum(col("q6")).cast("double") / (count(lit(1)) * 1e6), 6).as("mean_quality"),
            sum(col("is_en")).as("n_en"),
            sum(col("dup")).as("n_dup_docs"))
          .orderBy(col("source")),
      Some(s"""WITH per_doc AS (
              |  SELECT doc_id, source,
              |    CAST(len($T) AS BIGINT) AS nt,
              |    CAST(floor(round(
              |      least(CAST(len($T) AS DOUBLE) / 100.0, 1.0) * 0.4
              |      + least((CASE WHEN len($T) = 0 THEN 0.0 ELSE CAST(len(list_filter($T, t -> list_contains(['the','a','an','and','or','of','to','in','is','it','on','for','with','as','at','by','from','that','this','be'], t))) AS DOUBLE) / len($T) END) * 4.0, 1.0) * 0.4
              |      + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text) END) * 5.0) * 0.2
              |    , 6) * 1e6 + 0.5) AS BIGINT) AS q6,
              |    CASE WHEN (${langIdSql}) = 'en' THEN 1 ELSE 0 END AS is_en,
              |    CASE WHEN count(*) OVER (PARTITION BY md5(text)) > 1 THEN 1 ELSE 0 END AS dup
              |  FROM documents
              |)
              |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(nt) AS BIGINT) AS n_tokens,
              |  round(CAST(sum(q6) AS DOUBLE) / (count(*) * 1e6), 6) AS mean_quality,
              |  CAST(sum(is_en) AS BIGINT) AS n_en,
              |  CAST(sum(dup) AS BIGINT) AS n_dup_docs
              |FROM per_doc GROUP BY source ORDER BY source""".stripMargin)),

    // Top-20 vocabulary with deterministic ids (count desc, token asc).
    "text_vocab" -> QueryDef(
      (s, d) =>
        graft.ops.TextAnalysis.buildVocab(Tables.documents(s, d), "text", 20)
          .orderBy(col("id")),
      Some(s"""WITH c AS (
              |  SELECT unnest($T) AS token FROM documents
              |), n AS (
              |  SELECT token, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY token
              |)
              |SELECT token, n,
              |  CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS BIGINT) AS id
              |FROM n ORDER BY n DESC, token LIMIT 20""".stripMargin),
      headline = true),

    // Real BPE subword tokenization over the corpus, oracle-gated: the
    // merge list is trained at DEFINITION time from a fixed word-frequency
    // fixture (trainBpeFromCounts is pure — no data access), so the same
    // constant merges drive the scan-stage BpeEncode kernel on the Spark
    // side and the generated replace-chain (TextAnalysis.bpeEncodeSql) on
    // the DuckDB side. Pieces render as a chr(31)/chr(30)-wrapped string:
    // both markers are absent from the corpus, so the rendering is
    // unambiguous and engine-identical. (Corpus-trained merges stay
    // spec-gated — oracle SQL is static and cannot retrain; the KERNEL
    // under test here is the same one trainBpe feeds.)
    "text_bpe_encode" -> QueryDef(
      (s, d) => {
        val merges = graft.ops.TextAnalysis.trainBpeFromCounts(BpeFixtureCounts, 24)
        // kernel-parallelism floor: measured 1.67 -> 0.88 s at sf0.1
        Tables.documentsKernelPar(s, d)
          .select(col("doc_id"),
            graft.functions.BpeEncode.of(tokens(col("text")), merges).as("p"))
          .select(col("doc_id"),
            concat_ws("", transform(col("p"),
              x => concat(lit("\u001F"), x, lit("\u001E")))).as("pieces_wrapped"),
            size(col("p")).cast("long").as("n_pieces"))
          .orderBy(col("doc_id"))
      },
      Some {
        val merges = graft.ops.TextAnalysis.trainBpeFromCounts(BpeFixtureCounts, 24)
        val enc = graft.ops.TextAnalysis.bpeEncodeSql("w", merges)
        s"""WITH enc AS (
           |  SELECT doc_id,
           |    array_to_string(list_transform($T, w -> $enc), '') AS pieces_wrapped
           |  FROM documents)
           |SELECT doc_id, pieces_wrapped,
           |  CAST(length(pieces_wrapped) -
           |       length(replace(pieces_wrapped, chr(31), '')) AS BIGINT) AS n_pieces
           |FROM enc ORDER BY doc_id""".stripMargin
      },
      headline = true),

    // WordPiece tokenization (the BERT tokenizer family — greedy
    // longest-match-first under a trained vocab, the third tokenizer
    // after BPE merge-replay and unigram-LM Viterbi), oracle-gated: the
    // vocab is trained at definition time from the shared fixture via
    // the HF likelihood objective (count(ab)/(count(a)·count(b)), exact
    // integer compare), so the same constant vocab drives the
    // scan-stage WordPieceEncode kernel and the generated
    // longest-match strip chain on the DuckDB side (applied per
    // DISTINCT word, then joined back in token order). Whole-word
    // [UNK] on any stuck position or over-length word — the HF
    // max_input_chars_per_word contract — is replayed by both engines.
    "text_wordpiece_encode" -> QueryDef(
      (s, d) => {
        val vocab = graft.ops.TextAnalysis.trainWordPieceFromCounts(BpeFixtureCounts, 16)
        // kernel-parallelism floor: measured 1.02 -> 0.79 s at sf0.1
        Tables.documentsKernelPar(s, d)
          .select(col("doc_id"),
            graft.functions.WordPieceEncode.of(tokens(col("text")), vocab, 20).as("p"))
          .select(col("doc_id"),
            concat_ws("", transform(col("p"),
              x => concat(lit(""), x, lit("")))).as("pieces_wrapped"),
            size(col("p")).cast("long").as("n_pieces"))
          .orderBy(col("doc_id"))
      },
      Some {
        val vocab = graft.ops.TextAnalysis.trainWordPieceFromCounts(BpeFixtureCounts, 16)
        val ctes = graft.ops.TextAnalysis.wordPieceEncodeCtes("words", vocab, 20)
        s"""WITH toks AS (SELECT doc_id, $T AS ts FROM documents),
           |tok AS MATERIALIZED (
           |  SELECT doc_id, unnest(ts) AS w, unnest(range(1, len(ts) + 1)) AS i
           |  FROM toks),
           |words AS (SELECT DISTINCT w FROM tok),
           |$ctes,
           |per AS (
           |  SELECT t.doc_id,
           |    string_agg(e.pieces_w, '' ORDER BY t.i) AS pieces_wrapped
           |  FROM tok t JOIN wp_enc e ON t.w = e.w GROUP BY t.doc_id)
           |SELECT d.doc_id, coalesce(p.pieces_wrapped, '') AS pieces_wrapped,
           |  CAST(length(coalesce(p.pieces_wrapped, '')) -
           |       length(replace(coalesce(p.pieces_wrapped, ''), chr(31), ''))
           |    AS BIGINT) AS n_pieces
           |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
           |ORDER BY d.doc_id""".stripMargin
      },
      headline = true),

    // WordPiece ids: the fused encode+lookup kernel under the standard
    // reserved-special id layout ([UNK]=0, then vocab pieces in order).
    // The oracle replays the SAME strip chain, then maps pieces through
    // a generated CASE — so the id assignment, not just the
    // segmentation, is engine-identical.
    "text_wordpiece_ids" -> QueryDef(
      (s, d) => {
        val vocab = graft.ops.TextAnalysis.trainWordPieceFromCounts(BpeFixtureCounts, 16)
        // kernel-parallelism floor: measured 1.02 -> 0.79 s at sf0.1
        Tables.documentsKernelPar(s, d)
          .select(col("doc_id"),
            graft.functions.WordPieceEncodeIds.of(tokens(col("text")), vocab, 20).as("ids"))
          .select(col("doc_id"),
            concat_ws(",", transform(col("ids"), _.cast("string"))).as("ids_joined"),
            size(filter(col("ids"), _ === 0L)).cast("long").as("n_unk"))
          .orderBy(col("doc_id"))
      },
      Some {
        val vocab = graft.ops.TextAnalysis.trainWordPieceFromCounts(BpeFixtureCounts, 16)
        val ctes = graft.ops.TextAnalysis.wordPieceEncodeCtes("words", vocab, 20)
        val caseExpr = (graft.functions.WordPieceKernel.Unk +: vocab).zipWithIndex
          .map { case (p, i) => s"WHEN '${p.replace("'", "''")}' THEN $i" }
          .mkString("CASE p ", " ", " ELSE 0 END")
        s"""WITH toks AS (SELECT doc_id, $T AS ts FROM documents),
           |tok AS MATERIALIZED (
           |  SELECT doc_id, unnest(ts) AS w, unnest(range(1, len(ts) + 1)) AS i
           |  FROM toks),
           |words AS (SELECT DISTINCT w FROM tok),
           |$ctes,
           |docp AS (
           |  SELECT t.doc_id,
           |    string_agg(e.pieces_w, '' ORDER BY t.i) AS pw
           |  FROM tok t JOIN wp_enc e ON t.w = e.w GROUP BY t.doc_id),
           |docids AS (
           |  SELECT doc_id,
           |    list_filter(string_split(replace(pw, chr(30), ''), chr(31)),
           |      p -> p <> '') AS pieces
           |  FROM docp)
           |SELECT d.doc_id,
           |  coalesce(array_to_string(
           |    list_transform(i.pieces, p -> CAST($caseExpr AS VARCHAR)), ','), '')
           |    AS ids_joined,
           |  CAST(coalesce(len(list_filter(i.pieces, p -> p = '[UNK]')), 0)
           |    AS BIGINT) AS n_unk
           |FROM documents d LEFT JOIN docids i ON d.doc_id = i.doc_id
           |ORDER BY d.doc_id""".stripMargin
      }),

    // CORPUS-trained WordPiece, train AND encode hash-gated: the oracle
    // RETRAINS the vocab in SQL (unrolled likelihood-argmax iterations
    // on an exact HUGEINT floor key — the text_bpe_corpus pattern for
    // the likelihood objective) and encodes via a recursive
    // longest-match walk over a precomputed per-(word, offset) match
    // table, so neither the trained pieces nor the segmentation is
    // trusted from the engine under test. Sized at 6 merges: each
    // unrolled likelihood iteration (two aggregates + two joins) holds
    // ~9 MB to query end in DuckDB and the 128 MB oracle bar caps the
    // chain — the 16-merge trainer itself is pinned by the fixture
    // gates, which run the identical Scala code. This gate caught a
    // real bug on arrival: DuckDB's array_to_string([], '') is NULL,
    // which silently dropped every single-char word from SQL training.
    "text_wordpiece_corpus" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val vocab = graft.ops.TextAnalysis.trainWordPiece(docs, "text",
          numMerges = 6, maxWords = 60)
        docs.select(col("doc_id"),
            graft.functions.WordPieceEncode.of(tokens(col("text")), vocab, 20).as("p"))
          .select(col("doc_id"),
            concat_ws("", transform(col("p"),
              x => concat(lit(""), x, lit("")))).as("pieces_wrapped"),
            size(col("p")).cast("long").as("n_pieces"))
          .orderBy(col("doc_id"))
      },
      Some {
        s"""WITH RECURSIVE ${graft.ops.TextAnalysis.wordPieceRetrainCtes(T, 60, 6)},
           |${graft.ops.TextAnalysis.wordPieceApplyDocCtes(T, 20)},
           |wp_per AS (
           |  SELECT t.doc_id,
           |    string_agg(e.pieces_w, '' ORDER BY t.i) AS pieces_wrapped
           |  FROM wpe_tok t JOIN wp_enc e ON t.w = e.w GROUP BY t.doc_id)
           |SELECT d.doc_id, coalesce(p.pieces_wrapped, '') AS pieces_wrapped,
           |  CAST(length(coalesce(p.pieces_wrapped, '')) -
           |       length(replace(coalesce(p.pieces_wrapped, ''), chr(31), ''))
           |    AS BIGINT) AS n_pieces
           |FROM documents d LEFT JOIN wp_per p ON d.doc_id = p.doc_id
           |ORDER BY d.doc_id""".stripMargin
      }),

    // WordPiece DECODE + round-trip identity: ids map back through the
    // reserved-special vocab, ## pieces rejoin their word, and the
    // `lossless` column asserts decode∘encode ≡ the normalized token
    // sequence for every UNK-free doc IN BOTH ENGINES — the oracle
    // re-derives decode from its own strip-chain pieces (word = strip
    // markers and ## prefixes), so the gate proves the identity, not
    // just the mapping.
    "text_wordpiece_decode" -> QueryDef(
      (s, d) => {
        val vocab = graft.ops.TextAnalysis.trainWordPieceFromCounts(BpeFixtureCounts, 16)
        val docs = Tables.documents(s, d)
        val ids = docs.select(col("doc_id"),
          graft.functions.WordPieceEncodeIds.of(tokens(col("text")), vocab, 20).as("ids"))
        graft.ops.TextAnalysis.decodeWordPieceIds(ids, "doc_id", "ids", vocab)
          .join(docs.select(col("doc_id"),
            array_join(tokens(col("text")), " ").as("norm")), Seq("doc_id"))
          .select(col("doc_id"), col("decoded"), col("n_unk"),
            (col("n_unk") > 0 || col("decoded") === col("norm")).as("lossless"))
          .orderBy(col("doc_id"))
      },
      Some {
        val vocab = graft.ops.TextAnalysis.trainWordPieceFromCounts(BpeFixtureCounts, 16)
        val ctes = graft.ops.TextAnalysis.wordPieceEncodeCtes("words", vocab, 20)
        s"""WITH toks AS (SELECT doc_id, $T AS ts FROM documents),
           |tok AS MATERIALIZED (
           |  SELECT doc_id, unnest(ts) AS w, unnest(range(1, len(ts) + 1)) AS i
           |  FROM toks),
           |words AS (SELECT DISTINCT w FROM tok),
           |$ctes,
           |perword AS (
           |  SELECT t.doc_id, t.i,
           |    replace(replace(replace(e.pieces_w, chr(30), ''),
           |      chr(31) || '##', ''), chr(31), '') AS word,
           |    CAST((length(e.pieces_w) - length(replace(e.pieces_w,
           |      chr(31) || '[UNK]' || chr(30), ''))) / 7 AS BIGINT) AS unks
           |  FROM tok t JOIN wp_enc e ON t.w = e.w),
           |per AS (
           |  SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS decoded,
           |    CAST(sum(unks) AS BIGINT) AS n_unk
           |  FROM perword GROUP BY doc_id)
           |SELECT d.doc_id, coalesce(p.decoded, '') AS decoded,
           |  coalesce(p.n_unk, 0) AS n_unk,
           |  (coalesce(p.n_unk, 0) > 0 OR
           |   coalesce(p.decoded, '') = array_to_string($T, ' ')) AS lossless
           |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
           |ORDER BY d.doc_id""".stripMargin
      }),

    // Mergeable log-histogram QUANTILE sketch (the third sketch family):
    // doc-length p50/p95/p99 intervals per source. Buckets are integer
    // threshold chains over the q20 image (no fp log2 — both engines
    // agree exactly); the oracle re-derives every bucket row, the
    // cumulative crossing, and the interval bounds; buckets_joined makes
    // the gate a full-sketch parity proof. Interval semantics: the true
    // quantile provably lies in [lo, hi], width ≤ 1/16 relative.
    "sketch_quantiles" -> QueryDef(
      (s, d) =>
        graft.ops.Sketches.quantilesFromBuckets(
            graft.ops.Sketches.quantileBuckets(
              Tables.documents(s, d), "source", col("n_chars")),
            "group", Seq(0.5, 0.95, 0.99))
          .withColumnRenamed("group", "source")
          .orderBy(col("source")),
      headline = true,
      oracle = Some {
        val S = graft.ops.Sketches
        val ests = Seq("50" -> "0.5", "95" -> "0.95", "99" -> "0.99").flatMap {
          case (nm, p) =>
            val k = s"CAST(ceil($p * CAST(n AS DOUBLE)) AS BIGINT)"
            Seq(s"arg_min(min_q, bucket) FILTER (WHERE cum >= $k) AS p${nm}_lo_q20",
              s"arg_min(max_q, bucket) FILTER (WHERE cum >= $k) AS p${nm}_hi_q20")
        }.mkString(",\n|    ")
        s"""WITH v0 AS (
           |  SELECT source AS grp,
           |    CAST(floor(CAST(n_chars AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT) AS q
           |  FROM documents WHERE n_chars IS NOT NULL),
           |v1 AS (SELECT grp, q, ${S.qBitlenSqlOverQ} AS L FROM v0),
           |v2 AS (SELECT grp, q, ${S.qBucketSqlOverQL} AS bucket FROM v1),
           |b AS (SELECT grp, bucket, CAST(count(*) AS BIGINT) AS cnt,
           |    min(q) AS min_q, max(q) AS max_q
           |  FROM v2 GROUP BY grp, bucket),
           |c AS (SELECT grp, bucket, cnt, min_q, max_q,
           |    sum(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum,
           |    sum(cnt) OVER (PARTITION BY grp) AS n
           |  FROM b)
           |SELECT grp AS source, CAST(max(n) AS BIGINT) AS n,
           |  string_agg(bucket || ':' || cnt, ',' ORDER BY bucket) AS buckets_joined,
           |    $ests
           |FROM c GROUP BY grp ORDER BY source""".stripMargin
      }),

    // Mergeable count-min frequency sketch, fully re-derived by the
    // oracle: token occurrences per source hash into 4×64 integer
    // counters (md5+affine indexes — the same portable family as
    // minhash); the 256-counter string makes the gate a full-sketch
    // parity proof, and the probe estimates (least over rows at
    // plan-time coordinates) pin the point-query path. 'zzqx' probes a
    // token absent from the corpus — its estimate is pure collision
    // mass, the CMS overestimate exhibit.
    "sketch_cms_counts" -> QueryDef(
      (s, d) =>
        graft.ops.Sketches.cmsCounts(
            Tables.documents(s, d)
              .select(col("source"),
                explode(graft.ops.TextAnalysis.tokens(col("text"))).as("it")),
            "source", col("it"), salt = "cms",
            probes = Seq("the", "and", "data", "zzqx"))
          .withColumnRenamed("group", "source")
          .orderBy(col("source")),
      Some {
        val S = graft.ops.Sketches
        val idxCols = (0 until S.CmsD)
          .map(d => s"${S.cmsIdxSql("x", d)} AS i$d").mkString(", ")
        val sums = (for (d <- 0 until S.CmsD; j <- 0 until S.CmsW)
          yield s"CAST(sum(CASE WHEN i$d = $j THEN 1 ELSE 0 END) AS BIGINT) AS c_${d}_$j")
          .mkString(",\n|    ")
        val joined = (for (d <- 0 until S.CmsD; j <- 0 until S.CmsW)
          yield s"CAST(c_${d}_$j AS VARCHAR)")
          .mkString("concat_ws(',', ", ", ", ")")
        val ests = Seq("the", "and", "data", "zzqx").map { p =>
          val coords = S.cmsIdxLiteral(p, "cms")
          coords.zipWithIndex.map { case (j, d) => s"c_${d}_$j" }
            .mkString("least(", ", ", s") AS est_$p")
        }.mkString(",\n|  ")
        s"""WITH items AS (
           |  SELECT source AS grp, unnest($T) AS it FROM documents),
           |x AS (SELECT grp, (${graft.functions.Hashing.h64Sql("it", "cms")} & 4294967295) AS x FROM items),
           |idx AS (SELECT grp, $idxCols FROM x),
           |wide AS (SELECT grp,
           |    $sums
           |  FROM idx GROUP BY grp)
           |SELECT grp AS source, $joined AS cms_joined,
           |  $ests
           |FROM wide ORDER BY source""".stripMargin
      }),

    // EXACT heavy hitters via the CMS pre-filter (the fourth sketch
    // exhibit): tokens with corpus frequency >= 100. The oracle is the
    // PLAIN exact query — GROUP BY HAVING — because the sketch is a
    // pure optimization: CMS never underestimates, so the candidate set
    // is a superset and the exact verify trims collisions. The Spark
    // side's keyed shuffle carries only candidate keys; the long tail
    // (most of the distinct-key mass at 100 TB) never shuffles.
    // heavyHitters evaluates its input TWICE (see its input contract):
    // this tokenize+explode recomputes deliberately — two scan-stage
    // passes over source bytes beat materializing a token stream many
    // times the corpus size.
    "sketch_heavy_hitters" -> QueryDef(
      (s, d) =>
        graft.ops.Sketches.heavyHitters(
            Tables.documents(s, d)
              .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("it")),
            col("it"), minCount = 100L, salt = "hh")
          .orderBy(col("item")),
      Some {
        s"""WITH items AS (
           |  SELECT unnest($T) AS it FROM documents)
           |SELECT it AS item, CAST(count(*) AS BIGINT) AS cnt
           |FROM items GROUP BY it HAVING count(*) >= 100
           |ORDER BY item""".stripMargin
      }),

    // Mergeable HLL cardinality sketch, fully re-derived by the oracle:
    // distinct 3-gram shingles per source — registers, scaled indicator
    // sum, and estimate are all md5/integer-exact; only the final
    // estimate is fp, in one shared expression. The 64-register string
    // in the output makes the gate a full-sketch parity proof, not just
    // an estimate comparison.
    "sketch_hll_distinct" -> QueryDef(
      (s, d) =>
        graft.ops.Sketches.hllDistinct(
            Tables.documents(s, d)
              .select(col("source"),
                explode(graft.ops.Dedup.shingles(col("text"), 3)).as("it")),
            "source", col("it"), salt = "hll")
          .withColumnRenamed("group", "source")
          .orderBy(col("source")),
      Some {
        val S = graft.ops.Sketches
        val regCols = (0 until 64).map(j =>
          s"coalesce(max(CASE WHEN reg = $j THEN r END), 0) AS r_$j").mkString(",\n|    ")
        // a || chain would nest 127 binary ops deep — past DuckDB's
        // binder recursion limit; concat_ws is one flat call
        val joined = (0 until 64).map(j => s"CAST(r_$j AS VARCHAR)")
          .mkString("concat_ws(',', ", ", ", ")")
        val sSum = (0 until 64).map(j =>
          s"(CASE WHEN r_$j <= 56 THEN (CAST(1 AS BIGINT) << (56 - r_$j)) ELSE CAST(0 AS BIGINT) END)")
          .mkString("(", " + ", ")")
        val zeros = (0 until 64).map(j => s"(CASE WHEN r_$j = 0 THEN 1 ELSE 0 END)")
          .mkString("(", " + ", ")")
        s"""WITH items AS (
           |  SELECT source AS grp, unnest(${graft.queries.OracleSql.shingles(3)}) AS it
           |  FROM documents),
           |h AS (SELECT grp, ${graft.functions.Hashing.h64Sql("it", "hll")} AS h FROM items),
           |pr AS (SELECT grp, CAST(h & 63 AS INT) AS reg, ${S.rankSql("(h >> 6)")} AS r FROM h),
           |mx AS (SELECT grp, reg, max(r) AS r FROM pr GROUP BY 1, 2),
           |wide AS (SELECT grp,
           |    $regCols
           |  FROM mx GROUP BY grp),
           |calc AS (SELECT grp, $joined AS registers_joined,
           |    $sSum AS s, $zeros AS zeros
           |  FROM wide),
           |est AS (SELECT grp, registers_joined, zeros,
           |    ${S.AlphaM2} * ${math.pow(2.0, 56)} / CAST(s AS DOUBLE) AS est_raw
           |  FROM calc)
           |SELECT grp AS source, registers_joined,
           |  CAST(floor((CASE WHEN est_raw <= 160.0 AND zeros > 0
           |    THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE)) ELSE est_raw END)
           |    * 1000.0 + 0.5) AS BIGINT) AS est_q3
           |FROM est ORDER BY source""".stripMargin
      }),

    // KMV (theta) sketch set algebra: pairwise cross-source 3-gram
    // overlap estimates — union, intersection, difference, Jaccard — from
    // bounded 64-hash sketches (HLL registers can only union; the KMV
    // hashes themselves support intersection, which is why both sketches
    // exist side by side). The custom TypedImperativeAggregate keeps k
    // longs of state per set with a map-side partial, so the corpus never
    // shuffles; the oracle re-derives every sketch (windowed row_number ≤
    // k over distinct md5 hashes), the union-law merge, and the shared
    // fp estimate expressions — a full-sketch parity proof across all
    // 190 source pairs.
    "sketch_theta_overlap" -> QueryDef(
      (s, d) => {
        // the codegen ShingleHashes kernel hashes each distinct 3-gram
        // exactly like h64(shingle, "kmv") — ~50× the interpreted
        // shingle-transform + md5-Column path this replaces
        val hashed = Tables.documents(s, d)
          .select(col("source"), tokens(col("text")).as("ts"))
          .select(col("source"),
            explode(graft.functions.ShingleHashes.of(col("ts"), 3, "kmv")).as("h"))
        graft.ops.Sketches.kmvPairwise(
            graft.ops.Sketches.kmvSketches(hashed, "source", col("h"), 64), 64)
          .orderBy(col("set_a"), col("set_b"))
      },
      Some(s"""WITH items AS (
              |  SELECT source AS grp, unnest(${graft.queries.OracleSql.shingles(3)}) AS it
              |  FROM documents
              |), hh AS (
              |  SELECT DISTINCT grp, ${graft.functions.Hashing.h64Sql("it", "kmv")} AS h
              |  FROM items
              |), ${graft.ops.Sketches.kmvPairwiseSql(64)}
              |SELECT set_a, set_b, n_a, n_b, n_union_sk, n_common,
              |  est_a_q3, est_b_q3, est_union_q3, est_isect_q3,
              |  est_diff_ab_q3, jaccard_q6
              |FROM kmvp ORDER BY set_a, set_b""".stripMargin),
      headline = true),

    // Data-mixing diagnostics: KL(source ‖ corpus) over the pooled top-25
    // vocabulary — which sources' unigram distributions sit far from the
    // blend (reweighting candidates). Terms integerize before summing
    // (q9), so the per-class sums are exact and order-free; the oracle
    // re-derives vocab, counts, both smoothed distributions, and every
    // term.
    "text_kl_sources" -> QueryDef(
      (s, d) =>
        graft.ops.LanguageModel.klBySource(Tables.documents(s, d),
            "source", "text", maxVocab = 25)
          .withColumnRenamed("c", "source")
          .orderBy(col("source")),
      Some(s"""WITH toks AS (SELECT source, $T AS ts FROM documents),
              |u AS (SELECT source, unnest(ts) AS t FROM toks),
              |vocab AS (SELECT t AS w, CAST(count(*) AS BIGINT) AS n FROM u
              |          WHERE t <> '<unk>'
              |          GROUP BY t ORDER BY n DESC, w LIMIT 25),
              |vs AS (SELECT CAST(count(*) AS DOUBLE) + 1.0 AS vp FROM vocab),
              |m AS (SELECT u.source AS c,
              |        CASE WHEN v.w IS NOT NULL THEN u.t ELSE '<unk>' END AS w
              |      FROM u LEFT JOIN vocab v ON v.w = u.t),
              |cnt AS (SELECT c, w, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY 1, 2),
              |ctot AS (SELECT c, CAST(sum(n) AS BIGINT) AS nt FROM cnt GROUP BY 1),
              |wtot AS (SELECT w, CAST(sum(n) AS BIGINT) AS nw FROM cnt GROUP BY 1),
              |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nall FROM cnt),
              |vkeys AS (SELECT w FROM vocab UNION ALL SELECT '<unk>'),
              |grid AS (
              |  SELECT ct.c, ct.nt, vk.w, coalesce(cn.n, 0) AS n,
              |    coalesce(wt.nw, 0) AS nw, t.nall, vs.vp
              |  FROM ctot ct CROSS JOIN vkeys vk
              |  LEFT JOIN cnt cn ON cn.c = ct.c AND cn.w = vk.w
              |  LEFT JOIN wtot wt ON wt.w = vk.w
              |  CROSS JOIN tot t CROSS JOIN vs),
              |terms AS (
              |  SELECT c, nt,
              |    CAST(floor(
              |      ((CAST(n AS DOUBLE) + 1.0) / (CAST(nt AS DOUBLE) + vp))
              |      * ln(((CAST(n AS DOUBLE) + 1.0) / (CAST(nt AS DOUBLE) + vp))
              |           / ((CAST(nw AS DOUBLE) + 1.0) / (CAST(nall AS DOUBLE) + vp)))
              |      * 1000000000.0 + 0.5) AS BIGINT) AS term_q9
              |  FROM grid)
              |SELECT c AS source, CAST(min(nt) AS BIGINT) AS n_tokens,
              |  CAST(sum(term_q9) AS BIGINT) AS kl_q9
              |FROM terms GROUP BY c ORDER BY source""".stripMargin)),

    // C4-style corpus-level frequent-line removal: lines occurring more
    // than maxOccurrences times ACROSS the corpus are boilerplate and
    // dropped everywhere; docs reassemble in original line order. The
    // corpus has no newlines, so lines are fabricated deterministically
    // (the pipeline_e2e pattern) plus planted boilerplate: a footer on
    // every doc (dropped), a banner on every third (dropped), a unique
    // ref line on every seventh (kept).
    "text_dedup_lines" -> QueryDef(
      (s, d) => {
        val fab = Tables.documents(s, d).select(col("doc_id"),
          concat(
            replace(col("text"), lit(" merge "), lit("\n")),
            lit("\ncopyright example corp all rights reserved"),
            when(col("doc_id") % 3 === 0,
              lit("\nsubscribe to our newsletter today")).otherwise(lit("")),
            when(col("doc_id") % 7 === 0,
              concat(lit("\nref code "), col("doc_id").cast("string")))
              .otherwise(lit(""))).as("t"))
        graft.ops.TextAnalysis.dedupFrequentLines(fab, "doc_id", "t", maxOccurrences = 3)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH fab AS (
              |  SELECT doc_id, replace(text, ' merge ', chr(10))
              |    || chr(10) || 'copyright example corp all rights reserved'
              |    || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'subscribe to our newsletter today' ELSE '' END
              |    || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'ref code ' || doc_id ELSE '' END AS t
              |  FROM documents
              |), ls AS (
              |  SELECT doc_id, unnest(string_split(t, chr(10))) AS line,
              |    unnest(range(1, len(string_split(t, chr(10))) + 1)) AS idx
              |  FROM fab
              |), freq AS (
              |  SELECT line FROM ls GROUP BY line HAVING count(*) > 3
              |), kept AS (
              |  SELECT doc_id, idx, line FROM ls
              |  WHERE line NOT IN (SELECT line FROM freq)
              |), reb AS (
              |  SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS clean,
              |    CAST(count(*) AS BIGINT) AS n_kept
              |  FROM kept GROUP BY doc_id
              |)
              |SELECT d.doc_id, coalesce(r.clean, '') AS clean,
              |  coalesce(r.n_kept, 0) AS n_kept
              |FROM documents d LEFT JOIN reb r USING (doc_id)
              |ORDER BY d.doc_id""".stripMargin)),

    // Multinomial Naive Bayes source classifier, train AND score
    // hash-gated (the text_lm_score pattern): the oracle re-derives the
    // global vocab, the per-(class, mapped-token) counts, every add-one
    // integer-scaled cost, the priors, and each document's argmin class —
    // a drift anywhere in training or scoring breaks the hash. The
    // synthetic corpus carries no real class signal; the gate proves
    // engine parity of the full train/score path, not model quality.
    "text_nb_classify" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val m = graft.ops.NaiveBayes.train(docs, "source", "text", maxVocab = 40)
        graft.ops.NaiveBayes.classify(docs, "doc_id", "text", m)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, source, $T AS ts FROM documents),
              |u AS (SELECT doc_id, source, unnest(ts) AS t FROM toks),
              |vocab AS (
              |  SELECT t AS w, CAST(count(*) AS BIGINT) AS n FROM u
              |  WHERE t <> '<unk>'
              |  GROUP BY t ORDER BY n DESC, w LIMIT 40),
              |vsize AS (SELECT CAST(count(*) AS BIGINT) + 1 AS vp FROM vocab),
              |m AS (
              |  SELECT u.doc_id, u.source,
              |    CASE WHEN v.w IS NOT NULL THEN u.t ELSE '<unk>' END AS w
              |  FROM u LEFT JOIN vocab v ON v.w = u.t),
              |cnt AS (SELECT source AS c, w, CAST(count(*) AS BIGINT) AS n
              |        FROM m GROUP BY 1, 2),
              |ctot AS (SELECT source AS c, CAST(count(*) AS BIGINT) AS nt
              |         FROM m GROUP BY 1),
              |vkeys AS (SELECT w FROM vocab UNION ALL SELECT '<unk>'),
              |costs AS (
              |  SELECT ct.c, vk.w,
              |    CAST(floor(-ln((CAST(coalesce(cn.n, 0) AS DOUBLE) + 1.0)
              |      / (CAST(ct.nt AS DOUBLE) + CAST(vs.vp AS DOUBLE))) * 1e6 + 0.5) AS BIGINT) AS q6
              |  FROM ctot ct CROSS JOIN vkeys vk CROSS JOIN vsize vs
              |  LEFT JOIN cnt cn ON cn.c = ct.c AND cn.w = vk.w),
              |dpri AS (SELECT source AS c, CAST(count(*) AS BIGINT) AS nd
              |         FROM documents GROUP BY 1),
              |tot AS (SELECT CAST(count(*) AS BIGINT) AS ndocs FROM documents),
              |priors AS (
              |  SELECT d.c,
              |    CAST(floor(-ln(CAST(d.nd AS DOUBLE) / CAST(t.ndocs AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS pq6
              |  FROM dpri d CROSS JOIN tot t),
              |docsum AS (
              |  SELECT m.doc_id, cs.c, CAST(sum(cs.q6) AS BIGINT) AS s
              |  FROM m JOIN costs cs ON cs.w = m.w GROUP BY 1, 2),
              |allsc AS (
              |  SELECT d.doc_id, p.c, p.pq6 + coalesce(ds.s, 0) AS score
              |  FROM documents d CROSS JOIN priors p
              |  LEFT JOIN docsum ds ON ds.doc_id = d.doc_id AND ds.c = p.c),
              |ranked AS (
              |  SELECT doc_id, c, score,
              |    row_number() OVER (PARTITION BY doc_id ORDER BY score, c) AS rn
              |  FROM allsc)
              |SELECT doc_id, c AS pred, score AS score_q6
              |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // CORPUS-trained BPE, train side oracle-gated: trainBpe derives the
    // merge list from the documents table itself (distributed top-60
    // word counts → driver merge loop), and the oracle RETRAINS the same
    // merges in SQL — word counts, 16 unrolled argmax-merge iterations
    // with identical (count DESC, pair) tie-breaks — then re-encodes
    // every document with them. A drift anywhere in training (counting,
    // tie-breaks, merge application) or encoding breaks the hash.
    // Complements text_bpe_encode, whose frozen-fixture merges pin only
    // the ENCODE side.
    "text_bpe_corpus" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = graft.ops.TextAnalysis.trainBpe(docs, "text",
          numMerges = 16, maxWords = 60)
        docs.select(col("doc_id"),
            graft.functions.BpeEncode.of(tokens(col("text")), merges).as("p"))
          .select(col("doc_id"),
            concat_ws("", transform(col("p"),
              x => concat(lit("\u001F"), x, lit("\u001E")))).as("pieces_wrapped"),
            size(col("p")).cast("long").as("n_pieces"))
          .orderBy(col("doc_id"))
      },
      Some {
        s"""WITH ${graft.ops.TextAnalysis.bpeRetrainCtes(T, 60, 16)},
           |${graft.ops.TextAnalysis.bpeApplyDocCtes(T, 16)}
           |SELECT doc_id, s AS pieces_wrapped,
           |  CAST(length(s) - length(replace(s, chr(31), '')) AS BIGINT) AS n_pieces
           |FROM bpe_doc_16 ORDER BY doc_id""".stripMargin
      }),

    // CCNet-style LM quality filter: a pruned add-one bigram LM trained on
    // the corpus itself (top-50 vocab, top-300 bigrams — small enough that
    // the unk and pruned-bigram paths fire on real rows), scoring every
    // doc by integer-scaled NLL. The oracle retrains the identical LM in
    // SQL (same counts, same tie-breaks) and re-derives every per-token
    // probability — train AND score both hash-gated.
    "text_lm_score" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val lm = graft.ops.LanguageModel.train(docs, "text", maxVocab = 50, maxBigrams = 300)
        graft.ops.LanguageModel.scoreNll(docs, "doc_id", "text", lm)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${lmNllCtes(50, 300)}
              |SELECT d.doc_id, CAST(len($T) AS BIGINT) AS n_tokens,
              |  coalesce(a.nll_q6, 0) AS nll_q6
              |FROM documents d LEFT JOIN agg a USING (doc_id)
              |ORDER BY doc_id""".stripMargin),
      headline = true),

    // The COMPLETE tokenizer path: tokens → BPE pieces → integer ids —
    // what a pretraining pipeline actually materializes. Vocab ids are the
    // standard BPE layout (sorted training alphabet + EOW, then merges in
    // rank order — TextAnalysis.bpeVocab); pieces outside the vocab
    // (corpus characters unseen in the training fixture) map to -1, so the
    // OOV path is exercised on real rows. Oracle: the same wrapped-string
    // encode as text_bpe_encode, split back to pieces, mapped through a
    // generated CASE over the identical vocab.
    "text_bpe_ids" -> QueryDef(
      (s, d) => {
        val merges = graft.ops.TextAnalysis.trainBpeFromCounts(BpeFixtureCounts, 24)
        val vocab = graft.ops.TextAnalysis.bpeVocab(BpeFixtureCounts, merges)
        // fused encode+lookup kernel: one pass per row, ids in the scan
        // stage (the piece-array + interpreted map-literal form was ~40%
        // slower at sf0.1)
        Tables.documents(s, d)
          .select(col("doc_id"),
            graft.functions.BpeEncodeIds.of(tokens(col("text")), merges, vocab).as("ids"))
          .select(col("doc_id"),
            concat_ws(",", transform(col("ids"), _.cast("string"))).as("ids_joined"),
            size(filter(col("ids"), _ === -1L)).cast("long").as("n_oov"))
          .orderBy(col("doc_id"))
      },
      Some {
        val merges = graft.ops.TextAnalysis.trainBpeFromCounts(BpeFixtureCounts, 24)
        val vocab = graft.ops.TextAnalysis.bpeVocab(BpeFixtureCounts, merges)
        val enc = graft.ops.TextAnalysis.bpeEncodeSql("w", merges)
        val caseExpr = vocab.zipWithIndex
          .map { case (p, i) => s"WHEN '${p.replace("'", "''")}' THEN $i" }
          .mkString("CASE p ", " ", " ELSE -1 END")
        s"""WITH enc AS (
           |  SELECT doc_id,
           |    list_filter(string_split(replace(
           |      array_to_string(list_transform($T, w -> $enc), ''),
           |      chr(30), ''), chr(31)), p -> p <> '') AS pieces
           |  FROM documents)
           |SELECT doc_id,
           |  array_to_string(list_transform(pieces, p -> CAST($caseExpr AS VARCHAR)), ',') AS ids_joined,
           |  CAST(len(list_filter(pieces, p -> ($caseExpr) = -1)) AS BIGINT) AS n_oov
           |FROM enc ORDER BY doc_id""".stripMargin
      }),

    // BPE DECODE + the tokenizer round-trip identity: ids from the fused
    // encode kernel map back through the vocab (plan-literal map,
    // scan-stage), pieces concatenate, EOW becomes a space — and the
    // `lossless` column asserts decode∘encode ≡ the normalized token
    // sequence for every OOV-free doc, in BOTH engines (the oracle
    // recomputes decode and the identity independently, so the hash gate
    // proves the round trip, not just the mapping).
    "text_bpe_decode" -> QueryDef(
      (s, d) => {
        val merges = graft.ops.TextAnalysis.trainBpeFromCounts(BpeFixtureCounts, 24)
        val vocab = graft.ops.TextAnalysis.bpeVocab(BpeFixtureCounts, merges)
        val docs = Tables.documents(s, d)
        val ids = docs.select(col("doc_id"),
          graft.functions.BpeEncodeIds.of(tokens(col("text")), merges, vocab).as("ids"))
        graft.ops.TextAnalysis.decodeBpeIds(ids, "doc_id", "ids", vocab)
          .join(docs.select(col("doc_id"),
            array_join(tokens(col("text")), " ").as("norm")), Seq("doc_id"))
          .select(col("doc_id"), col("decoded"), col("n_unk"),
            (col("n_unk") > 0 || col("decoded") === col("norm")).as("lossless"))
          .orderBy(col("doc_id"))
      },
      Some {
        val merges = graft.ops.TextAnalysis.trainBpeFromCounts(BpeFixtureCounts, 24)
        val vocab = graft.ops.TextAnalysis.bpeVocab(BpeFixtureCounts, merges)
        val caseExpr = vocab.zipWithIndex
          .map { case (p, i) => s"WHEN '${p.replace("'", "''")}' THEN $i" }
          .mkString("CASE p ", " ", " ELSE -1 END")
        s"""WITH enc AS (
           |  SELECT doc_id,
           |    list_filter(string_split(replace(
           |      array_to_string(list_transform($T, w -> ${graft.ops.TextAnalysis.bpeEncodeSql("w", merges)}), ''),
           |      chr(30), ''), chr(31)), p -> p <> '') AS pieces
           |  FROM documents
           |), dec AS (
           |  SELECT doc_id,
           |    trim(replace(array_to_string(list_transform(pieces,
           |      p -> CASE WHEN ($caseExpr) = -1 THEN '<unk>' ELSE p END), ''),
           |      '</w>', ' ')) AS decoded,
           |    CAST(len(list_filter(pieces, p -> ($caseExpr) = -1)) AS BIGINT) AS n_unk
           |  FROM enc
           |), n AS (
           |  SELECT doc_id, array_to_string($T, ' ') AS norm FROM documents
           |)
           |SELECT d.doc_id, d.decoded, d.n_unk,
           |  (d.n_unk > 0 OR d.decoded = n.norm) AS lossless
           |FROM dec d JOIN n USING (doc_id) ORDER BY doc_id""".stripMargin
      }),

    // Corpus→ids encode pass: the top-30 vocabulary (count desc, token asc
    // ids — same definition as text_vocab) applied back to every document.
    // Ids render as a comma-joined string (integer arrays would trip the
    // arrow element-name gate; integers render identically in both
    // engines). OOV → -1, so len(ids) always equals the token count.
    "text_encode_ids" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.ops.TextAnalysis.encodeIds(docs, "doc_id", "text",
            graft.ops.TextAnalysis.buildVocab(docs, "text", 30))
          .select(col("doc_id"),
            concat_ws(",", transform(col("ids"), _.cast("string"))).as("ids_joined"),
            col("n_oov"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH c AS (
              |  SELECT unnest($T) AS token FROM documents
              |), n AS (
              |  SELECT token, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY token
              |), v AS (
              |  SELECT token, CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS BIGINT) AS id
              |  FROM n ORDER BY n DESC, token LIMIT 30
              |), u AS (
              |  SELECT doc_id, unnest($T) AS t, unnest(range(len($T))) AS ord
              |  FROM documents
              |), e AS (
              |  SELECT u.doc_id,
              |    array_to_string(list(coalesce(v.id, -1) ORDER BY u.ord), ',') AS ids_joined,
              |    CAST(sum(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
              |  FROM u LEFT JOIN v ON v.token = u.t
              |  GROUP BY u.doc_id
              |)
              |SELECT d.doc_id,
              |  coalesce(e.ids_joined, '') AS ids_joined,
              |  coalesce(e.n_oov, 0) AS n_oov
              |FROM documents d LEFT JOIN e USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    // BM25 keyword relevance against a fixed query-term set; exact-integer
    // corpus stats make the scores parallelism-independent, and the oracle
    // CTE (TextAnalysis.bm25Sql) repeats the identical per-term arithmetic
    // in the identical association order.
    "text_bm25" -> QueryDef(
      (s, d) =>
        graft.ops.TextAnalysis.bm25Scores(
            Tables.documents(s, d), "doc_id", "text", Bm25Terms)
          .orderBy(col("doc_id")),
      Some(s"""WITH ${graft.ops.TextAnalysis.bm25Sql(Bm25Terms, T)}
              |SELECT doc_id, bm25 FROM scored ORDER BY doc_id""".stripMargin),
      headline = true),

    // Per-doc unigram Shannon entropy + type count (lexical-diversity /
    // natural-language quality signals): exact n-scaled nano-nat integers
    // via the wide portable-ln — Spark computes them shuffle-FREE in the
    // scan stage (lnWideCol inside the array lambda), the oracle replays
    // the identical quantization through the explode/group/CTE chain, so
    // the hash gate proves the lambda arithmetic ≡ the SQL chain.
    "text_entropy" -> QueryDef(
      (s, d) =>
        graft.ops.TextAnalysis.tokenEntropy(Tables.documents(s, d), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(s"""WITH ${graft.ops.TextAnalysis.tokenEntropySql(T)}
              |SELECT doc_id, n_tokens, n_types, entropy_qn
              |FROM ent ORDER BY doc_id""".stripMargin)),

    // TF-IDF top-3 keywords per doc: train (df/N statistics) AND rank are
    // hash-gated — the oracle recomputes tf, df, the portable-ln idf
    // difference, the nano-nat quantization, and the (score desc, term)
    // tie order bit-for-bit.
    "text_keywords" -> QueryDef(
      (s, d) =>
        graft.ops.TextAnalysis.tfidfKeywords(
            Tables.documents(s, d), "doc_id", "text", k = KeywordsK)
          .orderBy(col("doc_id"), col("rank")),
      Some(s"""WITH ${graft.ops.TextAnalysis.tfidfKeywordsSql(T, KeywordsK)}
              |SELECT doc_id, rank, term, score_q FROM kw
              |ORDER BY doc_id, rank""".stripMargin),
      headline = true),

    // PPMI word features over TOKEN co-occurrence (window 2) — the same
    // operator as graph_ppmi (walkPpmi is input-agnostic over (center,
    // context, cnt)) fed by the text skip-gram corpus instead of the
    // walk corpus: Levy-Goldberg distributional features straight off
    // documents, no trainer. Pairs generate in the scan stage (array
    // lambdas, no positions self-join); the oracle replays pairing,
    // marginals, the four-term wide-ln sum, quantization, and the
    // (ppmi_qn desc, context) rank cut.
    "text_ppmi" -> QueryDef(
      (s, d) =>
        graft.ops.Graph.walkPpmi(
            graft.ops.TextAnalysis.tokenSkipGrams(
              Tables.documents(s, d), "text", window = 2), k = 3)
          .orderBy(col("center"), col("rank")),
      Some(s"""WITH ${graft.ops.TextAnalysis.tokenSkipGramsSql(T, 2)},
              |${graft.ops.Graph.walkPpmiSql(3)}
              |SELECT center, rank, context, ppmi_qn FROM ppk
              |ORDER BY center, rank""".stripMargin))
  )

  /** Keywords per doc for text_keywords. */
  private val KeywordsK = 3

  /** The fixed "search query" for text_bm25 — terms present in the
    * synthetic corpus at varied frequencies. */
  private val Bm25Terms = Seq("hash", "spark", "window", "vector", "merge")
}
