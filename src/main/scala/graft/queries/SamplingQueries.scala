package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Sampling, TextAnalysis}
import graft.queries.{OracleSql => O}

/** Deterministic sampling / split / packing operators as verifiable
  * queries over `documents`. Every keep/assign decision is md5-derived
  * (graft.ops.Sampling), so the DuckDB oracle reproduces each decision
  * exactly and the driver's hash gate checks full memberships — not just
  * counts. Parameters are chosen against sf0.01 ground truth so no query
  * is vacuous (every sample is a strict, non-empty subset; the budget
  * fraction is < 1; the probe set removes fingerprint-dup docs).
  */
object SamplingQueries extends QueryModule {

  /** DuckDB mirror of Sampling.coin over `expr` (stringified key). */
  private def coinSql(expr: String, salt: String): String =
    O.h32Sql(expr, salt)

  private val tc = s"CAST(len(${O.T}) AS BIGINT)"

  def defs: Map[String, QueryDef] = Map(
    "sample_bernoulli" -> QueryDef(
      (s, d) =>
        Sampling.bernoulli(Tables.documents(s, d), "doc_id", 0.2, "bern")
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, source FROM documents
              |WHERE ${coinSql("doc_id", "bern")} < ${Sampling.threshold32(0.2)}
              |ORDER BY doc_id""".stripMargin)),

    "sample_stratified" -> QueryDef(
      (s, d) =>
        Sampling.stratified(Tables.documents(s, d), "lang", "doc_id",
            Map("en" -> 0.5, "zh" -> 0.1), defaultFraction = 0.25, salt = "strat")
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, lang FROM documents
              |WHERE ${coinSql("doc_id", "strat")} <
              |  CASE lang WHEN 'en' THEN ${Sampling.threshold32(0.5)}
              |            WHEN 'zh' THEN ${Sampling.threshold32(0.1)}
              |            ELSE ${Sampling.threshold32(0.25)} END
              |ORDER BY doc_id""".stripMargin)),

    "sample_split" -> QueryDef(
      (s, d) =>
        Sampling.assignSplit(Tables.documents(s, d), "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "split")
          .select(col("doc_id"), col("split"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  CASE WHEN ${coinSql("doc_id", "split")} < ${Sampling.threshold32(0.8)} THEN 'train'
              |       WHEN ${coinSql("doc_id", "split")} < ${Sampling.threshold32(0.9)} THEN 'val'
              |       ELSE 'test' END AS split
              |FROM documents ORDER BY doc_id""".stripMargin)),

    "sample_uniform_k" -> QueryDef(
      (s, d) =>
        Sampling.uniformK(Tables.documents(s, d), "source", "doc_id", k = 5,
            salt = "uk")
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, source FROM documents
              |QUALIFY row_number() OVER (
              |  PARTITION BY source ORDER BY ${coinSql("doc_id", "uk")}, doc_id) <= 5
              |ORDER BY doc_id""".stripMargin)),

    // Weighted k-per-group (Efraimidis–Spirakis priorities): longer docs
    // proportionally likelier, ranked by ln(u)/w. ln is the PortableMath
    // series — the identical generated fragments run in Spark and here,
    // so the priorities are bit-equal by construction (no libm parity
    // assumption; round-9 advice #4).
    "sample_weighted_k" -> QueryDef(
      (s, d) =>
        Sampling.weightedUniformK(Tables.documents(s, d), "source", "doc_id",
            col("n_chars"), k = 5, salt = "wk")
          .select(col("doc_id"), col("source"), col("n_chars"))
          .orderBy(col("doc_id")),
      {
        val P = graft.functions.PortableMath
        Some(s"""WITH t0 AS (
                |  SELECT doc_id, source, n_chars,
                |    ${coinSql("doc_id", "wk")} + 1 AS __x
                |  FROM documents WHERE n_chars > 0
                |), t1 AS (
                |  SELECT *, ${P.mSql("__x")} AS __m, ${P.biasSql("__x")} AS __b FROM t0
                |), t2 AS (SELECT *, ${P.zSql("__m")} AS __z FROM t1
                |), t3 AS (SELECT *, (__z * __z) AS __zz FROM t2)
                |SELECT doc_id, source, n_chars FROM (
                |  SELECT doc_id, source, n_chars,
                |    row_number() OVER (PARTITION BY source ORDER BY
                |      ${P.lnFromPartsSql("__z", "__zz", "__b")}
                |        / CAST(n_chars AS DOUBLE) DESC, doc_id) AS rn
                |  FROM t3)
                |WHERE rn <= 5 ORDER BY doc_id""".stripMargin)
      }),

    // DSIR importance selection: keep the 100 pool docs (source <> src0)
    // whose hashed-unigram distribution is most target-like (target =
    // src0). The oracle retrains both bucket models, replays the wide
    // portable-ln chain per bucket AND for the totals term, quantizes the
    // same nano-nat integers, and re-ranks — every bucket weight and doc
    // score is bit-identical, so the hash gate covers train + score +
    // select. (Zero-token pool docs have no feature rows and are
    // unrankable by construction — both engines drop them in GROUP BY.)
    "sample_dsir" -> QueryDef(
      (s, d) =>
        // kernel-parallelism floor: the tokenize+hash pass otherwise runs
        // as one task at fixture split counts
        Sampling.dsirSelect(Tables.documentsKernelPar(s, d), "doc_id", "text",
            col("source") === "src0", buckets = 512, k = 100)
          .orderBy(col("score_q9").desc, col("id")),
      {
        val P = graft.functions.PortableMath
        val B = 512
        Some(s"""WITH ex AS MATERIALIZED (
                |  SELECT id, is_t, (${graft.functions.Hashing.h64Sql("tok", "dsir")}) % $B AS b
                |  FROM (SELECT doc_id AS id, source = 'src0' AS is_t,
                |          unnest(${O.T}) AS tok FROM documents)
                |), counts AS MATERIALIZED (
                |  SELECT b,
                |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) + 1 AS xt,
                |    CAST(sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS BIGINT) + 1 AS xr
                |  FROM ex GROUP BY b
                |), w1 AS (
                |  SELECT b, ${P.mWideSql("xt")} AS mt, ${P.biasWideSql("xt")} AS bt,
                |    ${P.mWideSql("xr")} AS mr, ${P.biasWideSql("xr")} AS br FROM counts
                |), w2 AS (
                |  SELECT b, ${P.zSql("mt")} AS zt, bt, ${P.zSql("mr")} AS zr, br FROM w1
                |), w3 AS (
                |  SELECT b, zt, (zt * zt) AS zzt, bt, zr, (zr * zr) AS zzr, br FROM w2
                |), wq AS MATERIALIZED (
                |  SELECT b, CAST(floor((${P.lnFromPartsSql("zt", "zzt", "bt")}
                |    - ${P.lnFromPartsSql("zr", "zzr", "br")}) * 1.0E9 + 0.5E0) AS BIGINT) AS delta_q
                |  FROM w3
                |), tot0 AS (
                |  SELECT CAST(sum(xt - 1) AS BIGINT) + $B AS tt,
                |    CAST(sum(xr - 1) AS BIGINT) + $B AS tr FROM counts
                |), g1 AS (
                |  SELECT ${P.mWideSql("tt")} AS mt, ${P.biasWideSql("tt")} AS bt,
                |    ${P.mWideSql("tr")} AS mr, ${P.biasWideSql("tr")} AS br FROM tot0
                |), g2 AS (
                |  SELECT ${P.zSql("mt")} AS zt, bt, ${P.zSql("mr")} AS zr, br FROM g1
                |), g3 AS (
                |  SELECT zt, (zt * zt) AS zzt, bt, zr, (zr * zr) AS zzr, br FROM g2
                |), cq AS MATERIALIZED (
                |  SELECT CAST(floor((${P.lnFromPartsSql("zr", "zzr", "br")}
                |    - ${P.lnFromPartsSql("zt", "zzt", "bt")}) * 1.0E9 + 0.5E0) AS BIGINT) AS const_q
                |  FROM g3
                |)
                |SELECT id, CAST(sum(delta_q + const_q) AS BIGINT) AS score_q9
                |FROM ex JOIN wq USING (b) CROSS JOIN cq
                |WHERE NOT is_t GROUP BY id
                |ORDER BY score_q9 DESC, id LIMIT 100""".stripMargin)
      },
      headline = true),

    // Temperature-scaled (α = ½) domain resampling, the XLM-R mixing
    // scheme: keep rates ∝ sqrt(token mass)/mass per source. sqrt is the
    // ONE correctly-rounded power, and weights quantize to integer
    // micro-units before the exact Σ, so the oracle replays every rate
    // bit-for-bit — train-side (the weights) AND decision-side (the
    // coins) both hash-gated.
    "sample_temperature" -> QueryDef(
      (s, d) =>
        Sampling.temperatureResample(Tables.documents(s, d), "source", "doc_id",
            TextAnalysis.tokenCount(col("text")), budget = 2000L, salt = "temp")
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id")),
      Some(s"""WITH t AS (
              |  SELECT source, CAST(sum($tc) AS BIGINT) AS tt
              |  FROM documents GROUP BY source
              |), w AS (
              |  SELECT source, tt,
              |    CAST(floor(sqrt(CAST(tt AS DOUBLE)) * 1.0E6 + 0.5E0) AS BIGINT) AS wq
              |  FROM t
              |), sw AS (
              |  SELECT CAST(sum(wq) AS BIGINT) AS sw FROM w
              |)
              |SELECT d.doc_id, d.source
              |FROM documents d JOIN w USING (source) CROSS JOIN sw
              |WHERE CAST(${coinSql("doc_id", "temp")} AS DOUBLE) <
              |  (CASE WHEN tt > 0 THEN least(1.0, (2000.0E0 * CAST(wq AS DOUBLE)) /
              |    (CAST(sw AS DOUBLE) * CAST(tt AS DOUBLE))) ELSE 0.0E0 END) * 4294967296.0
              |ORDER BY doc_id""".stripMargin)),

    "sample_domain_budget" -> QueryDef(
      (s, d) =>
        Sampling.domainBudget(Tables.documents(s, d), "source", "doc_id",
            TextAnalysis.tokenCount(col("text")), budget = 800L, salt = "bud")
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id")),
      Some(s"""WITH t AS (
              |  SELECT doc_id, source, ${coinSql("doc_id", "bud")} AS coin,
              |    SUM($tc) OVER (PARTITION BY source) AS total
              |  FROM documents)
              |SELECT doc_id, source FROM t
              |WHERE CAST(coin AS DOUBLE) <
              |  least(1.0, 800.0 / CAST(total AS DOUBLE)) * 4294967296.0
              |ORDER BY doc_id""".stripMargin)),

    // Deterministic epoch shuffle: the training-order permutation of the
    // corpus, ranked WITHOUT a global window — value-derived bucket
    // offsets (bounded histogram) + 4096-way parallel per-bucket windows.
    // The oracle is the straightforward global row_number over the same
    // coin, so the hash gate proves the distributed rank equals it.
    "sample_shuffle" -> QueryDef(
      (s, d) =>
        Sampling.epochShuffle(Tables.documents(s, d), "doc_id", "ord", epoch = 1)
          .select(col("doc_id"), col("pos"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  CAST(row_number() OVER (ORDER BY ${coinSql("doc_id", "ord:e1")}, doc_id) - 1 AS BIGINT) AS pos
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Importance sampling: keep probability is a PER-ROW score (here a
    // length ramp over n_chars) instead of a plan-time constant.
    "sample_weighted" -> QueryDef(
      (s, d) =>
        Sampling.weightedBernoulli(Tables.documents(s, d), "doc_id",
            least(col("n_chars").cast("double") / 400.0, lit(1.0)) * lit(0.8), "wb")
          .select(col("doc_id"), col("n_chars"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, n_chars FROM documents
              |WHERE CAST(${coinSql("doc_id", "wb")} AS DOUBLE) <
              |  least(greatest(least(CAST(n_chars AS DOUBLE) / 400.0, 1.0) * 0.8, 0.0), 1.0)
              |    * 4294967296.0
              |ORDER BY doc_id""".stripMargin)),

    // Per-domain percentile gate: top 30% of each source by n_chars —
    // per-source curation a global cut can't express. Score ties break by
    // the md5 coin lottery (then doc_id), mirrored exactly in the rank.
    "sample_percentile" -> QueryDef(
      (s, d) =>
        Sampling.percentileGate(Tables.documents(s, d), "source", "doc_id",
            col("n_chars"), keepFrac = 0.3)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .orderBy(col("doc_id")),
      Some(s"""WITH r AS (
              |  SELECT doc_id, source, n_chars,
              |    CAST(row_number() OVER (PARTITION BY source
              |      ORDER BY n_chars DESC, ${coinSql("doc_id", "pctl")}, doc_id) AS BIGINT) AS rk,
              |    count(*) OVER (PARTITION BY source) AS n
              |  FROM documents)
              |SELECT doc_id, source, n_chars FROM r
              |WHERE rk <= CAST(ceil(0.3 * CAST(n AS DOUBLE)) AS BIGINT)
              |ORDER BY doc_id""".stripMargin)),

    // Mixture resampling: src0 upsampled 2.5 epochs, src1 thinned to 0.25,
    // src2 dropped, everything else kept at 1 — exercises the whole-copy,
    // fractional-coin, zero, and default paths. The oracle repeats each
    // doc with range(reps) from the identical weight CASE + coin.
    "sample_mixture" -> QueryDef(
      (s, d) =>
        Sampling.mixtureResample(Tables.documents(s, d), "source", "doc_id",
            Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0),
            defaultWeight = 1.0, salt = "mix")
          .select(col("doc_id"), col("source"), col("epoch"))
          .orderBy(col("doc_id"), col("epoch")),
      Some(s"""WITH w AS (
              |  SELECT doc_id, source,
              |    CASE WHEN source = 'src2' THEN 0.0
              |         WHEN source = 'src1' THEN 0.25
              |         WHEN source = 'src0' THEN 2.5 ELSE 1.0 END AS wt,
              |    CAST(${coinSql("doc_id", "mix")} AS DOUBLE) AS coin
              |  FROM documents
              |), r AS (
              |  SELECT doc_id, source,
              |    CAST(floor(wt) AS BIGINT) +
              |      (CASE WHEN coin < (wt - floor(wt)) * 4294967296.0 THEN 1 ELSE 0 END) AS reps
              |  FROM w
              |)
              |SELECT doc_id, source, unnest(range(0, reps)) AS epoch
              |FROM r WHERE reps > 0 ORDER BY doc_id, epoch""".stripMargin)),

    "pack_chunks" -> QueryDef(
      (s, d) =>
        Sampling.packChunks(Tables.documents(s, d), "source", "doc_id",
            TextAnalysis.tokenCount(col("text")), contextLen = 512, salt = "pack")
          .orderBy(col("shard"), col("id")),
      Some(s"""WITH t AS (
              |  SELECT source AS shard, doc_id AS id, $tc AS n_tokens,
              |    ${coinSql("doc_id", "pack")} AS coin
              |  FROM documents
              |), s AS (
              |  SELECT shard, id, n_tokens,
              |    CAST(SUM(n_tokens) OVER (
              |      PARTITION BY shard ORDER BY coin, id
              |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_tok
              |  FROM t)
              |SELECT shard, id, n_tokens, start_tok,
              |  CAST(start_tok // 512 AS BIGINT) AS chunk_first,
              |  CAST((start_tok + greatest(n_tokens - 1, 0)) // 512 AS BIGINT) AS chunk_last
              |FROM s ORDER BY shard, id""".stripMargin)),

    // Packed-sequence MATERIALIZATION: the tensor-prep step — top-30
    // vocab ids (text_encode_ids' exact definition) concatenated per
    // shard in packChunks' hash order and cut into 64-id sequences. The
    // oracle rebuilds the vocab, the ids, the offsets, and every
    // sequence's id string from raw text.
    "pack_sequences" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val vocab = TextAnalysis.buildVocab(docs, "text", 30)
        val ids = TextAnalysis.encodeIds(docs, "doc_id", "text", vocab)
          .select(col("doc_id"), col("ids"))
        Sampling.packSequences(
            docs.select(col("doc_id"), col("source")).join(ids, Seq("doc_id")),
            "source", "doc_id", col("ids"), contextLen = 64, salt = "ps")
          .orderBy(col("shard"), col("seq_idx"))
      },
      Some(s"""WITH c AS (SELECT unnest(${O.T}) AS token FROM documents),
              |n AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY token),
              |v AS (SELECT token, CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS BIGINT) AS id
              |      FROM n ORDER BY n DESC, token LIMIT 30),
              |toks AS (SELECT doc_id, source, ${O.T} AS ts FROM documents),
              |off AS (
              |  SELECT doc_id,
              |    CAST(SUM(len(ts)) OVER (
              |      PARTITION BY source ORDER BY ${coinSql("doc_id", "ps")}, doc_id
              |      ROWS UNBOUNDED PRECEDING) - len(ts) AS BIGINT) AS strt
              |  FROM toks),
              |u AS (SELECT doc_id, source, unnest(ts) AS tok,
              |        unnest(range(1, len(ts) + 1)) AS i
              |      FROM toks),
              |ids AS (SELECT u.doc_id, u.source, u.i, coalesce(v.id, -1) AS tid
              |        FROM u LEFT JOIN v ON v.token = u.tok),
              |pos AS (SELECT ids.source AS shard, o.strt + ids.i - 1 AS gpos, ids.tid
              |        FROM ids JOIN off o ON o.doc_id = ids.doc_id)
              |SELECT shard, CAST(gpos // 64 AS BIGINT) AS seq_idx,
              |  CAST(count(*) AS BIGINT) AS n_ids,
              |  string_agg(CAST(tid AS VARCHAR), ',' ORDER BY gpos) AS ids_joined
              |FROM pos GROUP BY 1, 2 ORDER BY shard, seq_idx""".stripMargin)),

    "text_decontaminate" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        Sampling.decontaminate(
            docs.filter(col("doc_id") % 11 =!= 0),
            docs.filter(col("doc_id") % 11 === 0), "text")
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH fp AS (
              |  SELECT doc_id, source,
              |    md5(array_to_string(list_sort(list_distinct(${O.T})), ' ')) AS f
              |  FROM documents)
              |SELECT c.doc_id, c.source FROM fp c
              |WHERE c.doc_id % 11 <> 0
              |  AND NOT EXISTS (
              |    SELECT 1 FROM fp p WHERE p.doc_id % 11 = 0 AND p.f = c.f)
              |ORDER BY doc_id""".stripMargin)),

    // the bloom prefilter is invisible in the output by construction (no
    // false negatives; false positives exact-verified) — the oracle is the
    // plain anti-join, here on a different split than text_decontaminate
    // and with a deliberately tiny sketch so false positives actually
    // exercise the verify join at sf scale
    "text_decontaminate_bloom" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        Sampling.decontaminateBloom(
            docs.filter(col("doc_id") % 7 =!= 0),
            docs.filter(col("doc_id") % 7 === 0), "text",
            expectedProbes = 64L)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH fp AS (
              |  SELECT doc_id, source,
              |    md5(array_to_string(list_sort(list_distinct(${O.T})), ' ')) AS f
              |  FROM documents)
              |SELECT c.doc_id, c.source FROM fp c
              |WHERE c.doc_id % 7 <> 0
              |  AND NOT EXISTS (
              |    SELECT 1 FROM fp p WHERE p.doc_id % 7 = 0 AND p.f = c.f)
              |ORDER BY doc_id""".stripMargin))
  )
}
