package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Similarity

/** ANN similarity search over the `embeddings` table. Brute-force top-k is
  * exact and oracle-checked against DuckDB's list_cosine_similarity (rank
  * output only — fp comparison stays integral). The LSH variant's
  * signatures are md5-derived plan-time literals and its cosine fold is
  * left-associative, so its oracle recomputes buckets, probes, and scores
  * bit-identically (graft.queries.OracleSql).
  */
object SimilarityQueries extends QueryModule {

  /** The IVF probe-and-rank oracle, shared VERBATIM by sim_topk_ivf,
    * sim_topk_ivf_delta (partition-pruned read) and sim_topk_ivfpq
    * (PQ shortlist + refine): one definition makes the shared-oracle
    * losslessness proofs structural — the variants cannot drift from the
    * baseline oracle by a missed edit. */
  /** The shared IVF CTE chain (assign → probe → candidate → score): one
    * definition for the top-k AND range oracles so the probe/assignment
    * replay cannot drift between them. Ends in `scored(query_id,
    * neighbor_id, cos)`. */
  /** The ebase → cents → assigned prefix alone — shared by the scored
    * chain below AND the sim_inertia readout, so the assignment replay
    * cannot drift between search and diagnostics. */
  private val IvfAssignCtes: String = {
    val O = OracleSql
    val assignCos = O.cosineN("b.v", "c.cv", "b.nrm", "c.cnrm", 64)
    s"""WITH ebase AS MATERIALIZED (
       |  SELECT vec_id AS id, embedding AS v, ${O.norm("embedding", 64)} AS nrm FROM embeddings
       |), cents AS MATERIALIZED (
       |  SELECT id AS cid, v AS cv, nrm AS cnrm FROM ebase WHERE id < 16
       |), assigned AS MATERIALIZED (
       |  SELECT id, cell FROM (
       |    SELECT b.id, c.cid AS cell,
       |      row_number() OVER (PARTITION BY b.id ORDER BY $assignCos DESC, c.cid) AS rn
       |    FROM ebase b CROSS JOIN cents c
       |  ) WHERE rn = 1
       |)""".stripMargin
  }

  private def ivfScoredCtes(candJoin: String = "", candWhere: String = ""): String = {
    val O = OracleSql
    // norms precomputed once per row, candidate generation carries ids
    // only, vectors join back for exactly one dot product per scored
    // pair — a third of the old SQL's expression count, same doubles
    // (OracleSql.cosineN's bit-identity note; round-9 driver-OOM lever)
    val assignCos = O.cosineN("b.v", "c.cv", "b.nrm", "c.cnrm", 64)
    s"""$IvfAssignCtes, probes AS (
       |  SELECT id AS query_id, cell FROM (
       |    SELECT b.id, c.cid AS cell,
       |      row_number() OVER (PARTITION BY b.id ORDER BY $assignCos DESC, c.cid) AS rn
       |    FROM ebase b CROSS JOIN cents c WHERE b.id < 8
       |  ) WHERE rn <= 4
       |), cand AS (
       |  SELECT DISTINCT p.query_id, a.id AS neighbor_id
       |  FROM assigned a JOIN probes p ON a.cell = p.cell$candJoin
       |  WHERE a.id <> p.query_id$candWhere
       |), scored AS (
       |  SELECT p.query_id, p.neighbor_id, ${O.cosineN("q.v", "n.v", "q.nrm", "n.nrm", 64)} AS cos
       |  FROM cand p JOIN ebase q ON q.id = p.query_id JOIN ebase n ON n.id = p.neighbor_id
       |)""".stripMargin
  }

  private val IvfScoredCtes: String = ivfScoredCtes()

  /** The IVF probe-and-rank oracle, shared VERBATIM by sim_topk_ivf,
    * sim_topk_ivf_delta (partition-pruned read) and sim_topk_ivfpq
    * (PQ shortlist + refine): one definition makes the shared-oracle
    * losslessness proofs structural — the variants cannot drift from the
    * baseline oracle by a missed edit. */
  private val IvfOracleSql: String =
    s"""$IvfScoredCtes, ranked AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** The SAME chain with the metadata predicate dropped into candidate
    * generation — one generator for filtered and unfiltered, so the
    * filtered replay cannot drift from the baseline by a missed edit. */
  private val IvfFilteredOracleSql: String =
    s"""${ivfScoredCtes(
          candJoin = " JOIN embeddings em ON em.vec_id = a.id",
          candWhere = " AND em.label % 2 = 0")}, ranked AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  def defs: Map[String, QueryDef] = Map(
    // Per-label centroids via exact integer-scaled sums: deterministic
    // across partitionings where a naive fp mean is a summation-order
    // lottery. Means exported as micro-unit integers.
    "sim_group_mean" -> QueryDef(
      (s, d) =>
        graft.ops.Similarity.groupMeanEmbedding(
            graft.Tables.embeddings(s, d), "label", "embedding")
          .orderBy(col("group")),
      Some("""WITH ex AS (
             |  SELECT label AS grp,
             |    unnest(range(len(embedding))) AS pos,
             |    unnest(list_transform(embedding, x ->
             |      CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))) AS qx
             |  FROM embeddings
             |), agg AS (
             |  SELECT grp, pos, CAST(count(*) AS BIGINT) AS n, CAST(sum(qx) AS BIGINT) AS sq
             |  FROM ex GROUP BY grp, pos
             |), m AS (
             |  SELECT grp, pos, n,
             |    CAST(floor(CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1048576.0) * 1000000.0 + 0.5) AS BIGINT) AS m6
             |  FROM agg
             |)
             |SELECT grp AS "group", min(n) AS n,
             |  array_to_string(list(CAST(m6 AS VARCHAR) ORDER BY pos), ',') AS mean_q6_joined
             |FROM m GROUP BY grp ORDER BY "group"""".stripMargin)),

    // Symmetric int8 quantization — per-row arithmetic, no fp summation,
    // round-half-up spelled floor(x+0.5) so both engines agree exactly.
    "sim_quantize" -> QueryDef(
      (s, d) =>
        graft.ops.Similarity.quantizeInt8(
            graft.Tables.embeddings(s, d), "vec_id", "embedding")
          // codes joined to one string: a list output trips the arrow
          // schema gate on the element FIELD NAME (Spark `element` vs
          // DuckDB `l`) even with identical values — same dodge as ref_c3
          .select(col("id"), col("scale"), concat_ws(",", col("q")).as("q_joined"))
          .orderBy(col("id")),
      Some("""WITH m AS (
             |  SELECT vec_id AS id, embedding,
             |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
             |  FROM embeddings
             |), s AS (
             |  SELECT id, embedding,
             |    CASE WHEN ma IS NULL OR ma = 0 THEN 0.0 ELSE 127.0 / ma END AS scale
             |  FROM m
             |)
             |SELECT id, scale,
             |  array_to_string(list_transform(embedding, x ->
             |    CAST(least(greatest(floor(CAST(x AS DOUBLE) * scale + 0.5), -127.0), 127.0) AS INT)), ',') AS q_joined
             |FROM s ORDER BY id""".stripMargin)),

    "sim_topk_brute" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 8)
        Similarity.bruteForceTopK(emb, "vec_id", "embedding",
            queries, "vec_id", "embedding", k = 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
             |scored AS (
             |  SELECT q.query_id, e.vec_id AS neighbor_id,
             |    list_cosine_similarity(q.qv, e.embedding) AS cos
             |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
             |), ranked AS (
             |  SELECT query_id, neighbor_id,
             |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
             |  FROM scored
             |)
             |SELECT query_id, neighbor_id, rank FROM ranked
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
      headline = true),

    // Scalar-quantized flat scan + exact refine, SHARING the brute-force
    // oracle: the hash gate proves the int8 approximate scan's 16-deep
    // shortlist (of ~499 candidates; worst true-top-5 approx rank on
    // this corpus is 6) never drops a true neighbor — the faiss SQ8
    // pattern with its losslessness machine-checked.
    "sim_topk_sq8" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val quant = Similarity.quantizeInt8(emb, "vec_id", "embedding")
        val queries = emb.filter(col("vec_id") < 8)
        Similarity.sq8TopK(quant, emb, "vec_id", "embedding",
            queries, "vec_id", "embedding", k = 5, shortlist = 16)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
             |scored AS (
             |  SELECT q.query_id, e.vec_id AS neighbor_id,
             |    list_cosine_similarity(q.qv, e.embedding) AS cos
             |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
             |), ranked AS (
             |  SELECT query_id, neighbor_id,
             |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
             |  FROM scored
             |)
             |SELECT query_id, neighbor_id, rank FROM ranked
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    "sim_topk_lsh" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 8)
        Similarity.lshTopK(emb, "vec_id", "embedding",
            queries, "vec_id", "embedding", k = 5,
            m = Similarity.hyperplaneMatrix(8, 64))
          .orderBy(col("query_id"), col("rank"))
      },
      {
        val O = OracleSql
        val m = O.hyperplanes(8, 64)
        // id-only candidate DISTINCT + norm-precomputed cosine — same
        // doubles as the old 3-dot form (OracleSql.cosineN), lean gate
        Some(s"""WITH sigs AS MATERIALIZED (
                |  SELECT vec_id AS id, embedding AS v, ${O.norm("embedding", 64)} AS nrm,
                |    ${O.signature("embedding", m)} AS sig
                |  FROM embeddings
                |), q AS (
                |  SELECT id AS query_id, sig AS qsig FROM sigs WHERE id < 8
                |), probes AS (
                |  SELECT query_id, unnest(${O.probeList(8)}) AS sig FROM q
                |), cand AS (
                |  SELECT DISTINCT p.query_id, s.id AS neighbor_id
                |  FROM probes p JOIN sigs s ON p.sig = s.sig WHERE s.id <> p.query_id
                |), scored AS (
                |  SELECT p.query_id, p.neighbor_id, ${O.cosineN("a.v", "b.v", "a.nrm", "b.nrm", 64)} AS cos
                |  FROM cand p JOIN sigs a ON a.id = p.query_id JOIN sigs b ON b.id = p.neighbor_id
                |), ranked AS (
                |  SELECT query_id, neighbor_id,
                |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
                |  FROM scored
                |)
                |SELECT query_id, neighbor_id, rank FROM ranked
                |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)
      },
      headline = true),

    // Johnson–Lindenstrauss projection 64 -> 16 dims under the shared
    // md5-derived ±1 matrix, 1/sqrt(16) scale. Projections are
    // bit-identical cross-engine (same literals, same fold order); gated
    // as micro-unit integers joined to one string (the list-schema dodge).
    // ---- Greedy k-center diversity selection (coreset sampling): 8
    // maximally-spread exemplars under exact-integer squared L2 (2^20
    // quantization — the argmax cannot flip on float noise). The oracle
    // re-runs the greedy loop as ONE recursive CTE accumulating the
    // selected-id list; every rank, id, AND selection radius must agree.
    "sim_kcenter" -> QueryDef(
      (s, d) =>
        Similarity.kCenterSelect(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 8),
      Some(Similarity.kCenterSql(8,
        s"SELECT vec_id AS id, ${Similarity.quantizeSql("embedding")} AS qv FROM embeddings"))),

    "sim_project_jl" -> QueryDef(
      (s, d) =>
        Similarity.jlProject(Tables.embeddings(s, d), "vec_id", "embedding",
            outDims = 16, dims = 64)
          .select(col("id"), concat_ws(",",
            transform(col("proj"), x =>
              floor(x * lit(1000000.0) + lit(0.5)).cast("long"))).as("proj_q6_joined"))
          .orderBy(col("id")),
      {
        val O = OracleSql
        val comps = O.jlComponents("embedding", O.hyperplanes(16, 64), 0.25)
          .map(c => s"CAST(floor(($c * 1000000.0) + 0.5) AS BIGINT)")
        Some(s"""SELECT vec_id AS id,
                |  array_to_string([${comps.mkString(", ")}], ',') AS proj_q6_joined
                |FROM embeddings ORDER BY id""".stripMargin)
      }),

    // Cosine RANGE search, exact baseline: all pairs with cos >= 0.25
    // for the 8 query vectors. Values (not just ranks) are gated — the
    // 6dp-rounded cosine is bit-stable across engines (dedup_embedding
    // precedent).
    "sim_range_brute" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.rangeSearch(emb, "vec_id", "embedding",
            emb.filter(col("vec_id") < 8), "vec_id", "embedding", minCos = 0.25)
          .orderBy(col("query_id"), col("neighbor_id"))
      },
      {
        val O = OracleSql
        Some(s"""WITH ebase AS MATERIALIZED (
                |  SELECT vec_id AS id, embedding AS v, ${O.norm("embedding", 64)} AS nrm FROM embeddings
                |), q AS (SELECT id, v, nrm FROM ebase WHERE id < 8),
                |scored AS (
                |  SELECT q.id AS query_id, e.id AS neighbor_id,
                |    ${O.cosineN("q.v", "e.v", "q.nrm", "e.nrm", 64)} AS cos
                |  FROM q CROSS JOIN ebase e WHERE e.id <> q.id
                |)
                |SELECT query_id, neighbor_id, round(cos, 6) AS cosine FROM scored
                |WHERE cos >= 0.25 ORDER BY query_id, neighbor_id""".stripMargin)
      }),

    // The IVF-pruned range search: candidates only from each query's 4
    // probed cells (of 16). Approximate BY CONSTRUCTION, so the oracle
    // replays assignment + probes (IvfScoredCtes) instead of sharing the
    // brute oracle — recall vs exact is a spec property, correctness of
    // the pruned computation is the gate.
    "sim_range_ivf" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfRangeSearch(emb, "vec_id", "embedding",
            emb.filter(col("vec_id") < 8), "vec_id", "embedding",
            minCos = 0.25, numCentroids = 16, nprobe = 4)
          .orderBy(col("query_id"), col("neighbor_id"))
      },
      Some(s"""$IvfScoredCtes
              |SELECT query_id, neighbor_id, round(cos, 6) AS cosine FROM scored
              |WHERE cos >= 0.25 ORDER BY query_id, neighbor_id""".stripMargin)),

    "sim_topk_ivf" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 8)
        Similarity.ivfTopK(emb, "vec_id", "embedding",
            queries, "vec_id", "embedding", k = 5, numCentroids = 16, nprobe = 4)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(IvfOracleSql)),

    // ANN RECALL@k measurement (the #1 retrieval-quality diagnostic:
    // exact brute-force is ground truth on a QUERY SAMPLE — at 100 TB
    // nobody brutes the corpus, everyone brutes a few hundred probes —
    // and the approximate index is scored against it): per query, how
    // many of the brute top-5 the IVF(16 cells, 4 probes) search
    // returned. Total readout — a query the index fully misses
    // surfaces with hits = 0, never drops. Both chains are the gated
    // operators themselves; the oracle composes their existing replay
    // CTEs, so the recall number cannot drift from the searches it
    // scores.
    "sim_recall" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 8)
        val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
            queries, "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
            queries, "vec_id", "embedding", k = 5, numCentroids = 16, nprobe = 4)
          .select(col("query_id"), col("neighbor_id"),
            lit(1L).as("__hit"))
        brute.join(ivf, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"),
            count(lit(1)).as("k"))
          .orderBy(col("query_id"))
      },
      Some {
        val O = OracleSql
        s"""${ivfScoredCtes()}, ivfk AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           |    FROM scored) WHERE rnk <= 5
           |), bq AS (
           |  SELECT id AS query_id, v AS qv, nrm AS qnrm FROM ebase WHERE id < 8
           |), bscored AS (
           |  SELECT b.query_id, e.id AS neighbor_id,
           |    ${O.cosineN("b.qv", "e.v", "b.qnrm", "e.nrm", 64)} AS cos
           |  FROM bq b CROSS JOIN ebase e WHERE e.id <> b.query_id
           |), brk AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           |    FROM bscored) WHERE rnk <= 5
           |)
           |SELECT b.query_id, CAST(count(i.neighbor_id) AS BIGINT) AS hits,
           |  CAST(count(*) AS BIGINT) AS k
           |FROM brk b LEFT JOIN ivfk i
           |  ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
           |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin
      }),

    // The recall CURVE users actually tune against: recall@5 summed over
    // the query set for nprobe ∈ {1,2,4,8,16} — sim_recall scores one
    // operating point; the tuning decision is the curve. Zero new
    // kernels: five ivfTopK calls against ONE checkpointed brute top-5.
    // Monotonicity is a THEOREM here (an element of the global top-5
    // present in a candidate set stays in the top-5 of any superset —
    // at most the same elements outrank it), so the in-query require()
    // is a hard correctness pin, not a heuristic; the collect is 5 rows.
    // The oracle shares IvfAssignCtes and scores the rn≤16 candidate
    // set ONCE, carrying each neighbor's probe rank — per-nprobe results
    // are then rank filters, not five replayed chains.
    "sim_recall_sweep" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 8)
        val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
            queries, "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id")).localCheckpoint()
        val rows = Seq(1, 2, 4, 8, 16).map { np =>
          val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
              queries, "vec_id", "embedding", k = 5,
              numCentroids = 16, nprobe = np)
            .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
          brute.join(ivf, Seq("query_id", "neighbor_id"), "left")
            .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"),
              count(lit(1)).as("k"))
            .select(lit(np.toLong).as("nprobe"), col("hits"), col("k"))
        }.reduce(_ unionAll _).localCheckpoint()
        val arr = rows.orderBy(col("nprobe")).collect() // 5 rows, bounded
        require(arr.map(_.getLong(1)).sliding(2).forall(p =>
            p.length < 2 || p(0) <= p(1)),
          "recall@5 must be monotone non-decreasing in nprobe — a " +
            "violation means the candidate sets are not nested")
        rows.orderBy(col("nprobe"))
      },
      Some {
        val O = OracleSql
        val assignCos = O.cosineN("b.v", "c.cv", "b.nrm", "c.cnrm", 64)
        val perN = Seq(1, 2, 4, 8, 16).map { np =>
          s"""  SELECT CAST($np AS BIGINT) AS nprobe,
             |    CAST(count(i.neighbor_id) AS BIGINT) AS hits,
             |    CAST(count(*) AS BIGINT) AS k
             |  FROM brk b LEFT JOIN (
             |    SELECT query_id, neighbor_id FROM (
             |      SELECT query_id, neighbor_id,
             |        row_number() OVER (PARTITION BY query_id
             |          ORDER BY cos DESC, neighbor_id) AS rnk
             |      FROM scored16 WHERE prn <= $np) WHERE rnk <= 5) i
             |  ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id""".stripMargin
        }.mkString("\n  UNION ALL\n")
        s"""$IvfAssignCtes, prk AS MATERIALIZED (
           |  SELECT id AS query_id, cell, rn FROM (
           |    SELECT b.id, c.cid AS cell,
           |      row_number() OVER (PARTITION BY b.id ORDER BY $assignCos DESC, c.cid) AS rn
           |    FROM ebase b CROSS JOIN cents c WHERE b.id < 8)
           |), scored16 AS MATERIALIZED (
           |  SELECT g.query_id, g.neighbor_id, g.prn,
           |    ${O.cosineN("q.v", "n.v", "q.nrm", "n.nrm", 64)} AS cos
           |  FROM (SELECT p.query_id, a.id AS neighbor_id, p.rn AS prn
           |        FROM assigned a JOIN prk p ON a.cell = p.cell
           |        WHERE a.id <> p.query_id) g
           |  JOIN ebase q ON q.id = g.query_id JOIN ebase n ON n.id = g.neighbor_id
           |), bq AS (
           |  SELECT id AS query_id, v AS qv, nrm AS qnrm FROM ebase WHERE id < 8
           |), brk AS MATERIALIZED (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT b.query_id, e.id AS neighbor_id,
           |      row_number() OVER (PARTITION BY b.query_id
           |        ORDER BY ${O.cosineN("b.qv", "e.v", "b.qnrm", "e.nrm", 64)} DESC, e.id) AS rnk
           |    FROM bq b CROSS JOIN ebase e WHERE e.id <> b.query_id) WHERE rnk <= 5
           |)
           |SELECT nprobe, hits, k FROM (
           |$perN
           |) ORDER BY nprobe""".stripMargin
      }),

    // Codebook-quality diagnostics over the SAME assignment chain as
    // sim_topk_ivf (shared IvfAssignCtes — search and diagnostics cannot
    // drift): per cell, member count + exact-integer quantized SSE to
    // the centroid (order-free long sums; a raw fp inertia is a
    // summation-order lottery). Empty cells surface with n = 0 — the
    // degenerate-codebook signal this readout exists for.
    "sim_inertia" -> QueryDef(
      (s, d) =>
        Similarity.ivfInertia(Tables.embeddings(s, d), "vec_id", "embedding",
            numCentroids = 16, quantBits = 10)
          .orderBy(col("cell")),
      Some {
        def q(e: String) =
          s"CAST(floor(CAST($e AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)"
        val d2 = s"CAST(list_sum(list_transform(range(1, 65), i -> " +
          s"(${q("b.v[i]")} - ${q("c.cv[i]")}) * " +
          s"(${q("b.v[i]")} - ${q("c.cv[i]")}))) AS BIGINT)"
        s"""$IvfAssignCtes, ivq AS (
           |  SELECT a.cell, $d2 AS d2
           |  FROM assigned a JOIN ebase b ON b.id = a.id
           |    JOIN cents c ON c.cid = a.cell
           |), ivagg AS (
           |  SELECT cell, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(d2) AS BIGINT) AS sse_q
           |  FROM ivq GROUP BY cell
           |)
           |SELECT c.cid AS cell, COALESCE(g.n, 0) AS n,
           |  COALESCE(g.sse_q, 0) AS sse_q
           |FROM cents c LEFT JOIN ivagg g ON g.cell = c.cid
           |ORDER BY cell""".stripMargin
      }),

    // FILTERED ANN (the RAG retrieval shape: nearest neighbors WHERE
    // <metadata predicate>): same codebook/cells/probes as sim_topk_ivf,
    // predicate label % 2 = 0 dropped into candidate generation BEFORE
    // ranking — all 5 slots go to matching rows. The oracle is the same
    // generator with the predicate parameter set, so filtered and
    // unfiltered replays cannot drift apart.
    "sim_topk_filtered" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 8)
        Similarity.ivfTopKFiltered(emb, "vec_id", "embedding",
            col("label") % 2 === 0,
            queries, "vec_id", "embedding", k = 5, numCentroids = 16, nprobe = 4)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(IvfFilteredOracleSql)),

    // The SAME search through the cell-partitioned Delta layout: the
    // corpus is written Hive-partitioned by cell (writeIvfAssigned) and
    // the probe reads only the probed cells' files via partition pruning
    // (ivfTopKDelta / DeltaTable.scanIn). Shares sim_topk_ivf's oracle —
    // the hash gate doubles as the proof that pruning loses nothing
    // (the dedup_ngram_prefix precedent).
    "sim_topk_ivf_delta" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        // identical codebook to sim_topk_ivf: the first 16 corpus vectors
        val cents: Seq[Seq[Float]] = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").cast("long"), col("embedding"))
          .collect().sortBy(_.getLong(0)).map(_.getSeq[Float](1).toSeq).toSeq
        // Scratch registers a shutdown-hook delete: each build writes a
        // fresh layout, but nothing accumulates across JVM runs
        val path = graft.Scratch.dir("ivf-delta")
        Similarity.writeIvfAssigned(emb, "vec_id", "embedding", cents, path)
        val queries = emb.filter(col("vec_id") < 8)
        Similarity.ivfTopKDelta(s, path, "vec_id", "embedding",
            queries, "vec_id", "embedding", k = 5, cents, nprobe = 4)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(IvfOracleSql)),

    // IVF-PQ with exact refine, sharing sim_topk_ivf's candidate universe:
    // same first-16 cell codebook, same nprobe=4 — the PQ stage (stand-in
    // codebook = residual subvectors of ids 0..15, re-derivable from the
    // raw table; 4 subspaces × 16 codewords), an ADC shortlist of 64, then
    // exact cosine re-rank. SHARES sim_topk_ivf's oracle: the hash gate is
    // the machine-checked proof that the ADC shortlist never drops a true
    // top-5 candidate of the probed set (the dedup_ngram_prefix /
    // sim_topk_ivf_delta precedent). The shortlist IS load-bearing — it
    // keeps 64 of ~125 candidates per query (the worst true top-5 ADC rank on this corpus is 53), so a bad ADC ordering would
    // break the gate.
    "sim_topk_ivfpq" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val cents: Seq[Seq[Float]] = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").cast("long"), col("embedding"))
          .collect().sortBy(_.getLong(0)).map(_.getSeq[Float](1).toSeq).toSeq
        val pq = Similarity.pqCodebookFromCorpus(emb, "vec_id", "embedding",
          cents, numSubspaces = 4, ksub = 16)
        val queries = emb.filter(col("vec_id") < 8)
        Similarity.ivfPqTopK(emb, "vec_id", "embedding",
            queries, "vec_id", "embedding",
            k = 5, cents, nprobe = 4, pq, shortlist = 64)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(IvfOracleSql))
  )
}
