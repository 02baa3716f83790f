package graft.queries

import graft.functions.Hashing
import graft.ops.Similarity

/** DuckDB SQL fragments mirroring the probabilistic operators exactly.
  *
  * Every fragment is generated from the SAME plan-time constants (affine
  * coefficients, hyperplane signs) the Spark operators fold into their
  * plans, and every floating-point reduction is spelled out left-to-right
  * in the operator's order — so signatures, buckets, and cosines are
  * bit-identical across engines and the driver's hash gate can compare
  * full outputs, not just row counts.
  */
object OracleSql {

  /** Tokens of an arbitrary expression: lowercase, whitespace-split,
    * empties dropped — mirrors TextAnalysis.tokens. */
  def tokensSql(expr: String): String =
    s"list_filter(regexp_split_to_array(lower(trim($expr)), '\\s+'), t -> t <> '')"

  /** Tokens of the `text` column (the shared shorthand). */
  val T = tokensSql("text")

  /** Mirrors TextAnalysis.qualityScore over a text expression (6dp
    * rounded composite — length ramp, stopword ramp, punctuation
    * penalty). */
  def qualitySql(e: String): String = {
    val t = tokensSql(e)
    val stop = graft.ops.TextAnalysis.StopwordsEn.map("'" + _ + "'").mkString(",")
    val stopRatio = s"(CASE WHEN len($t) = 0 THEN 0.0 ELSE CAST(len(list_filter($t, t -> list_contains([$stop], t))) AS DOUBLE) / len($t) END)"
    val punct = s"(CASE WHEN length($e) = 0 THEN 0.0 ELSE CAST(length(regexp_replace($e, '[^.,;:!?''\"()-]', '', 'g')) AS DOUBLE) / length($e) END)"
    s"""round(least(CAST(len($t) AS DOUBLE) / 100.0, 1.0) * 0.4
       | + least($stopRatio * 4.0, 1.0) * 0.4
       | + greatest(0.0, 1.0 - $punct * 5.0) * 0.2, 6)""".stripMargin.replace("\n", " ")
  }

  /** Mirrors Dedup.shingles(text, n). */
  def shingles(n: Int): String =
    s"""CASE WHEN len($T) < $n THEN [array_to_string($T, ' ')]
       |ELSE list_distinct(list_transform(range(1, len($T) - $n + 2),
       |  i -> array_to_string($T[i:i+${n - 1}], ' '))) END""".stripMargin.replace("\n", " ")

  /** Mirrors Dedup.jaccard(a, b). */
  def jaccard(a: String, b: String): String =
    s"""CASE WHEN len(list_distinct(list_concat($a, $b))) = 0 THEN 0.0
       |ELSE CAST(len(list_intersect($a, $b)) AS DOUBLE)
       |  / len(list_distinct(list_concat($a, $b))) END""".stripMargin.replace("\n", " ")

  /** Mirrors Hashing.h32 applied to a scalar expression. */
  def h32Sql(expr: String, seed: String): String =
    s"(${Hashing.h64Sql(expr, seed)} & 4294967295)"

  /** The [mh_0, …, mh_{k-1}] minhash array as GROUP BY aggregates over a
    * pre-hashed per-shingle column `x` — mirrors the min-agg form of
    * Dedup.minhashLsh. */
  def minhashAggArray(x: String, k: Int): String =
    (0 until k).map { i =>
      s"min((${Hashing.affineA(i)} * $x + ${Hashing.affineB(i)}) % ${Hashing.P32})"
    }.mkString("[", ", ", "]")

  /** Banded UNION ALL rows over a `sigs(id, mh)` CTE — mirrors the
    * posexplode in Dedup.minhashLsh. */
  def bandedUnion(bands: Int, rows: Int): String =
    (0 until bands).map { b =>
      val slice = s"array_to_string(mh[${b * rows + 1}:${b * rows + rows}], ',')"
      s"SELECT id, $b AS band, ${Hashing.h64Sql(slice, s"band$b")} AS bucket FROM sigs"
    }.mkString(" UNION ALL ")

  /** 60-bit simhash over a pre-hashed list column `hs` — mirrors
    * Dedup.simhashFromHashes (per-bit majority vote). */
  def simhashExpr(hs: String, bits: Int = 60): String =
    (0 until bits).map { b =>
      s"(CASE WHEN list_sum(list_transform($hs, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** The 15 chunk-pair block rows over a `sigs(id, sig)` CTE — mirrors the
    * posexplode in Dedup.simhashPairs. */
  def simhashBlocksUnion: String = {
    val pairs = for { j <- 0 until 6; k <- j + 1 until 6 } yield (j, k)
    pairs.zipWithIndex.map { case ((j, k), blk) =>
      s"SELECT id, sig, $blk AS blk, ((sig >> ${j * 10}) & 1023) * 1024 + ((sig >> ${k * 10}) & 1023) AS key FROM sigs"
    }.mkString(" UNION ALL ")
  }

  /** Signed projection of vector expr `v` onto hyperplane row `w`,
    * left-associative — mirrors Similarity.projection. */
  private def projection(v: String, w: Array[Double]): String =
    w.zipWithIndex.map { case (wi, i) =>
      s"CAST($v[${i + 1}] AS DOUBLE) * ${if (wi >= 0) "1.0" else "-1.0"}"
    }.mkString(" + ")

  /** Scaled signed projections of `v` under `m` — mirrors
    * Similarity.jlProject term-for-term (left-assoc fold, then ×scale). */
  def jlComponents(v: String, m: Array[Array[Double]], scale: Double): Seq[String] =
    m.toSeq.map(w => s"((${projection(v, w)}) * $scale)")

  /** Packed sign-bit signature of `v` — mirrors Similarity.signature. */
  def signature(v: String, m: Array[Array[Double]]): String =
    m.zipWithIndex.map { case (w, p) =>
      s"(CASE WHEN (${projection(v, w)}) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Left-associative dot product seeded with 0.0 — mirrors Similarity.dot. */
  def dot(a: String, b: String, dims: Int): String =
    (1 to dims).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
      .mkString("(0.0 + ", " + ", ")")

  /** Mirrors Similarity.cosine (norm product tested against 0 first). */
  def cosine(a: String, b: String, dims: Int): String = {
    val d = s"(sqrt(${dot(a, a, dims)}) * sqrt(${dot(b, b, dims)}))"
    s"CASE WHEN $d = 0 THEN 0.0 ELSE ${dot(a, b, dims)} / $d END"
  }

  /** `sqrt(v·v)` — the per-row norm VecKernel.cosine computes inline.
    * Precomputing it once per row in a CTE yields the identical double
    * (same left-associative fold, same sqrt), so downstream cosines can
    * reference it instead of re-expanding two 64-term dot products. */
  def norm(v: String, dims: Int): String = s"sqrt(${dot(v, v, dims)})"

  /** cosine via PRE-COMPUTED norms `na`/`nb` — bit-identical to
    * [[cosine]] (the product, zero test, and division see the same
    * doubles) at a third of the expression size. Exists purely to keep
    * the driver's DuckDB gate lean: round-8/9 phantom OOMs hit whichever
    * query was mid-allocation when the HOST ran dry, so every byte the
    * planner doesn't allocate widens the survival window. */
  def cosineN(a: String, b: String, na: String, nb: String, dims: Int): String = {
    val d = s"($na * $nb)"
    s"CASE WHEN $d = 0 THEN 0.0 ELSE ${dot(a, b, dims)} / $d END"
  }

  /** Probe-set list for LSH: own signature + every 1-bit flip — mirrors
    * the explodes in Similarity.lshTopK and Dedup.embeddingNearDups. */
  def probeList(planes: Int, sigCol: String = "qsig"): String =
    (sigCol +: (0 until planes).map(p => s"xor($sigCol, ${1L << p})")).mkString("[", ", ", "]")

  def hyperplanes(planes: Int, dims: Int): Array[Array[Double]] =
    Similarity.hyperplaneMatrix(planes, dims)

  /** The per-row argmax-cosine cell assignment over a `(cid, cv, cnrm)`
    * centroid CTE — mirrors Similarity.cellOf's array_max over
    * (cosine, −cid) structs: best cosine wins, exact-double ties resolve
    * to the smallest centroid id. Emits (id, cell) ONLY — consumers that
    * need vectors join `ebase` back, keeping the materialized hash table
    * id-sized (the gate-leanness contract of [[cosineN]]). */
  def ivfAssignCte(name: String, centsCte: String, dims: Int): String =
    s"$name AS MATERIALIZED (SELECT id, cell FROM (" +
      s"SELECT b.id, c.cid AS cell, row_number() OVER (PARTITION BY b.id " +
      s"ORDER BY ${cosineN("b.v", "c.cv", "b.nrm", "c.cnrm", dims)} DESC, c.cid) AS rn " +
      s"FROM ebase b CROSS JOIN $centsCte c) WHERE rn = 1)"

  /** The FULL in-SQL retraining of Similarity.trainIvfCentroids, unrolled
    * iteration by iteration (the text_bpe_corpus precedent): md5-seeded
    * codebook (`k` smallest md5("ivf:"+id) corpus rows, in that order),
    * then per iteration an argmax-cosine assignment and the 2^20
    * integer-exact per-(cell, dim) mean — long sums commute, so the means
    * (and the FLOAT cast) are bit-identical to Spark's regardless of
    * partitioning. Empty cells keep their previous centroid via the LEFT
    * JOIN COALESCE, the Lloyd degeneracy guard. Emits CTEs `ebase`,
    * `cents_0` … `cents_<iters>`; iterated CTEs are MATERIALIZED (DuckDB
    * inlines twice-referenced CTEs exponentially otherwise). Every
    * fragment is single-line: generated SQL must never start a line with
    * '|' or an enclosing stripMargin corrupts it. */
  def ivfLloydCtes(k: Int, iters: Int, dims: Int): String = {
    val seed =
      s"ebase AS MATERIALIZED (SELECT vec_id AS id, embedding AS v, ${norm("embedding", dims)} AS nrm FROM embeddings), " +
        "cents_0 AS MATERIALIZED (SELECT cid, cv, cnrm FROM (SELECT CAST(row_number() OVER " +
        "(ORDER BY md5('ivf:' || CAST(id AS VARCHAR)), id) AS BIGINT) - 1 AS cid, v AS cv, nrm AS cnrm " +
        s"FROM ebase) WHERE cid < $k)"
    val steps = (0 until iters).map { j =>
      val assign = ivfAssignCte(s"cells_$j", s"cents_$j", dims)
      val agg = s"agg_$j AS (SELECT cell, pos, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(qx) AS BIGINT) AS sq FROM (SELECT cl.cell, unnest(range(len(e.v))) AS pos, " +
        "unnest(list_transform(e.v, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))) AS qx " +
        s"FROM cells_$j cl JOIN ebase e ON e.id = cl.id) GROUP BY cell, pos)"
      val newc = s"newc_$j AS (SELECT cell AS cid, " +
        "list(CAST(CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1048576.0) AS FLOAT) ORDER BY pos) AS cv " +
        s"FROM agg_$j GROUP BY cell)"
      val next = s"cents_${j + 1} AS MATERIALIZED (SELECT p.cid, COALESCE(n.cv, p.cv) AS cv, " +
        s"CASE WHEN n.cv IS NULL THEN p.cnrm ELSE ${norm("n.cv", dims)} END AS cnrm " +
        s"FROM cents_$j p LEFT JOIN newc_$j n ON p.cid = n.cid)"
      Seq(assign, agg, newc, next).mkString(", ")
    }
    (seed +: steps).mkString(", ")
  }
}
