package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Dedup

/** Deduplication operators as verifiable queries over `documents` /
  * `embeddings`. Exact and blocked-Jaccard variants have full DuckDB
  * oracles; the probabilistic variants (MinHash-LSH, SimHash, embedding
  * LSH) are declared without oracle SQL → driver records the weaker
  * rows-only check (their cross-checks live in DedupSpec, which validates
  * LSH candidates against exhaustive small-n ground truth).
  */
object DedupQueries extends QueryModule {

  private val T = "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '')"

  /** DuckDB fragment mirroring Dedup.shingles(text, n). */
  private def shinglesSql(n: Int) =
    s"""CASE WHEN len($T) < $n THEN [array_to_string($T, ' ')]
       |ELSE list_distinct(list_transform(range(1, len($T) - $n + 2),
       |  i -> array_to_string($T[i:i+${n - 1}], ' '))) END""".stripMargin.replace("\n", " ")

  def defs: Map[String, QueryDef] = Map(
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
            shingleN = 2, threshold = 0.5, bucketWidth = 4)
          .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH base AS (
              |  SELECT doc_id AS id, ${shinglesSql(2)} AS sh,
              |    CAST(len($T) // 4 AS BIGINT) AS bucket
              |  FROM documents
              |), expanded AS (
              |  SELECT id, sh, unnest([bucket, bucket + 1]) AS blk FROM base
              |), cand AS (
              |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
              |  FROM expanded a JOIN expanded b ON a.blk = b.blk AND a.id < b.id
              |), scored AS (
              |  SELECT c.id_a, c.id_b,
              |    CASE WHEN len(list_distinct(list_concat(x.sh, y.sh))) = 0 THEN 0.0
              |      ELSE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
              |           / len(list_distinct(list_concat(x.sh, y.sh))) END AS j
              |  FROM cand c JOIN base x ON c.id_a = x.id JOIN base y ON c.id_b = y.id
              |)
              |SELECT id_a, id_b, round(j, 6) AS jaccard FROM scored
              |WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin),
      headline = true),

    // Probabilistic — no SQL oracle (rows-only check); ground-truth
    // validation in DedupSpec.
    "dedup_minhash_lsh" -> QueryDef(
      (s, d) =>
        Dedup.minhashLsh(Tables.documents(s, d), "doc_id", "text",
            shingleN = 2, numHashes = 32, bands = 16, threshold = 0.5)
          .orderBy(col("id_a"), col("id_b")),
      None,
      headline = true),

    "dedup_simhash" -> QueryDef(
      (s, d) =>
        Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text", maxHamming = 3)
          .orderBy(col("id_a"), col("id_b")),
      None),

    "dedup_embedding" -> QueryDef(
      (s, d) =>
        Dedup.embeddingNearDups(Tables.embeddings(s, d), "vec_id", "embedding",
            threshold = 0.9, planes = 12)
          .orderBy(col("id_a"), col("id_b")),
      None)
  )
}
