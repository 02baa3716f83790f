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

  def defs: Map[String, QueryDef] = Map(
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
      })
  )
}
