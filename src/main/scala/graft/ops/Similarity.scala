package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor similarity search over embedding columns.
  *
  * Scale design: the baseline is brute-force top-k with the (small) query
  * set broadcast — one pass over the corpus, no shuffle of the corpus side,
  * per-partition top-k before the final merge. The scale path is IVF:
  * k-means-free bucketing via random hyperplane LSH, probing only matching
  * buckets. Dot products are `aggregate`/`zip_with` Column expressions
  * (codegen, no UDF).
  */
object Similarity {

  /** Dot product of two float-array columns (fp64 accumulation, sequential
    * and therefore deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Brute-force exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (id, vec) DataFrame — arbitrarily large
    * @param queries (id, vec) DataFrame — small, broadcast
    * @return (query_id, neighbor_id, rank) — rank 1..k by cosine desc,
    *         neighbor_id asc tie-break; self-matches excluded
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("qv")))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Random-hyperplane signature: `planes` sign bits packed into a long.
    * Hyperplane p's normal vector component for dimension i is a
    * deterministic pseudo-random ±1 derived from xxhash64(p, i) — no stored
    * model, identical on every executor. */
  def hyperplaneSignature(vec: Column, planes: Int): Column = {
    val dims = size(vec)
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), dims - 1), (x, i) =>
          x.cast("double") *
            when(xxhash64(lit(p), i).bitwiseAND(1L) === 1L, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF-style ANN: probe only the query's bucket (and optionally its
    * 1-bit-flip neighbors for recall). At 100 TB the corpus is bucketed
    * once (write-time partitioning by signature); queries touch a handful
    * of partitions instead of the full corpus. */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, planes: Int = 8, multiProbe: Boolean = true): DataFrame = {
    val sigC = hyperplaneSignature(col(corpusVec), planes)
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"), sigC.as("sig"))
    val sigQ = hyperplaneSignature(col(queryVec), planes)
    val qBase = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"), sigQ.as("qsig"))
    // multi-probe: also search buckets at Hamming distance 1 from the query
    val probes =
      if (multiProbe)
        array((lit(-1) +: (0 until planes).map(lit(_))): _*)
      else array(lit(-1))
    val q = broadcast(qBase.select(col("query_id"), col("qv"),
      explode(transform(probes, p =>
        when(p === -1, col("qsig"))
          .otherwise(col("qsig").bitwiseXOR(call_function("shiftleft", lit(1L), p))))).as("sig")))
    val scored = c.join(q, Seq("sig"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
