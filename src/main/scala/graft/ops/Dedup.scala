package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines at 100 TB scale.
  *
  * Strategy notes:
  *  - exact: one hash-shuffle on a 16-byte digest (never on the full text —
  *    shuffling 100 TB of text to dedup it is the classic mistake; shuffling
  *    ~hashes is ~0.03% of that).
  *  - MinHash/LSH: shingles → k minhashes → b bands; candidate generation is
  *    a self-join on (band, bucket) so only near-duplicates co-locate; the
  *    verify step computes exact Jaccard on candidates only. Cost is
  *    O(n·k + candidates), never O(n²).
  *  - SimHash: 64-bit signature; near-dup = small Hamming distance; bucketed
  *    by 4×16-bit chunks (any pair within distance 3 shares ≥1 chunk).
  */
object Dedup {

  import TextAnalysis.tokens

  /** Exact dedup: keep the smallest id per identical text. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("h"), col(idCol))
      .groupBy(col("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles of the text. */
  def shingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    val idx = sequence(lit(0), greatest(size(ts) - n, lit(0)))
    when(size(ts) < n, array(concat_ws(" ", ts)))
      .otherwise(array_distinct(transform(idx, i => concat_ws(" ", slice(ts, i + 1, lit(n))))))
  }

  /** Exact Jaccard similarity of two token-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** k MinHash values per doc from its shingle set: h_i = min over shingles
    * of xxhash64(shingle, seed_i). Deterministic (fixed seeds). */
  def minhashes(shingleSet: Column, k: Int): Column =
    array((0 until k).map { seed =>
      array_min(transform(shingleSet, s => xxhash64(s, lit(seed))))
    }: _*)

  /** MinHash-LSH near-duplicate pairs.
    *
    * @param df        input with id + text columns
    * @param numHashes total minhash functions (bands × rowsPerBand)
    * @param bands     LSH bands; Pr[candidate] = 1-(1-j^r)^b
    * @param threshold exact-Jaccard verification threshold on shingle sets
    * @return (id_a, id_b, jaccard) with id_a < id_b, verified pairs only
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val base = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"))
    val withSig = base.withColumn("mh", minhashes(col("sh"), numHashes))

    // one row per (band, bucket-hash): bucket = hash of the band's slice
    val banded = withSig.select(col("id"), col("sh"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",", slice(col("mh"), b * rows + 1, rows)), lit(b))
      }: _*)).as(Seq("band", "bucket")))

    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")

    cand.withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash of the token multiset: per-bit majority vote over token
    * hashes. Expressed with bit arithmetic over an exploded-free aggregate:
    * sum per bit of ±1 depending on the token hash bit. */
  def simhash(text: Column): Column = {
    val ts = tokens(text)
    // For each of 64 bits: count tokens with bit set minus tokens without;
    // bit in signature = 1 iff vote > 0.
    val votes = transform(sequence(lit(0), lit(63)), bit =>
      aggregate(ts, lit(0L), (acc, t) =>
        acc + when(call_function("shiftright", xxhash64(t), bit).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, i) =>
        when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs: candidates share ≥1 of 4 16-bit chunks
    * (guarantees recall for Hamming distance ≤ 3), verified by exact
    * Hamming distance. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunked = sig.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(0xFFFFL)): _*)).as(Seq("chunk_idx", "chunk")))
    val a = chunked.select(col("chunk_idx"), col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    val ham = bit_count(col("sig_a").bitwiseXOR(col("sig_b")))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** n-gram Jaccard near-dup with deterministic length-bucket blocking —
    * SQL-expressible end to end (oracle-checkable), unlike the probabilistic
    * variants. Blocks = token-count buckets; docs within a bucket (or
    * adjacent buckets) are compared exactly. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 2, threshold: Double = 0.5,
                        bucketWidth: Int = 4): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"),
      (TextAnalysis.tokenCount(col(textCol)) / bucketWidth).cast("long").as("bucket"))
    // docs with Jaccard ≥ t have similar sizes → same or adjacent bucket
    val expanded = base.select(col("id"), col("sh"),
      explode(array(col("bucket"), col("bucket") + 1)).as("blk"))
    val a = expanded.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = expanded.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding near-dup: cosine ≥ threshold via LSH bucketing (random
    * hyperplanes) + exact verify. See Similarity for the primitives.
    * The hyperplane matrix is md5-derived at plan time (deterministic),
    * so the oracle can inline the identical ±1 literals. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, planes: Int = 16,
                        dims: Int = 64): DataFrame = {
    val m = Similarity.hyperplaneMatrix(planes, dims)
    val sig = Similarity.signature(col(vecCol), m)
    val withSig = df.select(col(idCol).as("id"), col(vecCol).as("v"), sig.as("sig"))
    val a = withSig.select(col("sig"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withSig.select(col("sig"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
