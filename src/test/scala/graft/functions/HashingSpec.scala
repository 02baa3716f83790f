package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the engine-portable hash primitives to golden values computed with
  * DuckDB v1.0 (`CAST(('0x' || substring(md5(s),1,15)) AS BIGINT)`) — the
  * exact fragments the oracle SQL uses. If these break, every probabilistic
  * operator's oracle breaks with them.
  */
class HashingSpec extends SparkSpec {
  import spark.implicits._

  test("h64 matches DuckDB golden values") {
    val row = Seq(("hello world", "a b")).toDF("a", "b")
      .select(Hashing.h64(col("a"), "mh"), Hashing.h64(col("b"), "cooc"))
      .head()
    assert(row.getLong(0) === 604821124779355104L)
    assert(row.getLong(1) === 1081781969947832538L)
  }

  test("planTimeH64 is the JVM twin of h64") {
    val fromCol = Seq("hello world").toDF("a")
      .select(Hashing.h64(col("a"), "mh")).head().getLong(0)
    assert(Hashing.planTimeH64("mh:hello world") === fromCol)
  }

  test("ShingleHash.h60 equals hex-prefix parsing of the digest") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (s <- Seq("abc", "hello world", "", "graft")) {
      val d = md.digest(s.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      assert(ShingleHash.h60(d) === java.lang.Long.parseLong(hex.substring(0, 15), 16))
      md.reset()
    }
  }

  test("h32 stays within 32 bits; affine stays within [0, P32)") {
    val rows = Seq("a", "b", "c", "dddd").toDF("s")
      .select(Hashing.h32(col("s"), "mh").as("x"))
      .select(col("x"), Hashing.affine(col("x"), 0).as("a0"), Hashing.affine(col("x"), 127).as("a127"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 0xFFFFFFFFL)
      assert(r.getLong(1) >= 0 && r.getLong(1) < Hashing.P32)
      assert(r.getLong(2) >= 0 && r.getLong(2) < Hashing.P32)
    }
  }

  test("MinHashSig: null on empty input, never a MaxValue sentinel; values match affine minima") {
    // an all-MaxValue sentinel would band every empty doc into ONE bucket
    // at any call site that forgets minhashLsh's guard — null is inert in
    // banding and joins instead
    val rows = Seq(
      (1L, Seq(7L, 9L, 11L)),
      (2L, Seq.empty[Long])).toDF("id", "hsh")
      .select(col("id"), MinHashSig.of(col("hsh"), 4).as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(2L).isEmpty, "empty shingle array must yield a NULL signature")
    val sig = rows(1L).get.asInstanceOf[scala.collection.Seq[Long]]
    assert(sig.length === 4)
    // value-identical to the exploded min(affine) formulation the oracle uses
    val expected = (0 until 4).map { j =>
      Seq(7L, 9L, 11L).map { x =>
        (Hashing.affineA(j) * (x & 0xFFFFFFFFL) + Hashing.affineB(j)) % Hashing.P32
      }.min
    }
    assert(sig.toSeq === expected)
  }

  test("ShingleHashes equals h64 over the string-shingle path") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one",
      "a a a a",
      "").toDF("text")
    val viaStrings = docs
      .select(graft.ops.TextAnalysis.tokens(col("text")).as("ts"), col("text"))
      .select(col("text"), explode(graft.ops.Dedup.shinglesFromTokens(col("ts"), 2)).as("s"))
      .select(col("text"), Hashing.h64(col("s"), "t").as("h"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val viaKernel = docs
      .select(col("text"), graft.ops.TextAnalysis.tokens(col("text")).as("ts"))
      .select(col("text"), explode(ShingleHashes.of(col("ts"), 2, "t")).as("h"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(viaKernel === viaStrings)
  }
}
