package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Dedup, TextAnalysis}

/** The `graft_*` SQL functions ([[graft.GraftExtensions]]) must resolve to
  * the SAME expression trees the Scala Column API builds — proven by
  * value-equality on real corpus data and by literal-argument misuse
  * failing at analysis, not at runtime.
  */
class ExtensionsSpec extends SparkSpec {

  private lazy val docs = {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    d.createOrReplaceTempView("ext_docs")
    d
  }

  test("scalar kernels: SQL surface ≡ Column API, row for row") {
    docs // force view registration
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_shingle_hashes(graft_tokens(text), 2, 'mh') AS hsh,
        |  graft_simhash(graft_shingle_hashes(graft_tokens(text), 1, 'sh')) AS sim,
        |  graft_zvalue(doc_id, n_chars) AS zv,
        |  graft_hilbert(doc_id, n_chars) AS hv,
        |  graft_qbucket(n_chars) AS qb,
        |  graft_double_order_bits(CAST(n_chars AS DOUBLE)) AS dob,
        |  graft_h64(text, 's') AS h,
        |  graft_fingerprint(text) AS fp,
        |  graft_langid(text) AS lang
        |FROM ext_docs""".stripMargin)
    val ts = TextAnalysis.tokens(col("text"))
    val viaApi = docs.select(col("doc_id"),
      ShingleHashes.of(ts, 2, "mh").as("hsh"),
      SimHashSig.of(ShingleHashes.of(ts, 1, "sh"), 60).as("sim"),
      ZValue.of(col("doc_id"), col("n_chars")).as("zv"),
      HilbertValue.of(col("doc_id"), col("n_chars")).as("hv"),
      QBucket.of(col("n_chars")).as("qb"),
      DoubleOrderBits.of(col("n_chars").cast("double")).as("dob"),
      Hashing.h64(col("text"), "s").as("h"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.langId(col("text")).as("lang"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("signature pipeline: minhash → bands via SQL ≡ Column API") {
    docs
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_band_buckets(
        |    graft_minhash_sig(graft_shingle_hashes(graft_tokens(text), 2, 'mh'), 128),
        |    32) AS bk
        |FROM ext_docs WHERE size(graft_tokens(text)) > 0""".stripMargin)
    val ts = TextAnalysis.tokens(col("text"))
    val viaApi = docs.filter(size(ts) > 0).select(col("doc_id"),
      BandBuckets.of(
        MinHashSig.of(ShingleHashes.of(ts, 2, "mh"), 128), 32).as("bk"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("vector + set similarity functions agree with the API") {
    docs
    val viaSql = spark.sql(
      """SELECT a.doc_id AS ia, b.doc_id AS ib,
        |  graft_jaccard(graft_tokens(a.text), graft_tokens(b.text)) AS j,
        |  graft_cosine(array(1.0F, 0.0F, CAST(a.n_chars AS FLOAT)),
        |               array(0.5F, 0.5F, CAST(b.n_chars AS FLOAT))) AS c,
        |  graft_quality(a.text) AS q
        |FROM ext_docs a JOIN ext_docs b ON b.doc_id = a.doc_id + 1""".stripMargin)
    val a = docs.select(col("doc_id"), col("text"), col("n_chars"))
    val b = docs.select(col("doc_id").as("doc_id_b"), col("text").as("text_b"),
      col("n_chars").as("n_chars_b"))
    val viaApi = a.join(b, col("doc_id_b") === col("doc_id") + 1)
      .select(col("doc_id").as("ia"), col("doc_id_b").as("ib"),
        Dedup.jaccard(TextAnalysis.tokens(col("text")),
          TextAnalysis.tokens(col("text_b"))).as("j"),
        VecExprs.cosine(
          array(lit(1.0f), lit(0.0f), col("n_chars").cast("float")),
          array(lit(0.5f), lit(0.5f), col("n_chars_b").cast("float"))).as("c"),
        TextAnalysis.qualityScore(col("text")).as("q"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("plan-time parameters must be literals — misuse fails at analysis") {
    docs
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes(graft_tokens(text), doc_id, 'mh') FROM ext_docs")
    }
    assert(e.getMessage.contains("integer literal"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(graft_tokens(text), 128, 3) FROM ext_docs")
    }
    assert(e2.getMessage.contains("expects 2 arguments"))
  }

  test("graft_shingles matches Dedup.shingles for short and long docs") {
    docs
    val viaSql = spark.sql(
      "SELECT doc_id, graft_shingles(text, 3) AS sh FROM ext_docs")
    val viaApi = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("graft_ln_wide is bit-identical to PortableMath.lnWide from pure SQL") {
    docs
    val got = spark.sql(
      "SELECT n_chars, graft_ln_wide(n_chars) AS ln FROM ext_docs")
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.nonEmpty)
    got.foreach { case (x, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ===
        java.lang.Double.doubleToLongBits(PortableMath.lnWide(x)), s"x=$x")
    }
  }

  test("graft_nfc: SQL surface ≡ Column API; composes into exact dedup digests") {
    docs
    // Spark's chr() is ASCII-only — embed the decomposed codepoints
    // (e + combining acute) directly in the statement text
    val eAcuteDecomposed = new String(Array(0x65, 0x301), 0, 2)
    val viaSql = spark.sql(
      s"SELECT doc_id, md5(graft_nfc(concat(text, '$eAcuteDecomposed'))) AS h FROM ext_docs")
    val viaApi = docs.select(col("doc_id"),
      md5(NfcNormalize.of(concat(col("text"),
        lit(new String(Array(0x65, 0x301), 0, 2))))).as("h"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
    // and the digests equal the precomposed form's — the dedup point
    val pre = docs.select(col("doc_id"),
      md5(concat(col("text"), lit(new String(Array(0xE9), 0, 1)))).as("h"))
    assert(viaApi.exceptAll(pre).isEmpty)
  }

  test("url + script functions: SQL surface ≡ Column API") {
    docs
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_url_normalize('HTTPS://WWW.Ex.COM:443/a/?b=2&utm_source=x&a=1#f') AS u,
        |  graft_url_host('http://user@Sub.WWW.co.uk:8080/x') AS h,
        |  graft_url_domain(graft_url_host('http://a.b.example.com/x')) AS d,
        |  graft_script_count(text, 'latin') AS ln,
        |  graft_dominant_script(text) AS ds
        |FROM ext_docs""".stripMargin)
    val viaApi = docs.select(col("doc_id"),
      graft.ops.UrlOps.normalizeUrl(
        lit("HTTPS://WWW.Ex.COM:443/a/?b=2&utm_source=x&a=1#f")).as("u"),
      graft.ops.UrlOps.urlHost(lit("http://user@Sub.WWW.co.uk:8080/x")).as("h"),
      graft.ops.UrlOps.registeredDomain(
        graft.ops.UrlOps.urlHost(lit("http://a.b.example.com/x"))).as("d"),
      TextAnalysis.scriptCount(col("text"), "latin").as("ln"),
      TextAnalysis.dominantScript(col("text")).as("ds"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
    // script name must be a literal
    val e = intercept[Exception] {
      spark.sql("SELECT graft_script_count(text, text) FROM ext_docs")
    }
    assert(e.getMessage.contains("string literal"))
  }

  test("table_changes(): the CDF as a SQL table function, same rows as changes()") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ext-tvf").toString
    val t = graft.delta.DeltaTable.forPath(spark, dir).create(
      Seq((0L, "x")).toDF("k", "v").schema,
      configuration = Map(graft.delta.DeltaTable.CdfConfigKey -> "true"))
    t.append((0L until 6L).map(i => (i, s"v$i")).toDF("k", "v")) // v1
    t.delete(col("k") >= 4L)                                     // v2
    t.update(col("k") === 0L, Map("v" -> lit("zero")))           // v3
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "v", graft.delta.DeltaTable.ChangeTypeCol, "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(x => (x._4, x._3, x._1)).toSeq
    // full range, `to` omitted = latest
    assert(key(spark.sql(s"SELECT * FROM table_changes('$dir', 1)"))
      === key(t.changes(1L, t.log.latestVersion())))
    // bounded range via SQL
    assert(key(spark.sql(s"SELECT * FROM table_changes('$dir', 2, 2)"))
      === key(t.changes(2L, 2L)))
    // it is a real relation: filters and aggregates compose
    assert(spark.sql(
      s"""SELECT count(*) FROM table_changes('$dir', 1)
         |WHERE _change_type = 'delete'""".stripMargin).head().getLong(0) === 2L)
    // timestamp bounds: everything from before the table began
    assert(key(spark.sql(
      s"SELECT * FROM table_changes('$dir', '2000-01-01T00:00:00')"))
      === key(t.changes(0L, t.log.latestVersion())))
  }
}
