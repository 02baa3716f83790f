package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sketch contracts. HLL: estimate accuracy within the m=64 error
  * bound, bit-identical results across partitionings (register max is
  * order-free), and the small-range linear-counting branch. CMS: never
  * underestimates, exact on light sketches, partitioning-independent
  * (counter sums are order-free). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("cmsCounts never underestimates; exact here; partitioning-independent") {
    // 10 distinct items with known multiplicities 1..10 — far below the
    // 4x64 sketch's collision regime, so estimates should be EXACT for
    // present items unless two of the 10 items collide in all 4 rows
    // (probability ~(10/64)^4 per pair — and the fixed md5 coordinates
    // make the outcome deterministic, so this spec is not flaky)
    val rows = for (i <- 1 to 10; _ <- 1 to i) yield ("g", s"tok-$i")
    val df = rows.toDF("g", "it")
    val probes = Seq("tok-1", "tok-7", "tok-10", "absent")
    val out = Sketches.cmsCounts(df, "g", col("it"), "t", probes).collect().head
    assert(out.getAs[Long]("est_tok-1") === 1L)
    assert(out.getAs[Long]("est_tok-7") === 7L)
    assert(out.getAs[Long]("est_tok-10") === 10L)
    // an absent item's estimate is collision mass only: 0 <= est <= total
    val absent = out.getAs[Long]("est_absent")
    assert(absent >= 0L && absent < 55L, s"absent-probe estimate $absent")
    // counter array sums to D * total occurrences (every item increments
    // one counter per row)
    val counters = out.getAs[String]("cms_joined").split(",").map(_.toLong)
    assert(counters.length === Sketches.CmsD * Sketches.CmsW)
    assert(counters.sum === Sketches.CmsD.toLong * 55L)
    // order-free: any partitioning yields the identical sketch
    for (parts <- Seq(1, 7, 32)) {
      val again = Sketches.cmsCounts(df.repartition(parts), "g", col("it"), "t", probes)
        .collect().head
      assert(again.getAs[String]("cms_joined") === out.getAs[String]("cms_joined"),
        s"counters differ under repartition($parts)")
    }
  }

  test("quantile sketch: intervals bracket the true quantile, merge order-free") {
    // mixed-sign values with a heavy tail — ids are deterministic
    val vals = (1 to 1000).map(i => (i * 37 % 997) - 100 + (if (i % 17 == 0) 5000 else 0))
      .map(_.toDouble / 3.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("g", "id", "x")
    val buckets = Sketches.quantileBuckets(df, "g", col("x"))
    val out = Sketches.quantilesFromBuckets(buckets, "group", Seq(0.5, 0.95, 0.99))
      .collect().head
    assert(out.getAs[Long]("n") === 1000L)
    // true quantile (ceil(p*n)-th smallest in the q20 domain) must lie in
    // the reported interval, and the interval must be narrow
    val qs = vals.map(v => math.floor(v * (1L << 20).toDouble + 0.5).toLong).sorted
    for ((p, nm) <- Seq((0.5, "50"), (0.95, "95"), (0.99, "99"))) {
      val truth = qs(math.ceil(p * 1000).toInt - 1)
      val lo = out.getAs[Long](s"p${nm}_lo_q20")
      val hi = out.getAs[Long](s"p${nm}_hi_q20")
      assert(lo <= truth && truth <= hi, s"p$nm: $truth not in [$lo, $hi]")
      // ≤ 1/16 relative width by construction (same-sign bucket)
      assert(hi - lo <= math.max(math.abs(hi), math.abs(lo)) / 16 + 1,
        s"p$nm interval too wide: [$lo, $hi]")
    }
    // order-free merge: any partitioning yields the identical sketch
    val joined = out.getAs[String]("buckets_joined")
    for (parts <- Seq(1, 7, 32)) {
      val again = Sketches.quantilesFromBuckets(
        Sketches.quantileBuckets(df.repartition(parts), "g", col("x")),
        "group", Seq(0.5, 0.95, 0.99)).collect().head
      assert(again.getAs[String]("buckets_joined") === joined,
        s"buckets differ under repartition($parts)")
    }
    // explicit two-half merge law: bucket rows of the halves, unioned and
    // re-aggregated, equal the whole corpus' sketch
    val (h1, h2) = df.collect().splitAt(500)
    def sketch(rows: Array[org.apache.spark.sql.Row]) =
      Sketches.quantileBuckets(
        spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), df.schema),
        "g", col("x"))
    val merged = sketch(h1).unionByName(sketch(h2))
      .groupBy(col("group"), col("bucket"))
      .agg(org.apache.spark.sql.functions.sum(col("cnt")).as("cnt"),
        min(col("min_q")).as("min_q"), max(col("max_q")).as("max_q"))
    val mergedOut = Sketches.quantilesFromBuckets(merged, "group", Seq(0.5))
      .collect().head
    assert(mergedOut.getAs[String]("buckets_joined") === joined)
  }

  test("hllDistinct estimates within the standard error; partitioning-independent") {
    // 2000 distinct items per group, duplicated 3x (dups must not matter)
    val df = (0 until 6000).map(i => ("g1", s"item-${i % 2000}")).toDF("g", "it")
    val out = Sketches.hllDistinct(df, "g", col("it"), "t").collect().head
    val est = out.getAs[Long]("est_q3") / 1000.0
    // 1.04/sqrt(64) ≈ 13% standard error; allow 3 sigma
    assert(math.abs(est - 2000.0) / 2000.0 < 0.39, s"estimate $est vs 2000")
    for (parts <- Seq(1, 7, 32)) {
      val again = Sketches.hllDistinct(df.repartition(parts), "g", col("it"), "t")
        .collect().head
      assert(again.getAs[String]("registers_joined") === out.getAs[String]("registers_joined"),
        s"registers differ under repartition($parts)")
      assert(again.getAs[Long]("est_q3") === out.getAs[Long]("est_q3"))
    }
  }

  test("hllDistinct small-range correction: tiny sets fall back to linear counting") {
    val df = (0 until 5).map(i => ("g", s"only-$i")).toDF("g", "it")
    val out = Sketches.hllDistinct(df, "g", col("it"), "t").collect().head
    val est = out.getAs[Long]("est_q3") / 1000.0
    // linear counting is near-exact at n << m
    assert(math.abs(est - 5.0) < 1.5, s"small-range estimate $est vs 5")
    // most registers empty
    assert(out.getAs[String]("registers_joined").split(",").count(_ == "0") >= 59)
  }

  test("heavyHitters is exactly GROUP BY HAVING, whatever the CMS collisions do") {
    // 5000 distinct tail items (1-2 occurrences) + 6 heavy items: the
    // candidate filter may admit collision-inflated tail keys, but the
    // exact verify must trim the output to precisely the true heavy set
    val rows =
      (0 until 5000).flatMap(i => Seq.fill(1 + i % 2)(s"tail-$i")) ++
        (0 until 6).flatMap(h => Seq.fill(50 + h)(s"heavy-$h"))
    val df = rows.toDF("it")
    val out = Sketches.heavyHitters(df, col("it"), minCount = 50L, salt = "hh")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === (0 until 6).map(h => s"heavy-$h" -> (50L + h)).toMap)
    // partition-layout independence (the two passes are aggregations)
    val again = Sketches.heavyHitters(df.repartition(13), col("it"), 50L, "hh")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === out)
    // threshold above everything: empty, not an error
    assert(Sketches.heavyHitters(df, col("it"), 1000000L, "hh").count() === 0L)
    // null keys are invisible to the CMS but still a group: the exact
    // pass must count them like GROUP BY does
    val withNulls = (rows ++ Seq.fill(75)(null: String)).toDF("it")
    val hh = Sketches.heavyHitters(withNulls, col("it"), 60L, "hh")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(hh(None) === 75L)
    assert(Sketches.heavyHitters(withNulls, col("it"), 80L, "hh")
      .filter("item IS NULL").count() === 0L, "sub-threshold nulls trim exactly")
  }

  test("kmvSketches: k smallest DISTINCT hashes, sorted, partitioning-independent") {
    val k = 8
    def sketchOf(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val r = Sketches.kmvSketches(df, "set", col("h"), k).head()
      r.getSeq[Long](r.fieldIndex("hs"))
    }
    // 100 items with heavy duplication (each value appears 3x) plus nulls:
    // the sketch must be the k smallest distinct hashes of the value SET
    val vals = (0 until 100).flatMap(i => Seq.fill(3)(i.toLong))
    val hashes = vals.distinct
      .map(v => graft.functions.Hashing.planTimeH64(s"kmvspec:$v")).sorted
    val df = (vals.map(Option(_)) ++ Seq(None, None)).toDF("v")
      .select(graft.functions.Hashing.h64(col("v"), "kmvspec").as("h"))
      .withColumn("set", lit("s"))
    val got = sketchOf(df)
    assert(got === hashes.take(k), "k smallest distinct, ascending")
    // merge across many partitions must yield the identical sketch
    assert(sketchOf(df.repartition(17)) === got)
    // fewer distinct items than k: the sketch IS the complete hash set
    val small = (0 until 3).map(_.toLong).toDF("v")
      .select(graft.functions.Hashing.h64(col("v"), "kmvspec").as("h"))
      .withColumn("set", lit("s"))
    assert(sketchOf(small).size === 3)
    // all-null input: empty array, not null, and the group survives
    val empty = Seq[Option[Long]](None).toDF("v")
      .select(graft.functions.Hashing.h64(col("v"), "kmvspec").as("h"))
      .withColumn("set", lit("s"))
    assert(sketchOf(empty).isEmpty)
  }

  test("kmvPairwise: exact regime below k, union law and estimate regime above") {
    val k = 16
    // A = {0..9}, B = {5..14}: 10 ∩ 10 = 5, ∪ = 15 — all below k=16, so
    // every estimate must be the EXACT count (q3-scaled)
    val rows = (0 until 10).map(i => ("A", i.toLong)) ++
      (5 until 15).map(i => ("B", i.toLong))
    val df = rows.toDF("set", "v")
      .select(col("set"), graft.functions.Hashing.h64(col("v"), "kmvp").as("h"))
    val sk = Sketches.kmvSketches(df, "set", col("h"), k)
    val r = Sketches.kmvPairwise(sk, k).head()
    assert(r.getAs[String]("set_a") === "A" && r.getAs[String]("set_b") === "B")
    assert(r.getAs[Long]("est_a_q3") === 10000L)
    assert(r.getAs[Long]("est_b_q3") === 10000L)
    assert(r.getAs[Long]("est_union_q3") === 15000L)
    assert(r.getAs[Long]("est_isect_q3") === 5000L)
    assert(r.getAs[Long]("est_diff_ab_q3") === 5000L)
    assert(r.getAs[Long]("n_common") === 5L)
    // estimate regime: 2000 vs 2000 with 50% true overlap — the KMV
    // bound for k=16 is loose (~±25% rel. std. error), so assert the
    // estimates land within a wide-but-meaningful band and that the
    // union estimate is consistent (≥ each side's)
    val big = (0 until 2000).map(i => ("A", i.toLong)) ++
      (1000 until 3000).map(i => ("B", i.toLong))
    val bdf = big.toDF("set", "v")
      .select(col("set"), graft.functions.Hashing.h64(col("v"), "kmvp").as("h"))
    val br = Sketches.kmvPairwise(Sketches.kmvSketches(bdf, "set", col("h"), k), k).head()
    val estU = br.getAs[Long]("est_union_q3") / 1000.0
    assert(estU > 1500 && estU < 6000, s"union estimate off: $estU (true 3000)")
    assert(br.getAs[Long]("est_union_q3") >= br.getAs[Long]("est_a_q3"))
    assert(br.getAs[Long]("est_union_q3") >= br.getAs[Long]("est_b_q3"))
  }

  test("kmvPairwise: a data-scale set column fails the maxSets guard loudly") {
    // the pairwise nested-loop is O(|sets|^2) BY DESIGN — a caller who
    // groups by a high-cardinality key must hit a hard error carrying
    // the bound, never a silently-planned quadratic join
    val df = (0 until 5).map(i => (s"s$i", i.toLong)).toDF("set", "v")
      .select(col("set"), graft.functions.Hashing.h64(col("v"), "kmvp").as("h"))
    val sk = Sketches.kmvSketches(df, "set", col("h"), 8)
    val e = intercept[IllegalArgumentException](
      Sketches.kmvPairwise(sk, 8, maxSets = 4))
    assert(e.getMessage.contains("maxSets=4"))
    // at the bound itself it runs
    assert(Sketches.kmvPairwise(sk, 8, maxSets = 5).count() === 10L)
  }
}
