package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.WindowedAggs._

/** Stateful streaming semantics: watermark drops late events and closes
  * windows; event-time timeouts close sessions across micro-batches. */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streamingDomainBudget admits first-come until the quota is spent, per source") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[BudgetDoc]
    val q = WindowedAggs.streamingDomainBudget(in.toDS(), budget = 100L)
      .writeStream.format("memory").queryName("sdb").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: srcA consumes 40 + 50 = 90 (admitted in (ts, id) order);
      // the 20-token doc would overflow -> dropped without consuming
      in.addData(
        BudgetDoc("srcA", 2L, ts(1), 50L),
        BudgetDoc("srcA", 1L, ts(0), 40L),
        BudgetDoc("srcA", 3L, ts(2), 20L),
        BudgetDoc("srcB", 10L, ts(0), 99L))
      q.processAllAvailable()
      // batch 2: srcA has 10 left — a 10-token doc fits exactly, a later
      // one is refused; srcB has 1 left — everything refused
      in.addData(
        BudgetDoc("srcA", 4L, ts(3), 10L),
        BudgetDoc("srcA", 5L, ts(4), 1L),
        BudgetDoc("srcB", 11L, ts(1), 2L))
      q.processAllAvailable()
      val out = spark.table("sdb").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(out === Set(1L, 2L, 4L, 10L),
        s"expected first-come admissions within per-source budgets; got $out")
    } finally q.stop()
  }

  test("windowed counts with watermark: late events beyond lateness are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val events = in.toDF.toDF("event_id", "ts", "event_type", "value")
    val q = WindowedAggs.windowedCounts(events, "15 minutes", lateness = "10 minutes")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: events in [10:00, 10:15) and [10:15, 10:30)
      in.addData((1L, ts(1), "click", 1.0), (2L, ts(5), "click", 2.0), (3L, ts(16), "view", 3.0))
      q.processAllAvailable()
      // batch 2: advance watermark far past 10:15 → first window closes
      in.addData((4L, ts(50), "view", 4.0))
      q.processAllAvailable()
      // batch 3: a late event for the closed [10:00,10:15) window → dropped
      in.addData((5L, ts(2), "click", 100.0))
      q.processAllAvailable()
      // batch 4: push watermark to close [10:15,10:30) too
      in.addData((6L, ts(59), "view", 5.0))
      q.processAllAvailable()

      val out = spark.table("wc")
        .select("window_start", "event_type", "n", "total_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val first = out.filter(_._1 == Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(first.toSeq === Seq((Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L, 3.0)),
        s"late event must not reopen the closed window; got ${out.toSeq}")
      assert(out.exists(o => o._1 == Timestamp.valueOf("2024-01-01 10:15:00") && o._3 == 1L))
    } finally q.stop()
  }

  test("windowedDistinct: HLL register state per window, replay-deterministic, matches batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // 40 distinct users (+ replays) in [10:00, 10:15), 3 users in the next
    // window, then a watermark push that closes both.
    val batch1 = (1 to 40).map(u => (u.toLong, ts(u % 15))) ++ Seq((7L, ts(3)), (7L, ts(4)))
    val batch2 = Seq((100L, ts(16)), (101L, ts(17)), (100L, ts(18)))
    val closer = Seq((999L, ts(59)))

    def runOnce(name: String): (Seq[(Timestamp, String, Long)], Long) = {
      val in = MemoryStream[(Long, Timestamp)]
      val events = in.toDF.toDF("user_id", "ts")
      val q = WindowedAggs.windowedDistinct(events, col("user_id"),
          "15 minutes", lateness = "10 minutes", salt = "hllw")
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try {
        in.addData(batch1); q.processAllAvailable()
        val openStateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        in.addData(batch2); q.processAllAvailable()
        in.addData(closer); q.processAllAvailable()
        val rows = spark.table(name).collect()
          .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
          .sortBy(_._1.getTime).toSeq
        (rows, openStateRows)
      } finally q.stop()
    }

    val (rows, stateRows) = runOnce("wd1")
    // Bounded state: after batch 1, 42 item rows hit ONE open window — the
    // store must hold one sketch row for it, not one row per distinct item.
    assert(stateRows === 1L,
      s"state must be one register row per open window, got $stateRows rows")

    // Closed-window sketches equal the batch path's (same math, watermark a
    // no-op on batch), i.e. what the DuckDB gate verifies at sf0.01.
    val batchDf = (batch1 ++ batch2 ++ closer).toDF("user_id", "ts")
    val expected = WindowedAggs.windowedDistinct(batchDf, col("user_id"),
        "15 minutes", lateness = "10 minutes", salt = "hllw")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1.getTime).toSeq
    val closed = expected.filter(_._1.getTime < ts(45).getTime)
    assert(rows === closed,
      s"streaming sketches must match batch registers+estimate; got $rows vs $closed")
    // 40 distinct in the first window: the estimate lands near truth
    val est1 = rows.head._3 / 1000.0
    assert(est1 > 30 && est1 < 50, s"HLL estimate for 40 distinct was $est1")

    // Replay of the identical micro-batches is bit-identical (register max
    // is order-free; every ingredient md5-derived).
    val (rows2, _) = runOnce("wd2")
    assert(rows2 === rows, "replay must reproduce identical sketch rows")
  }

  test("windowedDistinct sketches persist to Delta exactly-once across restart") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
    implicit val sqlCtx = spark.sqlContext
    // the observability loop end-to-end: windowed HLL sketches land in a
    // Delta table through foreachBatch + the (appId, batchId) txn guard,
    // so a restarted query resuming from the checkpoint can neither lose
    // a closed window nor land one twice
    val tablePath = tmpDir("sketch-table")
    val ckpt = tmpDir("sketch-ckpt")
    val table = graft.delta.DeltaTable.forPath(spark, tablePath).create(StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("registers_joined", StringType),
      StructField("est_q3", LongType))))

    def startSink(in: MemoryStream[(Long, Timestamp)]) =
      WindowedAggs.windowedDistinct(in.toDF.toDF("user_id", "ts"), col("user_id"),
          "15 minutes", lateness = "10 minutes", salt = "hllw")
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          table.append(df, Some("sketch-sink"), batchId,
            operation = "STREAMING UPDATE"): Unit
        }
        .start()

    val blockA = (1 to 20).map(u => (u.toLong, ts(u % 15)))     // window 10:00
    val blockB = Seq((50L, ts(16)), (51L, ts(17)))              // window 10:15
    val closer1 = Seq((99L, ts(40)))                            // closes 10:00
    val in1 = MemoryStream[(Long, Timestamp)]
    val q1 = startSink(in1)
    try {
      in1.addData(blockA); q1.processAllAvailable()
      in1.addData(blockB ++ closer1); q1.processAllAvailable()
      in1.addData(Seq((98L, ts(41)))); q1.processAllAvailable() // flush emissions
    } finally q1.stop()
    val afterRun1 = table.toDF.count()
    assert(afterRun1 >= 1L, "run 1 must have landed the closed 10:00 window")

    // restart on the same checkpoint: the new source carries the FULL
    // history again (same BLOCK boundaries — MemoryStream offsets count
    // blocks, and the checkpoint resumes past the committed ones) plus a
    // closer past 10:15 — replayed blocks must not re-land, the newly
    // closed window must
    val in2 = MemoryStream[(Long, Timestamp)]
    in2.addData(blockA)
    in2.addData(blockB ++ closer1)
    in2.addData(Seq((98L, ts(41))))
    val q2 = startSink(in2)
    try {
      in2.addData(Seq((97L, ts(59)))); q2.processAllAvailable() // closes 10:15
    } finally q2.stop()

    val rows = table.toDF.collect()
      .map(r => (r.getTimestamp(0), r.getLong(2)))
    val starts = rows.map(_._1.toString).sorted
    assert(starts.length === starts.distinct.length,
      s"a window landed twice after restart: ${starts.toSeq}")
    assert(starts.exists(_.startsWith("2024-01-01 10:00")) &&
      starts.exists(_.startsWith("2024-01-01 10:15")),
      s"closed windows missing after restart: ${starts.toSeq}")
    // and the persisted sketch is the batch-computed truth
    val batchAll = (blockA ++ blockB ++ closer1 ++ Seq((98L, ts(41)), (97L, ts(59))))
      .toDF("user_id", "ts")
    val expect = WindowedAggs.windowedDistinct(batchAll, col("user_id"),
        "15 minutes", lateness = "10 minutes", salt = "hllw")
      .collect().map(r => (r.getTimestamp(0), r.getLong(2))).toMap
    rows.foreach { case (w, est) =>
      assert(expect(w) === est, s"persisted estimate for $w diverges from batch")
    }
  }

  test("windowedTheta: k-longs KMV state per window, replay-deterministic, matches batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val k = 8
    // 40 distinct users (+ replays) in [10:00, 10:15) — well above k, so
    // the sketch truncates; 3 events/2 users next window; then a closer.
    val batch1 = (1 to 40).map(u => (u.toLong, ts(u % 15))) ++ Seq((7L, ts(3)), (7L, ts(4)))
    val batch2 = Seq((100L, ts(16)), (101L, ts(17)), (100L, ts(18)))
    val closer = Seq((999L, ts(59)))

    def runOnce(name: String): (Seq[(Timestamp, String)], Long) = {
      val in = MemoryStream[(Long, Timestamp)]
      val events = in.toDF.toDF("user_id", "ts")
      val q = WindowedAggs.windowedTheta(events, col("user_id"),
          "15 minutes", lateness = "10 minutes", salt = "thw", k = k)
        .selectExpr("window_start", "concat_ws(',', transform(hs, h -> cast(h as string))) AS hj")
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try {
        in.addData(batch1); q.processAllAvailable()
        val openStateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        in.addData(batch2); q.processAllAvailable()
        in.addData(closer); q.processAllAvailable()
        val rows = spark.table(name).collect()
          .map(r => (r.getTimestamp(0), r.getString(1)))
          .sortBy(_._1.getTime).toSeq
        (rows, openStateRows)
      } finally q.stop()
    }

    val (rows, stateRows) = runOnce("wt1")
    // Bounded state: 42 item rows hit ONE open window — one sketch row
    // (≤ k longs) in the store, never one row per distinct item.
    assert(stateRows === 1L,
      s"state must be one sketch row per open window, got $stateRows rows")
    // the first window's sketch truncated to exactly k ascending hashes
    val firstSketch = rows.head._2.split(",").map(_.toLong).toSeq
    assert(firstSketch.length === k && firstSketch === firstSketch.sorted,
      s"sketch must hold the k smallest hashes ascending: $firstSketch")

    // Closed-window sketches equal the batch path's (merge-and-truncate
    // is order-free; watermark a no-op on batch) — the DuckDB gate's
    // contract at sf0.01.
    val batchDf = (batch1 ++ batch2 ++ closer).toDF("user_id", "ts")
    val expected = WindowedAggs.windowedTheta(batchDf, col("user_id"),
        "15 minutes", lateness = "10 minutes", salt = "thw", k = k)
      .selectExpr("window_start", "concat_ws(',', transform(hs, h -> cast(h as string))) AS hj")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)))
      .sortBy(_._1.getTime).toSeq
    val closed = expected.filter(_._1.getTime < ts(45).getTime)
    assert(rows === closed,
      s"streaming sketches must match batch KMV; got $rows vs $closed")

    // overlap readout on the emitted sketches: window 2 shares no users
    // with window 1 → zero intersection; its own estimate is exact (2 < k)
    val overlap = WindowedAggs.thetaWindowOverlap(
        WindowedAggs.windowedTheta(batchDf, col("user_id"),
          "15 minutes", lateness = "10 minutes", salt = "thw", k = k),
        "15 minutes", k = k)
      .orderBy(col("window_start")).collect()
    val w2 = overlap(1)
    assert(w2.getAs[Long]("est_q3") === 2000L)
    assert(w2.getAs[Long]("est_isect_prev_q3") === 0L)
    assert(w2.getAs[Long]("jaccard_prev_q6") === 0L)
    // the first window's predecessor is the EMPTY sketch: zero overlap
    // fields (total readout, no nulls), real own estimate
    val w1 = overlap(0)
    assert(w1.getAs[Long]("est_prev_q3") === 0L)
    assert(w1.getAs[Long]("est_isect_prev_q3") === 0L)
    assert(w1.getAs[Long]("jaccard_prev_q6") === 0L)
    assert(w1.getAs[Long]("est_q3") > 0L)

    // Replay of the identical micro-batches is bit-identical.
    val (rows2, _) = runOnce("wt2")
    assert(rows2 === rows, "replay must reproduce identical sketch rows")
  }

  test("windowedVecSums: one state row per open window; streaming ≡ batch; drift readout") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dims = 4
    // window 1: vectors along +x; window 2: along +y (maximal drift);
    // then a closer to evict both
    def vec(x: Double, y: Double) = Seq(x.toFloat, y.toFloat, 0f, 0f)
    val batch1 = Seq((vec(1, 0), ts(1)), (vec(2, 0), ts(5)), (vec(3, 0), ts(9)))
    val batch2 = Seq((vec(0, 1), ts(16)), (vec(0, 2), ts(18)))
    val closer = Seq((vec(1, 1), ts(59)))

    val in = MemoryStream[(Seq[Float], Timestamp)]
    val q = WindowedAggs.windowedVecSums(in.toDF.toDF("v", "ts"), col("v"),
        dims, "15 minutes", lateness = "10 minutes")
      .selectExpr("window_start", "n",
        "concat_ws(',', transform(sums, s -> cast(s as string))) AS sj")
      .writeStream.format("memory").queryName("wvd1")
      .outputMode(OutputMode.Append()).start()
    val stateRows = try {
      in.addData(batch1); q.processAllAvailable()
      val s = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      in.addData(batch2); q.processAllAvailable()
      in.addData(closer); q.processAllAvailable()
      s
    } finally q.stop()
    assert(stateRows === 1L,
      s"state must be one sum row per open window, got $stateRows")

    val streamed = spark.table("wvd1").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1.getTime).toSeq
    val batchAll = (batch1 ++ batch2 ++ closer).toDF("v", "ts")
    val expect = WindowedAggs.windowedVecSums(batchAll, col("v"), dims,
        "15 minutes", lateness = "10 minutes")
      .selectExpr("window_start", "n",
        "concat_ws(',', transform(sums, s -> cast(s as string))) AS sj")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1.getTime).toSeq
    val closed = expect.filter(_._1.getTime < ts(45).getTime)
    assert(streamed === closed, "streaming sums must match the batch path")

    // drift readout: orthogonal centroids → cos 0 → drift_q6 = 1e6;
    // the first window (zero-vector predecessor, n_prev 0) also reads 1e6
    val drift = WindowedAggs.vecDriftOverlap(
        WindowedAggs.windowedVecSums(batchAll, col("v"), dims,
          "15 minutes", lateness = "10 minutes"),
        "15 minutes", dims)
      .orderBy(col("window_start")).collect()
    assert(drift(0).getAs[Long]("n_prev") === 0L)
    assert(drift(0).getAs[Long]("drift_q6") === 1000000L)
    assert(drift(1).getAs[Long]("n_prev") === 3L)
    assert(drift(1).getAs[Long]("drift_q6") === 1000000L,
      "orthogonal window centroids must read maximal drift")
    // identical directions would read ~0: check via a same-direction pair
    val same = WindowedAggs.vecDriftOverlap(
        WindowedAggs.windowedVecSums(
          (batch1 ++ Seq((vec(4, 0), ts(17)))).toDF("v", "ts"), col("v"),
          dims, "15 minutes", lateness = "10 minutes"),
        "15 minutes", dims)
      .orderBy(col("window_start")).collect()
    assert(same(1).getAs[Long]("drift_q6") === 0L,
      "same-direction centroids must read zero drift")
  }

  test("windowedThetaOverlap ≡ the two-call form with one shared windowLen") {
    import org.apache.spark.sql.functions.col
    val k = 16
    val batch = ((1 to 20).map(u => (u.toLong, ts(u % 15))) ++
      Seq((7L, ts(16)), (8L, ts(17)))).toDF("user_id", "ts")
    val oneCall = WindowedAggs.windowedThetaOverlap(batch, col("user_id"),
        "15 minutes", lateness = "10 minutes", salt = "thw", k = k)
      .orderBy(col("window_start")).collect().map(_.toString).toSeq
    val twoCall = WindowedAggs.thetaWindowOverlap(
        WindowedAggs.windowedTheta(batch, col("user_id"),
          "15 minutes", lateness = "10 minutes", salt = "thw", k = k),
        "15 minutes", k = k)
      .orderBy(col("window_start")).collect().map(_.toString).toSeq
    assert(oneCall === twoCall)
  }

  test("thetaWindowOverlap: a mismatched windowLen silently zeroes every overlap (doc contract)") {
    // The predecessor equi-join probes at window_start − windowLen; a
    // windowLen differing from the one the sketches were built with
    // matches NOTHING — the readout stays total (no nulls, no errors) but
    // every prev/overlap field reads 0 everywhere, which is exactly why
    // the scaladoc requires threading one constant through both calls.
    import org.apache.spark.sql.functions.col
    // k > |window| keeps every sketch exact, so the correctly-built
    // intersection below is deterministic (truncated sketches can
    // legitimately estimate a real 2-user overlap as 0)
    val k = 64
    val batch = ((1 to 40).map(u => (u.toLong, ts(u % 15))) ++
      Seq((7L, ts(16)), (8L, ts(17)), (100L, ts(18)))).toDF("user_id", "ts")
    val sketches = WindowedAggs.windowedTheta(batch, col("user_id"),
      "15 minutes", lateness = "10 minutes", salt = "thw", k = k)
    val good = WindowedAggs.thetaWindowOverlap(sketches, "15 minutes", k)
      .orderBy(col("window_start")).collect()
    // built correctly, window 2 DOES overlap window 1 (users 7 and 8)
    assert(good(1).getAs[Long]("est_isect_prev_q3") > 0L)
    val bad = WindowedAggs.thetaWindowOverlap(sketches, "10 minutes", k)
      .orderBy(col("window_start")).collect()
    assert(bad.length === good.length, "readout stays total — one row per window")
    bad.foreach { r =>
      assert(r.getAs[Long]("est_prev_q3") === 0L)
      assert(r.getAs[Long]("est_isect_prev_q3") === 0L)
      assert(r.getAs[Long]("jaccard_prev_q6") === 0L)
      assert(r.getAs[Long]("est_q3") > 0L, "own estimates are unaffected")
    }
  }

  test("windowedTheta sketches persist to Delta exactly-once across restart") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    val tablePath = tmpDir("theta-table")
    val ckpt = tmpDir("theta-ckpt")
    val table = graft.delta.DeltaTable.forPath(spark, tablePath).create(StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("hashes_joined", StringType),
      StructField("n_sk", LongType))))

    def startSink(in: MemoryStream[(Long, Timestamp)]) =
      WindowedAggs.windowedTheta(in.toDF.toDF("user_id", "ts"), col("user_id"),
          "15 minutes", lateness = "10 minutes", salt = "thw", k = k)
        .selectExpr("window_start",
          "concat_ws(',', transform(hs, h -> cast(h as string))) AS hashes_joined",
          "cast(size(hs) as long) AS n_sk")
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          table.append(df, Some("theta-sink"), batchId,
            operation = "STREAMING UPDATE"): Unit
        }
        .start()

    val blockA = (1 to 20).map(u => (u.toLong, ts(u % 15)))     // window 10:00
    val blockB = Seq((50L, ts(16)), (51L, ts(17)))              // window 10:15
    val closer1 = Seq((99L, ts(40)))                            // closes 10:00
    val in1 = MemoryStream[(Long, Timestamp)]
    val q1 = startSink(in1)
    try {
      in1.addData(blockA); q1.processAllAvailable()
      in1.addData(blockB ++ closer1); q1.processAllAvailable()
      in1.addData(Seq((98L, ts(41)))); q1.processAllAvailable()
    } finally q1.stop()
    assert(table.toDF.count() >= 1L, "run 1 must have landed the closed 10:00 window")

    // restart on the same checkpoint with the full history replayed —
    // committed batches must not re-land, the newly closed window must
    val in2 = MemoryStream[(Long, Timestamp)]
    in2.addData(blockA)
    in2.addData(blockB ++ closer1)
    in2.addData(Seq((98L, ts(41))))
    val q2 = startSink(in2)
    try {
      in2.addData(Seq((97L, ts(59)))); q2.processAllAvailable() // closes 10:15
    } finally q2.stop()

    val rows = table.toDF.collect()
      .map(r => (r.getTimestamp(0), r.getString(1)))
    val starts = rows.map(_._1.toString).sorted
    assert(starts.length === starts.distinct.length,
      s"a window landed twice after restart: ${starts.toSeq}")
    assert(starts.exists(_.startsWith("2024-01-01 10:00")) &&
      starts.exists(_.startsWith("2024-01-01 10:15")),
      s"closed windows missing after restart: ${starts.toSeq}")
    // the persisted sketch is the batch-computed truth (k-truncated)
    val batchAll = (blockA ++ blockB ++ closer1 ++ Seq((98L, ts(41)), (97L, ts(59))))
      .toDF("user_id", "ts")
    val expect = WindowedAggs.windowedTheta(batchAll, col("user_id"),
        "15 minutes", lateness = "10 minutes", salt = "thw", k = k)
      .selectExpr("window_start",
        "concat_ws(',', transform(hs, h -> cast(h as string))) AS hj")
      .collect().map(r => (r.getTimestamp(0), r.getString(1))).toMap
    rows.foreach { case (w, hj) =>
      assert(expect(w) === hj, s"persisted sketch for $w diverges from batch")
    }
  }

  test("degreeMaintenanceSink: CDF stream keeps the degree table current, exactly-once") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val D = graft.delta.DeltaTable
    // edge table with CDF on; feature table keyed on node
    val edges = D.forPath(spark, tmpDir("deg-edges")).create(
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))),
      configuration = Map(D.CdfConfigKey -> "true"))
    val features = D.forPath(spark, tmpDir("deg-features")).create(
      StructType(Seq(StructField("node", LongType), StructField("deg", LongType))))
    val ckpt = tmpDir("deg-ckpt")

    def startSink() = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(edges.path)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(graft.streaming.StreamingCuration.degreeMaintenanceSink(features))
      .start()

    def featMap() = features.toDF.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    def recompute() = graft.ops.Graph.pairDegrees(edges.toDF, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // day 1: triangle 1-2-3 + pendant 3-4
    edges.append(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b"))
    val q1 = startSink()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(featMap() === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))

    // day 2: purge + growth land while the query is DOWN; restart folds
    // only the missed change files
    assert(edges.delete(col("b") === 4L) > 0L) // node 4 drops to zero
    edges.append(Seq((2L, 5L)).toDF("a", "b"))
    val q2 = startSink()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(featMap() === recompute())
    assert(!featMap().contains(4L), "zero-degree node must drop its row")

    // replayed batch (same appId + batchId) is a no-op: the fold is NOT
    // content-idempotent, so only the txn guard stands between a restart
    // and double-counted degrees
    val before = featMap()
    val replay = edges.changes(1L, 2L)
    graft.streaming.StreamingCuration.degreeMaintenanceSink(features)(replay, 0L)
    assert(featMap() === before, "replayed (appId, batchId) must not re-fold")
    // the same rows under a NEW batch id DO fold (and double-count —
    // proving the guard above was the thing preventing it)
    graft.streaming.StreamingCuration.degreeMaintenanceSink(features)(
      edges.changes(3L, 3L), 99L)
    assert(featMap() !== before)

    // a batch whose deltas NET to zero (insert+delete of one edge, for
    // nodes unknown to the table) must leave the table untouched — an
    // unconditional merge would insert phantom deg=0 rows that neither
    // the batch fold nor a recompute contains
    val zeroNet = Seq((70L, 71L, "insert"), (70L, 71L, "delete"))
      .toDF("a", "b", "_change_type")
    val snap = featMap()
    graft.streaming.StreamingCuration.degreeMaintenanceSink(features)(zeroNet, 100L)
    assert(featMap() === snap, "zero-net batch must be a no-op")
    assert(!featMap().contains(70L) && !featMap().contains(71L))
  }

  test("triangleMaintenanceSink: CDF stream keeps triangle counts + edge mirror current, exactly-once") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val D = graft.delta.DeltaTable
    val edges = D.forPath(spark, tmpDir("tri-edges")).create(
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))),
      configuration = Map(D.CdfConfigKey -> "true"))
    val features = D.forPath(spark, tmpDir("tri-features")).create(
      StructType(Seq(StructField("node", LongType), StructField("triangles", LongType))))
    // the mirror is a BUCKETED adjacency table — numBuckets = 4 on a
    // 5-node graph so multiple nodes share a bucket AND multiple buckets
    // exist (both pruning regimes exercised)
    val mirror = graft.ops.Graph.createAdjacencyMirror(
      D.forPath(spark, tmpDir("tri-mirror")), numBuckets = 4)
    val ckpt = tmpDir("tri-ckpt")

    def startSink() = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(edges.path)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(
        graft.streaming.StreamingCuration.triangleMaintenanceSink(features, mirror))
      .start()

    def featMap() = features.toDF.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    def mirrorSet() = graft.ops.Graph.mirrorPairs(mirror).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recompute() = graft.ops.Graph.triangles(
        edges.toDF.select(col("a").as("src"), col("b").as("dst")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // day 1 INSERTS: triangle 1-2-3 + pendant 3-4
    edges.append(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b"))
    val q1 = startSink()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(featMap() === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(mirrorSet() === Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))

    // day 2 lands while the query is DOWN: a DELETE breaks the triangle,
    // an append closes a NEW one (2-3-4); restart folds only the missed
    // change files against the mirror's pre state
    assert(edges.delete(col("a") === 1L && col("b") === 2L) === 2L,
      "edge delete must commit at v2")
    edges.append(Seq((2L, 4L)).toDF("a", "b"))
    val q2 = startSink()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(featMap() === recompute())
    assert(featMap() === Map(2L -> 1L, 3L -> 1L, 4L -> 1L))
    assert(!featMap().contains(1L), "zero-triangle node must drop its row")
    assert(mirrorSet() === Set((1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L)))

    // replayed batch (same appId + batchId) is a no-op for BOTH tables —
    // the mirror's txn marks the batch complete, so the sink skips
    // before even deriving a delta (a re-derivation against the advanced
    // mirror would raise on the re-seen delete)
    val before = (featMap(), mirrorSet())
    val replay = edges.changes(2L, 3L)
    graft.streaming.StreamingCuration.triangleMaintenanceSink(features, mirror)(replay, 1L)
    assert((featMap(), mirrorSet()) === before,
      "replayed (appId, batchId) must not re-fold either table")

    // a batch whose deltas NET to zero (insert+delete of one unseen edge
    // in a catch-up batch) must leave both tables untouched
    val zeroNet = Seq((70L, 71L, "insert"), (70L, 71L, "delete"))
      .toDF("a", "b", "_change_type")
    graft.streaming.StreamingCuration.triangleMaintenanceSink(features, mirror)(zeroNet, 50L)
    assert((featMap(), mirrorSet()) === before, "zero-net batch must be a no-op")

    // coeff composition from the two maintained frames matches the
    // from-scratch clusteringCoeff of the final graph
    val degT = D.forPath(spark, tmpDir("tri-deg")).create(
      StructType(Seq(StructField("node", LongType), StructField("deg", LongType))))
    graft.streaming.StreamingCuration.degreeMaintenanceSink(degT)(
      edges.changes(1L, edges.snapshot.version), 0L)
    val composed = graft.ops.Graph.coeffFromMaintained(degT.toDF, features.toDF)
    val direct = graft.ops.Graph.clusteringCoeff(
      edges.toDF.select(col("a").as("src"), col("b").as("dst")))
    assert(composed.exceptAll(direct).unionAll(direct.exceptAll(composed)).isEmpty,
      "maintained coeff must equal from-scratch recompute")
  }

  test("windowedHeavyProbes: CMS counter state per window, matches batch, replayable") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // 3 clicks + 2 views in window 1; 1 view in window 2; then a closer
    val batch1 = Seq((ts(1), "click"), (ts(2), "click"), (ts(3), "click"),
      (ts(4), "view"), (ts(5), "view"))
    val batch2 = Seq((ts(16), "view"))
    val closer = Seq((ts(59), "error"))

    def runOnce(name: String): (Seq[(Timestamp, Long, Long, Long)], Long) = {
      val in = MemoryStream[(Timestamp, String)]
      val events = in.toDF.toDF("ts", "event_type")
      val q = WindowedAggs.windowedHeavyProbes(events, col("event_type"),
          probes = Seq("click", "view", "error"), "15 minutes",
          lateness = "10 minutes", salt = "cmsw")
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try {
        in.addData(batch1); q.processAllAvailable()
        val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        in.addData(batch2); q.processAllAvailable()
        in.addData(closer); q.processAllAvailable()
        val rows = spark.table(name).collect()
          .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(_._1.getTime).toSeq
        (rows, stateRows)
      } finally q.stop()
    }

    val (rows, stateRows) = runOnce("hp1")
    // one 256-counter sketch row per open window, not one row per item
    assert(stateRows === 1L, s"expected 1 state row, got $stateRows")
    // 3 event types cannot collide into overestimates here unless they
    // share cells in ALL 4 rows — deterministic md5 coordinates, exact:
    assert(rows.head === ((Timestamp.valueOf("2024-01-01 10:00:00"), 3L, 2L, 0L)),
      s"window-1 probe estimates wrong: ${rows.head}")
    assert(rows.length === 2) // the closer window is still open
    assert(rows(1)._3 === 1L, s"window-2 view estimate: ${rows(1)}")

    // batch parity (what the stream_windowed_cms gate checks at sf0.01)
    val batchDf = (batch1 ++ batch2 ++ closer).toDF("ts", "event_type")
    val expected = WindowedAggs.windowedHeavyProbes(batchDf, col("event_type"),
        Seq("click", "view", "error"), "15 minutes", "10 minutes", "cmsw")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1.getTime).toSeq
    assert(rows === expected.filter(_._1.getTime < ts(45).getTime))

    val (rows2, _) = runOnce("hp2")
    assert(rows2 === rows, "replay must reproduce identical estimates")
  }

  test("windowedQuantileBuckets: state per occupied bucket, matches batch extraction") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // 60 values in window 1 landing in FEW buckets (runs of similar
    // magnitudes), 3 in window 2, then a closer
    val batch1 = (1 to 60).map(i => (ts(i % 15), (100 + i % 4).toDouble))
    val batch2 = Seq((ts(16), 7.25), (ts(17), -3.5), (ts(18), 0.0))
    val closer = Seq((ts(59), 1.0))

    def runOnce(name: String) = {
      val in = MemoryStream[(Timestamp, Double)]
      val events = in.toDF.toDF("ts", "value")
      val q = WindowedAggs.windowedQuantileBuckets(events, col("value"),
          "15 minutes", lateness = "10 minutes")
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try {
        in.addData(batch1); q.processAllAvailable()
        val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        in.addData(batch2); q.processAllAvailable()
        in.addData(closer); q.processAllAvailable()
        val rows = spark.table(name).collect()
          .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .sortBy(t => (t._1.getTime, t._2)).toSeq
        (rows, stateRows)
      } finally q.stop()
    }

    val (rows, stateRows) = runOnce("qb1")
    // 60 items hit one window but only as many state rows as OCCUPIED
    // buckets — values 100..103 share a bucket family, far fewer than 60
    val batch1Buckets = rows.filter(_._1 == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(stateRows === batch1Buckets.size.toLong,
      s"state must be one row per (window, bucket): $stateRows vs ${batch1Buckets.size}")
    assert(stateRows < 10L, s"bucket rows should be few, got $stateRows")
    assert(batch1Buckets.map(_._3).sum === 60L, "counts must cover every item")

    // batch parity of the full path: bucket rows + downstream extraction
    val batchDf = (batch1 ++ batch2 ++ closer).toDF("ts", "value")
    val closedBatch = WindowedAggs.windowedQuantileBuckets(batchDf, col("value"),
        "15 minutes", lateness = "10 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .filter(_._1.getTime < ts(45).getTime)
      .sortBy(t => (t._1.getTime, t._2)).toSeq
    assert(rows === closedBatch, "streaming bucket rows must equal the batch sketch")

    val (rows2, _) = runOnce("qb2")
    assert(rows2 === rows, "replay must reproduce identical bucket rows")
  }

  test("dedupWithinWatermark drops replays, keeps state bounded by the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val events = in.toDF.toDF("event_id", "ts", "value")
    val q = WindowedAggs.dedupWithinWatermark(events, Seq("event_id"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("dd").outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, ts(0), 1.0), (1L, ts(1), 99.0), (2L, ts(2), 2.0))
      q.processAllAvailable()
      // replay of key 1 in a later batch, still within the watermark delay
      in.addData((1L, ts(3), 77.0))
      q.processAllAvailable()
      val out = spark.table("dd").collect().map(r => (r.getLong(0), r.getDouble(2))).sorted
      assert(out.toSeq === Seq((1L, 1.0), (2L, 2.0)),
        s"each key must survive exactly once with its first values; got ${out.toSeq}")
    } finally q.stop()
  }

  test("streaming curation: cleans boilerplate, gates quality, dedups cleaned text") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF.toDF("doc_id", "ts", "text")
    val good = "this is a perfectly reasonable document with the usual words in it"
    val q = StreamingCuration.curate(docs, "text", "ts", watermark = "10 minutes")
      .select("doc_id", "clean_text")
      .writeStream.format("memory").queryName("cur").outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (1L, ts(0), s"$good\n42\n12 345 6789"), // boilerplate lines cleaned off
        (2L, ts(1), "short junk"),              // fails the token gate
        (3L, ts(2), good))                      // same cleaned text as doc 1
      q.processAllAvailable()
      // a replayed near-identical doc in a later batch, inside the watermark
      in.addData((4L, ts(5), s"$good\n99"))
      q.processAllAvailable()
      val out = spark.table("cur").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // docs 1/3/4 all clean to the same text → exactly one survives;
      // doc 2 is gated out entirely
      assert(out.size === 1, s"got $out")
      assert(out.values.head === good)
      assert(!out.contains(2L))
    } finally q.stop()
  }

  test("streaming near-dup: band collisions inside the watermark drop; evicted state readmits") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF.toDF("doc_id", "ts", "text")
    val base = "the quick brown fox jumps over the lazy dog again and again in the open field today"
    val near = base.replace("field", "meadow") // shares almost every shingle
    val far = "completely different content about structured streaming state stores and watermark eviction"
    val q = StreamingCuration.dedupNearWithinWatermark(docs, "text", "ts", "10 minutes")
      .select("doc_id")
      .writeStream.format("memory").queryName("nd").outputMode(OutputMode.Append()).start()
    try {
      // doc 8 is byte-identical to doc 1 IN THE SAME BATCH: the exact
      // fingerprint pre-dedup must keep exactly one of them (band winners
      // alone could split between the two copies and drop both)
      in.addData((1L, ts(0), base), (8L, ts(0), base), (2L, ts(1), far))
      q.processAllAvailable()
      // near-dup within the watermark: shares band buckets with doc 1 → dropped
      in.addData((3L, ts(3), near))
      q.processAllAvailable()
      // advance the watermark past every earlier doc: closes their groups
      // (emitting 1 and 2, finalizing 3's drop) and EVICTS their band state
      in.addData((9L, ts(59), "an unrelated advancer document moving the event time clock forward"))
      q.processAllAvailable()
      // the same near-dup text again, now past the original's evicted
      // bands: the bounded-state contract says it is readmitted
      in.addData((6L, ts(58), near))
      q.processAllAvailable()
      in.addData((7L, Timestamp.valueOf("2024-01-01 11:20:00"),
        "final advancer closing the remaining groups for the assertion below"))
      q.processAllAvailable()
      val out = spark.table("nd").collect().map(_.getLong(0)).toSet
      assert((out & Set(1L, 8L)).size === 1,
        s"exactly ONE of the same-batch identical copies must survive; got $out")
      assert(out.contains(2L), s"unique doc must survive; got $out")
      assert(!out.contains(3L), s"in-watermark near-dup must be dropped; got $out")
      assert(out.contains(6L), s"post-eviction near-dup must be readmitted; got $out")
      assert(out.contains(9L), s"unique doc must survive; got $out")
    } finally q.stop()
  }

  test("streaming embedding near-dup: Hamming≤1 drops, Hamming 2 survives, eviction readmits; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dims = 8; val planes = 6
    // signature relationships are engineered, not assumed: scaling a
    // vector preserves every hyperplane sign (Hamming 0), negation flips
    // all of them (Hamming = planes); the H1/H2 probes are FOUND by
    // computing real signatures over perturbations — deterministic
    // search order, so the test is stable
    val base = Seq(1.0f, 0.62f, -0.41f, 0.23f, -0.85f, 0.17f, -0.33f, 0.49f)
    def sigsOf(vs: Seq[Seq[Float]]): Seq[Long] = {
      val m = graft.ops.Similarity.hyperplaneMatrix(planes, dims)
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      df.select(org.apache.spark.sql.functions.col("id"),
          graft.ops.Similarity.signature(
            org.apache.spark.sql.functions.col("v"), m).as("s"))
        .orderBy("id").collect().map(_.getLong(1)).toSeq
    }
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val sigBase = sigsOf(Seq(base)).head
    def findAtHamming(h: Int): Seq[Float] = {
      val cands = for (i <- 0 until dims; d <- Seq(0.5f, 1.0f, 2.0f, -0.5f, -1.0f, -2.0f))
        yield base.updated(i, base(i) + d)
      val sigs = sigsOf(cands)
      cands.zip(sigs).collectFirst {
        case (v, s) if hamming(s, sigBase) == h => v
      }.getOrElse(fail(s"no perturbation at Hamming $h — widen the search"))
    }
    val vEq = base.map(_ * 2.0f)       // Hamming 0, guaranteed
    val vFar = base.map(v => -v)       // Hamming = planes, guaranteed
    val vH1 = findAtHamming(1)
    val vH2 = findAtHamming(2)

    // batch parity FIRST: the stream's drop set must match the batch
    // operator's candidate definition (threshold -1 keeps every LSH
    // candidate — "near" is the signature condition, shared kernels)
    val allDocs = Seq((1L, base), (2L, vEq), (3L, vH1), (4L, vH2), (5L, vFar))
      .toDF("id", "v")
    val candPairs = graft.ops.Dedup.embeddingNearDups(allDocs, "id", "v",
        threshold = -1.0, planes = planes, dims = dims)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(candPairs.contains((1L, 2L)), "Hamming-0 pair must be a batch candidate")
    assert(candPairs.contains((1L, 3L)), "Hamming-1 pair must be a batch candidate")
    assert(!candPairs.contains((1L, 4L)),
      "Hamming-2 pair must NOT be a batch candidate (1-bit multiprobe)")
    assert(!candPairs.contains((1L, 5L)))

    val in = MemoryStream[(Long, Timestamp, Seq[Float])]
    val docs = in.toDF.toDF("doc_id", "ts", "vec")
    val q = StreamingCuration.dedupEmbeddingWithinWatermark(
        docs, "vec", "ts", "10 minutes", planes = planes, dims = dims)
      .select("doc_id")
      .writeStream.format("memory").queryName("emb").outputMode(OutputMode.Append()).start()
    try {
      // doc 8 is sig-identical to doc 1 IN THE SAME BATCH: the exact
      // signature pre-dedup keeps exactly one (key winners alone could
      // split between the copies and drop both)
      in.addData((1L, ts(0), base), (8L, ts(0), vEq))
      q.processAllAvailable()
      // within the watermark: H1 collides → drop; H2 does NOT collide
      // (per-plane key pairs reproduce the batch condition exactly — a
      // probe-set union would wrongly drop it); far survives
      in.addData((3L, ts(2), vH1))
      in.addData((4L, ts(3), vH2), (5L, ts(4), vFar))
      q.processAllAvailable()
      // advance the watermark far enough to close groups + evict keys
      in.addData((9L, ts(59), Seq.fill(dims)(0.9f)))
      q.processAllAvailable()
      // H1 again, past eviction: the bounded-state contract readmits
      in.addData((6L, ts(58), vH1))
      q.processAllAvailable()
      in.addData((7L, Timestamp.valueOf("2024-01-01 11:30:00"),
        Seq.fill(dims)(-0.7f)))
      q.processAllAvailable()
      val out = spark.table("emb").collect().map(_.getLong(0)).toSet
      assert((out & Set(1L, 8L)).size === 1,
        s"exactly one of the sig-identical same-batch copies survives; got $out")
      assert(!out.contains(3L), s"Hamming-1 doc inside the watermark must drop; got $out")
      assert(out.contains(4L), s"Hamming-2 doc must SURVIVE; got $out")
      assert(out.contains(5L), s"far doc must survive; got $out")
      assert(out.contains(6L), s"post-eviction near-dup must be readmitted; got $out")
    } finally q.stop()
  }

  test("verified near-dedup sink: same-batch near-identical docs keep exactly one representative") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF.toDF("doc_id", "ts", "text")
    val base = "the quick brown fox jumps over the lazy dog again and again in the open field today"
    val near = base.replace("field", "meadow") // near-identical, NOT identical
    val far = "completely different content about structured streaming state stores and watermark eviction"
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = docs.writeStream
      .foreachBatch(StreamingCuration.verifiedNearDedupSink("doc_id", "text")(
        b => seen.synchronized { seen ++= b.select("doc_id").collect().map(_.getLong(0)) }))
      .start()
    try {
      // the exact case dedupNearWithinWatermark documents as lossy: two
      // NEAR-identical docs in ONE micro-batch (its band winners could
      // split between them and drop both)
      in.addData((5L, ts(0), near), (1L, ts(0), base), (2L, ts(0), far))
      q.processAllAvailable()
      val out = seen.synchronized(seen.toSet)
      assert(out.contains(1L) && !out.contains(5L),
        s"the min-id representative (1) must survive and its near-dup (5) drop; got $out")
      assert(out.contains(2L), s"the unrelated doc must survive; got $out")
    } finally q.stop()

    // the pure batch form keeps the same contract (directly testable)
    import spark.implicits._
    val batch = Seq((1L, base), (5L, near), (2L, far)).toDF("doc_id", "text")
    val kept = StreamingCuration.verifyNearWithinBatch(batch, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L))
  }

  test("curateNear: cleaning + quality + near-dedup compose on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF.toDF("doc_id", "ts", "text")
    val good = "the quick brown fox jumps over the lazy dog again and again in the open field today"
    val near = good.replace("field", "meadow")
    val q = StreamingCuration.curateNear(docs, "text", "ts", "10 minutes")
      .select("doc_id", "clean_text", "quality")
      .writeStream.format("memory").queryName("cn").outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (1L, ts(0), s"$good\n42\n12 345 6789"), // boilerplate lines cleaned off
        (2L, ts(1), "short junk"))              // fails the token gate
      q.processAllAvailable()
      // a NEAR-dup of doc 1's CLEANED text wrapped in fresh boilerplate:
      // the exact fingerprint differs, the band buckets collide
      in.addData((3L, ts(3), s"$near\n99 88 77"))
      q.processAllAvailable()
      in.addData((9L, ts(59),
        "a totally different advancer document closing the earlier groups now"))
      q.processAllAvailable()
      in.addData((10L, Timestamp.valueOf("2024-01-01 11:20:00"),
        "final advancer for the last group emission in this scenario"))
      q.processAllAvailable()
      val out = spark.table("cn").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.contains(1L) && out(1L) === good,
        s"cleaned original must survive; got $out")
      assert(!out.contains(2L), s"quality-gated doc must drop; got $out")
      assert(!out.contains(3L), s"near-dup of cleaned text must drop; got $out")
      assert(out.contains(9L))
    } finally q.stop()
  }

  test("streaming decontamination drops probe-matching docs from every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF.toDF("doc_id", "ts", "text")
    val probes = Seq((100L, "leaked benchmark question text"))
      .toDF("probe_id", "text")
    val q = StreamingCuration.decontaminate(docs, probes, "text")
      .select("doc_id")
      .writeStream.format("memory").queryName("decon").outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, ts(0), "an ordinary clean training document"),
        (2L, ts(1), "text question benchmark leaked"))  // same token SET as the probe
      q.processAllAvailable()
      in.addData((3L, ts(2), "leaked benchmark question text"), // exact match, later batch
        (4L, ts(3), "another clean one"))
      q.processAllAvailable()
      val out = spark.table("decon").collect().map(_.getLong(0)).toSet
      assert(out === Set(1L, 4L), s"probe matches must be dropped in every batch; got $out")
    } finally q.stop()
  }

  test("n-gram contamination filter drops partial leaks across micro-batches, statelessly") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF.toDF("doc_id", "text")
    val bench = Seq((100L, "what is the capital of france"))
      .toDF("doc_id", "text")
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = docs.writeStream
      .foreachBatch(StreamingCuration.contaminationFilterSink(
        bench, "doc_id", "text", shingleN = 4)(
        clean => kept.synchronized {
          kept ++= clean.select("doc_id").collect().map(_.getLong(0)): Unit
        }))
      .start()
    try {
      // doc 2 embeds a benchmark 4-gram mid-sentence — the exact
      // fingerprint decontaminate would MISS it (different token set)
      in.addData((1L, "an ordinary clean training document with words"),
        (2L, "quiz answer what is the capital of france said the page"))
      q.processAllAvailable()
      in.addData((3L, "is the capital of gaul paris or rome"), // 4-gram "is the capital of"
        (4L, "another clean training document"))
      q.processAllAvailable()
      assert(kept.synchronized(kept.toSet) === Set(1L, 4L),
        s"partial leaks must drop in every batch; kept $kept")
    } finally q.stop()
  }

  test("verbatim-passage filter drops exact quotes but not scrambled overlap, per batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF.toDF("doc_id", "text")
    val passages = Seq((1L, "what is the capital of france"))
      .toDF("doc_id", "text")
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = docs.writeStream
      .foreachBatch(StreamingCuration.passageFilterSink(
        passages, "doc_id", "text", shingleN = 3)(
        clean => kept.synchronized {
          kept ++= clean.select("doc_id").collect().map(_.getLong(0)): Unit
        }))
      .start()
    try {
      // doc 2 quotes the passage verbatim mid-sentence → drops; doc 3
      // holds every trigram's WORDS but scrambled → positional alignment
      // keeps it (the contamination-overlap filter would flag it)
      in.addData((1L, "an ordinary clean training document"),
        (2L, "she asked what is the capital of france and left"))
      q.processAllAvailable()
      in.addData((3L, "france of capital the is what"),
        (4L, "the capital what is of france nearly but not quite")) // reordered
      q.processAllAvailable()
      in.addData((5L, "what is the capital of france")) // the passage itself
      q.processAllAvailable()
      assert(kept.synchronized(kept.toSet) === Set(1L, 3L, 4L),
        s"exact quotes drop, scrambles pass; kept $kept")
    } finally q.stop()
  }

  test("intervalJoin attributes within the window on live streams") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp, Double)]
    val joined = WindowedAggs.intervalJoin(
      clicks.toDF.toDF("event_id", "user_id", "ts"),
      views.toDF.toDF("user_id", "ts", "value"),
      "user_id", "ts", "ts", "20 minutes", "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData((1L, ts(10), 7.0), (1L, ts(39), 9.0)) // in / out of window
      clicks.addData((100L, 1L, ts(30)), (101L, 2L, ts(30)))
      q.processAllAvailable()
      val out = spark.table("ij")
        .select("event_id", "right_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      // click 100 attributes only the view 20 min before it; click 101's
      // user has no views; the 10:39 view is after the click
      assert(out.toSeq === Seq((100L, 7.0)))
    } finally q.stop()
  }

  test("sessionize: gap timeout closes sessions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val q = WindowedAggs.sessionize(in.toDS(), gapMs = 5 * 60 * 1000, lateness = "1 minute")
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 2 min apart (one session), then silence
      in.addData(SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(2), 2.0))
      q.processAllAvailable()
      // event far in the future advances the watermark → session times out
      in.addData(SessionEvent(2L, ts(30), 9.0))
      q.processAllAvailable()
      in.addData(SessionEvent(2L, ts(59), 1.0))
      q.processAllAvailable()

      val out = spark.table("sess").as[Session].collect()
      val u1 = out.filter(_.user_id == 1L)
      assert(u1.length === 1)
      assert(u1.head.n_events === 2)
      assert(u1.head.total_value === 3.0)
      assert(u1.head.session_start === ts(0) && u1.head.session_end === ts(2))
    } finally q.stop()
  }

  test("sessionize extends session_start for late-but-admitted earlier events") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val q = WindowedAggs.sessionize(in.toDS(), gapMs = 5 * 60 * 1000, lateness = "10 minutes")
      .writeStream.format("memory").queryName("sess3").outputMode(OutputMode.Append()).start()
    try {
      in.addData(SessionEvent(5L, ts(10), 1.0))
      q.processAllAvailable()
      // a late event 2 min EARLIER, still within the lateness window
      in.addData(SessionEvent(5L, ts(8), 2.0))
      q.processAllAvailable()
      in.addData(SessionEvent(6L, ts(59), 0.0)) // advance watermark → close
      q.processAllAvailable()
      val out = spark.table("sess3").as[Session].collect().filter(_.user_id == 5L)
      assert(out.length === 1)
      assert(out.head.session_start === ts(8),
        s"late earlier event must extend the start; got ${out.head}")
      assert(out.head.n_events === 2)
    } finally q.stop()
  }

  test("sessionize splits on gap within one batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val q = WindowedAggs.sessionize(in.toDS(), gapMs = 5 * 60 * 1000, lateness = "1 minute")
      .writeStream.format("memory").queryName("sess2").outputMode(OutputMode.Append()).start()
    try {
      // events 20 min apart → first session closes immediately (in-batch split)
      in.addData(SessionEvent(7L, ts(0), 1.0), SessionEvent(7L, ts(20), 2.0))
      q.processAllAvailable()
      val out = spark.table("sess2").as[Session].collect()
      assert(out.length === 1, "first of the two split sessions should be emitted")
      assert(out.head.session_start === ts(0) && out.head.n_events === 1)
    } finally q.stop()
  }

  test("incrementalDedupSink: corpus-backed dedup across batches and replays") {
    implicit val sqlCtx = spark.sqlContext
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("digest", org.apache.spark.sql.types.StringType)))
    val t = graft.delta.DeltaTable.forPath(spark, tmpDir("stream-incr")).create(schema)

    def ingest(batches: Seq[Seq[(Long, String)]]): Unit = {
      val in = MemoryStream[(Long, String)]
      val q = in.toDS().toDF("id", "text").writeStream
        .foreachBatch(StreamingCuration.incrementalDedupSink(t, "id", "text"))
        .outputMode(OutputMode.Append()).start()
      try batches.foreach { b => in.addData(b); q.processAllAvailable() }
      finally q.stop()
    }

    ingest(Seq(
      Seq(1L -> "alpha", 2L -> "alpha", 5L -> "beta"), // in-batch dup: min id wins
      Seq(0L -> "alpha", 7L -> "gamma"))) // cross-batch dup loses to the corpus
    def ids = graft.delta.DeltaTable.forPath(spark, t.path)
      .toDF.select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 5L, 7L))
    val v = graft.delta.DeltaTable.forPath(spark, t.path).snapshot.version

    // a full restart replaying every batch (the at-least-once worst case)
    // appends nothing and commits nothing — the corpus is the state
    ingest(Seq(Seq(1L -> "alpha", 2L -> "alpha", 5L -> "beta",
      0L -> "alpha", 7L -> "gamma")))
    assert(ids === Set(1L, 5L, 7L))
    assert(graft.delta.DeltaTable.forPath(spark, t.path).snapshot.version === v)
  }

  test("leakageSafeSplit streams: stateless stream-static join, batch-split independent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    // static near-dup cluster frame (ids 1..30 in reps {1,2,3})
    val clusters = (1L to 30L).map(i => (i, i % 3 + 1L)).toDF("id", "cluster_id")
    val all = (1L to 40L).map(i => SampleDoc("s", i, s"doc $i"))

    def run(name: String, batches: Seq[Seq[SampleDoc]]): Map[Long, String] = {
      val in = MemoryStream[SampleDoc]
      val q = graft.ops.Sampling.leakageSafeSplit(
          in.toDS().toDF(), "doc_id", clusters, splits, "ssplit")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
      } finally q.stop()
    }

    // cluster members deliberately split ACROSS micro-batches
    val one = run("lss1", Seq(all))
    val three = run("lss3", Seq(all.take(7), all.slice(7, 23), all.drop(23)))
    assert(one === three, "split must not depend on micro-batch boundaries")
    // streaming ≡ batch op, row for row (stateless: no watermark, no state)
    val batch = graft.ops.Sampling.leakageSafeSplit(
        all.toDF("source", "doc_id", "text"), "doc_id", clusters, splits, "ssplit")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(one === batch)
    // the leakage invariant holds across batch boundaries: every cluster
    // member inherits its representative's split
    (1L to 30L).foreach(i => assert(three(i) === batch(i % 3 + 1L)))
  }

  test("streamingUniformK: sample is micro-batch-split independent and equals the batch op") {
    implicit val sqlCtx = spark.sqlContext
    val k = 3
    val salt = "tuk"
    val all = (1L to 12L).map(id => SampleDoc("s", id, s"doc $id"))
    def coinOf(id: Long): Long =
      graft.functions.Hashing.planTimeH64(s"$salt:$id") & 0xFFFFFFFFL
    // the doc with the globally largest coin can never displace a full
    // k=3 reservoir built from the other 11 — its batch must emit nothing
    val worst = all.maxBy(d => (coinOf(d.doc_id), d.doc_id))

    def run(name: String, batches: Seq[Seq[SampleDoc]]): Seq[Seq[(String, Int, Long)]] = {
      val in = MemoryStream[SampleDoc]
      val q = WindowedAggs.streamingUniformK(in.toDS(), k, salt)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try {
        var prev = Map.empty[(String, Int, Long), Int]
        batches.map { b =>
          in.addData(b)
          q.processAllAvailable()
          val now = spark.table(name).collect()
            .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
            .groupBy(identity).map { case (t, g) => (t, g.length) }
          // multiset diff vs the previous snapshot = this batch's emission
          val fresh = now.toSeq.flatMap { case (t, n) =>
            Seq.fill(n - prev.getOrElse(t, 0))(t)
          }
          prev = now
          fresh.sorted
        }
      } finally q.stop()
    }

    val split3 = run("suk3",
      Seq(all.take(6).filterNot(_ == worst),
        all.drop(6).filterNot(_ == worst), Seq(worst)))
    val split1 = run("suk1", Seq(all))

    assert(split3(2).isEmpty,
      "a batch that cannot change the reservoir must emit nothing")
    val lastEmission3 = split3.reverse.find(_.nonEmpty).get
    val lastEmission1 = split1.reverse.find(_.nonEmpty).get
    assert(lastEmission3 === lastEmission1,
      "final sample must not depend on micro-batch boundaries")
    assert(lastEmission3.length === k)

    // equals the batch operator over the same rows (same coin, same ties)
    val batch = graft.ops.Sampling.uniformK(
        all.toDF("source", "doc_id", "text"), "source", "doc_id", k, salt)
      .collect().map(r => r.getLong(1)).toSet
    assert(lastEmission3.map(_._3).toSet === batch)
  }
}
