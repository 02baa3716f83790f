package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time operators verified through the batch gate: the watermarked
  * window aggregation (watermark is a no-op on batch input, semantics
  * otherwise identical) and gap-based sessionization in its deterministic
  * relational form (lag → new-session flag → running session id). The
  * stateful streaming twins live in graft.streaming.WindowedAggs and are
  * exercised by StreamingWindowSpec.
  */
object StreamingQueries extends QueryModule {

  def defs: Map[String, QueryDef] = Map(
    // Streaming deterministic uniform-k (reservoir slot): run on a batch
    // frame the flatMapGroupsWithState op degenerates to one group call
    // with empty state = exactly Sampling.uniformK, so the batch oracle
    // gates the SAME code path micro-batch runs execute; batch-split
    // independence and state bounds are StreamingWindowSpec's job.
    "stream_uniform_k" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .as[graft.streaming.WindowedAggs.SampleDoc]
        graft.streaming.WindowedAggs.streamingUniformK(docs, k = 5, salt = "uk")
          .toDF()
          .select(col("doc_id"), col("source"),
            col("rank").cast("long").as("smp_rank"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, source, CAST(row_number() OVER w AS BIGINT) AS smp_rank
              |FROM documents
              |WINDOW w AS (PARTITION BY source
              |  ORDER BY ${OracleSql.h32Sql("doc_id", "uk")}, doc_id)
              |QUALIFY row_number() OVER w <= 5
              |ORDER BY doc_id""".stripMargin)),

    // Delta table as a REAL streaming source (graft-delta, V1 Source):
    // half the documents land before the stream starts (the snapshot
    // batch), the other half are appended mid-stream (the tail batch),
    // and a stateful complete-mode aggregation drains both. The oracle
    // aggregates all documents — a re-emitted snapshot, a lost tail
    // batch, or version-offset drift doubles/loses rows and shifts
    // every sum. ------------------------------------------------------
    "stream_delta_tail" -> QueryDef(
      (s, d) => {
        val dir = graft.Scratch.dir("graft-dstream") + "/t"
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        val t = graft.delta.DeltaTable.forPath(s, dir).create(docs.schema)
        t.append(docs.filter(col("doc_id") % 2 === 0))
        val q = s.readStream.format("graft-delta").option("path", dir).load()
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).cast("long").as("id_sum"))
          .writeStream.format("memory").queryName("stream_delta_tail_mem")
          .outputMode("complete")
          .option("checkpointLocation", graft.Scratch.dir("graft-dstream-ck"))
          .start()
        try {
          q.processAllAvailable()
          t.append(docs.filter(col("doc_id") % 2 =!= 0))
          q.processAllAvailable()
        } finally q.stop()
        s.table("stream_delta_tail_mem").orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // The CHANGE FEED as a stream (readChangeFeed): ref_cdf's exact DML
    // history (2 appends, delete, update, merge) drains through the
    // streaming source from version 1 and must aggregate to the same
    // per-(version, change_type) counts/sums as the batch feed — the
    // oracle IS ref_cdf's oracle. A mis-stamped version, dropped change
    // file, or double-emitted batch shifts a group. ---------------------
    "stream_delta_cdf" -> QueryDef(
      (s, d) => {
        val dir = graft.Scratch.dir("graft-scdf") + "/t"
        val ev = Tables.events(s, d).select(col("event_id"), col("user_id"))
        val t = graft.delta.DeltaTable.forPath(s, dir).create(ev.schema,
          configuration = Map(graft.delta.DeltaTable.CdfConfigKey -> "true"))
        t.append(ev.filter(col("event_id") % 2 === 0))
        t.append(ev.filter(col("event_id") % 2 =!= 0))
        require(t.delete(col("event_id") % 7 === 0) == 3L)
        require(t.update(col("event_id") % 5 === 0,
          Map("user_id" -> (col("user_id") + 1000000L))) == 4L)
        val src = ev.filter(col("event_id") % 3 === 0)
          .select(col("event_id"), (col("user_id") + 2000000L).cast("long").as("user_id"))
        require(t.merge(src, Seq("event_id")) == 5L)
        val q = s.readStream.format("graft-delta").option("path", dir)
          .option("readChangeFeed", "true").option("startingVersion", "1")
          .load()
          .writeStream.format("memory").queryName("stream_delta_cdf_mem")
          .option("checkpointLocation", graft.Scratch.dir("graft-scdf-ck"))
          .start()
        try q.processAllAvailable() finally q.stop()
        s.table("stream_delta_cdf_mem")
          .groupBy(col("_commit_version").as("commit_version"),
            col("_change_type").as("change_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("event_id")).cast("long").as("sum_id"),
            sum(col("user_id")).cast("long").as("sum_user"))
          .orderBy(col("commit_version"), col("change_type"))
      },
      Some("""WITH ev AS (SELECT event_id AS id, user_id AS u FROM events),
             |allc AS (
             |  SELECT 1 AS v, 'insert' AS ct, id, u FROM ev WHERE id % 2 = 0
             |  UNION ALL SELECT 2, 'insert', id, u FROM ev WHERE id % 2 = 1
             |  UNION ALL SELECT 3, 'delete', id, u FROM ev WHERE id % 7 = 0
             |  UNION ALL SELECT 4, 'update_preimage', id, u
             |    FROM ev WHERE id % 5 = 0 AND id % 7 <> 0
             |  UNION ALL SELECT 4, 'update_postimage', id, u + 1000000
             |    FROM ev WHERE id % 5 = 0 AND id % 7 <> 0
             |  UNION ALL SELECT 5, 'update_preimage', id,
             |      u + CASE WHEN id % 5 = 0 THEN 1000000 ELSE 0 END
             |    FROM ev WHERE id % 3 = 0 AND id % 7 <> 0
             |  UNION ALL SELECT 5, 'update_postimage', id, u + 2000000
             |    FROM ev WHERE id % 3 = 0 AND id % 7 <> 0
             |  UNION ALL SELECT 5, 'insert', id, u + 2000000
             |    FROM ev WHERE id % 3 = 0 AND id % 7 = 0
             |)
             |SELECT CAST(v AS BIGINT) AS commit_version, ct AS change_type,
             |  count(*) AS n, CAST(sum(id) AS BIGINT) AS sum_id,
             |  CAST(sum(u) AS BIGINT) AS sum_user
             |FROM allc GROUP BY v, ct ORDER BY commit_version, change_type""".stripMargin)),

    // Streaming UPSERT through the graft-delta sink (mergeKeys): two
    // generations of per-user summaries flow raw→stream→sink; the
    // second generation's keys OVERWRITE the first's rows instead of
    // duplicating — the CDC-apply / latest-state shape. The oracle is a
    // full outer join preferring generation 2. -------------------------
    "stream_delta_upsert" -> QueryDef(
      (s, d) => {
        val rawDir = graft.Scratch.dir("graft-sup-raw") + "/t"
        val outDir = graft.Scratch.dir("graft-sup-out") + "/t"
        val ev = Tables.events(s, d)
        def gen(parity: Int) = ev.filter(col("event_id") % 2 === parity)
          .groupBy(col("user_id"))
          .agg(max(col("event_id")).cast("long").as("last_event"),
            count(lit(1)).as("n_events"))
        val raw = graft.delta.DeltaTable.forPath(s, rawDir).create(gen(0).schema)
        raw.append(gen(0))
        val q = s.readStream.format("graft-delta").option("path", rawDir).load()
          .writeStream.format("graft-delta")
          .option("path", outDir).option("mergeKeys", "user_id")
          .option("checkpointLocation", graft.Scratch.dir("graft-sup-ck"))
          .start()
        try {
          q.processAllAvailable()
          raw.append(gen(1))
          q.processAllAvailable()
        } finally q.stop()
        graft.delta.DeltaTable.forPath(s, outDir).toDF
          .orderBy(col("user_id"))
      },
      Some("""WITH g1 AS (
             |  SELECT user_id, CAST(max(event_id) AS BIGINT) AS last_event,
             |    CAST(count(*) AS BIGINT) AS n_events
             |  FROM events WHERE event_id % 2 = 0 GROUP BY user_id),
             |g2 AS (
             |  SELECT user_id, CAST(max(event_id) AS BIGINT) AS last_event,
             |    CAST(count(*) AS BIGINT) AS n_events
             |  FROM events WHERE event_id % 2 = 1 GROUP BY user_id)
             |SELECT coalesce(g2.user_id, g1.user_id) AS user_id,
             |  coalesce(g2.last_event, g1.last_event) AS last_event,
             |  coalesce(g2.n_events, g1.n_events) AS n_events
             |FROM g1 FULL OUTER JOIN g2 ON g1.user_id = g2.user_id
             |ORDER BY user_id""".stripMargin)),

    // Streaming CDC APPLY (sink deleteWhen + mergeKeys): the target
    // holds per-user state from even events; the change stream carries
    // odd-event state with an `op` marker — users ≡0 mod 7 DELETE, the
    // rest upsert. The marker column is outside the table schema (the
    // Debezium payload shape) and must never write. The oracle replays
    // kept = (even-only users) ∪ (odd non-delete users); a leaked
    // delete, a marker column written, or a resurrected row all shift
    // the compare. ----------------------------------------------------
    "stream_delta_cdc" -> QueryDef(
      (s, d) => {
        val rawDir = graft.Scratch.dir("graft-scdc-raw") + "/t"
        val outDir = graft.Scratch.dir("graft-scdc-out") + "/t"
        val ev = Tables.events(s, d)
        def agg(parity: Int) = ev.filter(col("event_id") % 2 === parity)
          .groupBy(col("user_id"))
          .agg(max(col("event_id")).cast("long").as("last_event"),
            count(lit(1)).as("n_events"))
        val state = agg(0)
        val out = graft.delta.DeltaTable.forPath(s, outDir).create(state.schema)
        out.append(state)
        val changes = agg(1).withColumn("op",
          when(col("user_id") % 7 === 0, lit("delete")).otherwise(lit("upsert")))
        val raw = graft.delta.DeltaTable.forPath(s, rawDir).create(changes.schema)
        raw.append(changes)
        val q = s.readStream.format("graft-delta").option("path", rawDir).load()
          .writeStream.format("graft-delta")
          .option("path", outDir).option("mergeKeys", "user_id")
          .option("deleteWhen", "op = 'delete'")
          .option("checkpointLocation", graft.Scratch.dir("graft-scdc-ck"))
          .start()
        try q.processAllAvailable() finally q.stop()
        val outT = graft.delta.DeltaTable.forPath(s, outDir)
        require(outT.toDF.columns.toSeq == Seq("user_id", "last_event", "n_events"),
          "the op marker column must never reach the table")
        outT.toDF.orderBy(col("user_id"))
      },
      Some("""WITH g1 AS (
             |  SELECT user_id, CAST(max(event_id) AS BIGINT) AS last_event,
             |    CAST(count(*) AS BIGINT) AS n_events
             |  FROM events WHERE event_id % 2 = 0 GROUP BY user_id),
             |g2 AS (
             |  SELECT user_id, CAST(max(event_id) AS BIGINT) AS last_event,
             |    CAST(count(*) AS BIGINT) AS n_events
             |  FROM events WHERE event_id % 2 = 1 GROUP BY user_id)
             |SELECT user_id, last_event, n_events FROM g1
             |WHERE user_id NOT IN (SELECT user_id FROM g2)
             |UNION ALL
             |SELECT user_id, last_event, n_events FROM g2 WHERE user_id % 7 <> 0
             |ORDER BY user_id""".stripMargin)),

    "stream_windowed_counts" -> QueryDef(
      (s, d) =>
        graft.streaming.WindowedAggs.windowedCounts(
            Tables.events(s, d), "15 minutes", lateness = "10 minutes")
          .orderBy(col("window_start"), col("event_type")),
      Some("""SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
             |  event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // Watermarked windowed DISTINCT count (HLL register merge law): one
    // 64-register sketch per window instead of per-item state. Batch run
    // (watermark no-op) → the oracle re-derives the ENTIRE sketch per
    // window — registers, integer indicator sum, estimate — exactly as
    // sketch_hll_distinct does per source, proving the streaming agg's
    // max-per-register formulation computes the same sketch.
    "stream_windowed_distinct" -> QueryDef(
      (s, d) =>
        graft.streaming.WindowedAggs.windowedDistinct(
            Tables.events(s, d), col("user_id"), "15 minutes",
            lateness = "10 minutes", salt = "hllw")
          .orderBy(col("window_start")),
      Some {
        val S = graft.ops.Sketches
        val regCols = (0 until 64).map(j =>
          s"coalesce(max(CASE WHEN reg = $j THEN r END), 0) AS r_$j").mkString(",\n|    ")
        val joined = (0 until 64).map(j => s"CAST(r_$j AS VARCHAR)")
          .mkString("concat_ws(',', ", ", ", ")")
        val sSum = (0 until 64).map(j =>
          s"(CAST(1 AS BIGINT) << (56 - r_$j))").mkString("(", " + ", ")")
        val zeros = (0 until 64).map(j => s"(CASE WHEN r_$j = 0 THEN 1 ELSE 0 END)")
          .mkString("(", " + ", ")")
        s"""WITH h AS (
           |  SELECT time_bucket(INTERVAL '15 minutes', ts) AS w,
           |    ${graft.functions.Hashing.h64Sql("user_id", "hllw")} AS h
           |  FROM events),
           |pr AS (SELECT w, CAST(h & 63 AS INT) AS reg, ${S.rankSql("(h >> 6)")} AS r FROM h),
           |wide AS (SELECT w,
           |    $regCols
           |  FROM pr GROUP BY w),
           |calc AS (SELECT w, $joined AS registers_joined,
           |    $sSum AS s, $zeros AS zeros
           |  FROM wide),
           |est AS (SELECT w, registers_joined, zeros,
           |    ${S.AlphaM2} * ${math.pow(2.0, 56)} / CAST(s AS DOUBLE) AS est_raw
           |  FROM calc)
           |SELECT w AS window_start, registers_joined,
           |  CAST(floor((CASE WHEN est_raw <= 160.0 AND zeros > 0
           |    THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE)) ELSE est_raw END)
           |    * 1000.0 + 0.5) AS BIGINT) AS est_q3
           |FROM est ORDER BY window_start""".stripMargin
      }),

    // Watermarked windowed SET-OVERLAP monitoring (KMV/theta merge-and-
    // truncate law): ≤ k longs of state per open window; the emitted
    // sketches support intersection — per-window distinct estimate PLUS
    // overlap/Jaccard against the previous window (user churn), which
    // HLL registers cannot give. Batch run (watermark no-op) → the
    // oracle re-derives every window's complete k-minimum sketch, the
    // predecessor equi-join, and the union-law estimate math
    // bit-for-bit — full sketch parity via hashes_joined, like
    // stream_windowed_distinct.
    "stream_windowed_theta" -> QueryDef(
      (s, d) =>
        graft.streaming.WindowedAggs.thetaWindowOverlap(
            graft.streaming.WindowedAggs.windowedTheta(
              Tables.events(s, d), col("user_id"), "15 minutes",
              lateness = "10 minutes", salt = "thw", k = 64),
            "15 minutes", k = 64)
          .orderBy(col("window_start")),
      Some {
        val k = 64
        val numer = s"${(k - 1).toDouble} * ${graft.ops.Sketches.KmvSpace}"
        s"""WITH h AS (
           |  SELECT time_bucket(INTERVAL '15 minutes', ts) AS w,
           |    ${graft.functions.Hashing.h64Sql("user_id", "thw")} AS h
           |  FROM events),
           |dh AS (SELECT DISTINCT w, h FROM h),
           |rk AS (SELECT w, h, row_number() OVER (PARTITION BY w ORDER BY h) AS rn FROM dh),
           |sk AS MATERIALIZED (
           |  SELECT w, list(h ORDER BY h) AS hs FROM rk WHERE rn <= $k GROUP BY w),
           |pair AS (
           |  SELECT c.w AS w, c.hs AS hs,
           |    coalesce(p.hs, CAST([] AS BIGINT[])) AS hp
           |  FROM sk c LEFT JOIN sk p ON p.w + INTERVAL '15 minutes' = c.w),
           |c1 AS (
           |  SELECT w, hs, hp,
           |    (list_sort(list_distinct(hp || hs)))[1:$k] AS su,
           |    len(hs) AS nc, len(hp) AS np
           |  FROM pair),
           |c2 AS (
           |  SELECT w, hs, hp, su, nc, np, len(su) AS nu,
           |    len(list_filter(su, x -> list_contains(hp, x) AND list_contains(hs, x))) AS com
           |  FROM c1),
           |c3 AS (
           |  SELECT w, hs, nc, nu, com,
           |    CASE WHEN nc < $k THEN CAST(nc AS DOUBLE) ELSE ($numer) / CAST(hs[$k] AS DOUBLE) END AS ec,
           |    CASE WHEN np < $k THEN CAST(np AS DOUBLE) ELSE ($numer) / CAST(hp[$k] AS DOUBLE) END AS ep,
           |    CASE WHEN nu < $k THEN CAST(nu AS DOUBLE) ELSE ($numer) / CAST(su[$k] AS DOUBLE) END AS eu
           |  FROM c2),
           |c4 AS (
           |  SELECT w, hs, nc, nu, com, ec, ep,
           |    CASE WHEN nu < $k THEN CAST(com AS DOUBLE)
           |      ELSE CAST(com AS DOUBLE) / ${k.toDouble} * eu END AS ei
           |  FROM c3)
           |SELECT w AS window_start, CAST(nc AS BIGINT) AS n_sk,
           |  array_to_string(hs, ',') AS hashes_joined,
           |  CAST(floor(ec * 1000.0 + 0.5) AS BIGINT) AS est_q3,
           |  CAST(floor(ep * 1000.0 + 0.5) AS BIGINT) AS est_prev_q3,
           |  CAST(floor(ei * 1000.0 + 0.5) AS BIGINT) AS est_isect_prev_q3,
           |  CASE WHEN nu = 0 THEN CAST(0 AS BIGINT)
           |    ELSE CAST(floor(CAST(com AS DOUBLE) / CAST(nu AS DOUBLE) * 1000000.0 + 0.5)
           |      AS BIGINT) END AS jaccard_prev_q6
           |FROM c4 ORDER BY window_start""".stripMargin
      }),

    // Windowed EMBEDDING-CENTROID drift (the vector twin of
    // stream_windowed_theta's membership churn): each event carries the
    // embedding keyed by event_id % 500 (a broadcast of the 500-row
    // vector table — the oracle replays the same join), the stateful op
    // keeps dims+1 exact-integer sums per open window, and the readout
    // is the consecutive-window centroid cosine as drift micro-units.
    // The oracle re-derives every per-dimension quantized sum, the
    // 64-term dots in the same IEEE order, and the q6 floor; the full
    // sum vector is hash-gated via sums_joined.
    "stream_windowed_drift" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d).select(col("ts"), col("event_id"))
          .join(broadcast(Tables.embeddings(s, d)
            .select(col("vec_id"), col("embedding"))),
            (col("event_id") % 500) === col("vec_id"))
        graft.streaming.WindowedAggs.vecDriftOverlap(
            graft.streaming.WindowedAggs.windowedVecSums(
              ev, col("embedding"), dims = 64, "15 minutes",
              lateness = "10 minutes"),
            "15 minutes", dims = 64)
          .orderBy(col("window_start"))
      },
      Some {
        val O = OracleSql
        val scale = (1L << 20).toDouble
        s"""WITH dev AS MATERIALIZED (
           |  SELECT time_bucket(INTERVAL '15 minutes', e.ts) AS w, m.embedding AS v
           |  FROM events e JOIN embeddings m ON m.vec_id = e.event_id % 500),
           |dwn AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM dev GROUP BY w),
           |dqx AS (
           |  SELECT w, unnest(range(1, 65)) AS pos,
           |    unnest(list_transform(range(1, 65), i ->
           |      CAST(floor(CAST(v[i] AS DOUBLE) * $scale + 0.5) AS BIGINT))) AS qv
           |  FROM dev),
           |dps AS (SELECT w, pos, CAST(sum(qv) AS BIGINT) AS s FROM dqx GROUP BY w, pos),
           |dws AS MATERIALIZED (
           |  SELECT dps.w, dwn.n, list(s ORDER BY pos) AS sums
           |  FROM dps JOIN dwn ON dwn.w = dps.w GROUP BY dps.w, dwn.n),
           |dpair AS (
           |  SELECT c.w, c.n, c.sums,
           |    coalesce(p.n, CAST(0 AS BIGINT)) AS n_prev,
           |    coalesce(p.sums, list_transform(range(1, 65), i -> CAST(0 AS BIGINT))) AS p
           |  FROM dws c LEFT JOIN dws p ON p.w + INTERVAL '15 minutes' = c.w),
           |dcos AS (
           |  SELECT w, n, n_prev, sums,
           |    (sqrt(${O.dot("sums", "sums", 64)}) * sqrt(${O.dot("p", "p", 64)})) AS den,
           |    ${O.dot("sums", "p", 64)} AS num
           |  FROM dpair)
           |SELECT w AS window_start, n, n_prev,
           |  array_to_string(sums, ',') AS sums_joined,
           |  CAST(floor((1.0 - CASE WHEN den = 0 THEN 0.0 ELSE num / den END)
           |    * 1000000.0 + 0.5) AS BIGINT) AS drift_q6
           |FROM dcos ORDER BY window_start""".stripMargin
      }),

    // Watermarked windowed FREQUENCY monitoring (count-min merge law):
    // 256 counter sums per window instead of per-item state, answering
    // point estimates for tracked keys. Batch run (watermark no-op) →
    // the oracle re-derives every window's counter array and the same
    // least-over-rows estimates in SQL.
    "stream_windowed_cms" -> QueryDef(
      (s, d) =>
        graft.streaming.WindowedAggs.windowedHeavyProbes(
            Tables.events(s, d), col("event_type"),
            probes = Seq("click", "view", "error"), "15 minutes",
            lateness = "10 minutes", salt = "cmsw")
          .orderBy(col("window_start")),
      Some {
        val S = graft.ops.Sketches
        val idxCols = (0 until S.CmsD)
          .map(d => s"${S.cmsIdxSql("x", d)} AS i$d").mkString(", ")
        val sums = (for (d <- 0 until S.CmsD; j <- 0 until S.CmsW)
          yield s"CAST(sum(CASE WHEN i$d = $j THEN 1 ELSE 0 END) AS BIGINT) AS c_${d}_$j")
          .mkString(",\n|    ")
        val ests = Seq("click", "view", "error").map { p =>
          val coords = S.cmsIdxLiteral(p, "cmsw")
          coords.zipWithIndex.map { case (j, d) => s"c_${d}_$j" }
            .mkString("least(", ", ", s") AS est_$p")
        }.mkString(",\n|  ")
        s"""WITH items AS (
           |  SELECT time_bucket(INTERVAL '15 minutes', ts) AS w, event_type AS it
           |  FROM events),
           |x AS (SELECT w, (${graft.functions.Hashing.h64Sql("it", "cmsw")} & 4294967295) AS x FROM items),
           |idx AS (SELECT w, $idxCols FROM x),
           |wide AS (SELECT w,
           |    $sums
           |  FROM idx GROUP BY w)
           |SELECT w AS window_start,
           |  $ests
           |FROM wide ORDER BY window_start""".stripMargin
      }),

    // Watermarked windowed QUANTILES (log-histogram sketch): per-window
    // value p50/p95/p99 intervals from (window, bucket) rows — the
    // bounded-state online form of a latency-percentile dashboard. The
    // batch run exercises the identical bucket agg + extraction; the
    // oracle re-derives buckets, cumulative crossings, and intervals.
    "stream_windowed_quantiles" -> QueryDef(
      (s, d) =>
        graft.ops.Sketches.quantilesFromBuckets(
            graft.streaming.WindowedAggs.windowedQuantileBuckets(
              Tables.events(s, d), col("value"), "15 minutes",
              lateness = "10 minutes"),
            "window_start", Seq(0.5, 0.95, 0.99))
          .orderBy(col("window_start")),
      Some {
        val S = graft.ops.Sketches
        val ests = Seq("50" -> "0.5", "95" -> "0.95", "99" -> "0.99").flatMap {
          case (nm, p) =>
            val k = s"CAST(ceil($p * CAST(n AS DOUBLE)) AS BIGINT)"
            Seq(s"arg_min(min_q, bucket) FILTER (WHERE cum >= $k) AS p${nm}_lo_q20",
              s"arg_min(max_q, bucket) FILTER (WHERE cum >= $k) AS p${nm}_hi_q20")
        }.mkString(",\n|    ")
        s"""WITH v0 AS (
           |  SELECT time_bucket(INTERVAL '15 minutes', ts) AS w,
           |    CAST(floor(CAST(value AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT) AS q
           |  FROM events WHERE value IS NOT NULL),
           |v1 AS (SELECT w, q, ${S.qBitlenSqlOverQ} AS L FROM v0),
           |v2 AS (SELECT w, q, ${S.qBucketSqlOverQL} AS bucket FROM v1),
           |b AS (SELECT w, bucket, CAST(count(*) AS BIGINT) AS cnt,
           |    min(q) AS min_q, max(q) AS max_q
           |  FROM v2 GROUP BY w, bucket),
           |c AS (SELECT w, bucket, cnt, min_q, max_q,
           |    sum(cnt) OVER (PARTITION BY w ORDER BY bucket) AS cum,
           |    sum(cnt) OVER (PARTITION BY w) AS n
           |  FROM b)
           |SELECT w AS window_start, CAST(max(n) AS BIGINT) AS n,
           |  string_agg(bucket || ':' || cnt, ',' ORDER BY bucket) AS buckets_joined,
           |    $ests
           |FROM c GROUP BY w ORDER BY window_start""".stripMargin
      }),

    // Sliding event-time windows: each event lands in windowLen/slide
    // overlapping windows (Spark aligns starts to epoch multiples of the
    // slide; the oracle expands k ∈ {0,1,2} buckets per event).
    "q16_sliding_window" -> QueryDef(
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "15 minutes", "5 minutes").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
          .select(col("w.start").as("window_start"), col("event_type"),
            col("n"), col("total_value"))
          .orderBy(col("window_start"), col("event_type")),
      Some("""WITH expanded AS (
             |  SELECT time_bucket(INTERVAL '5 minutes', ts) - k * INTERVAL '5 minutes' AS window_start,
             |    event_type, value
             |  FROM events, unnest([0, 1, 2]) AS t(k)
             |)
             |SELECT window_start, event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM expanded GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    "q14_sessionize" -> QueryDef(
      (s, d) => {
        val gapUs = 30L * 60 * 1000000 // 30-minute inactivity gap
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val flagged = Tables.events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("is_new",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
          .withColumn("sid", sum(col("is_new")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        flagged.groupBy(col("user_id"), col("sid"))
          .agg(min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
          .select(col("user_id"), col("session_start"), col("session_end"),
            col("n_events"), col("total_value"))
          .orderBy(col("user_id"), col("session_start"))
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |      THEN 1 ELSE 0 END AS is_new
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), sessions AS (
             |  SELECT user_id, ts, value,
             |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM flagged
             |)
             |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             |  count(*) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM sessions GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // Stream-stream interval join in its batch-verifiable form: each click
    // attributed to the views of the same user in the preceding 30 minutes.
    "q20_interval_join" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("value"))
        graft.streaming.WindowedAggs.intervalJoin(
            clicks, views, "user_id", "ts", "ts", "30 minutes", "10 minutes")
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_views"),
            sum(col("right_value").cast("decimal(18,2)")).cast("double").as("view_value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT c.event_id, count(*) AS n_views,
             |  CAST(sum(CAST(v.value AS DECIMAL(18,2))) AS DOUBLE) AS view_value
             |FROM events c JOIN events v
             |  ON c.event_type = 'click' AND v.event_type = 'view'
             |  AND c.user_id = v.user_id
             |  AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL '30 minutes'
             |GROUP BY c.event_id ORDER BY c.event_id""".stripMargin)),

    "q15_asof_join" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val errors = ev.filter(col("event_type") === "error")
          .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("err_value"))
        graft.ops.AsofJoin.asof(clicks, errors, "user_id", "ts", "ts", "err_value")
          .orderBy(col("event_id"))
      },
      Some("""WITH clicks AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
             |), errors AS (
             |  SELECT user_id, ts, max(value) AS err_value FROM events
             |  WHERE event_type = 'error' GROUP BY user_id, ts
             |)
             |SELECT c.event_id, c.user_id, c.ts, e.err_value AS asof_err_value
             |FROM clicks c ASOF LEFT JOIN errors e
             |  ON c.user_id = e.user_id AND c.ts >= e.ts
             |ORDER BY event_id""".stripMargin)),

    // The other two merge_asof directions over the same frames: FORWARD
    // (earliest error at or after the click) and NEAREST (closer of the
    // two, equal distances backward — the documented tie rule). The
    // oracle takes both candidates per click via LATERAL probes and
    // replays the µs-distance compare; DuckDB's ASOF syntax only covers
    // backward, so this is also the one asof gate whose oracle is a
    // from-first-principles replay rather than the builtin.
    "q26_asof_directions" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val errors = ev.filter(col("event_type") === "error")
          .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("err_value"))
        val fwd = graft.ops.AsofJoin.asof(clicks, errors, "user_id", "ts", "ts",
            "err_value", direction = "forward")
          .select(col("event_id"), col("asof_err_value").as("fwd_err"))
        val near = graft.ops.AsofJoin.asof(clicks, errors, "user_id", "ts", "ts",
            "err_value", direction = "nearest")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_err_value").as("near_err"))
        near.join(fwd, Seq("event_id")).orderBy(col("event_id"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("near_err"), col("fwd_err"))
      },
      Some("""WITH clicks AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
             |), errors AS (
             |  SELECT user_id, ts, max(value) AS err_value FROM events
             |  WHERE event_type = 'error' GROUP BY user_id, ts
             |), cand AS (
             |  SELECT c.event_id, c.user_id, c.ts,
             |    b.ts AS bt, b.err_value AS bv, f.ts AS ft, f.err_value AS fv
             |  FROM clicks c
             |  LEFT JOIN LATERAL (
             |    SELECT ts, err_value FROM errors e
             |    WHERE e.user_id = c.user_id AND e.ts <= c.ts
             |    ORDER BY e.ts DESC LIMIT 1) b ON TRUE
             |  LEFT JOIN LATERAL (
             |    SELECT ts, err_value FROM errors e
             |    WHERE e.user_id = c.user_id AND e.ts >= c.ts
             |    ORDER BY e.ts ASC LIMIT 1) f ON TRUE
             |)
             |SELECT event_id, user_id, ts,
             |  CASE WHEN bt IS NULL THEN fv
             |       WHEN ft IS NULL THEN bv
             |       WHEN epoch_us(ts) - epoch_us(bt) <= epoch_us(ft) - epoch_us(ts)
             |         THEN bv ELSE fv END AS near_err,
             |  fv AS fwd_err
             |FROM cand ORDER BY event_id""".stripMargin))
  )
}
