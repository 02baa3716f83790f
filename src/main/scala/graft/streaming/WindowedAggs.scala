package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over an events stream
  * (event_id, ts timestamp, user_id, event_type, value) — the Structured
  * Streaming surface a training-data pipeline needs beyond pure ingestion:
  * watermarked windowed aggregation and custom session state.
  *
  * Scale notes: both operators shuffle once on their grouping key and keep
  * state in the state store (RocksDB at production scale); the watermark
  * bounds state size — without it, window state grows monotonically.
  */
object WindowedAggs {

  /** Tumbling event-time window counts with a watermark: late events
    * beyond `lateness` are dropped deterministically; state for closed
    * windows is evicted. Works identically on a batch frame (watermark is
    * a no-op there), which is how the driver gate verifies it. */
  def windowedCounts(events: DataFrame, windowLen: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      // decimal-routed sum: partition-order-independent, so batch runs are
      // bit-reproducible and oracle-comparable (sum(double) is not)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Watermarked windowed DISTINCT count via the HLL register merge law
    * ([[graft.ops.Sketches]]): exact `count(DISTINCT …)` over a stream
    * needs one state row per distinct item per open window — unbounded in
    * the item domain; this keeps exactly 64 register maxima per open
    * window instead, because registers merge by element-wise max (the
    * sketch contract), which is precisely a 64-column `max` aggregation.
    *
    * ONE stateful operator: groupBy(window).agg(max(r | reg = j) for j in
    * 0..63) — state is 64 ints per open window regardless of stream
    * volume, the watermark evicts closed windows, and replay of the same
    * micro-batches is bit-identical (max is order-free; every ingredient
    * is md5-derived). Emits (window_start, registers_joined, est_q3) with
    * the identical estimate math as the batch sketch, so on a batch frame
    * (watermark no-op) the DuckDB oracle re-derives the full sketch —
    * which is how the `stream_windowed_distinct` gate verifies it. */
  def windowedDistinct(events: DataFrame, item: org.apache.spark.sql.Column,
                       windowLen: String, lateness: String,
                       salt: String): DataFrame = {
    import graft.ops.Sketches
    val (reg, r) = Sketches.regRank(item, salt)
    val perItem = events
      .withWatermark("ts", lateness)
      .select(col("ts"), reg.as("reg"), r.as("r"))
    val regAggs = (0 until Sketches.HllM).map(j =>
      coalesce(max(when(col("reg") === j, col("r"))), lit(0)).as(s"r_$j"))
    perItem
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(regAggs.head, regAggs.tail: _*)
      .select(col("w.start").as("window_start"),
        Sketches.registersJoinedExpr.as("registers_joined"),
        Sketches.estQ3Expr.as("est_q3"))
  }

  /** Watermarked windowed SET sketching via the KMV/theta merge-and-
    * truncate law ([[graft.functions.KMinHashAgg]]): keeps the k smallest
    * distinct md5 hashes per open window — bounded k-longs state per
    * window regardless of stream volume, watermark-evicted — where exact
    * per-window sets need one state row per distinct item. Unlike the
    * HLL register twin ([[windowedDistinct]]), the surviving hashes
    * support INTERSECTION/DIFFERENCE estimates downstream, which is what
    * set-OVERLAP monitoring (user churn between windows, cross-feed
    * containment) actually needs.
    *
    * ONE stateful operator: groupBy(window).agg(kminhash) — the map-side
    * partial consumes raw rows in the scan stage and both the exchange
    * and the state store carry ≤ k longs per window; merge-and-truncate
    * is order-free and every hash md5-derived, so replay of the same
    * micro-batches is bit-identical. Emits the raw sketch per closed
    * window; estimates/overlap extract downstream ([[thetaWindowOverlap]]),
    * which on a batch frame (watermark no-op) is how the
    * `stream_windowed_theta` gate verifies full sketch parity in DuckDB.
    *
    * @return (window_start, hs array&lt;long&gt; ascending, |hs| ≤ k) */
  def windowedTheta(events: DataFrame, item: org.apache.spark.sql.Column,
                    windowLen: String, lateness: String,
                    salt: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    events
      .withWatermark("ts", lateness)
      .select(col("ts"), graft.functions.Hashing.h64(item, salt).as("h"))
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(graft.functions.KMinHash.of(col("h"), k).as("hs"))
      .select(col("w.start").as("window_start"), col("hs"))
  }

  /** Consecutive-window set-overlap extraction over [[windowedTheta]]'s
    * closed-window sketches — the monitoring readout: per window, the
    * distinct-count estimate plus intersection/Jaccard against the
    * PREVIOUS window (user churn). The predecessor attaches via an
    * EQUI-join on `window_start − windowLen` (never a global lag window,
    * which would single-partition the frame); a missing predecessor (first
    * window, or an empty-window gap) is an EMPTY sketch — overlap fields
    * read 0, never null, so the readout is total and both engines agree
    * without null-propagation fine print. All estimate arithmetic is the
    * [[graft.ops.Sketches.kmvPairwise]] union-law math verbatim — four
    * double ops then q3/q6 floors — so the DuckDB oracle replays it
    * bit-for-bit, and a sketch shorter than k degrades to the EXACT
    * count. Runs downstream of the stateful op (a batch job over the
    * sink table, or the gate's batch frame).
    *
    * '''windowLen contract''': `windowLen` MUST be the same duration the
    * sketches were built with ([[windowedTheta]]'s `windowLen`) — the
    * predecessor equi-join probes at `window_start − windowLen`, so a
    * mismatched value finds no predecessor anywhere and every overlap
    * field silently reads 0 (the readout is total by design, so nothing
    * nulls or throws). Thread ONE constant through both calls; the
    * mismatch behavior is pinned by StreamingWindowSpec.
    *
    * @param sketches (window_start, hs) — [[windowedTheta]]'s shape
    * @return (window_start, n_sk, est_q3, est_prev_q3, est_isect_prev_q3,
    *         jaccard_prev_q6) */
  def thetaWindowOverlap(sketches: DataFrame, windowLen: String,
                         k: Int): DataFrame = {
    // every estimate expression comes from Sketches' shared KMV builders
    // — the batch kmvPairwise and this readout can never drift apart
    import graft.ops.Sketches._
    val prev = sketches.select(
      (col("window_start") + expr(s"INTERVAL $windowLen")).as("window_start"),
      col("hs").as("hp"))
    sketches.join(prev, Seq("window_start"), "left")
      .withColumn("hp", coalesce(col("hp"), array().cast("array<long>")))
      .withColumn("su", kmvUnionSketch(col("hp"), col("hs"), k))
      .withColumn("nc", size(col("hs")))
      .withColumn("np", size(col("hp")))
      .withColumn("nu", size(col("su")))
      .withColumn("com", kmvCommon(col("su"), col("hp"), col("hs")))
      .withColumn("ec", kmvEstOf(col("hs"), col("nc"), k))
      .withColumn("ep", kmvEstOf(col("hp"), col("np"), k))
      .withColumn("eu", kmvEstOf(col("su"), col("nu"), k))
      .withColumn("ei", kmvIsectEst(col("com"), col("nu"), col("eu"), k))
      .select(col("window_start"), col("nc").cast("long").as("n_sk"),
        // the full sketch rides along (≤ k longs, comma-joined): it is
        // what any FURTHER set algebra needs, and it lets the gate pin
        // complete sketch parity, not just the scalar estimates
        concat_ws(",", transform(col("hs"), h => h.cast("string")))
          .as("hashes_joined"),
        kmvQ3(col("ec")).as("est_q3"), kmvQ3(col("ep")).as("est_prev_q3"),
        kmvQ3(col("ei")).as("est_isect_prev_q3"),
        kmvJaccardQ6(col("com"), col("nu")).as("jaccard_prev_q6"))
  }

  /** Watermarked windowed EMBEDDING-CENTROID sums — the drift-monitoring
    * primitive for an embedding feed (semantic shift of a corpus stream
    * window over window: topic drift, upstream encoder changes, feed
    * corruption — the vector twin of [[windowedTheta]]'s membership
    * churn). Per window: row count + per-dimension EXACT-INTEGER sums of
    * the 2²⁰-quantized elements (the [[graft.ops.Similarity]] groupMean
    * scale) — integer sums are order-free, so replay is bit-identical
    * and the downstream cosine is computed from identical longs in both
    * engines.
    *
    * ONE stateful operator: groupBy(window) over `dims` sum columns —
    * state = dims + 1 longs per open window (one row), watermark-evicted;
    * the quantization runs in the scan stage. Drift extraction
    * ([[vecDriftOverlap]]) runs downstream over closed windows, exactly
    * the windowedTheta/thetaWindowOverlap split.
    *
    * @return (window_start, n, sums array&lt;long&gt; of length dims) */
  def windowedVecSums(events: DataFrame, vec: org.apache.spark.sql.Column,
                      dims: Int, windowLen: String,
                      lateness: String): DataFrame = {
    require(dims >= 1 && dims <= 4096, s"bad dims: $dims")
    def q(x: org.apache.spark.sql.Column) =
      floor(x.cast("double") * lit((1L << 20).toDouble) + lit(0.5e0)).cast("long")
    val perItem = events.withWatermark("ts", lateness)
      .select(col("ts") +:
        (0 until dims).map(i => q(element_at(vec, i + 1)).as(s"e$i")): _*)
    val aggs = count(lit(1)).as("n") +:
      (0 until dims).map(i => sum(col(s"e$i")).as(s"s$i"))
    perItem.groupBy(window(col("ts"), windowLen).as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("w.start").as("window_start"), col("n"),
        array((0 until dims).map(i => col(s"s$i")): _*).as("sums"))
  }

  /** Consecutive-window centroid-drift readout over [[windowedVecSums]]'
    * closed windows: cosine between a window's sum vector and its
    * predecessor's (means and sums have the SAME cosine — the 1/n and
    * quantization scales cancel), emitted as `drift_q6 = ⌊(1 − cos)·10⁶
    * + ½⌋` micro-units. The predecessor attaches via the equi-join on
    * `window_start − windowLen` (same windowLen contract as
    * [[thetaWindowOverlap]] — thread ONE constant); a missing
    * predecessor is the ZERO vector (`n_prev` = 0 marks it): the
    * zero-norm guard reads cos 0, so the first window carries maximal
    * drift rather than a null. The full sum vector rides along
    * comma-joined for downstream set algebra and full gate parity.
    *
    * @param winSums (window_start, n, sums) — [[windowedVecSums]]' shape
    * @return (window_start, n, n_prev, sums_joined, drift_q6) */
  def vecDriftOverlap(winSums: DataFrame, windowLen: String,
                      dims: Int): DataFrame = {
    val prev = winSums.select(
      (col("window_start") + expr(s"INTERVAL $windowLen")).as("window_start"),
      col("n").as("n_prev"), col("sums").as("p"))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0e0), (acc, e) => acc + e)
    winSums.join(prev, Seq("window_start"), "left")
      .withColumn("n_prev", coalesce(col("n_prev"), lit(0L)))
      .withColumn("p", coalesce(col("p"),
        array_repeat(lit(0L), dims)))
      .withColumn("__den",
        sqrt(dot(col("sums"), col("sums"))) * sqrt(dot(col("p"), col("p"))))
      .withColumn("__cos",
        when(col("__den") === 0.0e0, lit(0.0e0))
          .otherwise(dot(col("sums"), col("p")) / col("__den")))
      .select(col("window_start"), col("n"), col("n_prev"),
        concat_ws(",", transform(col("sums"), s => s.cast("string")))
          .as("sums_joined"),
        floor((lit(1.0e0) - col("__cos")) * lit(1.0e6) + lit(0.5e0))
          .cast("long").as("drift_q6"))
  }

  /** [[windowedTheta]] and [[thetaWindowOverlap]] wired through ONE
    * `windowLen` — the safe entry point for the common shape (sketch a
    * stream's windows, read churn downstream on the same batch frame, or
    * on a batch replay of the sink table). Exists because the two-call
    * form's windowLen coupling fails SILENTLY when mismatched (every
    * overlap reads 0 — see [[thetaWindowOverlap]]'s contract note); here
    * the constant cannot diverge. Streaming callers that persist the
    * sketches and read overlap later should still thread one shared
    * constant through both calls. */
  def windowedThetaOverlap(events: DataFrame,
                           item: org.apache.spark.sql.Column,
                           windowLen: String, lateness: String,
                           salt: String, k: Int): DataFrame =
    thetaWindowOverlap(
      windowedTheta(events, item, windowLen, lateness, salt, k),
      windowLen, k)

  /** Watermarked windowed FREQUENCY monitoring via the count-min merge
    * law ([[graft.ops.Sketches]]): per-item exact counts over a stream
    * hold one state row per distinct item per open window — unbounded;
    * this keeps exactly D·W counter sums per open window (counters ADD,
    * so the sketch is a plain sum aggregation) and answers point
    * estimates for a FIXED probe set — "how often did these tracked
    * keys occur per window", the bounded-state online form of a
    * frequency dashboard. Estimates never underestimate; collisions can
    * only inflate them (CMS contract).
    *
    * ONE stateful operator, state = 256 longs per open window,
    * watermark-evicted, replay-deterministic (integer sums + md5-derived
    * indexes). Batch frames run identically (watermark no-op), which is
    * how the `stream_windowed_cms` gate re-derives the full counter
    * array per window in SQL. */
  def windowedHeavyProbes(events: DataFrame, item: org.apache.spark.sql.Column,
                          probes: Seq[String], windowLen: String,
                          lateness: String, salt: String): DataFrame = {
    import graft.ops.Sketches
    val idx = Sketches.cmsIdx(item, salt)
    val perItem = events
      .withWatermark("ts", lateness)
      .select(col("ts") +: idx.zipWithIndex.map { case (c, d) => c.as(s"i$d") }: _*)
    val aggs = for (d <- 0 until Sketches.CmsD; j <- 0 until Sketches.CmsW)
      yield sum(when(col(s"i$d") === j, 1L).otherwise(0L)).as(s"c_${d}_$j")
    val wide = perItem
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(aggs.head, aggs.tail: _*)
    val estCols = probes.map { p =>
      val coords = Sketches.cmsIdxLiteral(p, salt)
      least(coords.zipWithIndex.map { case (j, d) => col(s"c_${d}_$j") }: _*)
        .as(s"est_$p")
    }
    wide.select(col("w.start").as("window_start") +: estCols: _*)
  }

  /** Watermarked windowed QUANTILE sketching via the log-histogram merge
    * law ([[graft.ops.Sketches]]): exact windowed percentiles need every
    * value in state; this keeps one (count, min_q, max_q) row per
    * OCCUPIED bucket per open window — bounded by the bucket family
    * (≤ ~2000 ids, in practice dozens), not the stream. Counts add and
    * min/max merge, so the sketch is one plain aggregation keyed by
    * (window, bucket); the watermark evicts closed windows and replay is
    * bit-identical (integer buckets, order-free merges).
    *
    * Emits the per-window BUCKET ROWS on window close; quantile
    * extraction ([[graft.ops.Sketches.quantilesFromBuckets]] — p50/p95/
    * p99 intervals with ≤ 1/16 relative width) runs downstream over
    * closed windows, which is how the `stream_windowed_quantiles` gate
    * verifies the whole path on a batch frame. */
  def windowedQuantileBuckets(events: DataFrame,
                              value: org.apache.spark.sql.Column,
                              windowLen: String, lateness: String): DataFrame = {
    import graft.ops.Sketches
    events.withWatermark("ts", lateness)
      .select(col("ts"), Sketches.qVal(value).as("q"))
      .filter(col("q").isNotNull)
      .select(col("ts"), col("q"), Sketches.qBucketOfQ(col("q")).as("bucket"))
      .groupBy(window(col("ts"), windowLen).as("w"), col("bucket"))
      .agg(count(lit(1)).as("cnt"), min(col("q")).as("min_q"), max(col("q")).as("max_q"))
      .select(col("w.start").as("window_start"), col("bucket"),
        col("cnt"), col("min_q"), col("max_q"))
  }

  /** Stream-stream event-time interval join (attribution shape): each left
    * row matches right rows with the same key whose timestamp falls in
    * [leftTs − window, leftTs]. Both sides carry watermarks and the join
    * condition bounds event time on both, so Spark evicts join state once
    * the watermark passes the interval — state stays proportional to the
    * window, not the stream. Right columns are exposed with `right_`
    * prefixes; left rows without a match are kept when `joinType` is
    * "leftOuter" (emitted on state eviction).
    *
    * Works identically on batch frames (watermarks are no-ops there),
    * which is how the oracle gate verifies the semantics. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String, window: String,
                   lateness: String, joinType: String = "inner"): DataFrame = {
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"right_$c"))
    left.withWatermark(leftTs, lateness)
      .join(r.withWatermark(s"right_$rightTs", lateness),
        expr(s"""$keyCol = right_$keyCol AND
                |right_$rightTs <= $leftTs AND
                |right_$rightTs >= $leftTs - INTERVAL $window""".stripMargin),
        joinType)
  }

  /** Streaming exact deduplication with BOUNDED state: keeps one row per
    * key, dropping replays that arrive within the watermark delay; key
    * state older than the watermark is evicted (plain dropDuplicates
    * would hold every key forever — unusable at 100 TB). The contract a
    * training-data ingest needs for at-least-once upstreams: duplicates
    * land within the delay window or not at all. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           tsCol: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, lastTs: Long, events: Int, total: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

  final case class BudgetDoc(source: String, doc_id: Long,
                             ts: java.sql.Timestamp, n_tokens: Long)

  /** Streaming per-domain token budget via flatMapGroupsWithState — the
    * streaming counterpart of [[graft.ops.Sampling.domainBudget]]: admit
    * a source's documents until its cumulative token count would exceed
    * `budget`, then drop that source's docs forever (state = one Long per
    * source, never evicted — bounded by the domain cardinality contract).
    * "Stop ingesting a source once its quota is spent" — the cap a
    * crawler feed needs online, where the batch op's global totals don't
    * exist yet.
    *
    * Determinism contract (unlike the batch op's coin-based sample):
    * admission is FIRST-COME by stream order — cross-batch arrival order
    * is the stream's order; WITHIN a batch, docs are admitted in
    * (ts, doc_id) order, so a replay of the same micro-batches yields
    * the same admissions. A doc larger than the remaining budget is
    * dropped without consuming it (the next smaller doc may still fit —
    * greedy-by-order, the standard quota semantics). */
  def streamingDomainBudget(docs: Dataset[BudgetDoc], budget: Long): Dataset[BudgetDoc] = {
    require(budget >= 0, s"negative budget: $budget")
    implicit val docEnc = Encoders.product[BudgetDoc]
    implicit val stateEnc = Encoders.scalaLong
    implicit val keyEnc = Encoders.STRING

    def fn(source: String, it: Iterator[BudgetDoc],
           state: GroupState[Long]): Iterator[BudgetDoc] = {
      var consumed = state.getOption.getOrElse(0L)
      val admitted = it.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).filter { d =>
        val fits = consumed + d.n_tokens <= budget
        if (fits) consumed += d.n_tokens
        fits
      }
      state.update(consumed)
      admitted.iterator
    }

    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }

  final case class SampleDoc(source: String, doc_id: Long, text: String)
  final case class SampledDoc(source: String, rank: Int, doc_id: Long, text: String)

  /** Streaming k-per-group uniform sample — the reservoir-sampling slot,
    * but DETERMINISTIC: state holds the k rows with the smallest
    * (md5 coin, doc_id) per source, the exact ranking
    * [[graft.ops.Sampling.uniformK]] uses, so after ANY prefix of the
    * stream the current sample equals the batch op over the rows seen so
    * far — independent of micro-batch boundaries and replay-stable, where
    * a textbook reservoir's contents depend on arrival order and RNG
    * state. A group's refreshed sample (rank-stamped, ≤ k rows) is
    * emitted only in batches that CHANGE it; sinks upsert on
    * (source, rank) under OutputMode.Update.
    *
    * Scale: one shuffle on source; state is ≤ k rows per source — bounded
    * by design, no watermark needed. Run on a batch frame (state empty,
    * one group call) it degenerates to exactly `uniformK`, which is how
    * the driver gate verifies it against the batch oracle.
    */
  def streamingUniformK(docs: Dataset[SampleDoc], k: Int,
                        salt: String): Dataset[SampledDoc] = {
    require(k >= 1, s"k must be >= 1, got $k")
    implicit val docEnc = Encoders.product[SampleDoc]
    implicit val outEnc = Encoders.product[SampledDoc]
    implicit val stateEnc = Encoders.product[SampleReservoir]
    implicit val keyEnc = Encoders.STRING

    // JVM twin of Sampling.coin(col, salt): low 32 bits of the 60-bit md5
    // hash of "salt:key" — bit-identical to the batch op's plan-side coin.
    def coinOf(id: Long): Long =
      graft.functions.Hashing.planTimeH64(s"$salt:$id") & 0xFFFFFFFFL

    def fn(source: String, it: Iterator[SampleDoc],
           state: GroupState[SampleReservoir]): Iterator[SampledDoc] = {
      val cur = state.getOption.map(_.docs).getOrElse(Seq.empty)
      val next = (cur ++ it).sortBy(d => (coinOf(d.doc_id), d.doc_id)).take(k)
      if (next == cur) Iterator.empty
      else {
        state.update(SampleReservoir(next))
        next.iterator.zipWithIndex.map { case (d, i) =>
          SampledDoc(source, i + 1, d.doc_id, d.text)
        }
      }
    }

    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
  }

  final case class SampleReservoir(docs: Seq[SampleDoc])

  /** Gap-based sessionization via flatMapGroupsWithState (the reference
    * has no stateful ops — this is the Spark-native custom-state surface):
    * a session closes when no event arrives within `gapMs` of the last
    * one; the event-time timeout fires on watermark advance, so state
    * never outlives the gap. */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 lateness: String = "10 minutes"): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong

    def fn(userId: Long, it: Iterator[SessionEvent],
           state: GroupState[SessionState]): Iterator[Session] = {
      def toSession(s: SessionState) = Session(userId,
        new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.lastTs),
        s.events, s.total)
      if (state.hasTimedOut) {
        val out = state.getOption.map(toSession).iterator
        state.remove()
        out
      } else {
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[Session]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastTs <= gapMs =>
              // a late-but-admitted event can PREDATE the session start —
              // extend the start too or the emitted duration understates
              cur = Some(s.copy(start = math.min(s.start, t),
                lastTs = math.max(s.lastTs, t),
                events = s.events + 1, total = s.total + e.value))
            case Some(s) =>
              closed ::= toSession(s)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // EventTimeTimeout requires a timeout strictly after the current
          // watermark; a group whose lastTs + gap already trails the
          // watermark (late-but-admitted events) would otherwise crash the
          // query with IllegalArgumentException. Clamping to watermark + 1
          // closes such sessions on the next watermark advance.
          state.setTimeoutTimestamp(
            math.max(s.lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
