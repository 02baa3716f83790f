package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deterministic sampling / splitting / packing operators for
  * training-data pipelines.
  *
  * Every decision is a pure function of md5-derived hash bits
  * ([[graft.functions.Hashing]]), never of Spark's RNG or row order, so:
  *  - results are reproducible across retries, speculative tasks, AQE
  *    re-plans, and cluster sizes (a `df.sample` draw is none of these);
  *  - the DuckDB oracle recomputes every keep/assign decision exactly;
  *  - re-running a grown corpus keeps prior decisions stable (a doc's
  *    split never flips because new docs arrived).
  *
  * Scale: keep/assign decisions are codegen'd per-row predicates inside
  * the scan stage — zero shuffle. The two operators that need more
  * ([[domainBudget]]: one tiny per-domain aggregate broadcast back;
  * [[packChunks]]: one window per shard) document their shuffle shape.
  */
object Sampling {

  private val U32 = 4294967296.0 // 2^32

  /** Plan-time keep threshold: floor(fraction · 2^32), clamped to [0, 2^32].
    * h32 is uniform on [0, 2^32), so P[h32 < threshold32(f)] = f exactly
    * (to 1/2^32 resolution). */
  def threshold32(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    (fraction * U32).toLong
  }

  /** Deterministic per-key uniform in [0, 2^32): the sampling coin. Keys
    * are stringified so Spark's long→string and DuckDB's int→varchar
    * renderings agree. */
  def coin(key: Column, salt: String): Column =
    Hashing.h32(key.cast("string"), salt)

  /** Bernoulli(fraction) sample, deterministic per key. */
  def bernoulli(df: DataFrame, keyCol: String, fraction: Double,
                salt: String): DataFrame =
    df.filter(coin(col(keyCol), salt) < lit(threshold32(fraction)))

  /** Stratified Bernoulli sample: per-stratum fraction, else default.
    * Thresholds fold to plan-time literals — one codegen'd CASE, no join. */
  def stratified(df: DataFrame, strataCol: String, keyCol: String,
                 fractions: Map[String, Double], defaultFraction: Double,
                 salt: String): DataFrame = {
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(threshold32(defaultFraction))) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit(threshold32(f))).otherwise(acc)
    }
    df.filter(coin(col(keyCol), salt) < thr)
  }

  /** Disjoint, exhaustive train/val/… split by cumulative hash ranges:
    * every row gets exactly one label; fractions must sum to 1. A row's
    * label depends only on (key, salt) — growing the corpus never moves
    * existing rows between splits. */
  def assignSplit(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)], salt: String,
                  outCol: String = "split"): DataFrame =
    df.withColumn(outCol, splitLabel(col(keyCol), splits, salt))

  /** The split CASE over an arbitrary key expression: coin < t1 → s1,
    * WHEN coin < t2 → s2, …, ELSE last. Shared by [[assignSplit]] and
    * [[leakageSafeSplit]] so the two can never disagree on a boundary. */
  private def splitLabel(key: Column, splits: Seq[(String, Double)],
                         salt: String): Column = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    splits.init.zip(cum.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), c), acc) =>
      when(coin(key, salt) < lit(threshold32(c)), lit(name)).otherwise(acc)
    }
  }

  /** LEAKAGE-SAFE split: the coin is flipped on the row's CLUSTER
    * REPRESENTATIVE, not the row — every member of a near-dup cluster
    * (e.g. a connected component from `Dedup.duplicateClusters`) lands
    * in the SAME split, so a test document's near-duplicates can never
    * sit in train (the split-level twin of benchmark decontamination;
    * random per-row splits leak precisely because near-dups are i.i.d.
    * assigned). Rows absent from `clusters` are singleton clusters —
    * their own key is the representative, so on a dup-free corpus this
    * degenerates to [[assignSplit]] exactly. Deterministic in
    * (clusters, salt); stable across appends EXCEPT when a new document
    * MERGES two existing clusters — the merged cluster re-coins on its
    * new representative, which can move members across splits. That is
    * the correct behavior, not a defect: the new evidence says those
    * docs are near-dups of each other, so leakage-safety REQUIRES
    * co-locating them even at the cost of moving one.
    *
    * Scale: one shuffle join of the corpus against the (id, cluster_id)
    * frame — both sides key-partitioned, no broadcast assumption (the
    * cluster frame is corpus-sized); the CASE itself is scan-stage.
    *
    * @param clusters (id, cluster_id) — same type as `df(keyCol)` */
  def leakageSafeSplit(df: DataFrame, keyCol: String, clusters: DataFrame,
                       splits: Seq[(String, Double)], salt: String,
                       outCol: String = "split"): DataFrame = {
    Seq("cluster_id", outCol).foreach(c => require(!df.columns.contains(c),
      s"leakageSafeSplit reserves column name '$c' but the input already has it"))
    val reps = clusters.select(col("id").as(keyCol), col("cluster_id"))
    df.join(reps, Seq(keyCol), "left")
      .withColumn(outCol,
        splitLabel(coalesce(col("cluster_id"), col(keyCol)), splits, salt))
      .drop("cluster_id")
  }

  /** Exactly min(k, |group|) rows per group — uniform without replacement
    * (rank by hash; ties broken by key, which is unique per row in any
    * sane pipeline). One shuffle on the group column; partial top-k
    * (TakeOrdered-style rank pruning) happens map-side via the window's
    * rank filter at k ≪ group size. */
  def uniformK(df: DataFrame, groupCol: String, keyCol: String, k: Int,
               salt: String): DataFrame = {
    require(!df.columns.contains("__rn"),
      "uniformK reserves column name '__rn' but the input already has it")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(coin(col(keyCol), salt), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** WEIGHTED k-per-group sampling without replacement — Efraimidis &
    * Spirakis priority sampling ("Weighted random sampling with a
    * reservoir", IPL 2006): each row draws priority u^(1/w) from its md5
    * coin and the k highest priorities per group win, giving inclusion
    * probabilities proportional to weight without ever materializing a
    * reservoir. Ranking uses the order-equivalent ln(u)/w (maximize;
    * ln is monotone, w > 0) — with ln evaluated by
    * [[graft.functions.PortableMath]]: an explicit power-of-two split +
    * atanh series built from ONLY correctly-rounded IEEE ops, the same
    * generated fragments running in Spark and in the DuckDB oracle. The
    * earlier `log(u)` form leaned on JVM Math.log ≡ DuckDB ln to the
    * last bit, which neither library promises (both are faithfully- but
    * not correctly-rounded) — a 1-ulp tie could flip the hash gate
    * intermittently; the shared-fragment series closes that for good
    * (round-9 advice #4).
    *
    * Plan shape: identical to [[uniformK]] — one window per group, the
    * rank filter gets WindowGroupLimit pushdown (per-partition top-k
    * before the shuffle); the series stages are scan-stage projections.
    * Rows with weight ≤ 0 or null are dropped outright.
    *
    * Contract: `keyCol` unique (the tie-break). */
  def weightedUniformK(df: DataFrame, groupCol: String, keyCol: String,
                       weightCol: Column, k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val reserved = Seq("__x", "__pri", "__rn")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"weightedUniformK reserves column name '$c' but the input already has it"))
    val wPos = weightCol.cast("double")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__pri").desc, col(keyCol))
    df
      // x ∈ [1, 2^32]: coin + 1 — never 0, so ln is finite. The kernel
      // form (PortableLn, not the SQL macro chain) keeps the fused
      // scan+sort stage under Janino's method limit — the expanded
      // cascade dropped the whole stage to interpreted eval.
      .withColumn("__x", coin(col(keyCol), salt) + lit(1L))
      .withColumn("__pri", when(wPos.isNotNull && wPos > 0.0,
        graft.functions.PortableLn.coin(col("__x")) / wPos))
      .filter(col("__pri").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop(reserved: _*)
  }

  /** Per-domain expected-budget downsampling: each domain is kept with
    * probability f_d = min(1, budget / Σ_d weight), so the EXPECTED kept
    * weight per domain is min(budget, total) — the standard way to flatten
    * a domain mix to a target token budget. Bernoulli, so the realized sum
    * concentrates around (not exactly at) the budget.
    *
    * Plan shape: one tiny (domain, total) aggregate — rows = |domains| —
    * broadcast-joined back onto the scan; the keep decision stays a
    * per-row predicate. Both engines evaluate f_d · 2^32 in IEEE doubles
    * from identical integer inputs, so the oracle reproduces every
    * decision. */
  def domainBudget(df: DataFrame, domainCol: String, keyCol: String,
                   weightCol: Column, budget: Long, salt: String): DataFrame = {
    val totals = df.groupBy(col(domainCol))
      .agg(sum(weightCol).as("__total"))
    df.join(broadcast(totals), Seq(domainCol))
      .filter(coin(col(keyCol), salt).cast("double") <
        least(lit(1.0), lit(budget.toDouble) / col("__total").cast("double")) * lit(U32))
      .drop("__total")
  }

  /** TEMPERATURE-scaled domain resampling — the multilingual /
    * multi-domain mixing scheme of mBERT/XLM-R (sampling mass per domain
    * ∝ (token mass)^α): flattens the natural size distribution so small
    * domains aren't drowned, WITHOUT the hand-set per-domain weights of
    * [[mixtureResample]]. Per-domain keep rate
    *
    *   r_d = min(1, budget·w_d / (Σw · T_d)),   w_d = T_d^α
    *
    * — expected kept tokens ∝ w_d until a domain saturates at keeping
    * everything (the single-shot form: budget freed by saturated domains
    * is not re-spread; re-run with a larger budget if that matters).
    *
    * Determinism/parity: α is FIXED at ½ — T^½ = sqrt(T), and IEEE-754
    * sqrt is CORRECTLY rounded (unlike pow/exp/ln), so with weights
    * quantized to integer micro-units (w_q = floor(sqrt(T)·10⁶ + ½)) and
    * Σw_q an exact integer sum, every rate is a chain of exact-int→double
    * casts, one multiply, one divide — bit-identical across engines and
    * partitionings. A general α needs pow, which is a 1-ulp libm lottery
    * (the PortableMath lesson); ½ is also a standard setting.
    *
    * Zero-token domains rate to 0 by an explicit guard (under ANSI mode
    * even double division by zero raises) — they keep nothing.
    *
    * Plan: one tiny per-domain integer aggregation + a one-row Σw_q,
    * both broadcast back; the keep decision is a scan-stage md5-coin
    * compare — the [[domainBudget]] skeleton. */
  def temperatureResample(df: DataFrame, domainCol: String, keyCol: String,
                          tokenCount: Column, budget: Long, salt: String): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val totals = df.groupBy(col(domainCol))
      .agg(sum(tokenCount.cast("long")).as("__t"))
      .withColumn("__wq",
        floor(sqrt(col("__t").cast("double")) * lit(1.0e6) + lit(0.5)).cast("long"))
    val sw = totals.agg(sum(col("__wq")).as("__sw"))
    val rate = when(col("__t") > 0L,
      least(lit(1.0),
        (lit(budget.toDouble) * col("__wq").cast("double")) /
          (col("__sw").cast("double") * col("__t").cast("double"))))
      .otherwise(lit(0.0))
    df.join(broadcast(totals), Seq(domainCol))
      .crossJoin(broadcast(sw))
      .filter(coin(col(keyCol), salt).cast("double") < rate * lit(U32))
      .drop("__t", "__wq", "__sw")
  }

  /** Importance sampling: keep each row with its OWN probability — a score
    * column in [0, 1] (quality score, model-based filter output, inverse
    * propensity weight) instead of a plan-time constant. The coin is the
    * same md5 hash as [[bernoulli]], so decisions stay deterministic per
    * (key, salt) even as the score model is retrained: only rows whose
    * score crossed their coin flip membership.
    *
    * Scale: a codegen'd per-row predicate in the scan stage — zero
    * shuffle. Scores outside [0, 1] clamp (a <0/NaN score keeps nothing,
    * >1 keeps always) rather than corrupting the comparison. */
  def weightedBernoulli(df: DataFrame, keyCol: String, probCol: Column,
                        salt: String): DataFrame = {
    // NaN sorts ABOVE every double in Spark's ordering, so least() would
    // pass it through as p = 1 — zero it first
    val p = least(greatest(nanvl(probCol.cast("double"), lit(0.0)), lit(0.0)), lit(1.0))
    df.filter(coin(col(keyCol), salt).cast("double") < p * lit(U32))
  }

  /** Per-domain percentile gate: keep the top `keepFrac` of each domain by
    * `scoreCol` — "keep the best 30% of every source" curation, which a
    * global threshold can't express when score scales differ by domain.
    * Keeps EXACTLY ceil(keepFrac · |domain|) rows per domain, so every
    * non-empty domain keeps at least its best row. Ties on score break by
    * the deterministic per-key md5 coin (an unbiased lottery among tied
    * rows — key order would systematically favor small/old keys), then by
    * key. Contract: `keyCol` unique per row; scores non-null (null-score
    * rows are dropped).
    *
    * Scale design (round-9 form): the per-domain CUTOFF — the k_d-th best
    * (score, coin, key) triple, k_d = ceil(keepFrac·n_d) — is found by
    * VALUE-derived histogram refinement, eagerly at call time; the
    * returned plan applies it as a broadcast scan-stage predicate. Every
    * decision derives from row values ([[graft.functions.DoubleOrderBits]]
    * makes the double order refinable by bit prefix), so — unlike the
    * round-6 partition-id form — cache eviction, recomputation, AQE, or
    * any re-partitioning of the source CANNOT shift a cutoff: no persist,
    * no spark_partition_id, no deterministic-input caveat.
    *
    *   1. four passes histogram successive 16-bit chunks of the score's
    *      order bits per domain (walked on the driver in keep order:
    *      descending), pinning the cutoff row's exact score `m*` and the
    *      in-tie offset;
    *   2. two passes refine the 32-bit tie coin the same way (ascending)
    *      among rows at `m*`, pinning the cutoff coin `c*`;
    *   3. rows at (m*, c*) — one per domain barring md5 collisions — get
    *      a per-domain key rank (window over those few rows only) to pin
    *      the cutoff key;
    *   4. the returned plan is `df ⋈ broadcast(cutoffs)` + a codegen'd
    *      three-level comparison — zero shuffle of the corpus, no window.
    *
    * Driver state per pass is ≤ 65536·|domains| (chunk, count) rows — the
    * bounded-|domains| contract of [[domainBudget]].
    *
    * @note EAGER: calling this runs 7 bounded-aggregation jobs over a
    *       3-column projection of `df` (each pass after the first filters
    *       to the previous pass's boundary chunk), and the returned plan
    *       re-scans `df` once more when executed. Callers composing
    *       lazily should call it once and reuse the result; callers may
    *       cache `df` for speed — correctness does not depend on it. */
  def percentileGate(df: DataFrame, domainCol: String, keyCol: String,
                     scoreCol: Column, keepFrac: Double,
                     salt: String = "pctl"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(keepFrac > 0.0 && keepFrac <= 1.0, s"keepFrac out of (0,1]: $keepFrac")
    // __cm/__cc/__ck are appended to the INPUT frame by the cutoff join
    Seq("__d", "__m", "__c", "__k", "__cm", "__cc", "__ck").foreach(c =>
      require(!df.columns.contains(c),
        s"percentileGate reserves column name '$c' but the input already has it"))
    val spark = df.sparkSession
    val mExpr = graft.functions.DoubleOrderBits.of(scoreCol.cast("double"))
    val cExpr = coin(col(keyCol), salt)
    val trip = df
      .select(col(domainCol).as("__d"), mExpr.as("__m"), cExpr.as("__c"),
        col(keyCol).as("__k"))
      .filter(col("__m").isNotNull)
    val domType = trip.schema("__d").dataType

    def prefDf(rows: Seq[Row], fields: Seq[StructField]): DataFrame =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        StructType(StructField("__pd", domType) +: fields))

    // walk one histogram level per domain: consume counts of chunks that
    // sort wholly before the cutoff (in keep order), return the chunk
    // holding the k-th row and the remaining 1-based offset within it
    def walk(hist: Array[(Any, Long, Long)], rem: collection.Map[Any, Long],
             ascending: Boolean): Map[Any, (Long, Long)] =
      hist.groupBy(_._1).map { case (dom, rows) =>
        val ordered = rows.sortBy(r => if (ascending) r._2 else -r._2)
        var remaining = rem(dom)
        val hit = ordered.find { case (_, _, n) =>
          remaining <= n || { remaining -= n; false } }.get
        dom -> (hit._2, remaining)
      }

    def hist(filtered: DataFrame, chunk: Column): Array[(Any, Long, Long)] =
      filtered.groupBy(col("__d"), chunk.as("__b"))
        .agg(count(lit(1)).as("__n"))
        .collect().map(r => (r.get(0), r.getLong(1), r.getLong(2)))

    // ---- pass 0: top 16 signed bits of m; also yields per-domain totals
    val h0 = hist(trip, shiftright(col("__m"), 48))
    val quotas = h0.groupBy(_._1).map { case (dom, rows) =>
      val n = rows.map(_._3).sum
      // same double arithmetic as the window definition / the oracle
      dom -> math.ceil(keepFrac * n.toDouble).toLong.max(1L).min(n)
    }
    var mState = walk(h0, quotas, ascending = false) // dom -> (mPrefix, rem)

    // ---- passes 1..3: refine successive 16-bit chunks of m
    for (level <- 1 to 3) {
      val prevShift = 64 - 16 * level
      val chunkShift = 48 - 16 * level
      val pref = prefDf(mState.toSeq.map { case (d, (p, _)) => Row(d, p) },
        Seq(StructField("__mp", LongType)))
      val filtered = trip.join(broadcast(pref),
        col("__d") <=> col("__pd") && shiftright(col("__m"), prevShift) === col("__mp"))
      val h = hist(filtered,
        shiftright(col("__m"), chunkShift).bitwiseAND(lit(0xFFFFL)))
      val rem = mState.map { case (d, (_, r)) => d -> r }
      val chosen = walk(h, rem, ascending = false)
      mState = chosen.map { case (d, (chunk, r)) =>
        d -> ((mState(d)._1 << 16) | chunk, r)
      }
    }
    val mStar = mState // dom -> (exact m*, offset within the m* tie group)

    // ---- passes 4..5: refine the 32-bit tie coin (ascending) at m == m*
    val prefM = prefDf(mStar.toSeq.map { case (d, (m, _)) => Row(d, m) },
      Seq(StructField("__mp", LongType)))
    val atM = trip.join(broadcast(prefM),
      col("__d") <=> col("__pd") && col("__m") === col("__mp"))
    val h4 = hist(atM, shiftright(col("__c"), 16))
    val c4 = walk(h4, mStar.map { case (d, (_, r)) => d -> r }, ascending = true)
    val prefC = prefDf(c4.toSeq.map { case (d, (p, _)) =>
      Row(d, mStar(d)._1, p) },
      Seq(StructField("__mp", LongType), StructField("__cp", LongType)))
    val atC = trip.join(broadcast(prefC),
      col("__d") <=> col("__pd") && col("__m") === col("__mp") &&
        shiftright(col("__c"), 16) === col("__cp"))
    val h5 = hist(atC, col("__c").bitwiseAND(lit(0xFFFFL)))
    val c5 = walk(h5, c4.map { case (d, (_, r)) => d -> r }, ascending = true)
    val cStar = c5.map { case (d, (chunk, r)) => d -> ((c4(d)._1 << 16) | chunk, r) }

    // ---- pass 6: exact key at (m*, c*) — ~1 row/domain barring md5
    // collisions, so the per-domain window ranks a handful of rows
    val prefFull = prefDf(cStar.toSeq.map { case (d, (c, j)) =>
      Row(d, mStar(d)._1, c, j) },
      Seq(StructField("__mp", LongType), StructField("__cp", LongType),
        StructField("__j", LongType)))
    val wKey = Window.partitionBy(col("__d")).orderBy(col("__k"))
    val cutRows = trip.join(broadcast(prefFull),
        col("__d") <=> col("__pd") && col("__m") === col("__mp") &&
          col("__c") === col("__cp"))
      .withColumn("__r", row_number().over(wKey).cast("long"))
      .filter(col("__r") === col("__j"))
      .select(col("__d"), col("__m").as("__cm"), col("__c").as("__cc"),
        col("__k").as("__ck"))
      .collect()

    val cutSchema = StructType(Seq(
      StructField("__d", domType),
      StructField("__cm", LongType),
      StructField("__cc", LongType),
      StructField("__ck", trip.schema("__k").dataType)))
    val cutDf = spark.createDataFrame(
      spark.sparkContext.parallelize(cutRows.toSeq, 1), cutSchema)
    // null-safe domain match preserves null-as-a-group semantics
    df.join(broadcast(cutDf), df(domainCol) <=> cutDf("__d"))
      .filter(mExpr > col("__cm") ||
        (mExpr === col("__cm") && (cExpr < col("__cc") ||
          (cExpr === col("__cc") && col(keyCol) <= col("__ck")))))
      .drop("__d", "__cm", "__cc", "__ck")
  }

  /** Deterministic epoch shuffle: a reproducible pseudo-random permutation
    * of the corpus — the training-order shuffle every pretraining run
    * needs, seeded per epoch so each epoch sees a different but
    * REPLAYABLE order (resume-from-checkpoint reads the same order).
    * `posCol` is the dense rank 0..n−1 of (md5 coin, key).
    *
    * Scale design: the naive global `row_number()` window serializes the
    * corpus into one task. Instead the coin's top 12 bits form 4096
    * VALUE-derived buckets (a prefix of the sort key, so bucket order ==
    * global order): one bounded aggregation computes the bucket
    * histogram (≤ 4096 rows to the driver), prefix-sum offsets fold back
    * as a map literal, and each row's position is its bucket offset plus
    * its rank within the bucket — one hash exchange, 4096-way parallel
    * windows, no single-partition funnel. Unlike [[percentileGate]]'s
    * partition-id coupling, buckets derive from row VALUES, so cache
    * eviction or recomputation cannot re-bucket a row.
    *
    * @note EAGER: the histogram job runs at call time; the returned plan
    *       re-scans `df`. Contract: `keyCol` unique (total order). */
  def epochShuffle(df: DataFrame, keyCol: String, salt: String, epoch: Int,
                   posCol: String = "pos"): DataFrame = {
    require(epoch >= 0, s"negative epoch: $epoch")
    Seq("__coin", "__bkt").foreach(c => require(!df.columns.contains(c),
      s"epochShuffle reserves column name '$c' but the input already has it"))
    require(!df.columns.contains(posCol), s"output column '$posCol' already exists")
    val c = coin(col(keyCol), s"$salt:e$epoch") // uniform in [0, 2^32)
    val withB = df.withColumn("__coin", c)
      .withColumn("__bkt", shiftright(col("__coin"), 20).cast("int"))
    val hist = withB.groupBy(col("__bkt")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = hist.scanLeft((0, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
    val offMap = hist.map(_._1).zip(offsets.map(_._2)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt")).orderBy(col("__coin"), col(keyCol))
    withB.withColumn(posCol,
        element_at(typedlit(offMap), col("__bkt")) +
          row_number().over(w).cast("long") - 1L)
      .drop("__coin", "__bkt")
  }

  /** Domain-mixture resampling (data mixing): each domain gets a sampling
    * WEIGHT w ≥ 0 interpreted as epochs — every doc is emitted ⌊w⌋ times
    * plus once more with probability frac(w), so the expected copy count
    * is exactly w (upsampling w > 1 repeats docs; downsampling w < 1
    * keeps a deterministic Bernoulli slice; w = 0 drops the domain). The
    * standard knob for retuning a source mix (books × 3, low-quality web
    * × 0.2) without materializing per-domain datasets.
    *
    * Each copy carries an `epoch` index (0-based) so downstream shuffles
    * or packing can distinguish repeats. Deterministic per (key, salt):
    * the fractional-epoch coin is the same md5 coin as [[bernoulli]], so
    * a doc's copy count never changes across runs or cluster sizes.
    *
    * Plan shape: weights fold to a plan-time CASE; the repeat explode is
    * a generated sequence inside the scan stage — zero shuffle, output
    * rows ≈ Σ_d w_d·|d| by construction. */
  def mixtureResample(df: DataFrame, domainCol: String, keyCol: String,
                      weights: Map[String, Double], defaultWeight: Double,
                      salt: String, epochCol: String = "epoch"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0.0 && w.isFinite),
      s"mixture weights must be finite and >= 0: $weights default=$defaultWeight")
    Seq("__reps", epochCol).foreach(c => require(!df.columns.contains(c),
      s"mixtureResample reserves column name '$c' but the input already has it"))
    val wExpr = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight): Column) {
      case (acc, (dom, w)) => when(col(domainCol) === dom, lit(w)).otherwise(acc)
    }
    val whole = floor(wExpr) // bigint in both engines' semantics
    val frac = wExpr - whole.cast("double")
    val extra = when(coin(col(keyCol), salt).cast("double") < frac * lit(U32), 1L)
      .otherwise(0L)
    // sequence() with start > stop counts DOWN — guard reps > 0 first so
    // a zero-copy doc emits nothing instead of a phantom [0, -1] pair
    df.withColumn("__reps", whole + extra)
      .filter(col("__reps") > 0)
      .withColumn(epochCol, explode(sequence(lit(0L), col("__reps") - 1)))
      .drop("__reps")
  }

  /** DSIR-style data selection via importance resampling (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): score every POOL document by how target-like its
    * hashed-n-gram feature distribution is, and keep the top k. The
    * feature model is the paper's hashed bag-of-unigrams: token → md5
    * bucket in [0, buckets); both corpora get add-one-smoothed unigram
    * models over the buckets, and a doc's score is its log importance
    * weight  Σ_tok [ln p_target(b(tok)) − ln p_pool(b(tok))].
    *
    * Determinism/parity: ln is [[graft.functions.PortableMath]]'s wide
    * chain (correctly-rounded-ops-only series, domain [1, 2^62] — counts
    * at 100 TB fit), each per-bucket log-ratio and the totals term are
    * quantized to integer nano-nats (floor(Δln·10⁹ + ½)), and the doc
    * score is an exact integer SUM of those — partition-order free, and
    * the oracle replays every bucket weight and every doc score
    * bit-for-bit.
    *
    * Plan shape: exploded (id, is_target, bucket) rows shuffle once into
    * the ≤`buckets`-row count table; bucket weights broadcast back onto
    * the exploded scan; doc scores are one groupBy(id) of (id, weight)
    * longs; the top k is a distributed TakeOrdered — no global sort, no
    * driver funnel, nothing text-sized past the scan stage.
    *
    * @param targetPred rows where TRUE define the target distribution;
    *                   the rest are the pool being selected from
    * @return k rows (id, score_q9) — highest importance first by the
    *         (score desc, id) total order */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
                 targetPred: Column, buckets: Int = 512, k: Int = 100): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(k >= 1, s"k must be >= 1, got $k")
    def lnWideOf(d: DataFrame, x: Column, out: String): DataFrame =
      // kernel form of the wide portable-ln chain (bit-identical twin of
      // the oracle's SQL macro; PortableMathSpec pins the equivalence)
      d.withColumn(out, graft.functions.PortableLn.wide(x.cast("long")))
    // materialized ONCE: the (id, is_t, bucket) rows feed three consumers
    // (bucket counts, the totals term, and the scoring pass) — without
    // the checkpoint each re-runs the corpus tokenize + hash chain, the
    // operator's dominant CPU. Long-only rows, never text.
    val ex = df.select(col(idCol).as("id"), targetPred.as("is_t"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(col("id"), col("is_t"),
        pmod(Hashing.h64(col("tok"), "dsir"), lit(buckets.toLong)).as("b"))
      .localCheckpoint()
    val counts = ex.groupBy(col("b")).agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("cr"))
    // per-bucket Δln of the add-one numerators, quantized to nano-nats
    val wq = lnWideOf(lnWideOf(counts, col("ct") + 1L, "__lnt"), col("cr") + 1L, "__lnr")
      .withColumn("delta_q",
        expr("CAST(floor((__lnt - __lnr) * 1.0E9 + 0.5E0) AS BIGINT)"))
      .select(col("b"), col("delta_q"))
    // denominator term: ln(Tpool + B) − ln(Ttarget + B), once (one row)
    val totals = counts.agg(
      (sum(col("ct")) + lit(buckets.toLong)).as("tt"),
      (sum(col("cr")) + lit(buckets.toLong)).as("tr"))
    val cq = lnWideOf(lnWideOf(totals, col("tr"), "__lnTr"), col("tt"), "__lnTt")
      .withColumn("const_q",
        expr("CAST(floor((__lnTr - __lnTt) * 1.0E9 + 0.5E0) AS BIGINT)"))
      .select(col("const_q"))
    ex.filter(!col("is_t"))
      .join(broadcast(wq), Seq("b"))
      .crossJoin(broadcast(cq))
      .groupBy(col("id"))
      .agg(sum(col("delta_q") + col("const_q")).as("score_q9"))
      .orderBy(col("score_q9").desc, col("id"))
      .limit(k)
  }

  /** Concat-and-chunk sequence packing (the GPT-pretraining scheme):
    * within each shard, documents are concatenated in a deterministic
    * hash order and cut into fixed `contextLen`-token windows; each doc
    * reports the window range it lands in. `chunk_first`/`chunk_last`
    * straddle a boundary when a doc crosses it — downstream chooses
    * truncate/continue semantics.
    *
    * Scale: ONE window per shard (running sum of token counts) — the
    * shard column must bound per-partition data (source, date, or an
    * explicit hash-shard column); a global pack would serialize on a
    * single partition, which is exactly what this signature forbids.
    *
    * @return shard, id, n_tokens, start_tok, chunk_first, chunk_last */
  def packChunks(df: DataFrame, shardCol: String, keyCol: String,
                 tokenCount: Column, contextLen: Int, salt: String): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive: $contextLen")
    val w = Window.partitionBy(col("shard"))
      .orderBy(coin(col("id"), salt), col("id"))
    df.select(col(shardCol).as("shard"), col(keyCol).as("id"),
        tokenCount.cast("long").as("n_tokens"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .withColumn("chunk_first", expr(s"start_tok DIV $contextLen"))
      .withColumn("chunk_last",
        expr(s"(start_tok + greatest(n_tokens - 1, 0L)) DIV $contextLen"))
  }

  /** Materialize PACKED training sequences — the step after
    * [[packChunks]]'s accounting: concatenate each shard's token-id
    * arrays in the same deterministic hash order, cut at `contextLen`
    * boundaries, and emit one row per (shard, seq_idx) carrying the ids
    * in order. The trailing partial sequence of each shard is kept
    * (padding/dropping is the trainer's policy, not the packer's).
    *
    * Scale: this op MATERIALIZES tokens, so per-token rows are the
    * honest cost — one per-shard offset window (same as [[packChunks]]),
    * one explode, one (shard, seq) shuffle of (int, long) pairs. The
    * shard column must bound per-partition data, same contract as
    * [[packChunks]].
    *
    * @param idsCol array<long> token ids per row (e.g.
    *   [[TextAnalysis.encodeIds]] or the BPE id kernel)
    * @return (shard, seq_idx, n_ids, ids_joined) — ids comma-joined
    *   (integer arrays trip the arrow element-name gate) */
  def packSequences(df: DataFrame, shardCol: String, keyCol: String,
                    idsCol: Column, contextLen: Int, salt: String): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive: $contextLen")
    val w = Window.partitionBy(col("shard"))
      .orderBy(coin(col("id"), salt), col("id"))
    // a NULL ids array must count as empty: size(NULL) poisons the
    // running-sum offsets of every later doc in the shard (silently
    // shifting all downstream sequence boundaries), while posexplode
    // would just drop the row
    df.select(col(shardCol).as("shard"), col(keyCol).as("id"),
        coalesce(idsCol, expr("array()").cast("array<bigint>")).as("__ids"))
      .withColumn("__n", size(col("__ids")).cast("long"))
      .withColumn("__start", coalesce(sum(col("__n")).over(w) - col("__n"), lit(0L)))
      .select(col("shard"), col("__start"),
        posexplode(col("__ids")).as(Seq("__i", "__tok")))
      .withColumn("__gpos", col("__start") + col("__i"))
      .groupBy(col("shard"), expr(s"__gpos DIV $contextLen").as("seq_idx"))
      .agg(count(lit(1)).cast("long").as("n_ids"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("__gpos"), col("__tok")))),
          s => s.getField("__tok").cast("string"))).as("ids_joined"))
  }

  /** Cross-corpus exact decontamination: drop corpus docs whose
    * bag-of-words fingerprint ([[TextAnalysis.fingerprint]] — sorted
    * distinct token set) appears in the probe corpus (benchmark/eval
    * suites). Complements [[Dedup.contaminationPairs]] (partial n-gram
    * overlap): this is the strict exact-match gate, that is the fuzzy
    * leak scan.
    *
    * Plan shape: probes (MBs) reduce to distinct 16-byte digests,
    * BROADCAST into a left-anti hash join inside the corpus scan stage —
    * zero shuffle of corpus data. */
  def decontaminate(corpus: DataFrame, probes: DataFrame,
                    textCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val probeFps = probes.select(fp.as("__fp")).distinct()
    corpus.withColumn("__fp", fp)
      .join(broadcast(probeFps), Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** [[decontaminate]] for probe sets past broadcast scale, with IDENTICAL
    * output: the probe fingerprints fold into a Bloom sketch (built by a
    * distributed aggregation; only the fixed-size sketch bytes reach the
    * driver — the same bounded-sketch exemption as the IVF codebook), which
    * is inlined as a literal so `might_contain` screens rows INSIDE the
    * corpus scan stage. A Bloom filter has no false negatives, so rows it
    * clears are definitively clean and never shuffle; only suspected rows
    * (true hits + ~fpp of the corpus) cross a digest-keyed exchange into
    * the exact anti-join that removes the false positives. Corpus scanned
    * twice, shuffled ~never — the right trade at 100 TB, where one shuffle
    * of the corpus costs far more than a second columnar scan.
    *
    * @param expectedProbes sizes the sketch (fpp ≈ 3% at the estimate;
    *   an underestimate only raises fpp, i.e. verify-join traffic — never
    *   correctness) */
  def decontaminateBloom(corpus: DataFrame, probes: DataFrame, textCol: String,
                         expectedProbes: Long = 1L << 22): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{toExpr, wrap}
    import org.apache.spark.sql.catalyst.expressions.XxHash64
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    require(expectedProbes > 0, s"expectedProbes must be positive: $expectedProbes")

    val fp = TextAnalysis.fingerprint(col(textCol))
    val probeFps = probes.select(fp.as("__fp")).distinct()
    val sketch: Array[Byte] = probeFps
      .agg(wrap(new BloomFilterAggregate(XxHash64(Seq(toExpr(col("__fp"))), 42L), expectedProbes)
        .toAggregateExpression()).as("b"))
      .head().getAs[Array[Byte]]("b")
    // an empty probe set aggregates to a null sketch — nothing to remove
    if (sketch == null) return corpus

    def mightContain(c: org.apache.spark.sql.Column) =
      wrap(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        toExpr(lit(sketch)), XxHash64(Seq(toExpr(c)), 42L)))

    val marked = corpus.withColumn("__fp", fp)
      // null fingerprints hash to a null probe — they can't match any
      // probe digest, so they are clean (the anti-join keeps them too)
      .withColumn("__sus", coalesce(mightContain(col("__fp")), lit(false)))
    val clean = marked.filter(!col("__sus"))
    val verified = marked.filter(col("__sus"))
      .join(probeFps, Seq("__fp"), "left_anti")
    clean.unionByName(verified).drop("__fp", "__sus")
  }
}
