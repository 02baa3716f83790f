package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Batch analytics surface over the ingested tables.
  *
  * The reference is ingestion-only (SURVEY.md §2.11: no joins/aggregations);
  * these queries are the read-side a user of the ingested Delta tables runs,
  * and the bench headliners. Design notes for 100 TB:
  *  - money aggregates go through exact integer sums ([[decSum]]) so
  *    results are order-independent (fp64 sums are not associative) — this
  *    also makes the DuckDB oracle comparison deterministic;
  *  - small dimensions (region/nation/supplier) are explicitly broadcast;
  *  - every query returns a deterministic total order.
  */
object Analytics extends QueryModule {

  /** Exact order-independent money aggregate as two LONG sums: integer
    * parts and 1e-4-scaled fractional parts summed separately. The money
    * fields carry ≤ 4 decimals, so each row's two parts are exact
    * integers and the result equals summing decimal(28,4) — but ~4×
    * faster (measured 1.86 s → 0.52 s on q1 @ sf0.1): long adds instead
    * of 128-bit decimal arithmetic on the hot path, and still exact at
    * any partition order (fp64 sums are not associative; integer sums
    * are). Overflow headroom: both partial sums stay under 2^63 past
    * 10^14 rows of 10^4-magnitude values (~40 PB of lineitem).
    * The same formula is emitted into the DuckDB oracle by [[decSumSql]]
    * so both engines round identically per row. */
  private def decSum(c: org.apache.spark.sql.Column) =
    sum(floor(c)).cast("double") +
      sum(round((c - floor(c)) * 10000).cast("long")).cast("double") / 1e4

  /** DuckDB twin of [[decSum]] over SQL expression `e`. */
  private def decSumSql(e: String): String =
    s"(CAST(sum(CAST(floor($e) AS BIGINT)) AS DOUBLE)" +
      s" + CAST(sum(CAST(round(($e - floor($e)) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0)"

  /** Windowed twin of [[decSum]]: two long prefix sums over frame `w`. */
  private def decSumOver(c: org.apache.spark.sql.Column,
                         w: org.apache.spark.sql.expressions.WindowSpec) =
    sum(floor(c)).over(w).cast("double") +
      sum(round((c - floor(c)) * 10000).cast("long")).over(w).cast("double") / 1e4

  /** DuckDB twin of [[decSumOver]]; `over` is the full "OVER (…)" text. */
  private def decSumOverSql(e: String, over: String): String =
    s"(CAST(sum(CAST(floor($e) AS BIGINT)) $over AS DOUBLE)" +
      s" + CAST(sum(CAST(round(($e - floor($e)) * 10000, 0) AS BIGINT)) $over AS DOUBLE) / 10000.0)"

  /** The adjacent-lineitem part graph every graph_* query runs on
    * (parts on consecutive line numbers of one order share an edge):
    * ONE definition plus [[PartGraphPairSql]], its oracle twin — ten
    * inlined copies used to invite silent drift that would change a
    * single query's graph. Directed (src, dst) rows; the ops normalize
    * duplicates/direction/self-loops themselves. */
  private def partGraph(s: SparkSession, d: String): DataFrame = {
    val l1 = Tables.lineitem(s, d).select(
      col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
      col("l_partkey").cast("long").as("pa"))
    val l2 = Tables.lineitem(s, d).select(
      col("l_orderkey").as("ok"), (col("l_linenumber") - 1).as("ln"),
      col("l_partkey").cast("long").as("pb"))
    l1.join(l2, Seq("ok", "ln"))
      .where(col("pa") =!= col("pb"))
      .select(col("pa").as("src"), col("pb").as("dst"))
  }

  /** DuckDB twin of [[partGraph]] as the canonical-pair CTE `p(a, b)`. */
  private val PartGraphPairSql: String =
    """p AS MATERIALIZED (
      |  SELECT DISTINCT least(CAST(l1.l_partkey AS BIGINT), CAST(l2.l_partkey AS BIGINT)) AS a,
      |    greatest(CAST(l1.l_partkey AS BIGINT), CAST(l2.l_partkey AS BIGINT)) AS b
      |  FROM lineitem l1 JOIN lineitem l2
      |    ON l1.l_orderkey = l2.l_orderkey AND l2.l_linenumber = l1.l_linenumber + 1
      |  WHERE l1.l_partkey <> l2.l_partkey
      |)""".stripMargin

  /** Distributed multiset-equality assertion for the IVM identity gates:
    * the symmetric `exceptAll` difference is computed as ONE distributed
    * anti-aggregation and only a ≤ 3-row sample ever reaches the driver —
    * never the |V|-sized frames themselves (at 100× scale a node-keyed
    * collect of either side is a driver OOM; the operators under test
    * are scale-clean, so the assertion must be too). */
  private def requireFoldMatches(folded: DataFrame, direct: DataFrame,
                                 what: String): Unit = {
    val diffSample = folded.exceptAll(direct)
      .unionAll(direct.exceptAll(folded)).limit(3).collect()
    require(diffSample.isEmpty,
      s"$what diverged from recompute; diff sample: ${diffSample.mkString("; ")}")
  }

  def defs: Map[String, QueryDef] = Map(
    // TPC-H Q1 shape: scan-heavy agg; partial aggregation map-side, one shuffle.
    "q1_agg" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            decSum(col("l_quantity")).as("sum_qty"),
            decSum(col("l_extendedprice")).as("sum_base_price"),
            decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
            (decSum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
             |  ${decSumSql("l_quantity")} AS sum_qty,
             |  ${decSumSql("l_extendedprice")} AS sum_base_price,
             |  ${decSumSql("(l_extendedprice * (1 - l_discount))")} AS sum_disc_price,
             |  ${decSumSql("l_quantity")} / count(*) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // Selective filter + global agg: exercises parquet predicate pushdown.
    "q6_filter_agg" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
          .agg(decSum(col("l_extendedprice") * col("l_discount")).as("revenue"),
               count(lit(1)).as("n"))
      },
      Some(s"""SELECT ${decSumSql("(l_extendedprice * l_discount)")} AS revenue,
             |  count(*) AS n
             |FROM lineitem
             |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),
      headline = true),

    // 3-way join + agg + top-k (TPC-H Q3 shape). Orders/customer filtered
    // before the join; final top-k via sort+limit.
    "q3_join_agg" -> QueryDef(
      (s, d) => {
        val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val ord = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderpriority"))
          .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT o_orderkey, o_orderpriority,
             |  ${decSumSql("(l_extendedprice * (1 - l_discount))")} AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey, o_orderpriority
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
      headline = true),

    // 6-way star join (TPC-H Q5 shape): dims broadcast, one fact shuffle.
    "q5_multijoin" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        val sup = Tables.supplier(s, d)
        val nat = Tables.nation(s, d)
        val reg = Tables.region(s, d)
        // customer scales with SF (GBs at sf100) — no broadcast hint on it;
        // AQE picks the join strategy at runtime. The genuinely-small dims
        // (nation/region/supplier) are broadcast explicitly.
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey") &&
            cust("c_nationkey") === sup("s_nationkey"))
          .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
          .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name,
             |  ${decSumSql("(l_extendedprice * (1 - l_discount))")} AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      headline = true),

    // Sort + limit (top-k): Spark plans TakeOrderedAndProject (no full sort).
    "q2_topk" -> QueryDef(
      (s, d) =>
        Tables.part(s, d)
          .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
          .limit(20),
      Some("""SELECT p_partkey, p_name, p_retailprice FROM part
             |ORDER BY p_retailprice DESC, p_partkey LIMIT 20""".stripMargin)),

    // Window functions: rank within partition + running aggregate.
    "q7_window" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("run_spend", decSumOver(col("o_totalprice"),
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("run_spend"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some(s"""SELECT o_custkey, rn, o_orderkey, run_spend FROM (
             |  SELECT o_custkey, o_orderkey,
             |    CAST(row_number() OVER w AS BIGINT) AS rn,
             |    ${decSumOverSql("o_totalprice",
                  "OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS run_spend
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),
      headline = true),

    // Distinct aggregation (exact) + approx sketch path exercised separately.
    "q8_distinct" -> QueryDef(
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(countDistinct(col("o_custkey")).as("n_cust"),
               count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Set operations: UNION / INTERSECT / EXCEPT keyspaces.
    "q9_setops" -> QueryDef(
      (s, d) => {
        // One lazy DataFrame (no driver-side .count() jobs): the three set-op
        // branches are scalar-aggregated and stitched with crossJoins, so the
        // whole thing is a single Spark job.
        val ordCust = Tables.orders(s, d).select(col("o_custkey").as("k"))
        val cust = Tables.customer(s, d).select(col("c_custkey").as("k"))
        val u = cust.union(ordCust).distinct().agg(count(lit(1)).as("n_union"))
        val i = cust.intersect(ordCust).agg(count(lit(1)).as("n_intersect"))
        val e = cust.except(ordCust).agg(count(lit(1)).as("n_except"))
        u.crossJoin(i).crossJoin(e)
      },
      Some("""SELECT
             |  (SELECT count(*) FROM (SELECT c_custkey AS k FROM customer UNION SELECT o_custkey FROM orders)) AS n_union,
             |  (SELECT count(*) FROM (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)) AS n_intersect,
             |  (SELECT count(*) FROM (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)) AS n_except""".stripMargin)),

    // Semi/anti joins (EXISTS / NOT EXISTS).
    "q12_semi_anti" -> QueryDef(
      (s, d) => {
        // Single lazy DataFrame: semi/anti branches scalar-aggregated and
        // crossJoined (no driver-side .count()).
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d).select(col("o_custkey"))
        val withOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("n_with_orders"))
        val without = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_without_orders"))
        withOrders.crossJoin(without)
      },
      Some("""SELECT
             |  (SELECT count(*) FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_with_orders,
             |  (SELECT count(*) FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without_orders""".stripMargin)),

    // Rollup (grouping sets family).
    "q11_rollup" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          // exact-sum-routed like every other quantity sum: raw sum(double)
          // is partition-order dependent and only passed by luck on
          // integral quantities (review finding)
          .agg(count(lit(1)).as("n"), decSum(col("l_quantity")).as("qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  ${decSumSql("l_quantity")} AS qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // Event-time tumbling window aggregation (batch form; the streaming form
    // with watermarks is covered in StreamingIngestSpec).
    "q10_events_hourly" -> QueryDef(
      (s, d) =>
        Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), decSum(col("value")).as("total_value"))
          .orderBy(col("hour"), col("event_type")),
      Some(s"""SELECT date_trunc('hour', ts) AS hour, event_type,
             |  count(*) AS n, ${decSumSql("value")} AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
      headline = true),

    // Full grouping-sets lattice (rollup's sibling; §2.11 coverage).
    "q17_cube" -> QueryDef(
      (s, d) =>
        Tables.lineitem(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), decSum(col("l_quantity")).as("qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  ${decSumSql("l_quantity")} AS qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // Running-total window frame (ROWS UNBOUNDED PRECEDING; exact-sum-routed
    // so prefix sums are partition-order independent).
    "q18_running_sum" -> QueryDef(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
            decSumOver(col("o_totalprice"), w).as("running_total"))
          .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      },
      Some(s"""SELECT o_custkey, o_orderdate, o_orderkey,
             |  ${decSumOverSql("o_totalprice",
                """OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  |    ROWS UNBOUNDED PRECEDING)""".stripMargin)} AS running_total
             |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // Exact percentiles (continuous interpolation — Spark percentile and
    // DuckDB quantile_cont share the definition, so values are exact).
    "q19_percentiles" -> QueryDef(
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(
            expr("percentile(value, 0.5)").as("p50"),
            expr("percentile(value, 0.95)").as("p95"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type, quantile_cont(value, 0.5) AS p50,
             |  quantile_cont(value, 0.95) AS p95, count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Salted skew join — must be row-identical to the plain join, which
    // is exactly what the oracle states (the salt is invisible in SQL).
    "q22_salted_join" -> QueryDef(
      (s, d) =>
        graft.ops.SkewJoin.saltedJoin(
            Tables.orders(s, d), Tables.customer(s, d).select(col("c_custkey").as("o_custkey"),
              col("c_mktsegment")), "o_custkey", "o_orderkey", salts = 8)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            decSum(col("o_totalprice")).as("total"))
          .orderBy(col("c_mktsegment")),
      Some(s"""SELECT c_mktsegment, count(*) AS n_orders,
             |  ${decSumSql("o_totalprice")} AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Z-order (Morton) clustering key — the expression behind
    // DeltaTable.optimizeZOrder, oracle-checked bit-for-bit (the rewrite
    // itself is spec-gated in DeltaSpec; this pins the cross-engine key).
    "q21_zorder_key" -> QueryDef(
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_id"),
            graft.functions.ZValue.of(col("user_id"), col("event_id")).as("zv"))
          .orderBy(col("event_id")),
      Some(s"""SELECT event_id, ${graft.functions.ZValue.sql("user_id", "event_id")} AS zv
              |FROM events ORDER BY event_id""".stripMargin)),

    // N-dimensional Morton key (the 3+-column OPTIMIZE ZORDER form,
    // ZValueN's 63/n-bit round-robin interleave) — oracle-checked
    // bit-for-bit via the same bit-gather spelling.
    "q31_zorder3_key" -> QueryDef(
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_id"),
            graft.functions.ZValueN.of(Seq(
              col("user_id"), col("event_id"),
              org.apache.spark.sql.functions.length(col("event_type")))).as("zv3"))
          .orderBy(col("event_id")),
      Some(s"""SELECT event_id, ${graft.functions.ZValueN.sql(
                Seq("user_id", "event_id", "length(event_type)"))} AS zv3
              |FROM events ORDER BY event_id""".stripMargin)),

    // Correlated scalar subquery shape: per-order max line.
    "q13_subquery" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val mx = li.groupBy(col("l_orderkey").as("k")).agg(max(col("l_quantity")).as("max_qty"))
        li.join(mx, li("l_orderkey") === mx("k") && li("l_quantity") === mx("max_qty"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_max_lines"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n_max_lines
             |FROM lineitem l
             |JOIN (SELECT l_orderkey AS k, max(l_quantity) AS max_qty FROM lineitem GROUP BY 1) m
             |  ON l.l_orderkey = m.k AND l.l_quantity = m.max_qty
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Hilbert clustering key (the liquid-clustering upgrade of q21's
    // Morton key), oracle-checked bit-for-bit: the DuckDB side replays
    // the full 16-step reflect/swap walk as a generated CTE chain.
    // Ordered conversion funnel (view -> click -> purchase): each stage's
    // time must follow the PREVIOUS stage's first time for that user —
    // the event-sequence analytic windows/sessionize don't express.
    // Three per-user min aggregates chained by semi-joins; each exchange
    // carries (user, ts) pairs only, and the funnel-stage frames shrink
    // monotonically, so the chain scales as three cheap shuffles of a
    // per-user row each at any event volume.
    "q24_funnel" -> QueryDef(
      (s, d) => {
        val e = Tables.events(s, d).select(col("user_id"), col("ts"), col("event_type"))
        val t1 = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val t2 = e.join(t1, Seq("user_id"))
          .filter(col("event_type") === "click" && col("ts") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val t3 = e.join(t2, Seq("user_id"))
          .filter(col("event_type") === "purchase" && col("ts") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        val stages = Seq(t1 -> 1, t2 -> 2, t3 -> 3).map { case (df, n) =>
          df.agg(count(lit(1)).as("users")).select(lit(n.toLong).as("stage"), col("users"))
        }
        stages.reduce(_ unionByName _).orderBy(col("stage"))
      },
      Some("""WITH t1 AS (
             |  SELECT user_id, min(ts) AS t1 FROM events
             |  WHERE event_type = 'view' GROUP BY user_id
             |), t2 AS (
             |  SELECT e.user_id, min(e.ts) AS t2
             |  FROM events e JOIN t1 ON e.user_id = t1.user_id
             |  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id
             |), t3 AS (
             |  SELECT e.user_id, min(e.ts) AS t3
             |  FROM events e JOIN t2 ON e.user_id = t2.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id
             |)
             |SELECT CAST(1 AS BIGINT) AS stage, CAST(count(*) AS BIGINT) AS users FROM t1
             |UNION ALL SELECT 2, count(*) FROM t2
             |UNION ALL SELECT 3, count(*) FROM t3
             |ORDER BY stage""".stripMargin)),

    // Cohort retention (the product-analytics staple the funnel doesn't
    // cover): users grouped by first-active WEEK, then distinct-user
    // counts per (cohort, weeks-since-cohort) cell. Week buckets via
    // date_trunc (ISO Monday in both engines — the q10 'hour' parity
    // precedent), offsets via exact integer day arithmetic (DIV 7 — both
    // engines truncate identically on the exact multiples date_trunc
    // guarantees). Plan: one distinct on (user, week), one per-user min,
    // a key join, one count-distinct agg — all shuffles carry (long,
    // timestamp) pairs.
    "q25_cohort" -> QueryDef(
      (s, d) => {
        val act = Tables.events(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .distinct()
        val firstWk = act.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
        act.join(firstWk, Seq("user_id"))
          .withColumn("week_offset", expr("CAST(datediff(wk, cohort) AS LONG) DIV 7"))
          .groupBy(col("cohort"), col("week_offset"))
          .agg(countDistinct(col("user_id")).as("users"))
          .orderBy(col("cohort"), col("week_offset"))
      },
      Some("""WITH act AS (
             |  -- DuckDB date_trunc('week') yields DATE, Spark a TIMESTAMP:
             |  -- cast here so the arrow schema gate compares like for like
             |  SELECT DISTINCT user_id,
             |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM events
             |), firstwk AS (
             |  SELECT user_id, min(wk) AS cohort FROM act GROUP BY user_id
             |)
             |SELECT f.cohort AS cohort,
             |  CAST(date_diff('day', f.cohort, a.wk) AS BIGINT) // 7 AS week_offset,
             |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
             |FROM act a JOIN firstwk f USING (user_id)
             |GROUP BY 1, 2 ORDER BY cohort, week_offset""".stripMargin)),

    // PIVOT (the §2.11 reshaping gap): daily event counts spread into
    // one column per event type — Spark's relational pivot with a FIXED
    // value list (the scale-sane form: an unbounded pivot needs a
    // value-discovery pass and an unbounded-width row). The oracle is
    // the portable CASE-sum expansion, which is also exactly what
    // Catalyst lowers pivot to.
    "q27_pivot" -> QueryDef(
      (s, d) =>
        Tables.events(s, d)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .pivot("event_type", Seq("view", "click", "purchase", "error"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .select(col("day"), col("view").cast("long").as("n_view"),
            col("click").cast("long").as("n_click"),
            col("purchase").cast("long").as("n_purchase"),
            col("error").cast("long").as("n_error"))
          .orderBy(col("day")),
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
             |FROM events GROUP BY 1 ORDER BY day""".stripMargin)),

    // Pearson correlation per group (the §2.11 statistics gap): corr of
    // (value, user_id) per event type, computed from EXACT integer
    // moment sums — value quantized to micro-units, the five moments
    // summed as scale-0 decimals (no fp summation order anywhere), the
    // final formula evaluated in doubles whose every op (exact-int cast,
    // ×, ÷, sqrt) is correctly rounded per IEEE-754 — so the result is
    // bit-identical across engines AND partitionings, where a naive
    // corr() is a summation-order lottery.
    // First-order Markov transition matrix over per-user event streams
    // (the behavioral-model / anomaly-baseline primitive): consecutive
    // event-type pairs per user under the deterministic (ts, event_id)
    // order; probabilities as exact integer micro-units (BIGINT floor
    // division in both engines — no float division drift).
    "q29_markov" -> QueryDef(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val pairs = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))
        pairs
          .withColumn("tot", sum(col("n")).over(wTot))
          .withColumn("p_micro",
            expr("CAST((n * CAST(1000000 AS BIGINT)) DIV tot AS BIGINT)"))
          .select(col("from_type"), col("to_type"), col("n"), col("p_micro"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH seq AS (
             |  SELECT user_id, event_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS next_type
             |  FROM events
             |), pairs AS (
             |  SELECT event_type AS from_type, next_type AS to_type,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
             |), tot AS (
             |  SELECT from_type, to_type, n,
             |    sum(n) OVER (PARTITION BY from_type) AS t
             |  FROM pairs
             |)
             |SELECT from_type, to_type, n,
             |  CAST((n * 1000000) // t AS BIGINT) AS p_micro
             |FROM tot ORDER BY from_type, to_type""".stripMargin)),

    // RFM customer segmentation (the classic retention/marketing cut):
    // per-customer recency (latest order epoch-day), frequency (orders),
    // monetary (exact cent sum); quintile scores via ntile(5) under
    // fully-deterministic (metric, custkey) orders — recency quintiles
    // newest-first so 5 = best in every dimension.
    "q30_rfm" -> QueryDef(
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val base = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(max(to_date(col("o_orderdate"))).as("last_day"),
            count(lit(1)).as("frequency"),
            sum(expr("CAST(floor(o_totalprice * 100 + 0.5E0) AS BIGINT)")).as("cents"))
        base
          .select(col("o_custkey"), col("frequency"), col("cents"),
            ntile(5).over(W.orderBy(col("last_day").desc, col("o_custkey")))
              .cast("long").as("r_score"),
            ntile(5).over(W.orderBy(col("frequency").desc, col("o_custkey")))
              .cast("long").as("f_score"),
            ntile(5).over(W.orderBy(col("cents").desc, col("o_custkey")))
              .cast("long").as("m_score"))
          .orderBy(col("o_custkey"))
      },
      Some("""WITH base AS (
             |  SELECT o_custkey,
             |    max(CAST(o_orderdate AS DATE)) AS last_day,
             |    CAST(count(*) AS BIGINT) AS frequency,
             |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5E0) AS BIGINT))
             |      AS BIGINT) AS cents
             |  FROM orders GROUP BY o_custkey
             |)
             |SELECT o_custkey, frequency, cents,
             |  CAST(ntile(5) OVER (ORDER BY last_day DESC, o_custkey) AS BIGINT) AS r_score,
             |  CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_score,
             |  CAST(ntile(5) OVER (ORDER BY cents DESC, o_custkey) AS BIGINT) AS m_score
             |FROM base ORDER BY o_custkey""".stripMargin)),

    "q28_corr" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"),
            expr("CAST(floor(value * 1.0E6 + 0.5E0) AS DECIMAL(38,0))").as("x"),
            col("user_id").cast("decimal(38,0)").as("y"))
        ev.groupBy(col("event_type"))
          .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("event_type"),
            col("n").cast("long").as("n_rows"),
            // degenerate groups (n=1 or zero variance) have no defined
            // correlation: guard to NULL explicitly — an unguarded 0/0 is
            // NULL in Spark but NaN in DuckDB, breaking the parity this
            // query exists to demonstrate
            when((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
                 (col("n") * col("syy") - col("sy") * col("sy")) > 0,
              ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")) /
                sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                  (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
              .as("corr_xy"))
          .orderBy(col("event_type"))
      },
      Some("""WITH q AS (
             |  SELECT event_type,
             |    CAST(floor(value * 1.0E6 + 0.5E0) AS HUGEINT) AS x,
             |    CAST(user_id AS HUGEINT) AS y
             |  FROM events
             |), m AS (
             |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             |    sum(x) AS sx, sum(y) AS sy,
             |    sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
             |  FROM q GROUP BY event_type
             |)
             |SELECT event_type, CAST(n AS BIGINT) AS n_rows,
             |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             |    CAST(n * sxy - sx * sy AS DOUBLE) /
             |      sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
             |           CAST(n * syy - sy * sy AS DOUBLE))
             |  ELSE NULL END AS corr_xy
             |FROM m ORDER BY event_type""".stripMargin)),

    "q23_hilbert_key" -> QueryDef(
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_id"),
            graft.functions.HilbertValue.of(col("user_id"), col("event_id")).as("hv"))
          .orderBy(col("event_id")),
      Some(s"""WITH ${graft.functions.HilbertValue.hilbertCtes(
                "events", Seq("event_id"), "user_id", "event_id")}
              |SELECT event_id, hd AS hv
              |FROM h${graft.functions.HilbertValue.Order} ORDER BY event_id""".stripMargin)),

    // Iterative graph computation: 3-round exact-integer PageRank over the
    // customer↔supplier interaction graph (symmetric bipartite edges from
    // order lines — every node has outdegree ≥ 1, no dangling mass). The
    // oracle replays the full unrolled iteration chain: same Q-scaled
    // integer ranks, same integer divisions, bit-for-bit.
    "graph_pagerank" -> QueryDef(
      (s, d) => {
        val rel = Tables.orders(s, d).join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        graft.ops.Graph.pageRank(
            graft.ops.Graph.bipartiteEdges(rel, "o_custkey", "l_suppkey", 10000000L),
            iters = 3, symmetricDistinct = true)
          .select(col("node"), col("r").as("rank_q"))
          .orderBy(col("node"))
      },
      Some(s"""WITH p AS MATERIALIZED (
              |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a,
              |    10000000 + CAST(l_suppkey AS BIGINT) AS b
              |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              |), e AS MATERIALIZED (
              |  SELECT a AS src, b AS dst FROM p
              |  UNION ALL SELECT b AS src, a AS dst FROM p
              |), ${graft.ops.Graph.pageRankSql(3)}
              |SELECT node, r AS rank_q FROM r3 ORDER BY node""".stripMargin),
      headline = true),

    // Exact triangle counting over the adjacent-lineitem part graph
    // (parts on consecutive line numbers of one order share an edge —
    // sparse, ~15 avg degree at sf0.01, 4.6k triangles). Degree-ordered
    // orientation on both sides; the oracle replays the same wedge order
    // and closing join, so per-node counts match bit for bit.
    "graph_triangles" -> QueryDef(
      (s, d) => {
        val edges = partGraph(s, d)
        graft.ops.Graph.triangles(edges).orderBy(col("node"))
      },
      Some(s"""WITH $PartGraphPairSql, ${graft.ops.Graph.trianglesSql}
              |SELECT node, triangles FROM tricnt ORDER BY node""".stripMargin),
      headline = true),

    // Synchronous label-propagation communities over the same
    // customer↔supplier interaction graph as graph_pagerank — the oracle
    // replays all 3 synchronous rounds (counts → smallest-label argmax →
    // simultaneous adoption) bit-for-bit, so a tie broken the wrong way
    // or an async-style in-round leak fails the hash.
    "graph_label_prop" -> QueryDef(
      (s, d) => {
        val rel = Tables.orders(s, d).join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        graft.ops.Graph.labelPropagation(
            graft.ops.Graph.bipartiteEdges(rel, "o_custkey", "l_suppkey", 10000000L),
            rounds = 3, symmetricDistinct = true)
          .select(col("node"), col("lbl").as("community"))
          .orderBy(col("node"))
      },
      Some(s"""WITH p AS MATERIALIZED (
              |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a,
              |    10000000 + CAST(l_suppkey AS BIGINT) AS b
              |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              |), e AS MATERIALIZED (
              |  SELECT a AS src, b AS dst FROM p
              |  UNION ALL SELECT b AS src, a AS dst FROM p
              |), ${graft.ops.Graph.labelPropagationSql(3)}
              |SELECT node, lbl AS community FROM l3 ORDER BY node""".stripMargin)),

    // Newman modularity per community over graph_label_prop's EXACT
    // label frame (the oracle re-derives all 3 synchronous rounds, then
    // the q_num = 2m·in_c − tot_c² exact-integer readout) — the quality
    // number that tells a curation pipeline whether the communities are
    // real structure or degree noise, with no float crossing engines.
    "graph_modularity" -> QueryDef(
      (s, d) => {
        val rel = Tables.orders(s, d).join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        val edges = graft.ops.Graph.bipartiteEdges(
          rel, "o_custkey", "l_suppkey", 10000000L)
        graft.ops.Graph.modularity(edges,
            graft.ops.Graph.labelPropagation(edges, rounds = 3,
              symmetricDistinct = true))
          .orderBy(col("community"))
      },
      Some(s"""WITH p AS MATERIALIZED (
              |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a,
              |    10000000 + CAST(l_suppkey AS BIGINT) AS b
              |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              |), e AS MATERIALIZED (
              |  SELECT a AS src, b AS dst FROM p
              |  UNION ALL SELECT b AS src, a AS dst FROM p
              |), ${graft.ops.Graph.labelPropagationSql(3)},
              |${graft.ops.Graph.modularitySqlOn("l3")}
              |SELECT community, n_nodes, internal_x2, deg_total, q_num
              |FROM modq ORDER BY community""".stripMargin)),

    // k-core decomposition over the adjacent-lineitem part graph (the
    // graph-curation peel): k=18 cascades for ~6 rounds at sf0.01
    // (2000 → 1853 nodes) — a real multi-round fixpoint, not a one-shot
    // degree filter. The oracle unrolls 8 peel rounds (monotone: extra
    // rounds no-op past the fixpoint; 8 = measured 6 + margin, bounded
    // by the 128MB oracle bar), so a premature stop, an in-round
    // ordering leak, or a wrong degree count all shift the final core.
    "graph_kcore" -> QueryDef(
      (s, d) => {
        val edges = partGraph(s, d)
        graft.ops.Graph.kCore(edges, k = 18).orderBy(col("node"))
      },
      Some(s"""WITH $PartGraphPairSql, e0 AS MATERIALIZED (
              |  SELECT a AS src, b AS dst FROM p
              |  UNION ALL SELECT b AS src, a AS dst FROM p
              |), ${graft.ops.Graph.kCoreSql(rounds = 8, k = 18)}
              |SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
              |FROM e8 GROUP BY src ORDER BY node""".stripMargin)),

    // TrustRank-style seed distance over the same part graph: hops from
    // the nearest trusted seed (partkey % 199 = 0), capped at 3 —
    // frontier expansion where Spark and the oracle run the IDENTICAL
    // horizon (depths 0..3; ~30 nodes only reached at 3), so a leaked
    // revisit (wrong depth) or a dropped frontier node fails the hash.
    "graph_seed_depth" -> QueryDef(
      (s, d) => {
        val und = partGraph(s, d)
          .select(col("src").as("a"), col("dst").as("b"))
        val edges = und.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
        val seeds = und.select(col("a").as("node"))
          .unionAll(und.select(col("b").as("node")))
          .filter(col("node") % 199 === 0).distinct()
        graft.ops.Graph.bfsDepth(edges, seeds, maxDepth = 3)
          .orderBy(col("node"))
      },
      Some(s"""WITH $PartGraphPairSql, e AS MATERIALIZED (
              |  SELECT a AS src, b AS dst FROM p
              |  UNION ALL SELECT b AS src, a AS dst FROM p
              |), f0 AS MATERIALIZED (
              |  SELECT DISTINCT node FROM (
              |    SELECT a AS node FROM p UNION ALL SELECT b FROM p)
              |  WHERE node % 199 = 0
              |), ${graft.ops.Graph.bfsDepthSql(3)}
              |SELECT node, CAST(depth AS BIGINT) AS depth
              |FROM v3 ORDER BY node""".stripMargin)),

    // Local clustering coefficient over the adjacent-lineitem part graph:
    // exact integer ppm (round-half-up via integer arithmetic — no float
    // crosses the engine boundary), triangle counts from the same
    // degree-ordered compact-forward pass graph_triangles gates, so the
    // oracle replays orientation, wedge order, AND the ppm rounding.
    "graph_clustering" -> QueryDef(
      (s, d) => {
        val edges = partGraph(s, d)
        graft.ops.Graph.clusteringCoeff(edges).orderBy(col("node"))
      },
      Some(s"""WITH $PartGraphPairSql, ${graft.ops.Graph.clusteringCoeffSql}
              |SELECT node, CAST(deg AS BIGINT) AS deg, triangles, coeff_ppm
              |FROM cc ORDER BY node""".stripMargin)),

    // Common-neighbor link prediction over the same part graph: top-64
    // non-adjacent pairs by shared-neighbor count with integer-ppm
    // Jaccard. maxMiddleDeg=24 is part of the operator's definition
    // (hub middles are dropped before the wedge fan-out — the standard
    // link-prediction trade), so the oracle replays the cap exactly; the
    // (cn DESC, u, v) total order makes the LIMIT cut deterministic.
    "graph_linkpredict" -> QueryDef(
      (s, d) => {
        val edges = partGraph(s, d)
        graft.ops.Graph.linkPredict(edges, topN = 64, maxMiddleDeg = 24L)
      },
      Some(s"""WITH $PartGraphPairSql, ${graft.ops.Graph.linkPredictSql(24L)}
              |SELECT u, v, cn, CAST(deg_u AS BIGINT) AS deg_u,
              |  CAST(deg_v AS BIGINT) AS deg_v, jaccard_ppm
              |FROM lp ORDER BY cn DESC, u, v LIMIT 64""".stripMargin)),

    // Personalized PageRank: seed-restart proximity to the trusted seeds
    // (partkey % 199 = 0, same seed rule as graph_seed_depth) over the
    // part graph — where bfsDepth gives hop DISTANCE, PPR gives a graded
    // proximity SCORE with multiplicity (two paths beat one). Exact
    // integer fixed point; the oracle replays all 3 rounds bit-for-bit,
    // so dropped teleport mass or a leaked uniform restart fails the hash.
    "graph_ppr" -> QueryDef(
      (s, d) => {
        val und = partGraph(s, d)
          .select(col("src").as("a"), col("dst").as("b"))
        val edges = und.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
        val seeds = und.select(col("a").as("node"))
          .unionAll(und.select(col("b").as("node")))
          .filter(col("node") % 199 === 0).distinct()
        graft.ops.Graph.personalizedPageRank(edges, seeds, iters = 3)
          .select(col("node"), col("r").as("rank_q"))
          .orderBy(col("node"))
      },
      Some(s"""WITH $PartGraphPairSql, e AS MATERIALIZED (
              |  SELECT a AS src, b AS dst FROM p
              |  UNION ALL SELECT b AS src, a AS dst FROM p
              |), s0 AS MATERIALIZED (
              |  SELECT DISTINCT node FROM (
              |    SELECT a AS node FROM p UNION ALL SELECT b FROM p)
              |  WHERE node % 199 = 0
              |), ${graft.ops.Graph.personalizedPageRankSql(3)}
              |SELECT node, r AS rank_q FROM p3 ORDER BY node""".stripMargin)),

    // Adamic–Adar link prediction over the same part graph and cap as
    // graph_linkpredict: the hub-DISCOUNTED score — each shared middle
    // contributes floor(1e9/ln(deg)) exact integer nano-units via the
    // PortableMath wide-ln chain, so a shared rare part is worth ~3× a
    // shared popular one and the oracle replays ln, floor, sum, and the
    // (aa DESC, u, v) cut bit-for-bit.
    "graph_linkpredict_aa" -> QueryDef(
      (s, d) => {
        val edges = partGraph(s, d)
        graft.ops.Graph.linkPredictAA(edges, topN = 64, maxMiddleDeg = 24L)
      },
      Some(s"""WITH $PartGraphPairSql, ${graft.ops.Graph.linkPredictAASql(24L)}
              |SELECT u, v, cn, aa_nano
              |FROM aap ORDER BY aa_nano DESC, u, v LIMIT 64""".stripMargin)),

    // Deterministic random-walk corpus (the DeepWalk/node2vec input) over
    // the part graph: 2 walks × 4 hops from every node, each hop an
    // md5-coin(walker, step) choice over rank-ordered adjacency — the
    // training corpus is a pure function of (edges, salt), so the oracle
    // replays EVERY hop and the gate hashes the complete 20k-row corpus;
    // an RNG-seeded walker would reshuffle it on every retry.
    "graph_walks" -> QueryDef(
      (s, d) => {
        val edges = partGraph(s, d)
        graft.ops.Graph.randomWalks(edges, walksPerNode = 2, len = 4,
            salt = "walk")
          .orderBy(col("walker"), col("step"))
      },
      Some(s"""WITH $PartGraphPairSql, ${graft.ops.Graph.randomWalksSql(2, 4, "walk")}
              |SELECT walker, step, node FROM walks ORDER BY walker, step""".stripMargin),
      // headline since round 17: the hop join was r16's one scale-grade
      // weak item (residual-filter fan-out) — benching the walk corpus
      // keeps the equi-join shape's cost visible round over round
      headline = true),

    // Skip-gram pairs from the SAME deterministic walk corpus as
    // graph_walks (window 2, directional, multiplicity summed) — the
    // word2vec-style input the embedding trainer actually consumes; the
    // oracle replays walks AND pairing, so the full two-stage DeepWalk
    // data pipeline is hash-gated end to end.
    "graph_skipgrams" -> QueryDef(
      (s, d) => {
        val edges = partGraph(s, d)
        graft.ops.Graph.walkSkipGrams(
            graft.ops.Graph.randomWalks(edges, walksPerNode = 2, len = 4,
              salt = "walk"), window = 2)
          .orderBy(col("center"), col("context"))
      },
      Some(s"""WITH $PartGraphPairSql, ${graft.ops.Graph.randomWalksSql(2, 4, "walk")},
              |${graft.ops.Graph.walkSkipGramsSql(2)}
              |SELECT center, context, cnt FROM sg ORDER BY center, context""".stripMargin)),

    // PPMI features over the SAME gated skip-gram corpus (the Levy-
    // Goldberg trainer-free endpoint of the DeepWalk pipeline): exact
    // integer nano-nat scores via the four-term wide portable-ln sum
    // quantized once, positives only, top-3 contexts per center by the
    // (ppmi_qn desc, context) total order. The oracle replays walks,
    // pairing, marginals, every ln stage, the quantization, and the
    // rank cut — the whole three-stage pipeline is hash-gated end to
    // end; the rank filter's WindowGroupLimit pushdown is PlanSpec's pin.
    "graph_ppmi" -> QueryDef(
      (s, d) => {
        val edges = partGraph(s, d)
        graft.ops.Graph.walkPpmi(
            graft.ops.Graph.walkSkipGrams(
              graft.ops.Graph.randomWalks(edges, walksPerNode = 2, len = 4,
                salt = "walk"), window = 2), k = 3)
          .orderBy(col("center"), col("rank"))
      },
      Some(s"""WITH $PartGraphPairSql, ${graft.ops.Graph.randomWalksSql(2, 4, "walk")},
              |${graft.ops.Graph.walkSkipGramsSql(2)},
              |${graft.ops.Graph.walkPpmiSql(3)}
              |SELECT center, rank, context, ppmi_qn FROM ppk
              |ORDER BY center, rank""".stripMargin)),

    // node2vec-biased walks over the same part graph: hop ≥ 2 weighs
    // return/common/other moves 4:2:1 (p ≈ 1/4, q ≈ 2 in node2vec
    // terms) via deterministic integer-threshold rejection sampling on
    // the md5 coins — the oracle replays every candidate draw, weight
    // classification, and accept/reject decision across all (hop,
    // attempt) pairs, so the biased corpus is hash-gated end to end
    // exactly like graph_walks.
    "graph_walks_n2v" -> QueryDef(
      (s, d) => {
        val edges = partGraph(s, d)
        graft.ops.Graph.node2vecWalks(edges, walksPerNode = 2, len = 4,
            salt = "n2v", wReturn = 4, wCommon = 2, wOther = 1,
            maxAttempts = 2)
          .orderBy(col("walker"), col("step"))
      },
      Some(s"""WITH $PartGraphPairSql, ${graft.ops.Graph.node2vecWalksSql(2, 4, "n2v", 4, 2, 1, 2)}
              |SELECT walker, step, node FROM walks ORDER BY walker, step""".stripMargin),
      headline = true),

    // Skip-gram pairs from the BIASED walk corpus — the full node2vec
    // training input (biased walks → windowed (center, context) pairs),
    // hash-gated end to end exactly like the DeepWalk twin
    // graph_skipgrams: the oracle replays every rejection-sampled hop
    // AND the pairing.
    "graph_skipgrams_n2v" -> QueryDef(
      (s, d) => {
        val edges = partGraph(s, d)
        graft.ops.Graph.walkSkipGrams(
            graft.ops.Graph.node2vecWalks(edges, walksPerNode = 2, len = 4,
              salt = "n2v", wReturn = 4, wCommon = 2, wOther = 1,
              maxAttempts = 2), window = 2)
          .orderBy(col("center"), col("context"))
      },
      Some(s"""WITH $PartGraphPairSql, ${graft.ops.Graph.node2vecWalksSql(2, 4, "n2v", 4, 2, 1, 2)},
              |${graft.ops.Graph.walkSkipGramsSql(2)}
              |SELECT center, context, cnt FROM sg ORDER BY center, context""".stripMargin)),

    // Incremental graph-feature maintenance from the change feed: the
    // part graph's canonical pairs live in a CDF Delta table through a
    // four-version lifecycle (two appends, an edge purge, a partial
    // re-insert); a maintained degree frame folds forward from ONLY the
    // change files — inserts +1 per endpoint, deletes −1 — and the query
    // require()s the fold equals a from-scratch recompute of the final
    // edge set (the pipeline_cdf_report IVM identity, on graph state).
    // At 100 TB the daily fold reads the day's change files, never the
    // accumulated edge set. The oracle derives the final degrees
    // analytically from lineitem.
    "graph_incremental_degree" -> QueryDef(
      (s, d) => {
        val und = partGraph(s, d).select(
            least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .where(col("a") =!= col("b")).distinct()
        val dir = graft.Scratch.dir("graft-gincr") + "/edges"
        val t = graft.delta.DeltaTable.forPath(s, dir).create(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("a",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("b",
              org.apache.spark.sql.types.LongType))),
          configuration = Map(graft.delta.DeltaTable.CdfConfigKey -> "true"))
        t.append(und.filter((col("a") + col("b")) % 2 === 0))
        t.append(und.filter((col("a") + col("b")) % 2 =!= 0))
        require(t.delete(col("a") % 7 === 0) == 3L, "edge purge must commit at v3")
        t.append(und.filter(col("a") % 7 === 0 && col("b") % 3 === 0))
        // maintained state after day 2 = fold of versions 1..2 (pure
        // feed consumption — never a table read)
        val m2 = graft.ops.Graph.degreeDelta(t.changes(1L, 2L))
        // day 3–4 advances the SAME state from its change files alone
        val folded = graft.ops.Graph.applyDegreeDelta(m2,
          graft.ops.Graph.degreeDelta(t.changes(3L, 4L)))
        val direct = graft.ops.Graph.pairDegrees(t.toDF)
        requireFoldMatches(folded, direct, "degree fold")
        folded.orderBy(col("node"))
      },
      Some(s"""WITH $PartGraphPairSql, fe AS (
              |  SELECT a, b FROM p WHERE (a % 7 <> 0) OR (b % 3 = 0)
              |)
              |SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
              |  SELECT a AS node FROM fe UNION ALL SELECT b AS node FROM fe)
              |GROUP BY node ORDER BY node""".stripMargin)),

    // The triangle-count sibling of graph_incremental_degree over the
    // SAME CDF lifecycle: created triangles enumerate from each inserted
    // edge's common neighbors in the post state, destroyed from each
    // deleted edge's in the pre state, deduped by sorted triple — cost
    // ∝ changes × degree, never a full recount. The fold must equal a
    // from-scratch triangle count of the final edge set (require()d
    // in-query); the oracle reruns the exact compact-forward triangle
    // chain over the final pair set analytically.
    "graph_incremental_triangles" -> QueryDef(
      (s, d) => {
        val und = partGraph(s, d).select(
            least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .where(col("a") =!= col("b")).distinct()
        val dir = graft.Scratch.dir("graft-gincrt") + "/edges"
        val t = graft.delta.DeltaTable.forPath(s, dir).create(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("a",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("b",
              org.apache.spark.sql.types.LongType))),
          configuration = Map(graft.delta.DeltaTable.CdfConfigKey -> "true"))
        t.append(und.filter((col("a") + col("b")) % 2 === 0))
        t.append(und.filter((col("a") + col("b")) % 2 =!= 0))
        require(t.delete(col("a") % 7 === 0) == 3L, "edge purge must commit at v3")
        t.append(und.filter(col("a") % 7 === 0 && col("b") % 3 === 0))
        // day-2 state: versions 1..2 are pure appends, so their change
        // rows ARE the edge set; the maintained triangle frame seeds from
        // a one-time count over that day-2 graph
        val e2 = t.changes(1L, 2L).where(col("_change_type") === "insert")
          .select(col("a"), col("b")).localCheckpoint()
        val t2 = graft.ops.Graph.triangles(
          e2.select(col("a").as("src"), col("b").as("dst")))
        // day 3–4 advances that state from its change files alone
        val folded = graft.ops.Graph.applyTriangleDelta(t2,
          graft.ops.Graph.triangleDelta(
            e2.select(col("a").as("u"), col("b").as("v")), t.changes(3L, 4L)))
        val direct = graft.ops.Graph.triangles(
          t.toDF.select(col("a").as("src"), col("b").as("dst")))
        requireFoldMatches(folded, direct, "triangle fold")
        folded.orderBy(col("node"))
      },
      Some(s"""WITH $PartGraphPairSql, p0 AS MATERIALIZED (
              |  SELECT a, b FROM p WHERE (a % 7 <> 0) OR (b % 3 = 0)
              |), ${graft.ops.Graph.trianglesSqlOn("p0")}
              |SELECT node, triangles FROM tricnt ORDER BY node""".stripMargin)),

    // The payoff of the two IVM folds: local clustering coefficient
    // composed PURELY from the maintained degree and triangle frames —
    // both advanced from the change feed alone — with zero reads of the
    // accumulated edge set. The fold-composition must equal a
    // from-scratch clusteringCoeff of the final graph (require()d
    // in-query); the oracle reruns the full compact-forward + ppm chain
    // over the final pair set analytically.
    "graph_incremental_coeff" -> QueryDef(
      (s, d) => {
        val und = partGraph(s, d).select(
            least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .where(col("a") =!= col("b")).distinct()
        val dir = graft.Scratch.dir("graft-gincrc") + "/edges"
        val t = graft.delta.DeltaTable.forPath(s, dir).create(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("a",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("b",
              org.apache.spark.sql.types.LongType))),
          configuration = Map(graft.delta.DeltaTable.CdfConfigKey -> "true"))
        t.append(und.filter((col("a") + col("b")) % 2 === 0))
        t.append(und.filter((col("a") + col("b")) % 2 =!= 0))
        require(t.delete(col("a") % 7 === 0) == 3L, "edge purge must commit at v3")
        t.append(und.filter(col("a") % 7 === 0 && col("b") % 3 === 0))
        val G = graft.ops.Graph
        val e2 = t.changes(1L, 2L).where(col("_change_type") === "insert")
          .select(col("a"), col("b")).localCheckpoint()
        val e2uv = e2.select(col("a").as("u"), col("b").as("v"))
        val day = t.changes(3L, 4L)
        // both feature frames advance from the change files alone
        val degM = G.applyDegreeDelta(G.degreeDelta(t.changes(1L, 2L)),
          G.degreeDelta(day))
        val triM = G.applyTriangleDelta(
          G.triangles(e2.select(col("a").as("src"), col("b").as("dst"))),
          G.triangleDelta(e2uv, day))
        val folded = G.coeffFromMaintained(degM, triM)
        val direct = G.clusteringCoeff(
          t.toDF.select(col("a").as("src"), col("b").as("dst")))
        requireFoldMatches(folded, direct, "coeff composition")
        folded.orderBy(col("node"))
      },
      Some(s"""WITH $PartGraphPairSql, p0 AS MATERIALIZED (
              |  SELECT a, b FROM p WHERE (a % 7 <> 0) OR (b % 3 = 0)
              |), ${graft.ops.Graph.clusteringCoeffSqlOn("p0")}
              |SELECT node, deg, triangles, coeff_ppm FROM cc ORDER BY node""".stripMargin)),

    // graph_incremental_coeff's STREAMING end: the SAME CDF lifecycle,
    // but the degree and triangle feature tables are maintained by a
    // real Structured Streaming query over the change feed
    // (format("graft-delta"), readChangeFeed) through the foreachBatch
    // maintenance sinks — per-batch folds cost ∝ the batch, MERGEd
    // exactly-once under the (appId, batchId) txn guard, with the
    // triangle sink's BUCKETED adjacency mirror providing the pre state
    // each batch needs through partition-pruned probes (round 19: mirror
    // I/O ∝ the batch endpoints' buckets, never the full edge set). The returned coeff composes PURELY from the two maintained
    // tables (zero reads of the edge set) and must equal a from-scratch
    // clusteringCoeff of the final graph (require()d in-query,
    // distributed); the oracle is graph_incremental_coeff's, verbatim.
    "stream_graph_incremental" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.types.{LongType, StructField, StructType}
        val D = graft.delta.DeltaTable
        val und = partGraph(s, d).select(
            least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .where(col("a") =!= col("b")).distinct()
        val base = graft.Scratch.dir("graft-sgincr")
        val t = D.forPath(s, base + "/edges").create(
          StructType(Seq(StructField("a", LongType), StructField("b", LongType))),
          configuration = Map(D.CdfConfigKey -> "true"))
        t.append(und.filter((col("a") + col("b")) % 2 === 0))
        t.append(und.filter((col("a") + col("b")) % 2 =!= 0))
        require(t.delete(col("a") % 7 === 0) == 3L, "edge purge must commit at v3")
        t.append(und.filter(col("a") % 7 === 0 && col("b") % 3 === 0))
        val degT = D.forPath(s, base + "/deg").create(StructType(Seq(
          StructField("node", LongType), StructField("deg", LongType))))
        val triT = D.forPath(s, base + "/tri").create(StructType(Seq(
          StructField("node", LongType), StructField("triangles", LongType))))
        val mirror = graft.ops.Graph.createAdjacencyMirror(
          D.forPath(s, base + "/mirror"), numBuckets = 8)
        val degSink = graft.streaming.StreamingCuration.degreeMaintenanceSink(degT)
        val triSink = graft.streaming.StreamingCuration
          .triangleMaintenanceSink(triT, mirror)
        val q = s.readStream.format("graft-delta")
          .option("readChangeFeed", "true").option("startingVersion", "1")
          .load(t.path)
          .writeStream.option("checkpointLocation", base + "/ckpt")
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val b = batch.localCheckpoint()
            degSink(b, batchId); triSink(b, batchId)
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        val folded = graft.ops.Graph.coeffFromMaintained(degT.toDF, triT.toDF)
        val direct = graft.ops.Graph.clusteringCoeff(
          t.toDF.select(col("a").as("src"), col("b").as("dst")))
        requireFoldMatches(folded, direct, "streamed coeff composition")
        folded.orderBy(col("node"))
      },
      Some(s"""WITH $PartGraphPairSql, p0 AS MATERIALIZED (
              |  SELECT a, b FROM p WHERE (a % 7 <> 0) OR (b % 3 = 0)
              |), ${graft.ops.Graph.clusteringCoeffSqlOn("p0")}
              |SELECT node, deg, triangles, coeff_ppm FROM cc ORDER BY node""".stripMargin)),

    // HyperBall 2-hop neighborhood sizes over the part graph: per-node
    // ball-size ESTIMATES via register propagation — the ball relation
    // (Σ|ball| rows, quadratic on dense graphs) never materializes;
    // register rows are bounded at 64·|V| per round. The oracle replays
    // self-sketch seeding, both merge rounds, and the estimate math, and
    // the gate hashes the FULL register sketches, not just estimates.
    "graph_ball2" -> QueryDef(
      (s, d) => {
        val und = partGraph(s, d)
          .select(col("src").as("a"), col("dst").as("b"))
        val edges = und.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
        graft.ops.Graph.neighborhoodHll(edges, hops = 2, salt = "ball")
          .orderBy(col("node"))
      },
      Some(s"""WITH $PartGraphPairSql, e AS MATERIALIZED (
              |  SELECT a AS src, b AS dst FROM p
              |  UNION ALL SELECT b AS src, a AS dst FROM p
              |), ${graft.ops.Graph.neighborhoodHllSql(2, "ball")}
              |SELECT node, registers_joined,
              |  CAST(floor((CASE WHEN est_raw <= 160.0 AND zeros > 0
              |    THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE)) ELSE est_raw END)
              |    * 1000.0 + 0.5) AS BIGINT) AS est_q3
              |FROM est ORDER BY node""".stripMargin))
  )
}
