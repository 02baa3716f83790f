package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PageRank pins: Spark result ≡ an independent in-memory integer
  * reference on the same fixed-point recurrence, partition-count
  * independent, and exact on the documented dangling-mass semantics. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala twin of the Q-scaled recurrence (Long `/` truncates like
    * Spark `div` and DuckDB `//` on the all-positive domain). */
  private def ref(edges: Set[(Long, Long)], iters: Int,
                  scale: Long = Graph.RankScale): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val n = nodes.size
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(v => v -> scale / n).toMap
    for (_ <- 1 to iters) {
      val c = edges.toSeq.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => r(e._1) / deg(e._1)).sum
      }
      r = nodes.map(v =>
        v -> (15L * scale / (100L * n) + 85L * c.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
                  parts: Int = 1): Map[Long, Long] =
    Graph.pageRank(
        edges.toDF("src", "dst").repartition(parts), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // deterministic pseudo-random digraph: 40 edges over 12 nodes
  private val graph: Seq[(Long, Long)] = (0 until 40).map { i =>
    val h = graft.functions.Hashing.planTimeH64(s"g:$i")
    ((h % 12).toLong, ((h >> 8) % 12).toLong)
  }.filter(e => e._1 != e._2)

  test("pageRank equals the in-memory integer reference, any partitioning") {
    val expected = ref(graph.toSet, iters = 3)
    assert(run(graph, 3) === expected)
    assert(run(graph, 3, parts = 7) === expected,
      "Q-scaled integer ranks must not depend on partition count")
  }

  test("iteration zero is the uniform prior; symmetric edges conserve it") {
    // undirected 3-cycle: uniform is the fixed point of the recurrence
    val cyc = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 1L, 3L -> 2L, 1L -> 3L)
    val n = 3
    val uniform = Graph.RankScale / n
    assert(run(cyc, 0).values.toSet === Set(uniform))
    val r3 = run(cyc, 3)
    // each round maps u -> 15%·u/1 + 85%·u (two in-edges at u/2 each, up
    // to integer truncation) — stays within iters ulps of uniform
    assert(r3.values.forall(v => (uniform - v) <= 3 && v <= uniform),
      s"symmetric-regular graph must hold the uniform fixed point, got $r3")
  }

  test("dangling sink evaporates mass exactly as documented") {
    val e = Seq(1L -> 2L) // 2 has no out-edge
    val expected = ref(e.toSet, iters = 2)
    assert(run(e, 2) === expected)
    // and the closed form: r1(1) = base only, r1(2) = base + 85%·r0(1)
    val scale = Graph.RankScale
    val base = 15L * scale / (100L * 2)
    assert(ref(e.toSet, 1)(1L) === base)
    assert(ref(e.toSet, 1)(2L) === base + 85L * (scale / 2) / 100L)
  }

  test("bipartiteEdges is symmetric and offsets the right id space") {
    val rel = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("cust", "supp")
    val e = Graph.bipartiteEdges(rel, "cust", "supp", 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e === Set((1L, 1010L), (1L, 1011L), (2L, 1010L),
      (1010L, 1L), (1011L, 1L), (1010L, 2L)))
  }

  test("bipartiteEdges fails LOUDLY when a left id crosses into the offset space") {
    // a left id >= rightOffset would silently merge left and right nodes
    // into one (wrong ranks, no error) — the scan-stage guard must throw
    val rel = Seq((1000L, 10L), (1L, 11L)).toDF("cust", "supp")
    val ex = intercept[Exception] {
      Graph.bipartiteEdges(rel, "cust", "supp", 1000L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("id-space split")),
      s"guard must name the violation, got: ${messages(ex)}")
    // valid ids still pass through the guard untouched
    assert(Graph.bipartiteEdges(Seq((999L, 10L)).toDF("cust", "supp"),
      "cust", "supp", 1000L).count() === 2L)
  }

  /** Plain-Scala twin of synchronous LPA with the (count desc, label
    * asc) tie rule. */
  private def lpaRef(edges: Set[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    var l = nodes.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      val next = edges.toSeq.groupBy(_._2).map { case (v, es) =>
        val counts = es.map(e => l(e._1)).groupBy(identity)
          .map { case (lbl, o) => lbl -> o.size }
        v -> counts.toSeq.sortBy { case (lbl, c) => (-c, lbl) }.head._1
      }
      l = nodes.map(v => v -> next.getOrElse(v, l(v))).toMap
    }
    l
  }

  private def sym(pairs: (Long, Long)*): Set[(Long, Long)] =
    pairs.toSet.flatMap((p: (Long, Long)) => Set(p, p.swap))

  test("triangles: exact per-node counts; normalization kills dupes/loops/direction") {
    // triangle {1,2,3}; triangle {4,5,6} bridged by 3-4; K4 on {7,8,9,10}
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L),
      (7L, 8L), (7L, 9L), (7L, 10L), (8L, 9L), (8L, 10L), (9L, 10L))
    // noise: duplicates, reversed direction, self-loops
    val edges = (base ++ base.map(_.swap) ++ Seq((1L, 2L), (5L, 5L)))
      .toDF("src", "dst")
    val got = graft.ops.Graph.triangles(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 1L, 7L -> 3L, 8L -> 3L, 9L -> 3L, 10L -> 3L)
    assert(got === expected)
    // total triangles from per-node participation: each counts 3 corners
    assert(got.values.sum === 3L * (1 + 1 + 4))
    // repartitioning must not change anything (pure joins + aggregation)
    val got8 = graft.ops.Graph.triangles(edges.repartition(8))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got8 === expected)
    // the canonical-input twin (the bench recompute leg): identical
    // counts over already-canonical pairs, with and without a caller-
    // supplied degree frame (pairDegrees ≡ the internal degreesOf)
    val canon = base.toDF("u", "v")
    val gotC = graft.ops.Graph.trianglesCanonical(canon)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotC === expected)
    val gotD = graft.ops.Graph.trianglesCanonical(canon,
        Some(graft.ops.Graph.pairDegrees(canon, "u", "v")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotD === expected)
  }

  test("kCore peels cascades to the exact fixpoint; edge cases hold") {
    // a 4-clique (every node degree 3) with a pendant chain hanging off
    // it: the 3-core is exactly the clique — the chain peels in CASCADE
    // (removing the tail drops the next node under 3, round after round)
    val clique = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val chain = Seq((3L, 4L), (4L, 5L), (5L, 6L))
    val got = Graph.kCore((clique ++ chain).toDF("src", "dst"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // k above the max degree: empty core, not a crash
    assert(Graph.kCore(clique.toDF("src", "dst"), k = 4).isEmpty)
    // k=1 keeps everything (after dupe/loop/direction normalization)
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 2L), (2L, 3L))
    assert(Graph.kCore(messy.toDF("src", "dst"), k = 1)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("bfsDepth: nearest-seed depths, cap honored, unreachable absent") {
    // path 0-1-2-3-4 plus an island 9-10; seeds {0, 4}
    val e0 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
    val edges = (e0 ++ e0.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(0L, 4L).toDF("node")
    val got = Graph.bfsDepth(edges, seeds, maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 2 is 2 hops from BOTH seeds — nearest wins, no double entry
    assert(got === Map(0L -> 0L, 4L -> 0L, 1L -> 1L, 3L -> 1L, 2L -> 2L))
    // cap 1 stops the frontier; the island never appears
    assert(Graph.bfsDepth(edges, seeds, maxDepth = 1)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L, 3L, 4L))
    // depth 0 = the seed set itself
    assert(Graph.bfsDepth(edges, seeds, maxDepth = 0).count() === 2L)
  }

  test("labelPropagation ≡ in-memory synchronous reference; communities separate") {
    // two triangles bridged by one edge: labels converge within each
    // triangle to its min id; the bridge is outvoted
    val edges = sym((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val df = edges.toSeq.toDF("src", "dst")
    val got = Graph.labelPropagation(df, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === lpaRef(edges, 4))
    // community structure: each triangle is uniform after convergence
    assert(Set(got(1L), got(2L), got(3L)).size === 1)
    assert(Set(got(10L), got(11L), got(12L)).size === 1)
  }

  test("labelPropagation: synchronous updates and smallest-label ties, any partitioning") {
    // a 4-star: sync LPA oscillates center↔leaves — the deterministic
    // fixed-round answer must match the reference EXACTLY (an async or
    // in-round-leaking implementation converges instead)
    val star = sym((5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L))
    (1 to 3).foreach { rounds =>
      val got = Graph.labelPropagation(star.toSeq.toDF("src", "dst"), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === lpaRef(star, rounds), s"rounds=$rounds")
    }
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L))
    val a = Graph.labelPropagation(
      edges.toSeq.toDF("src", "dst").repartition(1), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.labelPropagation(
      edges.toSeq.toDF("src", "dst").repartition(7, col("dst")), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b && a === lpaRef(edges, 3))
  }

  /** Plain-Scala twin of the seed-restart integer recurrence. */
  private def pprRef(edges: Set[(Long, Long)], seeds: Set[Long], iters: Int,
                     scale: Long = Graph.RankScale, num: Long = 85,
                     den: Long = 100): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val s = seeds & nodes
    val d = edges.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val ns = s.size.toLong
    var r = nodes.map(v => v -> (if (s(v)) scale / ns else 0L)).toMap
    for (_ <- 1 to iters) {
      val c = edges.toSeq.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => r(e._1) / d(e._1)).sum }
      r = nodes.map(v => v ->
        ((if (s(v)) ((den - num) * scale) / (den * ns) else 0L) +
          num * c.getOrElse(v, 0L) / den)).toMap
    }
    r
  }

  test("personalizedPageRank ≡ integer reference; mass stays near seeds") {
    // path 0-1-2-3 with an island 9-10; seed {0}
    val edges = sym((0L, 1L), (1L, 2L), (2L, 3L), (9L, 10L))
    val df = edges.toSeq.toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val got = Graph.personalizedPageRank(df, seeds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === pprRef(edges, Set(0L), 3))
    // the island is unreachable from the seed: rank EXACTLY 0 (a uniform
    // teleport leak would give it mass)
    assert(got(9L) === 0L && got(10L) === 0L)
    // proximity is graded WITHIN a parity class (on a path, rank mass
    // oscillates between the bipartition halves each round — comparing
    // across parity is not meaningful at a fixed small iteration count)
    assert(got(0L) > got(2L) && got(1L) > got(3L))
    // seeds outside the graph drop (identical result), and two in-graph
    // seeds split the restart mass per the reference
    val got2 = Graph.personalizedPageRank(df, Seq(0L, 42L).toDF("node"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === got)
    val two = Graph.personalizedPageRank(df, Seq(0L, 9L).toDF("node"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two === pprRef(edges, Set(0L, 9L), 2))
    // partitioning independence (exact integers)
    val rep = Graph.personalizedPageRank(df.repartition(7), seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep === got)
    // no seed in the graph refuses loudly
    intercept[IllegalArgumentException](
      Graph.personalizedPageRank(df, Seq(42L).toDF("node"), 1))
  }

  test("coeffPpm survives super-hub magnitudes; 0-iteration oracle SQL is well-formed") {
    // deg = 3,000,000 in a half-full community: T = C(d,2)/2 ≈ 2.25e12 —
    // 4e6·T wraps int64; the 128-bit path must yield exactly 500000 ppm
    val got = Seq((3000000L, 2249998500000L), (3L, 1L), (2L, 1L), (1L, 0L))
      .toDF("deg", "triangles")
      .withColumn("coeff_ppm", Graph.coeffPpm)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(3000000L -> 500000L, 3L -> 333333L,
      2L -> 1000000L, 1L -> 0L))
    // the SQL builders' documented domain includes 0 iterations: the
    // chain must terminate at its seed CTE, not emit a dangling comma
    Seq(Graph.pageRankSql(0), Graph.personalizedPageRankSql(0),
        Graph.neighborhoodHllSql(0, "s")).foreach { sql =>
      val flat = sql.replaceAll("\\s+", " ").trim
      assert(!flat.contains(", ,") && !flat.endsWith(","), sql.takeRight(120))
    }
    // and the hops-0 HyperBall chain references b0 as its terminal
    assert(Graph.neighborhoodHllSql(0, "s").contains("FROM b0 GROUP BY node"))
  }

  test("linkPredictAA: exact nano-unit scores; rare middles outrank hubs at equal cn") {
    import graft.functions.PortableMath
    def wOf(d: Long): Long =
      math.floor(1.0e9 / (PortableMath.lnWide(d) + 32.0 * PortableMath.Ln2)).toLong
    // pair (1,2) shares ONLY middle 10 (degree 2 — rare);
    // pair (3,4) shares ONLY middle 20 (degree 12 — a hub):
    // cn ties at 1, Adamic–Adar must rank (1,2) first
    val hubLeaves = (30L to 39L).map(x => (20L, x))
    val e0 = Seq((10L, 1L), (10L, 2L), (20L, 3L), (20L, 4L)) ++ hubLeaves
    val edges = (e0 ++ e0.map(_.swap)).toDF("src", "dst")
    val rows = Graph.linkPredictAA(edges, topN = 3, maxMiddleDeg = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.head === ((1L, 2L, 1L, wOf(2L))),
      s"rare-middle pair must rank first with the exact lnWide weight, got ${rows.toSeq}")
    // the hub pair's score is the hub's discounted weight — exact too
    assert(rows.map(r => (r._1, r._2) -> r._4).toMap.get((3L, 4L)) === Some(wOf(12L)))
    assert(wOf(2L) > wOf(12L), "discount must be monotone in degree")
    // capping below the hub's degree removes hub-evidence pairs entirely
    val capped = Graph.linkPredictAA(edges, topN = 10, maxMiddleDeg = 11L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!capped.contains((3L, 4L)) && capped.contains((1L, 2L)))
    intercept[IllegalArgumentException](Graph.linkPredictAA(edges, 1, 1L))
  }

  test("randomWalks: every hop replays the md5 coin over ranked adjacency") {
    // triangle {1,2,3} + pendant 3-4: every node has >= 1 neighbor
    val e0 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val edges = (e0 ++ e0.map(_.swap) ++ Seq((2L, 1L))).toDF("src", "dst")
    val W = 2; val L = 3
    val got = Graph.randomWalks(edges, W, L, "wk")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // in-memory twin: ranked adjacency + the same h32 coins
    val adj = Map(1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L),
      3L -> Seq(1L, 2L, 4L), 4L -> Seq(3L))
    def coin(walker: Long, t: Int): Long =
      graft.functions.Hashing.planTimeH64(s"wk:$t:$walker") & 0xFFFFFFFFL
    val want = (for {
      node <- adj.keySet.toSeq; w <- 0 until W
    } yield {
      val walker = node * W + w
      var cur = node
      ((walker, 0L) -> node) +: (1 to L).map { t =>
        cur = adj(cur)((coin(walker, t) % adj(cur).size).toInt)
        (walker, t.toLong) -> cur
      }
    }).flatten.toMap
    assert(got === want)
    // every row count: |V|·W·(L+1); partitioning cannot move a step
    assert(got.size === 4 * W * (L + 1))
    val rep = Graph.randomWalks(edges.repartition(7), W, L, "wk")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rep === got)
    // each hop is a real edge
    got.foreach { case ((walker, step), node) =>
      if (step > 0) {
        val prev = got((walker, step - 1))
        assert(adj(prev).contains(node), s"hop $prev -> $node is not an edge")
      }
    }
    intercept[IllegalArgumentException](Graph.randomWalks(edges, 0, 1, "wk"))
  }

  test("node2vecWalks: biased hops replay the coin/threshold procedure exactly") {
    // triangle {1,2,3} + pendant 3-4 (same fixture as randomWalks)
    val e0 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val edges = (e0 ++ e0.map(_.swap) ++ Seq((2L, 1L))).toDF("src", "dst")
    val adj = Map(1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L),
      3L -> Seq(1L, 2L, 4L), 4L -> Seq(3L))
    val pairSet = e0.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val W = 2; val L = 4; val R = 3
    val (wr, wc, wo) = (5, 3, 1); val wMax = 5

    def h32(s: String): Long =
      graft.functions.Hashing.planTimeH64(s) & 0xFFFFFFFFL
    // in-memory twin of the WHOLE procedure: uniform hop 1, then per
    // attempt a uniform candidate + integer-threshold accept, forced at R
    val want = (for {
      node <- adj.keySet.toSeq; w <- 0 until W
    } yield {
      val walker = node * W + w
      var cur = node
      var steps = List((walker, 0L) -> node)
      var prev = -1L
      val n1 = adj(cur)((h32(s"n2:1:$walker") % adj(cur).size).toInt)
      prev = cur; cur = n1
      steps ::= (walker, 1L) -> cur
      for (t <- 2 to L) {
        var decided = false; var r = 1
        while (!decided) {
          val cand = adj(cur)((h32(s"n2:$t:$r:$walker") % adj(cur).size).toInt)
          val wgt = if (cand == prev) wr
            else if (pairSet((math.min(prev, cand), math.max(prev, cand)))) wc
            else wo
          if (r == R || h32(s"n2:$t:$r:a:$walker") % wMax < wgt) {
            prev = cur; cur = cand; decided = true
          } else r += 1
        }
        steps ::= (walker, t.toLong) -> cur
      }
      steps
    }).flatten.toMap
    val got = Graph.node2vecWalks(edges, W, L, "n2", wr, wc, wo, R)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === want)
    assert(got.size === 4 * W * (L + 1))
    // partitioning cannot move a hop
    val rep = Graph.node2vecWalks(edges.repartition(7), W, L, "n2", wr, wc, wo, R)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rep === got)
    intercept[IllegalArgumentException](
      Graph.node2vecWalks(edges, W, L, "n2", 0, 1, 1))
    intercept[IllegalArgumentException](
      Graph.node2vecWalks(edges, W, L, "n2", 1, 1, 1, maxAttempts = 0))
  }

  test("node2vecWalks: extreme p/q weights steer the corpus the node2vec way") {
    // 5-cycle: every node degree 2, so return vs forward is a fair coin
    // under uniform weights — bias is cleanly visible
    val cyc = (0L to 4L).map(i => (i, (i + 1) % 5))
    val edges = (cyc ++ cyc.map(_.swap)).toDF("src", "dst")
    def backtracks(wr: Int, wc: Int, wo: Int): Int = {
      val walks = Graph.node2vecWalks(edges, 4, 6, "pq", wr, wc, wo, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      walks.count { case ((walker, step), node) =>
        step >= 2L && walks((walker, step - 2)) == node }
    }
    // wReturn ≫ rest → the walk mostly oscillates; wReturn ≪ rest (high
    // p, the "explore" regime) → backtracks are rare. Deterministic
    // corpora, so these are exact counts, not flaky expectations.
    val ret = backtracks(1000000, 1, 1)
    val fwd = backtracks(1, 1, 1000000)
    val uni = backtracks(1, 1, 1)
    assert(ret > uni && uni > fwd,
      s"backtrack ordering must follow the bias: return=$ret uniform=$uni explore=$fwd")
    // in the extreme-return corpus, backtracking dominates outright
    val totalHops2plus = 5 * 4 * 5 // |V|·W·(len-1)
    assert(ret > totalHops2plus / 2,
      s"extreme wReturn must make oscillation the norm: $ret of $totalHops2plus")
    assert(fwd < totalHops2plus / 5,
      s"extreme wOther must suppress backtracks: $fwd of $totalHops2plus")
  }

  test("walkSkipGrams: directional windowed pairs with summed multiplicity") {
    // two hand-built walks: walker 1 = [5, 6, 7], walker 2 = [6, 5]
    val walks = Seq((1L, 0L, 5L), (1L, 1L, 6L), (1L, 2L, 7L),
      (2L, 0L, 6L), (2L, 1L, 5L)).toDF("walker", "step", "node")
    val got = Graph.walkSkipGrams(walks, window = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // window 1: walker1 gives (5,6),(6,5),(6,7),(7,6); walker2 gives
    // (6,5),(5,6) — multiplicity sums across walks, both directions kept
    assert(got === Map((5L, 6L) -> 2L, (6L, 5L) -> 2L,
      (6L, 7L) -> 1L, (7L, 6L) -> 1L))
    // window 2 adds the distance-2 pair in walker 1
    val w2 = Graph.walkSkipGrams(walks, window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(w2((5L, 7L)) === 1L && w2((7L, 5L)) === 1L)
    // a center never pairs with its own position; same-node pairs from
    // DIFFERENT positions would still count (none in this fixture)
    assert(!got.contains((5L, 5L)) && !got.contains((6L, 6L)))
    intercept[IllegalArgumentException](Graph.walkSkipGrams(walks, 0))
  }

  test("degreeDelta/applyDegreeDelta: insert, delete, and mixed batches fold exactly") {
    // maintained state: triangle 1-2-3 plus pendant 3-4
    val base = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val m0 = Graph.pairDegrees(base)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m0 === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))

    def changes(rows: Seq[(Long, Long, String)]) =
      rows.toDF("a", "b", "_change_type")

    // insert-only batch: new edge 4-5 bumps both endpoints
    val ins = Graph.applyDegreeDelta(Graph.pairDegrees(base),
        Graph.degreeDelta(changes(Seq((4L, 5L, "insert")))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ins === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 1L))

    // delete-only batch: removing 3-4 drops node 4 to zero — its ROW
    // must vanish, matching a from-scratch recompute
    val del = Graph.applyDegreeDelta(Graph.pairDegrees(base),
        Graph.degreeDelta(changes(Seq((3L, 4L, "delete")))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(del === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))

    // mixed batch: delete 1-2, insert 2-5 and 4-5 — one fold, net signs
    val mix = Graph.applyDegreeDelta(Graph.pairDegrees(base),
        Graph.degreeDelta(changes(Seq((1L, 2L, "delete"),
          (2L, 5L, "insert"), (4L, 5L, "insert")))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val recompute = Graph.pairDegrees(Seq((1L, 3L), (2L, 3L), (3L, 4L),
        (2L, 5L), (4L, 5L)).toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(mix === recompute)

    // update_pre/postimage rows carry the +-1 signs too (an edge ENDPOINT
    // rewrite arrives as pre −, post +)
    val upd = Graph.applyDegreeDelta(Graph.pairDegrees(base),
        Graph.degreeDelta(changes(Seq((3L, 4L, "update_preimage"),
          (3L, 5L, "update_postimage")))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(upd === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 5L -> 1L))

    // a corrupt feed (deleting an edge that was never inserted) folds a
    // node negative — must fail loudly, not publish wrong degrees
    val e = intercept[Exception] {
      Graph.applyDegreeDelta(Graph.pairDegrees(base),
        Graph.degreeDelta(changes(Seq((4L, 9L, "delete"))))).collect()
    }
    assert(e.getMessage.contains("negative degree"))
  }

  test("triangleDelta: created/destroyed triangles fold exactly, deduped by triple") {
    // K4 on {1,2,3,4}: 4 triangles, each node in 3
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val pre = k4.toDF("u", "v")
    def changes(rows: Seq[(Long, Long, String)]) =
      rows.toDF("a", "b", "_change_type")
    def fold(prev: Seq[(Long, Long)], ch: Seq[(Long, Long, String)]) = {
      val t0 = Graph.triangles(prev.toDF("src", "dst"))
      Graph.applyTriangleDelta(t0,
          Graph.triangleDelta(prev.toDF("u", "v"), changes(ch)))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    def direct(pairs: Seq[(Long, Long)]) =
      Graph.triangles(pairs.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // insert-only: edge 4-5 with 5-1 and 5-2 → THREE mutually-overlapping
    // new triangles sharing inserted edges — the triple dedup is live
    val ins = Seq((4L, 5L, "insert"), (1L, 5L, "insert"), (2L, 5L, "insert"))
    assert(fold(k4, ins) === direct(k4 ++ Seq((4L, 5L), (1L, 5L), (2L, 5L))))

    // delete-only: removing 1-2 kills two triangles; 3 and 4 keep one
    assert(fold(k4, Seq((1L, 2L, "delete"))) ===
      direct(k4.filterNot(_ == (1L, 2L))))

    // mixed batch: delete 1-2, insert 1-5 and 2-5 (no new triangle —
    // 5's only closing edge would have been 1-2, which died in the SAME
    // batch; the post-state adjacency must see that)
    assert(fold(k4, Seq((1L, 2L, "delete"), (1L, 5L, "insert"), (2L, 5L, "insert"))) ===
      direct(k4.filterNot(_ == (1L, 2L)) ++ Seq((1L, 5L), (2L, 5L))))

    // insert+delete of the SAME edge nets to nothing
    assert(fold(k4, Seq((1L, 2L, "delete"), (1L, 2L, "insert"))) === direct(k4))

    // double insert of one edge = corrupt feed, loud failure
    val e = intercept[Exception] {
      Graph.triangleDelta(pre, changes(Seq((1L, 5L, "insert"), (5L, 1L, "insert"))))
        .collect()
    }
    assert(e.getMessage.contains("|sign| > 1"))

    // membership corruption nets to |sign| = 1 and never goes negative —
    // only the pre-state check can catch it: deleting an edge absent
    // from pre would COUNT PHANTOM destroyed triangles (common neighbors
    // of 1 and 2 exist even though edge (1,2) doesn't, on K4 minus it)
    val preNo12 = k4.filterNot(_ == (1L, 2L)).toDF("u", "v")
    val eDel = intercept[Exception] {
      Graph.triangleDelta(preNo12, changes(Seq((1L, 2L, "delete")))).collect()
    }
    assert(eDel.getMessage.contains("absent from the pre state"))
    // inserting an edge already present would double-count created ones
    val eIns = intercept[Exception] {
      Graph.triangleDelta(pre, changes(Seq((1L, 2L, "insert")))).collect()
    }
    assert(eIns.getMessage.contains("already present in the pre state"))
  }

  test("triangleDeltaBucketed: equals the frame fold and opens ONLY the batch's buckets") {
    val B = 32
    // deterministic graph: ~300 canonical pairs over 64 nodes, so every
    // bucket holds ≥ 1 node's adjacency and most hold several
    val allPairs = (0 until 500).map { i =>
      val h = graft.functions.Hashing.planTimeH64(s"adj:$i")
      val u = h & 0x3fL; val v = (h >> 8) & 0x3fL
      (math.min(u, v), math.max(u, v))
    }.filter(p => p._1 != p._2).distinct
    val preSeq = allPairs.filterNot { case (u, v) => (u + v) % 11 == 0 }
    val preDF = preSeq.toDF("u", "v")
    val mirror = Graph.createAdjacencyMirror(
      graft.delta.DeltaTable.forPath(spark, tmpDir("adj-mirror")), B)
    assert(Graph.adjacencyBuckets(mirror) === B)
    Graph.seedAdjacencyMirror(mirror, preDF)

    // batch localized to FEW nodes (the daily-trickle shape pruning
    // exists for): deletes from pre incident to node 1, inserts absent
    // from pre incident to nodes 2 and 3
    val dels = preSeq.filter(_._1 == 1L).take(2)
    val inss = Seq((2L, 100L), (3L, 101L)).filterNot(preSeq.contains)
    assert(dels.nonEmpty && inss.nonEmpty)
    val changes =
      (dels.map { case (u, v) => (u, v, "delete") } ++
        inss.map { case (u, v) => (u, v, "insert") }).toDF("a", "b", "_change_type")

    // pruning: the probe opens exactly the files of the batch-endpoint
    // buckets — a strict subset of the mirror's files
    val endpoints = (dels ++ inss).flatMap(p => Seq(p._1, p._2)).distinct
    val bkts = endpoints.map(n => (n % B).toInt).distinct
    val opened = mirror.scanInFiles("bkt", bkts)
    assert(opened.nonEmpty && opened.size < mirror.snapshot.files.size,
      s"pruned read must skip files: ${opened.size} of ${mirror.snapshot.files.size}")

    val viaMirror = Graph.triangleDeltaBucketed(mirror, changes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaFrame = Graph.triangleDelta(preDF, changes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaMirror === viaFrame)

    // fold ≡ recompute on the post graph
    val postSeq = preSeq.filterNot(dels.contains) ++ inss
    val folded = Graph.applyTriangleDelta(
        Graph.triangles(preDF.select(col("u").as("src"), col("v").as("dst"))),
        Graph.triangleDeltaBucketed(mirror, changes))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val direct = Graph.triangles(postSeq.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(folded === direct)

    // advance: mirror pairs become the post pair set, both orientations
    // bucket-consistent; a replayed (appId, txn) advance is a no-op
    Graph.advanceAdjacencyMirror(mirror, changes,
      txnAppId = Some("adj-spec"), txnVersion = 7L)
    val mp = Graph.mirrorPairs(mirror).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mp === postSeq.toSet)
    assert(mirror.toDF.filter(col("bkt") =!= pmod(col("m"), lit(B.toLong))
      .cast("int")).isEmpty, "every mirror row must sit in m mod B")
    val v = mirror.snapshot.version
    Graph.advanceAdjacencyMirror(mirror, changes,
      txnAppId = Some("adj-spec"), txnVersion = 7L)
    assert(mirror.snapshot.version === v, "replayed advance must not commit")

    // empty-net batch: early-out, correct empty schema
    val zero = Seq((70L, 71L, "insert"), (70L, 71L, "delete"))
      .toDF("a", "b", "_change_type")
    val z = Graph.triangleDeltaBucketed(mirror, zero)
    assert(z.columns.toSeq === Seq("node", "dt") && z.isEmpty)

    // guards still fire through the pruned membership probe
    val eDel = intercept[Exception] {
      Graph.triangleDeltaBucketed(mirror,
        Seq((1L, 999L, "delete")).toDF("a", "b", "_change_type")).collect()
    }
    assert(eDel.getMessage.contains("absent from the pre state"))

    // a plain table is not a mirror — loud refusal, not silent bucket-0
    val plain = graft.delta.DeltaTable.forPath(spark, tmpDir("adj-plain"))
      .create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bkt",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("m",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType))))
    val eNot = intercept[IllegalArgumentException] {
      Graph.adjacencyBuckets(plain)
    }
    assert(eNot.getMessage.contains("not an adjacency mirror"))
  }

  test("coeffFromMaintained: composed IVM frames equal clusteringCoeff exactly") {
    // K4 plus pendant 4-5: node 5 has deg 1 (coeff 0 by the <2 rule),
    // 4 has deg 4 with 3 triangles, 1..3 have deg 3 with 3 triangles
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    val asEdges = edges.toDF("src", "dst")
    val direct = Graph.clusteringCoeff(asEdges).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val composed = Graph.coeffFromMaintained(
        Graph.pairDegrees(edges.toDF("a", "b")),
        Graph.triangles(asEdges)
          .select(org.apache.spark.sql.functions.col("node"),
            org.apache.spark.sql.functions.col("triangles")))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(composed === direct)
    // the zero-triangle pendant surfaces with coeff 0, not absence
    assert(composed(5L) === ((1L, 0L, 0L)))
  }

  test("modularity: two K4s hand-computed; bridge edge and zero-internal community") {
    // two disjoint K4 cliques, perfectly labeled: m = 12, 2m = 24; each
    // community has in_c = 2·6 = 12, tot_c = 12, so q_num = 24·12 − 12²
    // = 144 per community and Q = (144+144)/24² = 0.5 — the textbook
    // value for a two-clique partition
    val k4a = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val k4b = k4a.map { case (u, v) => (u + 10L, v + 10L) }
    val edges = (k4a ++ k4b).toDF("src", "dst")
    val labels = ((1L to 4L).map((_, 1L)) ++ (11L to 14L).map((_, 2L)))
      .toDF("node", "lbl")
    val q = Graph.modularity(edges, labels).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(q === Map(1L -> ((4L, 12L, 12L, 144L)), 2L -> ((4L, 12L, 12L, 144L))))

    // a cross-community bridge edge: 2m = 26, community tot rises by 1
    // on each side, in_c unchanged — q_num = 26·12 − 13² = 143
    val bridged = (k4a ++ k4b :+ (4L, 11L)).toDF("src", "dst")
    val qb = Graph.modularity(bridged, labels).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(qb === Map(1L -> 143L, 2L -> 143L))

    // a community with ZERO internal edges (each node labeled alone on
    // one K4) still surfaces, with q_num = −tot² — the random-graph
    // penalty with no density to offset it
    val loners = ((1L to 4L).map(n => (n, n)) ++ (11L to 14L).map((_, 20L)))
      .toDF("node", "lbl")
    val ql = Graph.modularity(edges, loners).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(4)))).toMap
    assert(ql(1L) === ((0L, -9L)) && ql(4L) === ((0L, -9L)),
      s"loner communities must surface with internal_x2 = 0: $ql")
    assert(ql(20L) === ((12L, 24L * 12L - 144L)))
  }

  test("node2vecWalksSql: well-formed at len = 1 and mirrors the operator's domain") {
    // len = 1 unrolls ZERO biased hops — the chain must still parse (the
    // 0-iteration SQL well-formedness class): no dangling comma between
    // the w1 CTE and the walks terminal
    val sql = Graph.node2vecWalksSql(2, 1, "n2", 5, 3, 1, 3)
    assert(!sql.contains(", ,") && !sql.contains(",,"), sql)
    assert(sql.contains("w1 AS MATERIALIZED") && sql.contains("walks AS"))
    assert(!sql.contains("c2_1"), "len=1 must unroll no attempt CTEs")
    // the SQL builder refuses exactly what the operator refuses — a
    // silently-accepted parameter would emit an oracle with no operator
    intercept[IllegalArgumentException](Graph.node2vecWalksSql(0, 1, "n2", 1, 1, 1))
    intercept[IllegalArgumentException](Graph.node2vecWalksSql(2, 0, "n2", 1, 1, 1))
    intercept[IllegalArgumentException](Graph.node2vecWalksSql(2, 1, "n2", 0, 1, 1))
    intercept[IllegalArgumentException](
      Graph.node2vecWalksSql(2, 1, "n2", 1, 1, 1, maxAttempts = 0))
  }

  test("neighborhoodHll: propagated registers EQUAL the sketch of the exact ball") {
    // path 0-1-2-3-4 plus an island 9-10; symmetric edges
    val e0 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
    val symE = e0 ++ e0.map(_.swap)
    val edges = symE.toDF("src", "dst")
    val got = Graph.neighborhoodHll(edges, hops = 2, salt = "nb")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // exact 2-hop balls via in-memory BFS, sketched explicitly: the
    // propagation must reproduce hllDistinct of the materialized ball
    // REGISTER-FOR-REGISTER (the HyperBall identity), not just the
    // estimate
    val adj = symE.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def ball(v: Long): Set[Long] = {
      val one = adj(v) + v
      one ++ one.flatMap(u => adj.getOrElse(u, Set.empty[Long]))
    }
    val ballDf = adj.keySet.toSeq
      .flatMap(v => ball(v).toSeq.map(m => (v, m))).toDF("node", "member")
    val want = Sketches.hllDistinct(ballDf, "node", col("member"), "nb")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got === want)
    // the island's 2-hop ball is the island: its sketch has exactly 2
    // present registers (distinct node hashes), and the path's middle
    // node reaches all 5
    assert(got(9L)._1.split(",").count(_ != "0") <= 2)
    // hops = 0 is the self-sketch (est ≈ 1 for every node)
    val h0 = Graph.neighborhoodHll(edges, hops = 0, salt = "nb")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(h0.values.forall(_.split(",").count(_ != "0") === 1))
    intercept[IllegalArgumentException](Graph.neighborhoodHll(edges, -1, "nb"))
  }

  test("clusteringCoeff: exact ppm, zero-triangle and deg<2 nodes present") {
    // K4 on {7..10} (coeff 1), triangle {1,2,3} with 3 bridged to 4
    // (node 3: deg 3, one triangle → 1/3), pendant 4-5 (deg-1 nodes)
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (7L, 8L), (7L, 9L), (7L, 10L), (8L, 9L), (8L, 10L), (9L, 10L))
    val edges = (base ++ base.map(_.swap) ++ Seq((1L, 2L), (5L, 5L)))
      .toDF("src", "dst")
    val got = Graph.clusteringCoeff(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // node 1: deg 2, 1 triangle → 2·1/(2·1) = 1.0
    assert(got(1L) === ((2L, 1L, 1000000L)))
    // node 3: deg 3 (1,2,4), 1 triangle → 1/3, round-half-up ppm
    assert(got(3L) === ((3L, 1L, 333333L)))
    // node 4: deg 2 (3,5), zero triangles — PRESENT with coeff 0
    assert(got(4L) === ((2L, 0L, 0L)))
    // node 5: deg 1 → denominator guard, coeff 0
    assert(got(5L) === ((1L, 0L, 0L)))
    // K4 members: deg 3, 3 triangles, coeff exactly 1
    Seq(7L, 8L, 9L, 10L).foreach(n => assert(got(n) === ((3L, 3L, 1000000L))))
    assert(got.size === 9)
  }

  test("linkPredict: non-adjacent top pairs, hub-middle cap, TakeOrdered ranking") {
    // triangle {1,2,3} + edges 2-4, 3-4: the ONLY non-adjacent pair is
    // (1,4), sharing neighbors {2,3} → cn=2, jaccard 2/(2+2-2) = 1.0
    val e0 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val edges = (e0 ++ e0.map(_.swap)).toDF("src", "dst")
    val rows = Graph.linkPredict(edges, topN = 10, maxMiddleDeg = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.toSeq === Seq((1L, 4L, 2L, 2L, 2L, 1000000L)))
    // add hub 99 adjacent to everything plus pendants 5, 6 (hub deg 6 >
    // honest middles' deg 4): it manufactures co-neighbor evidence for
    // every pair — capping middle degree at 4 removes ONLY the hub's
    // wedges, restoring the single honest pair (pendant pairs like (5,6)
    // share only the hub, so they vanish with it)
    val hub = (1L to 6L).map(n => (n, 99L))
    val withHub = (e0 ++ hub ++ (e0 ++ hub).map(_.swap)).toDF("src", "dst")
    val capped = Graph.linkPredict(withHub, topN = 20, maxMiddleDeg = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(capped.toSeq === Seq((1L, 4L, 2L)),
      s"hub wedges must be dropped by the cap, got ${capped.toSeq}")
    // uncapped, the hub inflates (1,4) to cn=3 via middle 99
    val un = Graph.linkPredict(withHub, topN = 20, maxMiddleDeg = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(un((1L, 4L)) === 3L)
    // ranking is a distributed partial top-k, never a global sort
    val plan = Graph.linkPredict(edges, topN = 5, maxMiddleDeg = 100L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    // bad params refuse loudly
    intercept[IllegalArgumentException](Graph.linkPredict(edges, 0, 1L))
  }
}
