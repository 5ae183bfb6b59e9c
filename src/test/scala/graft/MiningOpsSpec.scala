package graft

import org.apache.spark.sql.functions._
import graft.mining.MiningOps

/** Boundary behavior of the mining family (fm1/km1/pr1) that the oracle
  * hash gates can't isolate: known-value association rules on planted
  * baskets, k-means recovery of well-separated clusters plus the
  * empty-cluster guard, and PageRank's ranking axioms on hand-built
  * graphs (star center dominates, symmetric nodes tie exactly).
  */
class MiningOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- fm1 association rules --------------------------------------------

  test("fm1: support/confidence/lift exact on planted baskets") {
    // 10 baskets; {a,b} together in 4, a alone in 2 more, b alone in 1,
    // {c,d} in 1, filler singles keep n_baskets at 10.
    val rows = Seq(
      1 -> "a", 1 -> "b", 2 -> "a", 2 -> "b", 3 -> "a", 3 -> "b",
      4 -> "a", 4 -> "b", 5 -> "a", 6 -> "a", 7 -> "b",
      8 -> "c", 8 -> "d", 9 -> "e", 10 -> "f")
    val baskets = rows.toDF("bid", "item")
    val out = MiningOps.associationRules(baskets, "bid", "item",
      minSupPct = 20).collect()
    // only {a,b} reaches 20% support (4/10); {c,d} is 10%
    assert(out.length == 2)
    val ab = out.find(r => r.getAs[String]("antecedent") == "a").get
    assert(ab.getAs[Long]("pair_cnt") == 4L)
    assert(ab.getAs[Long]("ante_cnt") == 6L)
    assert(ab.getAs[Long]("cons_cnt") == 5L)
    // confidence a→b = 4/6; lift = (4/6)·(10/5) = 4/3
    assert(math.abs(ab.getAs[Double]("confidence") - 0.666667) < 1e-9)
    assert(math.abs(ab.getAs[Double]("lift") - 1.333333) < 1e-9)
    val ba = out.find(r => r.getAs[String]("antecedent") == "b").get
    assert(ba.getAs[Double]("confidence") == 0.8) // 4/5
  }

  test("fm1: duplicate lines in one basket don't inflate counts") {
    val baskets = Seq(1 -> "a", 1 -> "a", 1 -> "b", 2 -> "a", 2 -> "b")
      .toDF("bid", "item")
    val out = MiningOps.associationRules(baskets, "bid", "item",
      minSupPct = 50).collect()
    assert(out.forall(_.getAs[Long]("pair_cnt") == 2L))
  }

  // ---- km1 k-means -------------------------------------------------------

  test("km1: three well-separated blobs are recovered exactly") {
    // 3 tight blobs far apart; seeds at ranked terciles land one per blob
    val pts = (1 to 30).map { i =>
      val blob = (i - 1) / 10
      (i.toLong, blob * 1000L + (i % 5).toLong, blob * 1000L + (i % 3).toLong)
    }.toDF("id", "x", "y")
    val out = MiningOps.kmeans(pts, iters = 3).collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("n_points")).toSeq == Seq(10L, 10L, 10L))
    // cluster means sit inside their blob's 0..1004 band
    val means = out.map(r => r.getAs[Double]("mean_x")).sorted
    assert(means(0) < 10 && means(1) > 990 && means(1) < 1010 &&
      means(2) > 1990)
  }

  test("km1: identical points collapse to one cluster without erroring") {
    // all seeds coincide → clusters 2/3 go empty and stay empty (the
    // null-centroid guard must treat them as infinitely far, not NPE)
    val pts = (1 to 12).map(i => (i.toLong, 7L, 9L)).toDF("id", "x", "y")
    val out = MiningOps.kmeans(pts, iters = 2).collect()
    assert(out.length == 1 && out.head.getAs[Int]("cl") == 1)
    assert(out.head.getAs[Long]("n_points") == 12L)
  }

  test("km1: registered plan holds no partition-less WindowExec") {
    // the round-6 verdict's last scale cliff: seeding ran row_number over
    // a global Window.orderBy. Seeds now come from Ranks.distributedRank
    // (band-parallel, prefix-sum via triangular self-join), so NO window
    // in the whole executed plan may have an empty partition spec.
    val bad = PlanChecks.partitionlessWindows(
      SparkEntry.queries("km1_kmeans")(spark, Sf001))
    assert(bad.isEmpty,
      s"partition-less WindowExec in km1 plan:\n${bad.mkString("\n")}")
  }

  test("km1: clusters stay non-empty on the real part table (both SFs)") {
    for (d <- Seq(Sf0001, Sf001)) {
      val pts = Tables.part(spark, d).select(
        col("p_partkey").as("id"), col("p_size").cast("long").as("x"),
        round(col("p_retailprice") * 100).cast("long").as("y"))
      val out = MiningOps.kmeans(pts, iters = 3).collect()
      assert(out.length == 3, s"empty cluster at $d")
      assert(out.map(_.getAs[Long]("n_points")).sum ==
        Tables.part(spark, d).count())
    }
  }

  // ---- pr1 PageRank ------------------------------------------------------

  test("pr1: star center outranks leaves; symmetric leaves tie exactly") {
    val edges = (1L to 8L).map(i => (0L, i)).toDF("src", "dst")
    val out = MiningOps.pageRank(edges, iters = 3).collect()
    val center = out.find(_.getAs[Long]("node") == 0L).get
      .getAs[Long]("rank_scaled")
    val leaves = out.filter(_.getAs[Long]("node") != 0L)
      .map(_.getAs[Long]("rank_scaled"))
    assert(leaves.length == 8)
    assert(center > leaves.max * 2)
    // exact integer arithmetic ⇒ symmetric nodes tie BIT-exactly
    assert(leaves.distinct.length == 1)
  }

  test("pr1: path-graph middle node outranks the endpoints") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = MiningOps.pageRank(edges, iters = 3).collect()
    def rank(n: Long) = out.find(_.getAs[Long]("node") == n).get
      .getAs[Long]("rank_scaled")
    assert(rank(2L) > rank(1L) && rank(1L) == rank(3L))
  }

  // ---- od1 outliers ------------------------------------------------------

  test("od1: planted extreme value is the only outlier; constant group has none") {
    // group a: 20 values at 100 ± 1 plus one at 10000 — only the spike
    // exceeds 3σ; group b: all identical (variance 0, dev 0 → 0 > 0 is
    // false, so NO outliers — the degenerate case must not flag rows)
    val rows = (1 to 20).map(i => ("a", 100L + (i % 2))) ++
      Seq(("a", 10000L)) ++ (1 to 10).map(_ => ("b", 55L))
    val o = rows.toDF("grp", "xl")
      .select(col("grp"), col("xl").cast("decimal(20,0)").as("x"))
    val out = MiningOps.outliers3Sigma(o).collect()
    val a = out.find(_.getString(0) == "a").get
    val b = out.find(_.getString(0) == "b").get
    assert(a.getAs[Long]("n_rows") == 21L &&
      a.getAs[Long]("n_outliers") == 1L)
    assert(b.getAs[Long]("n_outliers") == 0L)
  }

  test("pr2: directed graph with sinks conserves total mass (dangling " +
      "redistribution) and the source still holds rank") {
    // directed star 0→{1..8}: every leaf is a pure sink. Without the
    // dangling correction 8/9 of the mass vanishes per damped step; with
    // it the total stays within the integer-flooring budget.
    val edges = (1L to 8L).map(i => (0L, i)).toDF("src", "dst")
    val out = MiningOps.pageRank(edges, iters = 3, directed = true).collect()
    assert(out.length == 9)
    val total = out.map(_.getAs[Long]("rank_scaled")).sum
    val scale = 1000000000000L
    // per iteration: ≤1 unit per edge (r div d), ≤1 per node (dang div n),
    // ≤1 per node (div 100) — comfortably inside 100 units × 9 nodes × 3
    assert(total <= scale && total > scale - 9 * 100 * 3,
      s"mass not conserved: $total vs $scale")
    // node 0 has no in-edges: its rank is teleport + dangling share only,
    // strictly positive and below the leaves (which receive 0's mass)
    val r0 = out.find(_.getAs[Long]("node") == 0L).get.getAs[Long]("rank_scaled")
    val leaves = out.filter(_.getAs[Long]("node") != 0L)
      .map(_.getAs[Long]("rank_scaled"))
    assert(r0 > 0 && leaves.forall(_ > r0))
    assert(leaves.distinct.length == 1) // symmetric sinks tie bit-exactly
  }

  test("pr1: total mass stays within the flooring budget") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L))
      .toDF("src", "dst")
    val out = MiningOps.pageRank(edges, iters = 3).collect()
    val total = out.map(_.getAs[Long]("rank_scaled")).sum
    val scale = 1000000000000L
    // each node loses < 2 units per iteration to integer flooring
    assert(total <= scale && total > scale - 4 * 3 * 100)
  }

  // ---- pr3 triangle counting --------------------------------------------

  test("pr3: K4 puts every node in exactly 3 triangles") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("u", "v")
    val out = MiningOps.triangleCount(edges).collect()
    assert(out.length == 4)
    out.foreach(r => assert(r.getAs[Long]("triangles") == 3L))
  }

  test("pr3: paths and stars are triangle-free") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    assert(MiningOps.triangleCount(path).collect().isEmpty)
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("u", "v")
    assert(MiningOps.triangleCount(star).collect().isEmpty)
  }

  test("pr3: reversed duplicates and self-loops normalize away") {
    import spark.implicits._
    val noisy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (1L, 3L), (2L, 2L)).toDF("u", "v")
    val out = MiningOps.triangleCount(noisy).collect()
    assert(out.length == 3)
    out.foreach(r => assert(r.getAs[Long]("triangles") == 1L))
  }

  test("pr4: 3-core of a clique plus pendant chain is exactly the clique") {
    import spark.implicits._
    // K4 on {1,2,3,4} with a chain 4-5-6 hanging off: peeling removes 6
    // (deg 1), then 5 (deg 1 after 6 drops) — the 3-core is the clique,
    // every member at in-core degree 3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u", "v")
    val out = MiningOps.kcore(edges, 3, 10).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg_core")).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("pr4: below-k graphs peel to empty; a cycle IS its own 2-core") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    assert(MiningOps.kcore(path, 2, 10).collect().isEmpty)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("u", "v")
    val out = MiningOps.kcore(cycle, 2, 10).collect()
    assert(out.length === 3)
    out.foreach(r => assert(r.getAs[Long]("deg_core") === 2L))
  }

  test("pr4: the fixed unroll reaches the true fixpoint on the real " +
      "co-purchase graph (both SFs)") {
    // the registered function runs exactly KcoreRounds peels; this pins
    // that one more round changes nothing, i.e. the unroll IS the k-core
    for (d <- Seq(Sf0001, Sf001)) {
      val edges = MiningOps.coPurchaseEdges(spark, d)
        .localCheckpoint(true)
      def m(rounds: Int) =
        MiningOps.kcore(edges, MiningOps.KcoreK, rounds).collect()
          .map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg_core"))
          .toMap
      val atUnroll = m(MiningOps.KcoreRounds)
      assert(atUnroll === m(MiningOps.KcoreRounds + 1),
        s"peel not at fixpoint after ${MiningOps.KcoreRounds} rounds in $d")
      assert(atUnroll.nonEmpty, s"3-core empty in $d")
    }
  }

  test("pr6: path-graph BFS settles exact hop distances; nodes past the " +
      "round bound stay absent; a two-path node takes the MIN distance") {
    import spark.implicits._
    // path 1-2-3-4-5-6-7 seeded at {1}: dist = hops; 6 and 7 sit past
    // the 4-round horizon and must be ABSENT (partial function, no
    // sentinel)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L)).toDF("u", "v")
    val seed1 = Seq(1L).toDF("node")
    val got = MiningOps.multiSourceBfs(path, seed1, 4).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // diamond 1-2-4, 1-3-4 plus tail 4-5, seeded at {1}: node 4 is
    // reached through BOTH paths in the same round exactly once (the
    // distinct+anti-join), and multi-seed {1,5} pulls 4 to dist 1
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val gotD = MiningOps.multiSourceBfs(diamond, seed1, 4).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    assert(gotD === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
    val gotM = MiningOps.multiSourceBfs(diamond,
        Seq(1L, 5L).toDF("node"), 4).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    assert(gotM === Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("km4: two planted lattice blobs cluster separately, corners demote " +
      "to borders, isolated points are noise (absent)") {
    import spark.implicits._
    // two 3×3 unit lattices far apart + two isolated noise points;
    // eps²=2 (lattice-adjacent incl. diagonals), minDeg=5 → cores are
    // each blob's center (deg 8) + edge midpoints (deg 5); corners
    // (deg 3) border them; noise has no core neighbour and must be ABSENT
    def blob(ox: Long, oy: Long, base: Long) =
      for (i <- 0L to 2L; j <- 0L to 2L)
        yield (base + i * 3 + j, ox + i, oy + j)
    val pts = (blob(0, 0, 0) ++ blob(100, 100, 100) ++
      Seq((900L, 50L, 50L), (901L, 200L, 0L))).toDF("id", "x", "y")
    val got = MiningOps.dbscan(pts, eps2Override = Some(2L),
        minDegOverride = Some(5L)).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("cluster"), r.getAs[String]("role")))).toMap
    // blob A ids 0..8 at (i,j): corners 0,2,6,8; edges 1,3,5,7; center 4
    val coresA = Set(1L, 3L, 4L, 5L, 7L)
    val coresB = coresA.map(_ + 100L)
    assert(got.keySet === (0L to 8L).toSet ++ (100L to 108L).toSet,
      "exactly the blob members are clustered; noise absent")
    for (c <- coresA) assert(got(c) === ((1L, "core")), s"core $c")
    for (c <- coresB) assert(got(c) === ((101L, "core")), s"core $c")
    for (b <- Seq(0L, 2L, 6L, 8L)) assert(got(b) === ((1L, "border")))
    for (b <- Seq(100L, 102L, 106L, 108L)) assert(got(b) === ((101L, "border")))
  }

  test("km4: the pair join is cell-keyed — no cartesian or nested-loop " +
      "join anywhere in the plan") {
    import spark.implicits._
    val pts = (0L until 200L).map(i => (i, i % 20, i / 20)).toDF("id", "x", "y")
    val plan = MiningOps.dbscan(pts, eps2Override = Some(2L),
      minDegOverride = Some(3L)).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay an equi-join on grid cells:\n$plan")
  }

  test("km4: the registered clustering is non-degenerate — plural clusters " +
      "at the gated SF, real borders and noise everywhere") {
    // at sf0.001 (200 points) the fixed-occupancy ε legitimately spans
    // the domain and the cores fuse to ONE cluster — the density
    // structure only exists from sf0.01 up (measured 4 / 51 clusters),
    // which is where the driver's hash gate runs
    for ((d, minClusters) <- Seq(Sf0001 -> 1, Sf001 -> 2)) {
      val rows = Registry.all.toMap.apply("km4_dbscan").fn(spark, d)
        .collect()
      val n = Tables.part(spark, d).count()
      val clusters = rows.map(_.getAs[Long]("cluster")).distinct.length
      assert(clusters >= minClusters, s"$d: only $clusters cluster(s)")
      assert(rows.exists(_.getAs[String]("role") == "border"), s"$d borders")
      assert(rows.length < n, s"$d: no noise — every point clustered")
    }
  }

  test("pr3: wheel graph — hub rides every rim triangle despite max degree") {
    import spark.implicits._
    // hub 0 joined to the 5-cycle 1-2-3-4-5: triangles are exactly the
    // (hub, rim-edge) fans; degree orientation points every rim node AT
    // the hub, so the hub enumerates zero wedges itself (the
    // last-reducer property under test).
    val rim = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    val spokes = (1L to 5L).map(i => (0L, i))
    val out = MiningOps.triangleCount((rim ++ spokes).toDF("u", "v"))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("triangles"))
      .toMap
    assert(out(0L) == 5L)
    (1L to 5L).foreach(i => assert(out(i) == 2L))
  }

  test("pr5: triangle converges to min label; isolated edge oscillates " +
      "back to self-labels under the even fixed unroll") {
    import spark.implicits._
    // Hand-folded synchronous LPA (min tie-break), 4 rounds: the
    // triangle {1,2,3} reaches label 1 by round 3 and stays; the
    // isolated edge {5,6} is bipartite so sync LPA swaps labels each
    // round — after an EVEN unroll each node is back at its own label.
    // Both behaviors are the deterministic contract the oracle replays.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L)).toDF("u", "v")
    val out = MiningOps.labelPropagation(edges, MiningOps.LpaRounds)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("community"))
      .toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 6L))
  }

  test("pr5: real-corpus communities are plural and non-degenerate") {
    // the support-2 backbone must neither collapse to one community nor
    // stay fully shattered (every node its own label) after the unroll
    val out = MiningOps.labelPropagation(
      MiningOps.coPurchaseEdges(spark, Sf001), MiningOps.LpaRounds)
      .groupBy(col("community")).count().collect()
    val n = out.map(_.getAs[Long]("count")).sum
    assert(out.length > 1, "LPA collapsed to a single community")
    assert(out.length < n, "LPA left every node in its own community")
    assert(out.map(_.getAs[Long]("count")).max > 1, "no community grew")
  }

  test("od3: MAD flags the planted tail cluster that masks itself from " +
      "3σ; constant groups stay outlier-free") {
    import spark.implicits._
    // 20×100 + 5×100000: the five extremes inflate σ to ~39950, so
    // |100000−μ| ≈ 79920 < 3σ ≈ 119850 — od1's 3σ rule flags NOTHING
    // (the classic masking failure). The median stays 100 and MAD 0, so
    // Hampel's rule flags exactly the five.
    val contaminated = (Seq.fill(20)(100L) ++ Seq.fill(5)(100000L))
      .map(("g", _)).toDF("grp", "x")
    val mad = MiningOps.outliersMad(contaminated).collect().head
    assert(mad.getAs[Long]("n_outliers") === 5L)
    val sigma = MiningOps.outliers3Sigma(contaminated
        .select(col("grp"), col("x").cast("decimal(20,0)").as("x")))
      .collect().head
    assert(sigma.getAs[Long]("n_outliers") === 0L,
      "3σ was expected to be masked on this plant")
    val const = MiningOps.outliersMad(
      Seq.fill(10)(("c", 7L)).toDF("grp", "x")).collect().head
    assert(const.getAs[Long]("n_outliers") === 0L)
    assert(const.getAs[Long]("mad_cents") === 0L)
  }

  test("fm5: PrefixSpan counts gapped subsequences once per user and " +
      "honors the prefix window") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(u: Long, i: Int, t: String) =
      (u, new Timestamp(i * 1000L), i.toLong, t)
    // user 1: a x b  → <a,b> present WITH A GAP; <a,b> must count once
    // even though b also follows x. user 2: b a → no <a,b>.
    // user 3: a a b → <a,b> still counts ONCE (per-sequence support).
    // 7th event of user 1 is outside the 5-prefix → 'z' never appears.
    val events = (Seq(ev(1, 1, "a"), ev(1, 2, "x"), ev(1, 3, "b"),
        ev(1, 4, "x"), ev(1, 5, "x"), ev(1, 6, "z")) ++
      Seq(ev(2, 1, "b"), ev(2, 2, "a")) ++
      Seq(ev(3, 1, "a"), ev(3, 2, "a"), ev(3, 3, "b")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = MiningOps.prefixPatterns(events, minSupport = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("a|b") === 2L) // users 1 and 3, once each
    assert(out("a") === 3L && out("b") === 3L)
    assert(!out.contains("z"), "6th event leaked past the 5-prefix")
    assert(!out.contains("b|a|b"), "minSupport 0.5 of 3 users = 2; " +
      "b|a|b appears only in user 2... and shouldn't exist at all")
    assert(out.contains("a|a|b") === false) // only user 3 has it (1 < 2)
  }

  test("fm4-shape: frequent itemsets are downward closed on planted " +
      "baskets (the lattice contract fm4's oracle enumerates)") {
    import spark.implicits._
    // baskets {a,b} ×2, {a,c} ×1, minSupport 0.5 on 3 baskets → minc 2:
    // singletons a(3) b(2) survive, c(1) drops; pair ab(2) survives and
    // both its subsets are present (downward closure).
    val baskets = Seq(
      (1L, Seq("a", "b")), (2L, Seq("a", "b")), (3L, Seq("a", "c")))
      .toDF("bid", "items")
    val fi = new org.apache.spark.ml.fpm.FPGrowth()
      .setItemsCol("items").setMinSupport(0.5).fit(baskets)
      .freqItemsets.collect()
      .map(r => r.getSeq[String](0).sorted.mkString("|") ->
        r.getAs[Long]("freq")).toMap
    assert(fi == Map("a" -> 3L, "b" -> 2L, "a|b" -> 2L))
  }
}
