package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph}

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find — the independent oracle. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("matches union-find on a mixed component graph") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1),          // triangle
      (10, 11), (11, 12),              // path
      (20, 21),                        // pair
      (30, 30),                        // self-loop only -> dropped
      (40, 41), (41, 40), (40, 41))    // duplicates both directions
    val got = ccOf(edges)
    val want = unionFind(edges.filter(e => e._1 != e._2))
    assert(got === want)
    assert(got(3) === 1L && got(12) === 10L && got(41) === 40L)
    assert(!got.contains(30L)) // isolated after self-loop drop
  }

  test("adversarial 1000-node chain converges (log rounds, not diameter)") {
    // a single path 0-1-2-...-999: naive min-label propagation needs
    // ~1000 rounds; star alternation must finish well inside maxIter=50
    val edges = (0L until 999L).map(i => (i, i + 1))
    val got = ccOf(edges)
    assert(got.size === 1000)
    assert(got.values.toSet === Set(0L))
  }

  test("random graphs match union-find (deterministic seeds)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 200
      val edges = Seq.fill(300)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(ccOf(edges) === unionFind(edges), s"seed $seed")
    }
  }

  test("empty and single-edge inputs") {
    assert(ccOf(Nil) === Map.empty)
    assert(ccOf(Seq((7L, 3L))) === Map(7L -> 3L, 3L -> 3L))
  }

  test("componentsFor assigns isolated nodes to themselves") {
    val nodes = (1L to 6L).toDF("id")
    val pairs = Seq((1L, 2L), (4L, 5L)).toDF("src", "dst")
    val got = Graph.componentsFor(nodes, "id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L,
      4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("clusters the corpus near-dup pairs transitively") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.7)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val pairList = pairs.as[(Long, Long)].collect().toSeq
    val got = Graph.componentsFor(docs, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    val uf = unionFind(pairList)
    // every edge-incident doc matches union-find; the rest are singletons
    uf.foreach { case (n, c) => assert(got(n) === c) }
    val isolated = got.keySet -- uf.keySet
    isolated.foreach(n => assert(got(n) === n))
    assert(got.size === docs.count())
  }

  test("pageRankInt: exact hand-computed masses on a 3-node star") {
    // undirected star centered at 1: edges both directions
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    def masses(iters: Int): Map[Long, Long] =
      Graph.pageRankInt(edges, iterations = iters)
        .as[(Long, Long)].collect().toMap
    // iter 1: center gets 850000 from each leaf + 150000 base;
    // each leaf gets (1000000*85) div (100*2) = 425000 + base
    assert(masses(1) === Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L))
    // iter 2: leaves (1850000*85) div 200 = 786250 + base = 936250;
    // center 2*((575000*85) div 100) = 2*488750 + base = 1127500
    assert(masses(2) === Map(1L -> 1127500L, 2L -> 936250L, 3L -> 936250L))
  }

  test("pageRankIntWithRounds: exact-fixed-point early stop, same answer") {
    // symmetric 2-cycle: round 1 reproduces the initial masses exactly
    // (150000 + (1000000*85) div 100 = 1000000) -> fixed point at round 1
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val (ranks, rounds) = Graph.pageRankIntWithRounds(cyc, iterations = 10)
    assert(rounds === 1, "stops at the first exact fixed point, not the cap")
    assert(ranks.as[(Long, Long)].collect().toMap
      === Map(1L -> 1000000L, 2L -> 1000000L))
    // early stop never changes the answer: cap-10 converged == fixed 10
    val star = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val (capped, r2) = Graph.pageRankIntWithRounds(star, iterations = 10)
    assert(r2 <= 10)
    assert(capped.as[(Long, Long)].collect().toMap
      === Graph.pageRankInt(star, 10).as[(Long, Long)].collect().toMap)
  }

  test("pageRankInt redistributeDangling: hand-computed sink redistribution") {
    // directed 1 -> 2: node 2 is a sink. N = 2, base = 150000.
    // r1: D=1e6, share=(1e6*85) div 200=425000; contrib(2)=850000
    //     -> m(1)=575000, m(2)=1425000
    // r2: D=1425000, share=605625; contrib(2)=(575000*85) div 100=488750
    //     -> m(1)=755625, m(2)=1244375
    val e = Seq((1L, 2L)).toDF("src", "dst")
    def m(iters: Int): Map[Long, Long] =
      Graph.pageRankInt(e, iterations = iters, redistributeDangling = true)
        .as[(Long, Long)].collect().toMap
    assert(m(1) === Map(1L -> 575000L, 2L -> 1425000L))
    assert(m(2) === Map(1L -> 755625L, 2L -> 1244375L))
    // without redistribution the sink's mass is simply lost from node 1
    assert(Graph.pageRankInt(e, 1).as[(Long, Long)].collect().toMap
      === Map(1L -> 150000L, 2L -> 1000000L))
  }

  test("pageRankInt: determinism under repartitioning, mass bound, hub rank") {
    // two components: a 4-leaf star (hub 10) and a 2-cycle (20, 21)
    val base = Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L),
      (20L, 21L))
    val edges = (base ++ base.map(_.swap)).toDF("src", "dst")
    val r1 = Graph.pageRankInt(edges, 10).as[(Long, Long)].collect().toMap
    val r2 = Graph.pageRankInt(edges.repartition(13), 10)
      .as[(Long, Long)].collect().toMap
    assert(r1 === r2, "mass must not depend on partition layout")
    // floor truncation only ever loses mass
    assert(r1.values.sum <= 7L * 1000000L)
    // the hub outranks every leaf; the symmetric 2-cycle stays at scale
    assert((11L to 14L).forall(l => r1(10L) > r1(l)))
    assert(r1(20L) === 1000000L && r1(21L) === 1000000L)
  }

  test("triangleStats: known shapes — K4, chain, star, duplicate edges") {
    def stats(pairs: Seq[(Long, Long)]) =
      Graph.triangleStats(pairs.toDF("src", "dst"))
        .as[(Long, Long, Long, Long)].collect().head
    // complete graph on 4 nodes: C(4,3) = 4 triangles, each counted once
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(stats(k4) === ((4L, 6L, 3L, 4L)))
    // chain has wedges but no closures
    assert(stats(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === ((4L, 3L, 2L, 0L)))
    // star: hub degree n-1, zero triangles (the last-reducer shape)
    assert(stats((2L to 9L).map(8L * 8 -> _)) === ((9L, 8L, 8L, 0L)))
    // duplicate + reversed + self-loop edges collapse before counting
    assert(stats(Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L),
      (2L, 2L))) === ((3L, 3L, 2L, 1L)))
  }

  test("componentSizeHistogram: pairs collapse, singletons counted at size 1") {
    val nodes = (1L to 6L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val got = Graph.componentSizeHistogram(nodes, "id", pairs)
      .as[(Long, Long)].collect().toMap
    // {1,2,3} size 3, {4,5} size 2, {6} singleton
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  /** Reference synchronous min-tie LPA, driver-side. */
  private def lpaBrute(
      edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iterations) {
      labels = adj.map { case (n, nbrs) =>
        val votes = nbrs.groupBy(labels).view.mapValues(_.size)
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  test("labelPropagation: equals the synchronous reference; separates bridged cliques") {
    // two 4-cliques joined by one bridge edge: one CC component, but LPA
    // must keep the cliques in different communities
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(11L, 12L, 13L, 14L)) ++ Seq((4L, 11L))
    val got = Graph.labelPropagation(edges.toDF("src", "dst"), iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === lpaBrute(edges, 5))
    val left = Set(1L, 2L, 3L).map(got)
    val right = Set(12L, 13L, 14L).map(got)
    assert(left.size === 1 && right.size === 1 && left != right)
    // single CC component for contrast
    assert(Graph.connectedComponents(edges.toDF("src", "dst"))
      .select("component").distinct().count() === 1L)
  }

  test("labelPropagation: reference equality on a pseudo-random graph, partition-invariant") {
    val edges = (for (a <- 1L to 30L; b <- (a + 1) to 30L
      if (a * 31 + b * 17) % 7 == 0) yield (a, b)).toSeq
    val df = edges.toDF("src", "dst")
    val got = Graph.labelPropagation(df, iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === lpaBrute(edges, 4))
    val repart = Graph.labelPropagation(df.repartition(9), iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(repart === got)
  }

  test("labelPropagationWithRounds: fixed-point early stop, cap-unrolled answer") {
    // K4 reaches its label fixed point in 3 rounds (1→2 then all→1 then
    // stable); the early stop must return the same table as any larger
    // cap's unrolled recurrence, and report < cap rounds
    val edges = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val (df, rounds) = Graph.labelPropagationWithRounds(
      edges.toDF("src", "dst"), iterations = 10)
    val got = df.as[(Long, Long)].collect().toMap
    assert(got === lpaBrute(edges, 10))
    assert(rounds < 10, s"fixed point must stop early, ran $rounds rounds")
    assert(rounds === 3)
  }

  test("labelPropagationWithRounds: 2-cycle detection returns the cap-parity phase") {
    // a single edge oscillates with period 2 under synchronous LPA:
    // L0={1→1,2→2}, L1={1→2,2→1}, L2=L0, … — the stop rule must detect
    // the cycle at round 2 and hand back the phase the cap would reach
    val edges = Seq((1L, 2L))
    for (cap <- 0 to 6) {
      val (df, rounds) = Graph.labelPropagationWithRounds(
        edges.toDF("src", "dst"), iterations = cap)
      val got = df.as[(Long, Long)].collect().toMap
      assert(got === lpaBrute(edges, cap), s"cap=$cap parity phase wrong")
      assert(rounds === math.min(cap, 2), s"cap=$cap ran $rounds rounds")
    }
  }

  test("labelPropagationWithRounds: 2-cycle on a bipartite path, every cap parity") {
    // P4 (path 1-2-3-4) also oscillates; check all cap parities against
    // the driver-side reference
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    for (cap <- 2 to 7) {
      val got = Graph.labelPropagation(edges.toDF("src", "dst"),
        iterations = cap).as[(Long, Long)].collect().toMap
      assert(got === lpaBrute(edges, cap), s"cap=$cap")
    }
  }

  test("triangleStatsSampled: sampleDenom=1 degenerates to the exact census") {
    val edges = (for (a <- 1L to 30L; b <- (a + 1) to 30L
      if (a * 13 + b * 29) % 5 < 2) yield (a, b)).toSeq
    val df = edges.toDF("src", "dst")
    val exact = Graph.triangleStats(df)
      .as[(Long, Long, Long, Long)].collect().head
    val s = Graph.triangleStatsSampled(df, sampleDenom = 1)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(s._1 === exact._2) // n_edges
    assert(s._3 === exact._2) // every edge kept
    assert(s._4 === exact._4) // sampled count == exact count
    assert(s._5 === exact._4) // estimate == exact at p=1
  }

  test("triangleStatsSampled: hash coin replayed driver-side; estimate = count·denom³") {
    val edges = (for (a <- 1L to 40L; b <- (a + 1) to 40L
      if (a * 7919 + b * 104729) % 11 < 3) yield (a, b)).toSeq
    // replay the md5-top-16-bit coin exactly
    def keep(u: Long, v: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u:$v".getBytes("UTF-8"))
      val top16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      top16 % 4 == 0
    }
    val kept = edges.filter { case (a, b) => keep(a, b) }
    val adj = kept.toSet
    def conn(x: Long, y: Long) = adj.contains((x min y, x max y))
    val nodes = kept.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val brute = (for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if conn(i, j) && conn(j, k) && conn(i, k)
    } yield 1).size.toLong
    val got = Graph.triangleStatsSampled(edges.toDF("src", "dst"),
      sampleDenom = 4)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got._1 === edges.size.toLong, "full edge count")
    assert(got._2 === 4L, "denom recorded")
    assert(got._3 === kept.size.toLong, "hash coin must match the replay")
    assert(got._4 === brute, "sampled census must be exact on the sample")
    assert(got._5 === brute * 64L, "estimate = count·denom³")
  }

  test("triangleStatsSampled: random graphs × denominators match the driver replay") {
    def keep(u: Long, v: Long, denom: Int): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u:$v".getBytes("UTF-8"))
      val top16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      top16 % denom == 0
    }
    for (seed <- Seq(3L, 17L); denom <- Seq(2, 16)) {
      val edges = (for (a <- 1L to 25L; b <- (a + 1) to 25L
        if (a * seed * 101 + b * 379) % 7 < 3) yield (a, b)).toSeq
      val kept = edges.filter { case (a, b) => keep(a, b, denom) }
      val adj = kept.toSet
      val nodes = kept.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val brute = (for {
        i <- nodes; j <- nodes if j > i; m <- nodes if m > j
        if adj((i, j)) && adj((j, m)) && adj((i, m))
      } yield 1).size.toLong
      val got = Graph.triangleStatsSampled(edges.toDF("src", "dst"),
        sampleDenom = denom)
        .as[(Long, Long, Long, Long, Long)].collect().head
      assert(got._3 === kept.size.toLong, s"seed=$seed denom=$denom edges")
      assert(got._4 === brute, s"seed=$seed denom=$denom count")
      assert(got._5 === brute * denom.toLong * denom * denom,
        s"seed=$seed denom=$denom estimate")
    }
  }

  test("triangleStatsSampled: rejects a denom that does not divide 2^16") {
    val df = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.triangleStatsSampled(df, sampleDenom = 3)
    }
  }

  test("triangleStatsSampled: empty and self-loop-only inputs yield a zero row") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val e = Graph.triangleStatsSampled(empty, sampleDenom = 4)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(e === ((0L, 4L, 0L, 0L, 0L)))
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")
    val l = Graph.triangleStatsSampled(loops, sampleDenom = 4)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(l === ((0L, 4L, 0L, 0L, 0L)))
  }

  test("triangleStats: equals brute-force enumeration on a pseudo-random graph") {
    // deterministic pseudo-random graph on 40 nodes
    val edges = (for (a <- 1L to 40L; b <- (a + 1) to 40L
      if (a * 7919 + b * 104729) % 11 < 2) yield (a, b)).toSeq
    val adj = edges.toSet
    def connected(x: Long, y: Long) =
      adj.contains((x min y, x max y))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val brute = (for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if connected(i, j) && connected(j, k) && connected(i, k)
    } yield 1).size
    val got = Graph.triangleStats(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(got._2 === edges.size.toLong)
    assert(got._4 === brute.toLong)
  }

  /** Driver-side reference peel for the k-core tests. */
  private def bruteKCore(
      edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var e = edges.map(p => (p._1 min p._2, p._1 max p._2)).distinct
    var changed = true
    while (changed) {
      val deg = e.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = e.filter(p => keep(p._1) && keep(p._2))
      changed = next.size != e.size
      e = next
    }
    e.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  test("kCore: pendant chain peels away, triangle survives as the 2-core") {
    // triangle 1-2-3 with a chain 3-4-5 hanging off: 2-core = triangle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val (core, rounds) = Graph.kCoreWithRounds(edges.toDF("src", "dst"), 2)
    assert(core.as[(Long, Long)].collect().toSeq ===
      Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    assert(rounds === 3, "peel 5, then 4, then fixed point")
    // 3-core is empty (triangle degrees are 2)
    assert(Graph.kCore(edges.toDF("src", "dst"), 3).count() === 0L)
  }

  test("kCore: random graphs match the driver-side peel") {
    for (seed <- Seq(5L, 23L); k <- Seq(2, 3)) {
      val edges = (for (a <- 1L to 30L; b <- (a + 1) to 30L
        if (a * seed * 131 + b * 577) % 11 < 2) yield (a, b)).toSeq
      val expect = bruteKCore(edges, k)
      val got = Graph.kCore(edges.toDF("src", "dst"), k)
        .as[(Long, Long)].collect().toMap
      assert(got === expect.map { case (n, d) => n -> d.toLong },
        s"seed=$seed k=$k")
    }
  }

  test("commonNeighborScores: counts, ppm Jaccard, is_edge flag") {
    // square 1-2-3-4 (cycle): opposite corners share 2 neighbors and are
    // NOT edges; adjacent corners share 0 → below minCommon
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val r = Graph.commonNeighborScores(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    // jaccard = 2/(2+2-2) = 1 → 1000000 ppm
    assert(r === Seq(
      (1L, 3L, 2L, 2L, 2L, 1000000L, false),
      (2L, 4L, 2L, 2L, 2L, 1000000L, false)))
    // add the diagonal 1-3: now it IS an edge and degrees shift
    val r2 = Graph.commonNeighborScores(
      (edges :+ (1L, 3L)).toDF("src", "dst"), minCommon = 2)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(r2.exists { case (a, b, _, _, _, _, isE) =>
      a == 1L && b == 3L && isE })
  }
}
