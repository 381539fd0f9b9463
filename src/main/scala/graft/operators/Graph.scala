package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (minhash/simhash/ngram/embedding candidates, Dedup.scala) into
  * duplicate CLUSTERS with one representative per cluster. The reference
  * has no graph operators (SURVEY.md §2D); this is part of the mandated
  * training-data-pipeline surface: real corpus dedup keeps one doc per
  * connected component of the near-dup graph, not one per pair.
  *
  * Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * published shuffle-native CC algorithm:
  *
  *   large-star(u): connect every neighbor LARGER than u to the minimum
  *     of u's neighborhood (including u);
  *   small-star(u): connect every neighbor ≤ u (and u itself) to that
  *     minimum.
  *
  * Both phases are a groupBy-u + per-group min + re-emit — pure shuffle
  * operators with no driver-side graph state. The edge set monotonically
  * flattens into stars rooted at each component's minimum node in
  * O(log n) rounds (the paper's bound — vs O(diameter) for naive label
  * propagation, which a 1000-node chain defeats; the spec includes
  * exactly that adversarial chain).
  *
  * 100 TB posture:
  *   - per-round cost: one groupBy shuffle on node id per phase; edge
  *     rows only (node-id pairs, ~16 bytes) ever shuffle — never
  *     payloads. Join the output back to the corpus to pick survivors.
  *   - per-group memory: collect_set(neighbors) — bounded by current
  *     degree. Large-star halves high degrees every round (each larger
  *     neighbor re-points to m), so hubs shrink geometrically instead of
  *     accumulating; this is the paper's skew argument.
  *   - each round materializes via localCheckpoint to truncate lineage
  *     (iterative plans otherwise grow exponentially in the optimizer).
  *     On a cluster with dynamic executors use `spark.sparkContext
  *     .setCheckpointDir` + `.checkpoint()` instead — same contract,
  *     fault-tolerant storage; localCheckpoint is the single-JVM twin.
  *   - convergence test is a 2-scalar aggregate (count + order-free
  *     xxhash64 sum) per round — O(edges) scan, O(1) driver bytes.
  */
object Graph {

  /** Components of the undirected graph given by `pairs` (two columns:
    * src, dst; self-loops and duplicates tolerated; null endpoints
    * dropped). Returns (node, component) for every node incident to at
    * least one real edge, component = MINIMUM node id in the component
    * (the deterministic survivor policy used across Dedup). Nodes with
    * no edges are absent — they are their own component; callers
    * left-join + coalesce (see `componentsFor`).
    */
  def connectedComponents(
      pairs: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIter: Int = 50): DataFrame =
    connectedComponentsWithRounds(pairs, srcCol, dstCol, maxIter)._1

  /** Same, also returning rounds-to-convergence — the measurable form of
    * the O(log n) claim (ScaleCheck records it at 10×/20×).
    */
  def connectedComponentsWithRounds(
      pairs: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIter: Int = 50): (DataFrame, Int) = {

    // canonical initial edge set: (u = larger, v = smaller), the
    // orientation both star phases preserve
    val e0 = pairs
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(
        greatest(col(srcCol), col(dstCol)).as("u"),
        least(col(srcCol), col(dstCol)).as("v"))
      .distinct()

    // order-free edge-set fingerprint; decimal(38) sum cannot overflow
    // under ANSI (2^63 hashes × 2^63 magnitude < 10^38)
    def checksumExprs = Seq(
      count(lit(1)).as("n"),
      sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("h"))
    // per-round fingerprint read off the SAME job that materializes the
    // round's checkpoint (Dataset.observe — the checkpoint action flows
    // every row through the metrics collector anyway), replacing the
    // former separate checksum scan per round: one job and one pass
    // over e fewer per round, identical (count, hash-sum) values
    // (guide §1.2 "don't compute things you throw away")
    def checkpointWithChecksum(df: DataFrame): (DataFrame, (Long, BigDecimal)) = {
      val obs = org.apache.spark.sql.Observation()
      val pinned = df.observe(obs, checksumExprs.head, checksumExprs.tail: _*)
        .localCheckpoint(true)
      val m = obs.get
      val h = m("h")
      (pinned, (m("n").asInstanceOf[Long],
        if (h == null) BigDecimal(0)
        else BigDecimal(h.asInstanceOf[java.math.BigDecimal])))
    }

    // large-star: symmetrize so every node sees its full neighborhood;
    // for each u with min m = least(u, min(nbrs)): emit (x, m) for every
    // neighbor x > u. Output keeps first-column-larger (x > u >= m).
    def largeStar(edges: DataFrame): DataFrame = {
      val sym = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      sym.groupBy(col("u"))
        .agg(collect_set(col("v")).as("nbrs"))
        .select(
          col("u"),
          least(col("u"), array_min(col("nbrs"))).as("m"),
          col("nbrs"))
        .select(explode(filter(col("nbrs"), x => x > col("u"))).as("u2"),
          col("m"))
        .select(col("u2").as("u"), col("m").as("v"))
        .distinct()
    }

    // small-star: edges already point larger→smaller, so u's neighbor
    // list IS its ≤-u neighborhood and m = min(nbrs) (< u). Re-point
    // every non-min neighbor and u itself at m.
    def smallStar(edges: DataFrame): DataFrame = {
      edges.groupBy(col("u"))
        .agg(collect_set(col("v")).as("nbrs"))
        .select(col("u"), array_min(col("nbrs")).as("m"), col("nbrs"))
        .select(
          explode(
            array_union(
              filter(col("nbrs"), x => x =!= col("m")),
              array(col("u")))).as("x"),
          col("m"))
        .select(col("x").as("u"), col("m").as("v"))
        .distinct()
    }

    var (e, prev) = checkpointWithChecksum(e0)
    var converged = prev._1 == 0L
    var it = 0
    while (!converged && it < maxIter) {
      val (pinned, cur) = checkpointWithChecksum(smallStar(largeStar(e)))
      e = pinned
      converged = cur == prev
      prev = cur
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")

    // converged edge set = stars (node, root); roots map to themselves
    (e.select(col("u").as("node"), col("v").as("component"))
      .union(e.select(col("v").as("node"), col("v").as("component")))
      .distinct(), it)
  }

  /** Component id for EVERY row of `nodes` (one column `nodeCol`):
    * edge-incident nodes get their component minimum, isolated nodes get
    * themselves. The standard corpus-side wrapper (narrow left join —
    * the CC output is tiny relative to the corpus).
    */
  def componentsFor(
      nodes: DataFrame,
      nodeCol: String,
      pairs: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
      .withColumnRenamed("node", nodeCol)
    nodes.select(col(nodeCol))
      .join(cc, Seq(nodeCol), "left")
      .select(col(nodeCol),
        coalesce(col("component"), col(nodeCol)).as("component"))
  }

  /** Duplicate-cluster size histogram — the AUDIT face of
    * [[componentsFor]]: how many near-dup clusters exist at each size
    * (singletons included). The first thing to read after a dedup pass:
    * a fat tail of large clusters means template/mirror content (or a
    * too-loose threshold); all-singletons means the threshold found
    * nothing. Returns `(cluster_size, n_clusters)`.
    *
    * 100 TB shape: CC's own cost plus one component-keyed count and one
    * size-keyed count — both map-side-combined aggregates over (id,
    * long) rows; the histogram output is at most max-cluster-size rows.
    */
  def componentSizeHistogram(
      nodes: DataFrame,
      nodeCol: String,
      pairs: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame =
    componentsFor(nodes, nodeCol, pairs, srcCol, dstCol)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))

  /** Synchronous label-propagation communities (Raghavan et al. 2007's
    * LPA in its deterministic synchronous form): every node starts
    * labeled with its own id; each round, every node simultaneously
    * adopts the most frequent label among its neighbors (ties → lowest
    * label), for exactly `iterations` rounds. Communities = the label
    * partition after the last round.
    *
    * Where [[connectedComponents]] answers "what is REACHABLE", LPA
    * answers "what is DENSELY connected" — near-dup graphs bridged by a
    * single boilerplate doc form one component but distinct communities,
    * and that distinction is what decides whether to collapse or keep.
    *
    * Determinism contract (the same trade as [[pageRankInt]]): the
    * asynchronous/randomized LPA of the paper converges faster but is
    * run-order-dependent; the synchronous min-tie form is a pure
    * function of the edge set, so a fixed-round oracle replays it
    * exactly. Synchronous LPA can oscillate on bipartite structure —
    * the CONVERGENCE stop below makes even that exact.
    *
    * Convergence stop (the [[pageRankIntWithRounds]] contract): the
    * round map is deterministic on integer label tables, so the loop
    * stops at the first exact FIXED POINT (labels unchanged — persists
    * under the map, so the answer equals the cap-unrolled oracle's) or
    * the first detected 2-CYCLE (labels equal to two rounds back —
    * from there labels alternate between the last two tables, so the
    * cap-round table is picked by remaining-round PARITY), capped at
    * `iterations`. Both tests are node-sized joins on exactly-comparable
    * longs; early stop changes wall-time, never the answer — the oracle
    * unrolls the recurrence to the cap and matches bit-for-bit.
    *
    * 100 TB shape: per round ONE src-keyed join (labels ⋈ symmetrized
    * edges, co-partitioning reused round to round) + one (dst, label)
    * map-side-combined count + one dst-keyed struct-max argmax — only
    * (node, label, count) longs shuffle; lineage truncated per round
    * like every iterative operator here. Both stop tests compare
    * label-table FINGERPRINTS (count + order-free xxhash64 sum — the
    * [[connectedComponents]] checksum idiom; table equality ⟺
    * fingerprint equality on the constant node set, modulo the same
    * hash-sum collision class CC accepts) observed on each round's own
    * checkpoint job — zero probe joins, zero extra jobs per round.
    */
  def labelPropagation(
      pairs: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iterations: Int = 5): DataFrame =
    labelPropagationWithRounds(pairs, srcCol, dstCol, iterations)._1

  /** [[labelPropagation]] plus the number of rounds actually executed
    * (== `iterations` when the cap hit before a fixed point / 2-cycle).
    */
  def labelPropagationWithRounds(
      pairs: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iterations: Int = 5): (DataFrame, Int) = {
    require(iterations >= 0)
    val e0 = pairs
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val edges = e0.select(col("u").as("src"), col("v").as("dst"))
      .union(e0.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(true)
    // label-table fingerprint (count, order-free Σ xxhash64(node,
    // label)) — the [[connectedComponentsWithRounds]] checksum idiom
    // applied to the LPA stop tests (r18): the node set is CONSTANT
    // across rounds, so table equality ⟺ fingerprint equality (up to
    // the same 2⁻⁶⁴-class hash-sum collision CC's stop already
    // accepts), and the probe needs NO join back onto the previous
    // rounds' tables — the pre-r18 shape paid two node-keyed joins
    // (two exchanges) inside every round's materialization for an
    // exact mismatch count it only compared with zero. Decimal(38)
    // sum cannot overflow under ANSI (2^63 hashes × 2^63 magnitude
    // < 10^38). Values ride the round's own checkpoint job
    // (Dataset.observe — no separate probe job, as everywhere in r18).
    def fpExprs = Seq(
      count(lit(1)).as("n"),
      sum(xxhash64(col("node"), col("label")).cast("decimal(38,0)"))
        .as("h"))
    def readFp(m: Map[String, Any]): (Long, BigDecimal) =
      (m("n").asInstanceOf[Long], m("h") match {
        case null => BigDecimal(0)
        case d: java.math.BigDecimal => BigDecimal(d)
      })
    val obs0 = org.apache.spark.sql.Observation()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .observe(obs0, fpExprs.head, fpExprs.tail: _*)
      .localCheckpoint(true)
    var curFp = readFp(obs0.get)
    var prevFp: (Long, BigDecimal) = null // two rounds back, 2-cycle test
    var rounds = 0
    var done = false
    while (!done && rounds < iterations) {
      // argmax by (count, -label): lexicographic struct max takes the
      // highest count, then the LOWEST label — matching the oracle's
      // row_number() ORDER BY cnt DESC, label
      val nextPlan = edges
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("dst").as("node"), (-col("m.nl")).as("label"))
      if (rounds + 1 == iterations) {
        // final round: EVERY stop path would hand back `next` (fixed
        // point → next; 2-cycle with 0 rounds remaining → even parity →
        // next; no stop → next), so the probe is skipped
        labels = nextPlan.localCheckpoint(true)
        rounds += 1
        done = true
      } else {
        val obs = org.apache.spark.sql.Observation()
        val next = nextPlan.observe(obs, fpExprs.head, fpExprs.tail: _*)
          .localCheckpoint(true)
        val nextFp = readFp(obs.get)
        rounds += 1
        if (nextFp == curFp) {
          // fixed point: every later round is identical — cap-equal
          labels = next
          done = true
        } else if (prevFp != null && nextFp == prevFp) {
          // 2-cycle: from round `rounds` labels alternate (next, labels,
          // next, …), so the cap-round table is next iff the remaining
          // round count is even — parity picks the oracle-equal phase
          val remaining = iterations - rounds
          labels = if (remaining % 2 == 0) next else labels
          done = true
        } else {
          prevFp = curFp
          curFp = nextFp
          labels = next
        }
      }
    }
    (labels.select(col("node"), col("label").as("community"))
      .orderBy(col("node")), rounds)
  }

  /** Triangle census of the undirected graph given by `pairs` — the
    * clustering-coefficient numerator, the standard cohesion/anomaly
    * signal over derived graphs (co-occurrence graphs, near-dup graphs:
    * triangle-rich components are genuine communities, triangle-free hubs
    * are template/boilerplate artifacts).
    *
    * Algorithm: DEGREE ORIENTATION (the shuffle-native standard, e.g.
    * Suri & Vassilvitskii WWW'11 "Counting triangles and the curse of the
    * last reducer"): orient every edge from its lower-(degree, id)
    * endpoint to the higher; count wedges at each source and close them
    * against the oriented edge set. Each triangle {a,b,c}, ranked
    * a < b < c by (degree, id), is counted exactly once — as the wedge
    * (b, c) at a closed by the oriented edge b→c.
    *
    * Why orientation matters at scale: out-degree under degree
    * orientation is O(√m) for ANY graph, so the wedge join's per-key
    * fan-out — the "last reducer" that kills naive per-node wedge
    * counting on a power-law hub — is bounded; the wedge and closure
    * steps are plain equi-joins shuffling (node, node, long) rows only.
    *
    * Returns one summary row `(n_nodes, n_edges, max_degree,
    * n_triangles)` — all exact integers.
    */
  /** Canonical (u < v) distinct undirected edge set of a pair list. */
  private def canonicalEdges(
      pairs: DataFrame, srcCol: String, dstCol: String): DataFrame =
    pairs
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()

  /** Shared degree-orientation core of [[triangleStats]] and
    * [[triangleStatsSampled]]: degrees plus the 1-row exact triangle
    * count of a MATERIALIZED canonical edge set (both callers checkpoint
    * `e` first — it feeds degrees and both join sides).
    */
  private def orientedTriangleCount(e: DataFrame): (DataFrame, DataFrame) = {
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("deg"))
    // rank = (degree, id) lexicographic — a total order (ids unique)
    val lt = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val oriented = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(lt, col("u")).otherwise(col("v")).as("src"),
        when(lt, col("v")).otherwise(col("u")).as("dst"),
        when(lt, col("dv")).otherwise(col("du")).as("ddst"))
      .localCheckpoint(true) // wedge build reads it twice, closure once
    val wedges = oriented
      .select(col("src"), col("dst").as("w1"), col("ddst").as("d1"))
      .join(oriented.select(col("src"), col("dst").as("w2"),
        col("ddst").as("d2")), "src")
      .filter(struct(col("d1"), col("w1")) < struct(col("d2"), col("w2")))
    val tri = wedges
      .join(oriented.select(col("src").as("w1"), col("dst").as("w2")),
        Seq("w1", "w2"))
      .agg(count(lit(1)).as("n_triangles"))
    (deg, tri)
  }

  def triangleStats(
      pairs: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = canonicalEdges(pairs, srcCol, dstCol)
      .localCheckpoint(true) // consumed by degrees + both sides below
    val (deg, tri) = orientedTriangleCount(e)
    val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
      max(col("deg")).as("max_degree"))
    val edgeStats = e.agg(count(lit(1)).as("n_edges"))
    nodeStats.crossJoin(broadcast(edgeStats)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("max_degree"),
        col("n_triangles"))
  }

  /** DOULION-style edge-sampled triangle ESTIMATE (Tsourakakis et al.,
    * KDD'09 "DOULION: counting triangles in massive graphs with a
    * coin"): keep each edge with probability p = 1/`sampleDenom`, count
    * triangles exactly on the sparsified graph, scale by 1/p³. A
    * triangle survives iff all three edges survive (probability p³), so
    * the estimator is unbiased; the paper bounds its variance, and cost
    * shrinks superlinearly — the wedge join, the Ω-floor of any exact
    * census, runs on a graph with ~p·m edges (~p²·wedges).
    *
    * The coin is a HASH, not a RNG: an edge survives iff the top 16 bits
    * of md5("u:v") ≡ 0 (mod sampleDenom) — a pure function of the
    * canonical edge, so the sample (and therefore the whole estimate) is
    * deterministic, partition-invariant, and replayable by the DuckDB
    * oracle digit for digit. `sampleDenom` must divide 2¹⁶ so the
    * residue classes partition the 16-bit hash space exactly (no modulo
    * bias); p is then exactly 1/sampleDenom over the hash space.
    *
    * Returns one row `(n_edges, sample_denom, n_edges_sampled,
    * n_triangles_sampled, est_triangles)` — est = sampled · denom³, all
    * exact long arithmetic (overflow needs count · denom³ > 2⁶³; at the
    * default denom=4 that is 1.4·10¹⁷ sampled triangles).
    *
    * This is the FULL-GRAPH affordability path next to [[triangleStats]]
    * (which is exact but wedge-bound): run the estimate on the whole
    * graph, the exact census on a slice — ScaleCheck carries both
    * receipts.
    */
  def triangleStatsSampled(
      pairs: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      sampleDenom: Int = 4): DataFrame = {
    require(sampleDenom >= 1 && 65536 % sampleDenom == 0,
      s"sampleDenom must divide 2^16 for an exact residue partition, got $sampleDenom")
    val eFull = canonicalEdges(pairs, srcCol, dstCol)
      .localCheckpoint(true) // read by the full count + the sample filter
    // deterministic coin: top 16 bits of md5 of the canonical edge key
    val coin = conv(
      substring(md5(concat(col("u").cast("string"), lit(":"),
        col("v").cast("string")).cast("binary")), 1, 4), 16, 10)
      .cast("long") % sampleDenom
    val e = eFull.filter(coin === 0).localCheckpoint(true)
    val (_, tri) = orientedTriangleCount(e)
    val denomCubed = sampleDenom.toLong * sampleDenom * sampleDenom
    val fullEdges = eFull.agg(count(lit(1)).as("n_edges"))
    val sampledEdges = e.agg(count(lit(1)).as("n_edges_sampled"))
    fullEdges.crossJoin(broadcast(sampledEdges)).crossJoin(broadcast(tri))
      .select(col("n_edges"), lit(sampleDenom.toLong).as("sample_denom"),
        col("n_edges_sampled"),
        col("n_triangles").as("n_triangles_sampled"),
        (col("n_triangles") * denomCubed).as("est_triangles"))
  }

  /** k-core of the undirected graph: the (unique) maximal subgraph in
    * which every node has degree ≥ k — the standard density filter over
    * derived graphs (a near-dup cluster's 2-core separates genuine
    * mutual-duplicate mass from spokes hanging off one boilerplate hub;
    * co-occurrence cores isolate the stable vocabulary/entity nucleus).
    *
    * Algorithm: iterative PEEL (Matula & Beck 1983, the textbook
    * fixed-point form): repeatedly delete every node of current degree
    * < k until none remains. The peel is MONOTONE — the edge set only
    * shrinks — so the fixed point is exact, order-free, and equals the
    * k-core regardless of how deletions are batched; the synchronous
    * batched rounds here are therefore oracle-replayable (DuckDB unrolls
    * the same rounds; once the fixed point is reached every further
    * unrolled round is the identity, so any cap ≥ rounds-to-convergence
    * hash-matches — monotonicity means there is no 2-cycle parity case,
    * unlike [[labelPropagation]]).
    *
    * Output: `(node, core_degree)` for every node in the k-core, with its
    * degree INSIDE the core (≥ k by construction); empty when the graph
    * has no k-core.
    *
    * 100 TB shape: per round one map-side-combined degree count over the
    * current edge set + two node-keyed LEFT SEMI joins (edge rows against
    * the surviving-node set — semi joins shuffle only (node) keys and
    * never widen rows), with lineage truncated per round. Convergence is
    * the edge COUNT fixed point — the count is monotone non-increasing,
    * so equality ⟺ no node was peeled ⟺ fixed point; one long to the
    * driver per round, same contract as [[pageRankIntWithRounds]].
    * Rounds are bounded by the peel depth (≤ longest degeneracy chain,
    * log-ish on real graphs; ScaleCheck records it).
    */
  def kCore(
      pairs: DataFrame,
      k: Int,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIter: Int = 10000): DataFrame =
    kCoreWithRounds(pairs, k, srcCol, dstCol, maxIter)._1

  /** [[kCore]] plus rounds-to-fixed-point (the measurable peel depth). */
  def kCoreWithRounds(
      pairs: DataFrame,
      k: Int,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIter: Int = 10000): (DataFrame, Int) = {
    require(k >= 1, s"k must be >= 1, got $k")
    def degrees(edges: DataFrame): DataFrame =
      edges.select(col("u").as("node"))
        .unionAll(edges.select(col("v").as("node")))
        .groupBy(col("node"))
        .agg(count(lit(1)).as("deg"))
    // per-round edge counts ride the checkpoint jobs (Dataset.observe —
    // the r18 probe idiom): the former separate next.count() was a
    // second pass over the just-pinned edges every round
    def pinCounted(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val pinned = df.observe(obs, count(lit(1)).as("n"))
        .localCheckpoint(true)
      (pinned, obs.get("n").asInstanceOf[Long])
    }
    var (e, nEdges) = pinCounted(canonicalEdges(pairs, srcCol, dstCol))
    var rounds = 0
    var converged = nEdges == 0L
    while (!converged && rounds < maxIter) {
      val keep = degrees(e).filter(col("deg") >= k)
        .select(col("node"))
        .localCheckpoint(true) // read by BOTH semi joins
      val (next, n) = pinCounted(e
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v")))
      rounds += 1
      converged = n == nEdges // monotone ⇒ equality is the fixed point
      e = next
      nEdges = n
    }
    require(converged, s"kCore did not converge in $maxIter rounds")
    (degrees(e).select(col("node"), col("deg").as("core_degree"))
      .orderBy(col("node")), rounds)
  }

  /** Common-neighbor / Jaccard link scores — the classic neighborhood
    * link-prediction features (Liben-Nowell & Kleinberg 2003) over a
    * derived graph: for every node pair sharing ≥ `minCommon` neighbors,
    * the common-neighbor count, both degrees, integer-ppm Jaccard
    * |N(a)∩N(b)| / |N(a)∪N(b)|, and whether the pair is already an edge
    * (scored non-edges are the link candidates; scored edges are a
    * cohesion audit).
    *
    * Output: `(node_a, node_b, common, deg_a, deg_b, jaccard_ppm,
    * is_edge)` with node_a < node_b, ppm = 1e6·common div
    * (deg_a + deg_b − common) — all integer, oracle-exact.
    *
    * 100 TB shape: wedges are generated from the symmetrized adjacency by
    * a center-keyed self-join — inherently Ω(Σ deg²) like every
    * common-neighbor computation (the OUTPUT can be that large); the
    * `minCommon` cut happens in the partial aggregate right after the
    * join, so only pairs, never wedge multiplicities, survive the
    * shuffle. Hub skew is the same last-reducer shape as triangle
    * counting — run it on a degree-capped or sliced graph (the registered
    * query uses the same 1-in-4 slice as `graph_triangles`), or cap
    * neighborhoods first; the operator itself stays pure equi-joins.
    */
  def commonNeighborScores(
      pairs: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      minCommon: Long = 2L): DataFrame = {
    val e = canonicalEdges(pairs, srcCol, dstCol).localCheckpoint(true)
    val sym = e.select(col("u").as("w"), col("v").as("x"))
      .unionAll(e.select(col("v").as("w"), col("u").as("x")))
    val deg = sym.groupBy(col("w")).agg(count(lit(1)).as("deg"))
      .withColumnRenamed("w", "node")
    // wedge (a, b) at center w, a < b; one row per (pair, common nbr)
    val pairsCn = sym.select(col("w"), col("x").as("a"))
      .join(sym.select(col("w"), col("x").as("b")), "w")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    pairsCn
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), "b")
      .join(e.select(col("u").as("a"), col("v").as("b"),
        lit(true).as("is_edge")), Seq("a", "b"), "left")
      .select(col("a").as("node_a"), col("b").as("node_b"), col("common"),
        col("deg_a"), col("deg_b"),
        expr("common * 1000000 div (deg_a + deg_b - common)")
          .as("jaccard_ppm"),
        coalesce(col("is_edge"), lit(false)).as("is_edge"))
      .orderBy(col("node_a"), col("node_b"))
  }

  /** Fixed-iteration PageRank with INTEGER mass arithmetic — importance
    * scoring over a derived graph (domain link graph, customer–supplier
    * trade graph, near-dup cluster graph) as a shuffle-native iterative
    * operator.
    *
    * Why integer: floating-point PageRank sums in partition order, so two
    * runs of the same corpus can disagree in the last ulp and an external
    * oracle never matches bit-for-bit. Here every node starts with
    * `scale` units of integer mass and each iteration computes
    *
    *   mass'(v) = floor(scale·(den-num)/den)
    *            + Σ_{u→v} (mass(u) · num) div (den · outdeg(u))
    *
    * — all in long arithmetic (`div` = SQL integer division), so the sum
    * is associative, the result is independent of partitioning and visit
    * order, and a SQL engine re-running the same recurrence reproduces it
    * EXACTLY. Floor truncation leaks a bounded sub-unit of mass per edge
    * per round (documented, deliberate); ranks and orderings are
    * unaffected at scale = 10^6.
    *
    * Dangling nodes (no out-edges): by default they simply do not forward
    * mass — with symmetric edge sets (the common corpus use) none exist,
    * and on asymmetric graphs total mass shrinks each round (documented
    * divergence from standard PageRank). With
    * `redistributeDangling = true` the dangling mass is redistributed
    * uniformly, integer-exactly: each round every node additionally
    * receives `(D · num) div (den · N)` where `D = Σ mass(dangling)` and
    * `N` = node count — standard PageRank's dangling handling on the
    * integer lattice. D crosses to the driver as ONE long per round
    * (the same bounded sequential transfer as the convergence check and
    * [[Tokenizer.bpeMerges]]'s argmax). Precondition for no overflow:
    * total mass ≈ N·scale, so N·scale·num must stay inside Long — at
    * scale 10^6, num ≤ 100 that holds to N ~ 9·10^10 nodes.
    *
    * CONVERGENCE stop (`connectedComponentsWithRounds` contract): the
    * recurrence is a deterministic map on integer vectors, so it is
    * stopped at the first exact fixed point (mass delta == 0 — exactly
    * computable, the whole point of integer mass), capped at
    * `iterations`. A fixed point persists under the map, so an oracle
    * that unrolls the recurrence to the CAP reproduces the converged
    * result bit-for-bit regardless of which round the fixed point was
    * reached — early stop changes wall-time, never the answer.
    *
    * 100 TB shape: per iteration one join of the (src, dst, outdeg) edge
    * list against the (node, mass) rank table on src — both keyed the
    * same, so co-partitioning survives across iterations — plus one
    * groupBy(dst) sum with map-side partial aggregation; only
    * (node, long) pairs shuffle. The convergence probe is a node-sized
    * join of two checkpointed rank tables short-circuited by `isEmpty`.
    * Lineage is truncated per round via localCheckpoint (cluster twin:
    * `.checkpoint()`), same contract as [[connectedComponents]].
    */
  def pageRankInt(
      edges: DataFrame,
      iterations: Int = 10,
      alphaNum: Long = 85,
      alphaDen: Long = 100,
      scale: Long = 1000000L,
      redistributeDangling: Boolean = false): DataFrame =
    pageRankIntWithRounds(edges, iterations, alphaNum, alphaDen, scale,
      redistributeDangling)._1

  /** [[pageRankInt]] plus the number of iterations actually executed
    * (== `iterations` when the cap hit before the fixed point). */
  def pageRankIntWithRounds(
      edges: DataFrame,
      iterations: Int = 10,
      alphaNum: Long = 85,
      alphaDen: Long = 100,
      scale: Long = 1000000L,
      redistributeDangling: Boolean = false): (DataFrame, Int) = {
    require(iterations >= 0 && alphaDen > 0 && alphaNum >= 0 &&
      alphaNum <= alphaDen && scale > 0)
    val e = edges
      .select(col(edges.columns(0)).cast("long").as("src"),
        col(edges.columns(1)).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ed = e.join(outdeg, "src").localCheckpoint(true)
    // in redistribute mode every node carries its fixed has_out flag so
    // the per-round dangling-mass sum can ride the convergence probe
    // (r17): the former per-round dangling⋈ranks aggregate job is gone —
    // round r's probe returns BOTH the mismatch count and round r+1's
    // dangling mass D in one aggregate over the just-pinned table, and
    // round 1's D is nDangling·scale from the seed census below. Values
    // are bit-identical (same Σ mass over the same fixed node set).
    // The node table derives from the PINNED ed, not from e (r18): ed's
    // (src, dst) pairs ≡ e's (outdeg covers every src, inner join is
    // 1:1), so re-deriving e — the upstream corpus join + distinct —
    // a second time bought nothing; has_out ≡ "node appears as a src"
    // reads off ed the same way. The seed census (node count + dangling
    // count) rides the node pin job (Dataset.observe — the r18 probe
    // idiom) instead of a separate aggregate.
    val nodes0 = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node")))
      .distinct()
    val seedObs = org.apache.spark.sql.Observation()
    val nodes =
      (if (!redistributeDangling) nodes0
       else nodes0
         .join(ed.select(col("src").as("node"), lit(true).as("has_out"))
           .distinct(),
           Seq("node"), "left")
         .select(col("node"),
           coalesce(col("has_out"), lit(false)).as("has_out"))
         .observe(seedObs, count(lit(1)).as("n"),
           count(when(!col("has_out"), lit(1))).as("nd")))
        .localCheckpoint(true)
    val base = scale * (alphaDen - alphaNum) / alphaDen
    var ranks = nodes.withColumn("mass", lit(scale))
    // seed census: node count + dangling count, off the pin job
    lazy val (nNodes, nDangling) =
      if (!redistributeDangling) (nodes.count(), 0L)
      else {
        val m = seedObs.get
        (m("n").asInstanceOf[Long], m("nd").asInstanceOf[Long])
      }
    var dMass = if (redistributeDangling) nDangling * scale else 0L
    var rounds = 0
    var converged = false
    while (rounds < iterations && !converged) {
      val dShare =
        if (!redistributeDangling || nNodes == 0L) 0L
        else (dMass * alphaNum) / (alphaDen * nNodes)
      val contribs = ed
        .join(ranks.select(col("node").as("src"), col("mass")), "src")
        .select(col("dst").as("node"),
          expr(s"(mass * $alphaNum) div ($alphaDen * outdeg)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("contrib"))
      // ONE node-keyed join per round: `ranks` IS the full node set every
      // round (seeded from `nodes`, preserved by this select), so joining
      // contribs onto it both carries prev mass for the convergence probe
      // AND covers contrib-less nodes via the left join — the former
      // nodes⋈contribs⋈ranks double join paid a second node-hash stage
      // per round for nothing
      val carry =
        if (redistributeDangling) Seq(col("prev"), col("has_out"))
        else Seq(col("prev"))
      val nextPlan = ranks.withColumnRenamed("mass", "prev")
        .join(contribs, Seq("node"), "left")
        .select(Seq(col("node"),
          (lit(base + dShare) + coalesce(col("contrib"), lit(0L)))
            .as("mass")) ++ carry: _*)
      // the final round's probe is skipped — the loop exits and hands
      // back `next` regardless, so the answer cannot depend on it.
      // Probe values ride the checkpoint job itself (Dataset.observe —
      // r18): the materialization already flows every (mass, prev,
      // has_out) row, so the mismatch count and next round's dangling
      // mass D cost no separate aggregate job and no second pass over
      // the rank table; values are identical (same aggregates over the
      // same pinned rows). The former shape paid one probe job per
      // round (the r17 fusion had already folded D into that probe).
      val probe =
        if (rounds + 1 < iterations)
          Some(org.apache.spark.sql.Observation())
        else None
      val observed = probe match {
        case Some(o) if redistributeDangling =>
          nextPlan.observe(o,
            count(when(col("mass") =!= col("prev"), lit(1))).as("delta"),
            sum(when(!col("has_out"), col("mass"))).as("dmass"))
        case Some(o) =>
          nextPlan.observe(o,
            count(when(col("mass") =!= col("prev"), lit(1))).as("delta"))
        case None => nextPlan
      }
      val next = observed.localCheckpoint(true)
      rounds += 1
      probe.foreach { o =>
        val m = o.get
        converged = m("delta").asInstanceOf[Long] == 0L
        if (redistributeDangling)
          dMass = m("dmass") match {
            case null => 0L // empty node set: no dangling mass
            case l: java.lang.Long => l.longValue
          }
      }
      ranks = next.drop("prev")
    }
    (ranks.select(col("node"), col("mass")).orderBy(col("node")), rounds)
  }
}
