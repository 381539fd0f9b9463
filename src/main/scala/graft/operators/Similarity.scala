package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** North-star similarity search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Three paths, per the mandate:
  *
  *   - brute-force cosine top-k — the exact baseline. Queries are a small
  *     fixed set, so the candidate side is broadcast-joined against them:
  *     one scan of the corpus, per-partition top-k via window, no n²
  *     anywhere. At 100 TB this is exactly the shape you want (corpus scan
  *     × small query batch);
  *   - IVF ANN — k-means coarse quantizer; queries probe their nprobe
  *     nearest cells and exact-rerank only those candidates;
  *   - hyperplane-LSH ANN — sign-random-projection signatures bucket the
  *     corpus; band probing (with query-side multi-probe) compares only
  *     same-bucket candidates, then exact-reranks.
  *
  * INDEX BUILD IS A SEPARATE STAGE from the query path: [[buildIvfIndex]]
  * trains k-means on a bounded deterministic sample and materializes the
  * cell-assigned corpus once; [[buildLshIndex]] materializes signatures
  * once. At 100 TB both become persisted tables (celled corpus partitioned
  * by cell id; signed corpus bucketed by band bucket) written by an
  * offline job; the query functions only ever consume a prebuilt index.
  * `local[32]`-side, "persisted" = cached + materialized DataFrames, and
  * [[IndexCache]] keeps one index per (session, corpus) so repeated query
  * calls — the bench, the driver's verify pass — never rebuild.
  *
  * All arithmetic is double-precision with a fixed left-to-right fold,
  * matching DuckDB's sequential loop so oracle scores are bit-identical.
  */
object Similarity {

  /** Dot product of two array<double> columns — one codegen'd loop
    * (graft.functions.VectorOps; the HOF `aggregate(zip_with(...))` form is
    * CodegenFallback and its interpreted per-element dispatch dominated the
    * pairwise workloads). Accumulation order is identical, so scores are
    * bit-equal to the composable form and to DuckDB's loop.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalize (array<float|double> → unit array<double>);
    * pre-normalizing once turns every downstream cosine into a plain dot
    * product.
    */
  def normalized(a: Column): Column =
    graft.functions.VectorOps.vec_unit(a)

  /** Exact cosine top-k: for each query vector (small fixed set), the k
    * nearest corpus vectors. Query side broadcast; ranking via window with
    * deterministic tie-break.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10): DataFrame = {
    val unit = embeddings.select(
      col("vec_id"), normalized(col("embedding")).as("unit"))
    val queries = unit
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("unit").as("q_unit"))
    val scored = unit
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  // ------------------------------------------------------------ IVF index

  /** A prebuilt IVF index: unit-normalized centroid literals (tiny:
    * nlist × dim doubles, broadcast into every query plan) plus the corpus
    * with its cell assignment materialized once. At cluster scale `celled`
    * is a table written partitioned by `cell` so a probe touches nprobe
    * partitions, not the corpus.
    */
  final case class IvfIndex(
      centroids: Array[Array[Double]],
      celled: DataFrame,
      qcents: Array[Array[Long]] = Array.empty,
      qcentsSpace: String = "raw") {
    def nlist: Int = centroids.length
    def unpersist(): Unit = { celled.unpersist(); () }

    /** True when the index carries its coarse quantizer on
      * [[graft.operators.Clustering]]'s integer lattice (an exact-Lloyd
      * build) — the prerequisite for [[ivfQueryVectorsIntProbe]]'s
      * cross-engine-replayable probe selection.
      *
      * `qcentsSpace` records WHICH vectors the lattice quantized:
      * `"raw"` for a fresh [[buildIvfIndexExact]] (trained on original
      * embeddings) or `"unit"` for a drift rebuild
      * ([[graft.sinks.Sink.rebuildIvfIndex]] retrains on the index's
      * stored unit vectors — the originals are gone). The probe must
      * quantize its QUERY in the same space, or cell selection
      * compares mismatched lattices and silently degrades the
      * candidate set.
      */
    def hasQuantizedCentroids: Boolean = qcents.nonEmpty
  }

  /** Train the coarse quantizer on a bounded deterministic sample and
    * assign every corpus vector to its nearest centroid — the offline
    * build stage. The sample is hash-selected (stable under any
    * partitioning, unlike `DataFrame.sample`), capped at `maxTrainRows`:
    * k-means centroid quality needs a representative sample, not the
    * corpus, so build cost is O(sample) training + ONE corpus scan for
    * assignment regardless of corpus size.
    *
    * `carryCols` are extra corpus columns (e.g. `label`) preserved on the
    * celled output for operators that block on them.
    */
  def buildIvfIndex(
      embeddings: DataFrame,
      nlist: Int = 16,
      maxTrainRows: Int = 100000,
      seed: Long = 7L,
      carryCols: Seq[String] = Nil): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val unit = embeddings.select(
      (carryCols.map(col) :+ col("vec_id") :+
        normalized(col("embedding")).as("unit")): _*)
    val total = unit.count()
    val train0 =
      if (total <= maxTrainRows) unit
      else {
        // keep ≈ maxTrainRows rows via a deterministic hash filter
        val keepPerMillion = math.max(1L,
          (maxTrainRows.toDouble / total * 1000000L).toLong)
        unit.filter(
          pmod(xxhash64(col("vec_id"), lit(seed)), lit(1000000L)) < keepPerMillion)
      }
    val train = train0.select(array_to_vector(col("unit")).as("features"))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(10).setFeaturesCol("features")
      .fit(train)
    // unit-normalized centroids as literal arrays (tiny: nlist × dim)
    val centroids = model.clusterCenters.map { c =>
      val a = c.toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      a.map(_ / n)
    }
    val celled = unit
      .withColumn("cell", cellOf(centroids, col("unit")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    celled.count() // materialize: the build cost is paid here, once
    IvfIndex(centroids, celled)
  }

  /** Deterministic IVF build: the coarse quantizer is
    * [[Clustering]]'s integer Lloyd's — md5-pinned seeds, exact long
    * arithmetic — so the INDEX ITSELF is reproducible byte-for-byte
    * across builds, machines, and engines (the float path's Spark-ML
    * training is run-stable but not cross-engine replayable). Cell
    * assignment runs in the same integer geometry (codegen'd argmin over
    * quantized vectors); only the query-side probe ordering and rerank
    * use float cosine, exactly like every other index here.
    *
    * Operationally this is the index you can rebuild from a corpus
    * snapshot and diff against yesterday's build as an audit artifact —
    * identical corpus ⇒ identical cells, no "same data, different index"
    * drift. Build cost: iters + 1 corpus scans (no sampling stage); at
    * 100 TB you'd feed a hash-selected sample to [[Clustering.lloyd]] and
    * keep the one assignment scan, same as the float build.
    */
  def buildIvfIndexExact(
      embeddings: DataFrame,
      nlist: Int = 16,
      iters: Int = 3): IvfIndex = {
    val (qcents, assigned) = Clustering.fit(embeddings, nlist, iters)
    // dequantize for the float probe stage: undo shift+scale, then
    // unit-normalize so probe affinity is plain cosine like the float path
    val centroids = qcents.map { c =>
      val a = c.map(v => v / Clustering.Scale - Clustering.Shift)
      val n = math.sqrt(a.map(x => x * x).sum)
      if (n == 0.0) a else a.map(_ / n)
    }
    val celled = assigned
      .select(col("vec_id"), normalized(col("embedding")).as("unit"),
        col("cluster").as("cell"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    celled.count()
    // keep the integer-lattice centroids alongside the float probe set:
    // they are the cross-engine-replayable coarse quantizer (an auditor
    // can re-derive cell assignment AND probe selection in exact integer
    // arithmetic — [[ivfQueryVectorsIntProbe]] consumes them)
    IvfIndex(centroids, celled, qcents)
  }

  private def centroidDots(centroids: Array[Array[Double]], v: Column): Seq[Column] =
    centroids.toSeq.map(c => dot(v, typedLit(c.toSeq)))

  /** Cell assignment = argmax over centroid dots. NOTE: a when/otherwise
    * fold here duplicates the running-best subtree at every step — a
    * 2^nlist-node expression that hangs the analyzer. array_position of
    * the max keeps the tree linear (first occurrence = deterministic
    * tie-break on the lower cell id).
    */
  private def cellOf(centroids: Array[Array[Double]], v: Column): Column = {
    val dots = array(centroidDots(centroids, v): _*)
    (array_position(dots, array_max(dots)) - 1).cast("int")
  }

  /** Assign external vectors to their nearest existing cell — the
    * incremental-ADD half of the IVF lifecycle (FAISS `add`): new
    * vectors join the index under the ALREADY-TRAINED coarse quantizer,
    * no retrain, no corpus re-scan. A narrow map (broadcast centroid
    * literals, codegen'd argmax), so ingest cost is one pass over the
    * new rows only. [[graft.sinks.Sink.appendIvfIndex]] persists the
    * result into the on-disk cell layout.
    *
    * Output: `(vec_id, unit, cell)` — the celled-table row shape.
    */
  def assignCells(
      centroids: Array[Array[Double]], vectors: DataFrame,
      carry: Seq[Column] = Nil): DataFrame =
    vectors.select(Seq(col("vec_id"),
        normalized(col("embedding")).as("unit")) ++ carry: _*)
      .withColumn("cell", cellOf(centroids, col("unit")))

  /** Malformed-request guard for the SERVING probes
    * ([[ivfQueryVectors]], [[ivfQueryVectorsIntProbe]]): a null,
    * wrong-dimension, null-element, or all-zero query embedding must be
    * rejected PER REQUEST — these paths run inside streaming
    * foreachBatch, where `normalized`'s zero-vector error (or a
    * dimension-mismatch throw in the distance kernel) on ONE bad
    * request would kill the serving query for every client, and a
    * restart re-reads the same poison batch and dies again. Rejected
    * requests simply get no answer rows, the
    * [[graft.operators.TextAnalysis.proximityQueryBatch]] stance.
    * `dim = 0` (an empty index) rejects everything — an empty index
    * answers nothing either way.
    */
  private def servableQuery(e: Column, dim: Int): Column =
    e.isNotNull && size(e) === dim &&
      !exists(e, x => x.isNull) && exists(e, x => x =!= 0)

  /** The query's nprobe nearest cells, in descending-affinity order. */
  private def probeCells(
      centroids: Array[Array[Double]], v: Column, nprobe: Int): Column =
    slice(sortByDotDesc(centroidDots(centroids, v)), 1, nprobe)

  /** IVF ANN query: probe nprobe cells per query vector, exact-rerank the
    * candidates. Consumes a prebuilt [[IvfIndex]] — no training, no corpus
    * re-scan beyond the probed cells.
    */
  def ivfQuery(
      index: IvfIndex,
      queryIds: Seq[Long],
      k: Int = 10,
      nprobe: Int = 4): DataFrame = {
    val celled = index.celled
    val queries = celled
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("unit").as("q_unit"))
      .withColumn("probe_cells",
        probeCells(index.centroids, col("q_unit"), nprobe))
      .select(col("query_id"), col("q_unit"),
        explode(col("probe_cells")).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    celled
      .join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      // a corpus vector lives in exactly one cell, so (query, candidate)
      // pairs are already unique across probes — no dedup needed
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** [[ivfQuery]] against a PARTITIONED on-disk index
    * ([[graft.sinks.Sink.writeIvfIndex]]): the union of probe cells
    * (≤ queries × nprobe ints — tiny) is computed driver-side first and
    * pushed as a STATIC `cell IN (...)` predicate, so the candidate scan
    * carries a PartitionFilter and provably reads only the probed cell
    * directories — no reliance on runtime DPP firing. Candidate sets are
    * identical to [[ivfQuery]]'s (the per-(query, cell) join already
    * restricts to each query's own probe list; the static filter is the
    * union and prunes I/O, not candidates), so results are bit-equal.
    *
    * The query-vector lookup itself still scans the table once (fetch by
    * vec_id); in production the query vectors arrive with the request —
    * pass them through `queries` when in hand.
    */
  def ivfQueryPruned(
      index: IvfIndex,
      queryIds: Seq[Long],
      k: Int = 10,
      nprobe: Int = 4): DataFrame = {
    val queries = index.celled
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("unit").as("q_unit"))
      .withColumn("probe_cells",
        probeCells(index.centroids, col("q_unit"), nprobe))
      .select(col("query_id"), col("q_unit"),
        explode(col("probe_cells")).as("cell"))
    val probed: Seq[Int] = queries.select(col("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    index.celled
      .filter(col("cell").isin(probed: _*)) // static partition pruning
      .join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** [[ivfQueryPruned]] for EXTERNAL query vectors — the serving shape:
    * queries arrive as `(query_id, embedding)` rows carrying their own
    * vectors (an inference request, a micro-batch of a query stream),
    * never as corpus members, so there is no lookup scan and no
    * self-exclusion. The probe-cell union is collected driver-side
    * (≤ |queries| × nprobe ints — callers hand in request-sized batches,
    * not corpora) and pushed as the same static `cell IN (...)`
    * partition predicate, so against a persisted index the candidate
    * scan provably touches only the probed cell directories.
    * [[graft.streaming.StreamAnnServe]] runs this per micro-batch.
    *
    * Output: `(query_id, vec_id, cosine, rank)`, ties → lowest vec_id.
    */
  /** Sorted distinct cell ids observed (as `collect_set("cells")`) on a
    * request-batch pin job — the r18 probe-union idiom: the union rides
    * the `localCheckpoint` materialization instead of a second
    * distinct-collect job over the just-pinned rows.
    */
  private def observedCells(
      obs: org.apache.spark.sql.Observation): Seq[Int] =
    obs.get("cells").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Int]).sorted

  def ivfQueryVectors(
      index: IvfIndex,
      queries: DataFrame,
      k: Int = 10,
      nprobe: Int = 4): DataFrame = {
    val cellObs = org.apache.spark.sql.Observation()
    val probes = queries
      .filter(servableQuery(col("embedding"),
        index.centroids.headOption.map(_.length).getOrElse(0)))
      .select(col("query_id"), normalized(col("embedding")).as("q_unit"))
      .withColumn("probe_cells",
        probeCells(index.centroids, col("q_unit"), nprobe))
      .select(col("query_id"), col("q_unit"),
        explode(col("probe_cells")).as("cell"))
      // pin the request batch (it is request-sized) so the driver-side
      // cell-union collect and the broadcast join side read the SAME
      // rows even if `queries` is non-deterministic (a sample, a
      // re-read of a mutating path) — otherwise un-probed cells could
      // silently drop candidates. The cell union rides the pin job
      // itself (Dataset.observe — r18): the former separate
      // distinct-collect was a second job over the just-pinned batch
      .observe(cellObs, collect_set(col("cell")).as("cells"))
      .localCheckpoint(true)
    val probed: Seq[Int] = observedCells(cellObs)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    index.celled
      .filter(col("cell").isin(probed: _*)) // static partition pruning
      .join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Above this nlist, [[ivfQueryVectorsIntProbe]] switches probe-cell
    * selection from the inlined-expression form to the broadcast
    * centroid-join form (bit-identical output — see the inline comment
    * there). 128 keeps every repo-served index (nlist 8–64) on the
    * zero-join expression path while a FAISS-normal nlist=4096 layout
    * gets a plan that codegens.
    */
  val IntProbeInlineMaxNlist = 128

  /** [[ivfQueryVectors]] with the probe-cell selection moved onto
    * [[Clustering]]'s integer lattice — the CROSS-ENGINE-REPLAYABLE
    * serving probe: requires an exact-Lloyd index
    * ([[buildIvfIndexExact]], which carries its quantized centroids in
    * [[IvfIndex.qcents]]). Each query vector is quantized with the
    * training transform (`round((x + 1.0) * 4096)` — exact in IEEE
    * double, see [[Clustering.Scale]]) and its nprobe cells are the
    * smallest exact-integer squared-L2 distances to the quantized
    * centroids, ties → lowest cell id (an `array_sort` over
    * `(dist, cell)` structs — lexicographic, matching the oracle's
    * `ORDER BY dist, j`). Candidate ranking within the probed cells is
    * exact float cosine, identical to [[ivfQueryVectors]].
    *
    * Why it exists: the float probe's cell ORDER depends on
    * normalization arithmetic (a float sum whose reduction order is
    * engine-private), so an external auditor can verify its recall but
    * not replay its exact candidate set. This probe's cell set is pure
    * integer arithmetic end to end — DuckDB replays Lloyd's, the
    * assignment, AND the probe selection bit-exactly, which is what lets
    * a hybrid-retrieval query over a cell-pruned ANN leg be HASH-checked
    * rather than recall-floored (`retrieval_hybrid_rrf`). Same static
    * `cell IN (...)` partition pruning and 100 TB posture as
    * [[ivfQueryVectors]]; corpus-member queries self-exclude by id
    * (external ids never collide with corpus ids, so the filter is a
    * no-op for true serving requests).
    */
  def ivfQueryVectorsIntProbe(
      index: IvfIndex,
      queries: DataFrame,
      k: Int = 10,
      nprobe: Int = 4,
      inlineMaxNlist: Int = IntProbeInlineMaxNlist): DataFrame = {
    require(index.hasQuantizedCentroids,
      "integer-lattice probe needs an exact-Lloyd index " +
        "(buildIvfIndexExact / a persisted layout with qcentroids)")
    val cellObs = org.apache.spark.sql.Observation()
    // quantize the query in the lattice's TRAINING space: a fresh build
    // trained on raw embeddings, a drift rebuild on the stored unit
    // vectors (IvfIndex.qcentsSpace) — quantizing a raw query against a
    // unit-trained lattice compares mismatched spaces and silently
    // degrades probe-cell selection. The unit path normalizes first
    // (deterministic sequential fold, replayed the same way by the
    // oracle); the 4096-step lattice absorbs last-bit float drift
    // everywhere short of an exact half-way rounding tie.
    val qVec =
      if (index.qcentsSpace == "unit") normalized(col("embedding"))
      else col("embedding")
    val qLattice = transform(
      qVec,
      x => round((x.cast("double") + lit(Clustering.Shift)) *
        lit(Clustering.Scale)).cast("long"))
    val base = queries
      .filter(servableQuery(col("embedding"), index.qcents.head.length))
      .select(col("query_id").cast("long").as("query_id"),
        normalized(col("embedding")).as("q_unit"),
        qLattice.as("ql"))
    // Probe-cell selection has two physical forms with BIT-IDENTICAL
    // output (exact integer distances, ties → lowest cell id):
    //   - nlist ≤ IntProbeInlineMaxNlist: the centroids inline as
    //     typedLit structs into ONE array_sort expression — zero joins,
    //     whole-stage-codegen'd, the right shape at the nlist 8–64 this
    //     repo serves;
    //   - above it: an `array_sort` over thousands of inlined
    //     struct(vec_l2sq_long…) nodes is a codegen bomb (FAISS-normal
    //     nlist=4096 → a multi-thousand-node expression tree that blows
    //     the JIT method limit and falls back to interpreted eval), so
    //     the centroids become a BROADCAST nlist-row relation instead:
    //     per (query, cell) one distance row, `row_number` over
    //     (dist, cell) per query, keep rn ≤ nprobe — the same
    //     lexicographic order the struct sort uses.
    val probes = (if (index.qcents.length <= inlineMaxNlist) {
      val cands = index.qcents.zipWithIndex.map { case (c, j) =>
        struct(
          graft.functions.VectorOps
            .vec_l2sq_long(col("ql"), typedLit(c.toSeq)).as("dist"),
          lit(j).as("cell"))
      }
      base
        .withColumn("probe_cells",
          transform(
            slice(array_sort(array(cands.toIndexedSeq: _*)), 1, nprobe),
            s => s.getField("cell")))
        .select(col("query_id"), col("q_unit"),
          explode(col("probe_cells")).as("cell"))
    } else {
      val spark = queries.sparkSession
      import spark.implicits._
      val centDf = index.qcents.zipWithIndex.toSeq
        .map { case (c, j) => (j, c.toSeq) }.toDF("cell", "qc")
      // per-ROW window key, not query_id: the inline form above emits
      // nprobe probe cells per input ROW, so a (malformed) batch
      // carrying duplicate query_id rows with different embeddings must
      // get per-row probe sets here too — partitioning by query_id
      // alone would keep nprobe rows TOTAL for the duplicates, picked
      // arbitrarily across their distance rows, silently breaking the
      // two forms' bit-identity. The key is dropped before the fan-out.
      val wProbe = Window.partitionBy(col("row_key"))
        .orderBy(col("dist"), col("cell"))
      base.withColumn("row_key", monotonically_increasing_id())
        .crossJoin(broadcast(centDf))
        .select(col("row_key"), col("query_id"), col("q_unit"),
          col("cell"),
          graft.functions.VectorOps
            .vec_l2sq_long(col("ql"), col("qc")).as("dist"))
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= nprobe)
        .select(col("query_id"), col("q_unit"), col("cell"))
    })
      // pin the request batch: the driver-side cell-union collect and
      // the broadcast join side must read the SAME rows (the
      // ivfQueryVectors idiom); the union rides the pin job
      // (Dataset.observe — r18)
      .observe(cellObs, collect_set(col("cell")).as("cells"))
      .localCheckpoint(true)
    val probed: Seq[Int] = observedCells(cellObs)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    index.celled
      .filter(col("cell").isin(probed: _*)) // static partition pruning
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact cosine top-k for EXTERNAL query vectors — [[bruteForceTopK]]
    * with the queries handed in as `(query_id, embedding)` rows instead
    * of corpus ids (and hence no self-exclusion): the correctness
    * baseline for [[ivfQueryVectors]] recall audits.
    */
  def bruteForceTopKVectors(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int = 10): DataFrame = {
    val unit = embeddings.select(
      col("vec_id"), normalized(col("embedding")).as("unit"))
    val qs = queries.select(
      col("query_id"), normalized(col("embedding")).as("q_unit"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    unit.crossJoin(broadcast(qs))
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Build-then-query convenience (kept for spec/one-shot use; the
    * registered query path goes through [[IndexCache]] so the build runs
    * once per corpus, not once per call).
    */
  def ivfTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame =
    ivfQuery(buildIvfIndex(embeddings, nlist), queryIds, k, nprobe)

  /** Cell ids ordered by descending dot product: build (dot, id) structs,
    * sort descending via sort_array on negated dot, project the ids.
    */
  private def sortByDotDesc(dots: Seq[Column]): Column =
    transform(
      sort_array(array(dots.zipWithIndex.map { case (d, i) =>
        struct((-d).as("negdot"), lit(i).as("id"))
      }: _*)),
      s => s.getField("id"))

  // ------------------------------------------------------------ LSH index

  /** Deterministic random hyperplanes: nBits × dim doubles seeded once. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** Sign-random-projection signature (one long, nBits ≤ 64). */
  def srpSignature(unit: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = dot(unit, typedLit(p.toSeq))
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** A prebuilt SRP-LSH index: the hyperplane set plus the corpus with its
    * 64-bit signature materialized once. Band buckets are cheap bit
    * arithmetic over `sig`, so only (vec_id, unit, sig) is persisted — at
    * cluster scale a table bucketed by a band key, not bands× row
    * inflation.
    */
  final case class LshIndex(
      planes: Array[Array[Double]],
      bands: Int,
      signed: DataFrame) {
    def nBits: Int = planes.length
    def bitsPerBand: Int = nBits / bands
    def unpersist(): Unit = { signed.unpersist(); () }
  }

  /** Offline build: compute every corpus signature (the 64 hyperplane dot
    * products per vector that used to run inside every query call) once
    * and materialize.
    */
  def buildLshIndex(
      embeddings: DataFrame,
      nBits: Int = 64,
      bands: Int = 16,
      dim: Int = 64,
      seed: Long = 7L,
      carryCols: Seq[String] = Nil): LshIndex = {
    // dim must match the embedding column; vec_dot throws loudly on a
    // mismatch rather than silently projecting a truncated signature
    val planes = hyperplanes(nBits, dim, seed)
    val signed = embeddings
      .select((carryCols.map(col) :+ col("vec_id") :+
        normalized(col("embedding")).as("unit")): _*)
      .withColumn("sig", srpSignature(col("unit"), planes))
      .persist(StorageLevel.MEMORY_AND_DISK)
    signed.count()
    LshIndex(planes, bands, signed)
  }

  /** LSH ANN query over a prebuilt index: candidates share a band bucket
    * with the query; the query side additionally MULTI-PROBES every
    * 1-bit-flip neighbor of each of its band buckets (bands×(1+bits/band)
    * probe buckets per query — query-side only, so the corpus side stays
    * one row per (vector, band)). Exact rerank by true cosine. Recall < 1
    * by construction; the companion spec measures it against
    * [[bruteForceTopK]].
    */
  def lshQuery(
      index: LshIndex,
      queryIds: Seq[Long],
      k: Int = 10): DataFrame = {
    val bitsPerBand = index.bitsPerBand
    val mask = (1L << bitsPerBand) - 1
    def bandBucket(b: Int): Column =
      shiftright(col("sig"), b * bitsPerBand).bitwiseAND(mask)
    val banded = index.signed.select(
      col("vec_id"), col("unit"),
      posexplode(array((0 until index.bands).map(bandBucket): _*))
        .as(Seq("band", "bucket")))
    // query side: own bucket plus every 1-bit flip of it (multi-probe)
    val queries = index.signed
      .filter(col("vec_id").isin(queryIds: _*))
      .select(
        col("vec_id").as("query_id"), col("unit").as("q_unit"),
        posexplode(array((0 until index.bands).flatMap { b =>
          bandBucket(b) +: (0 until bitsPerBand).map(i =>
            bandBucket(b).bitwiseXOR(lit(1L << i)))
        }: _*)).as(Seq("probe", "bucket")))
      .withColumn("band", (col("probe") / (1 + bitsPerBand)).cast("int"))
      .select(col("band"), col("bucket"), col("query_id"), col("q_unit"))
    // Dot FIRST, dedup SECOND: a pair colliding in several probe buckets
    // is scored per occurrence inside the scan (a cheap codegen'd loop)
    // and collapsed by a map-side-combining aggregate over 24-byte
    // (query, vec, cosine) rows. The previous dropDuplicates-then-dot
    // order shuffled every candidate occurrence still carrying BOTH unit
    // arrays (~1 KB/row — measured 142 s at 20× for a 50-row answer);
    // pushing the projection below the exchange makes the shuffle payload
    // scalar and lets partial aggregation collapse duplicates per
    // partition before anything crosses the network (~2 s same probe).
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    banded
      .join(broadcast(queries), Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(max(col("cosine")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** An LSH index reloaded from its ON-DISK layout
    * ([[graft.sinks.Sink.writeLshIndex]] / `readLshIndex`): the
    * hyperplanes + band count (tiny metadata), the signed corpus
    * `(vec_id, unit, sig)` as a plain parquet table (the rerank side —
    * ONE row per vector, no band inflation), and the POSTINGS table
    * `(vec_id)` partitioned by `(band, bucket)` — the real disk shape of
    * an LSH index (per-band hash tables hold postings, not vectors), so
    * a probe reads only its probe-bucket directories.
    */
  final case class PersistedLshIndex(
      planes: Array[Array[Double]],
      bands: Int,
      signed: DataFrame,
      postings: DataFrame) {
    def nBits: Int = planes.length
    def bitsPerBand: Int = nBits / bands
  }

  /** [[lshQuery]] against the PARTITIONED on-disk index: the query
    * signatures are fetched first (one bounded collect — #queries longs),
    * every multi-probe (band, bucket) pair is computed driver-side, and
    * the union is pushed as a STATIC predicate on the postings table's
    * partition columns, so the candidate scan carries a PartitionFilter
    * and provably reads only the probed bucket directories
    * (SimilarityIndexPersistSpec asserts it) — no reliance on runtime
    * DPP. Candidate pairs are identical to [[lshQuery]]'s (the static
    * filter is the probe UNION and prunes I/O; the per-(band, bucket)
    * join still restricts each query to its own probes), and the rerank
    * joins candidate ids back to the signed table for exact cosine — so
    * results are bit-equal to the in-memory path on the same corpus.
    */
  def lshQueryPruned(
      index: PersistedLshIndex,
      queryIds: Seq[Long],
      k: Int = 10): DataFrame = {
    val spark = index.signed.sparkSession
    val bitsPerBand = index.bitsPerBand
    val mask = (1L << bitsPerBand) - 1
    // ONE signed-table scan for the query vectors: the collected rows
    // (#queries × (id, unit, sig) — request-sized) feed BOTH the
    // driver-side probe-pair set and the broadcast query relation, so
    // the table is not scanned a second time to rebuild identical rows
    val qproj = index.signed
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("unit"), col("sig"))
    val qrows = qproj.collect()
    val probePairs: Seq[(Int, Long)] = qrows.toSeq.flatMap { r =>
      val sig = r.getLong(2)
      (0 until index.bands).flatMap { b =>
        // arithmetic >> then mask == the query plan's shiftright+AND
        val base = (sig >> (b * bitsPerBand)) & mask
        (base +: (0 until bitsPerBand).map(i => base ^ (1L << i)))
          .map(v => (b, v))
      }
    }.distinct.sorted
    // linear probe predicate: one IN-list over the combined
    // (band << bits, bucket) key instead of an OR-chain of #queries ×
    // bands × (1 + bits/band) conjunctions — a realistic 100-query batch
    // would otherwise build ~24k expression nodes and fall out of
    // codegen; the combined key references only partition columns, so it
    // still prunes directories statically
    val probeKeys = probePairs.map { case (b, v) =>
      (b.toLong << bitsPerBand) + v
    }
    val probeFilter =
      if (probeKeys.isEmpty) lit(false)
      else (shiftleft(col("band").cast("long"), bitsPerBand) + col("bucket"))
        .isin(probeKeys: _*)
    def bandBucket(b: Int): Column =
      shiftright(col("sig"), b * bitsPerBand).bitwiseAND(mask)
    import scala.jdk.CollectionConverters._
    val queries = spark.createDataFrame(qrows.toList.asJava, qproj.schema)
      .select(
        col("vec_id").as("query_id"), col("unit").as("q_unit"),
        posexplode(array((0 until index.bands).flatMap { b =>
          bandBucket(b) +: (0 until bitsPerBand).map(i =>
            bandBucket(b).bitwiseXOR(lit(1L << i)))
        }: _*)).as(Seq("probe", "bucket")))
      .withColumn("band", (col("probe") / (1 + bitsPerBand)).cast("int"))
      .select(col("band"), col("bucket"), col("query_id"), col("q_unit"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    index.postings
      .filter(probeFilter) // static partition pruning on (band, bucket)
      .join(broadcast(queries), Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      // posting → corpus fetch: candidate ids pull their unit vectors
      .join(index.signed.select(col("vec_id"), col("unit")), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(max(col("cosine")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** [[lshQueryPruned]] for EXTERNAL query vectors — the LSH serving
    * shape, completing the serving family (IVF: [[ivfQueryVectors]],
    * IVF-PQ: [[ivfPqQueryVectors]]): requests arrive as `(query_id,
    * embedding)` rows, are SIGNED WITH THE PERSISTED HYPERPLANES (the
    * index's hash family — a request hashed with any other planes would
    * probe garbage buckets), multi-probe their band buckets (home +
    * every 1-bit flip), and the probe-pair union is pushed as the same
    * static combined-key predicate over the postings partition columns,
    * so against an on-disk index the candidate scan reads only probed
    * bucket directories. No self-exclusion (external queries). The
    * request batch is pinned once (`localCheckpoint`) so the signature
    * collect and the broadcast probe relation read the same rows.
    * [[graft.streaming.StreamAnnServe.servedLshWriter]] runs this per
    * micro-batch.
    */
  def lshQueryVectors(
      index: PersistedLshIndex,
      queries: DataFrame,
      k: Int = 10): DataFrame = {
    val bitsPerBand = index.bitsPerBand
    val mask = (1L << bitsPerBand) - 1
    // distinct signatures ride the pin job (Dataset.observe — r18;
    // probePairs dedupes anyway, so the set ≡ the former full collect)
    val sigObs = org.apache.spark.sql.Observation()
    val pinned = queries
      .select(col("query_id"), normalized(col("embedding")).as("q_unit"))
      .withColumn("sig", srpSignature(col("q_unit"), index.planes))
      .observe(sigObs, collect_set(col("sig")).as("sigs"))
      .localCheckpoint(true)
    val sigs = sigObs.get("sigs").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Long])
    val probePairs: Seq[(Int, Long)] = sigs.toSeq.flatMap { sig =>
      (0 until index.bands).flatMap { b =>
        val base = (sig >> (b * bitsPerBand)) & mask
        (base +: (0 until bitsPerBand).map(i => base ^ (1L << i)))
          .map(v => (b, v))
      }
    }.distinct.sorted
    // combined-key IN list over partition columns only — the
    // [[lshQueryPruned]] linear-predicate stance (an OR-chain of
    // #queries × bands × (1 + bits/band) conjunctions falls out of
    // codegen at realistic batch sizes)
    val probeKeys = probePairs.map { case (b, v) =>
      (b.toLong << bitsPerBand) + v
    }
    val probeFilter =
      if (probeKeys.isEmpty) lit(false)
      else (shiftleft(col("band").cast("long"), bitsPerBand) + col("bucket"))
        .isin(probeKeys: _*)
    def bandBucket(b: Int): Column =
      shiftright(col("sig"), b * bitsPerBand).bitwiseAND(mask)
    val probes = pinned
      .select(col("query_id"), col("q_unit"),
        posexplode(array((0 until index.bands).flatMap { b =>
          bandBucket(b) +: (0 until bitsPerBand).map(i =>
            bandBucket(b).bitwiseXOR(lit(1L << i)))
        }: _*)).as(Seq("probe", "bucket")))
      .withColumn("band", (col("probe") / (1 + bitsPerBand)).cast("int"))
      .select(col("band"), col("bucket"), col("query_id"), col("q_unit"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    index.postings
      .filter(probeFilter) // static partition pruning on (band, bucket)
      .join(broadcast(probes), Seq("band", "bucket"))
      .join(index.signed.select(col("vec_id"), col("unit")), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(max(col("cosine")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** An in-memory [[PersistedLshIndex]] view over a prebuilt [[LshIndex]]
    * — the postings relation derived from the signed table by the same
    * band arithmetic the disk layout materializes. Lets the serving path
    * ([[lshQueryVectors]]) run against cached indexes (registered
    * queries, tests) with identical semantics; the static probe filter
    * then prunes candidates instead of directories.
    */
  def lshIndexView(index: LshIndex): PersistedLshIndex = {
    val bitsPerBand = index.bitsPerBand
    val mask = (1L << bitsPerBand) - 1
    def bandBucket(b: Int): Column =
      shiftright(col("sig"), b * bitsPerBand).bitwiseAND(mask)
    val postings = index.signed.select(
      col("vec_id"),
      posexplode(array((0 until index.bands).map(bandBucket): _*))
        .as(Seq("band", "bucket")))
      .select(col("vec_id"), col("band").cast("int").as("band"),
        col("bucket"))
    PersistedLshIndex(index.planes, index.bands, index.signed, postings)
  }

  /** Build-then-query convenience; see [[ivfTopK]] note. */
  def lshTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nBits: Int = 64,
      bands: Int = 16,
      dim: Int = 64): DataFrame =
    lshQuery(buildLshIndex(embeddings, nBits, bands, dim), queryIds, k)

  // ------------------------------------------- within-label nearest dup

  /** Argmax-by-(cosine desc, id asc) as a partial-aggregating expression:
    * max over struct(cosine, −id) compares cosine first, then prefers the
    * SMALLER id on exact ties (ids are non-negative, so negation flips the
    * order safely). Recovering the id is a sign flip on the struct field.
    */
  private def bestNeighbor(cosine: Column, id: Column): Column =
    max(struct(cosine.as("cosine"), (-id).as("neg_id")))

  /** Nearest within-label neighbor for every vector — EXACT within each
    * label block, in three scale moves:
    *
    *   1. DEDUPE-FIRST: exact-duplicate vectors (identical unit arrays —
    *      the dominant redundancy in real training corpora) collapse to
    *      one representative via a hash groupBy BEFORE any pairwise work.
    *      A duplicate's NN is its lowest-id twin at cosine 1.0, answered
    *      directly from the group; only DISTINCT vectors enter the join.
    *      Pair cost is |distinct block|², not |block|².
    *   2. The pairwise stage is a partial-aggregating argmax: the join
    *      output feeds straight into a hash aggregate whose map-side
    *      combine reduces each partition to one running-best row per
    *      vec_id — per-pair rows NEVER shuffle (the old row_number-window
    *      formulation shuffled+sorted all |block|² pair rows; that was the
    *      measured 84 s at 20×).
    *   3. The remaining |distinct|² dots are one codegen'd loop per pair.
    *
    * The driver corpus is ISOTROPIC — within-label mean cosine ≈ 0, so
    * `label` is not a geometric cluster (measured; see SCALING.md) — and
    * on isotropic high-dimensional data no exact NN algorithm beats brute
    * force over distinct vectors. For the bucketed approximate variant
    * (near-linear candidates, measured-zero top-1 divergence on this
    * corpus) see [[nnWithinLabelAnn]].
    *
    * Tie note: a duplicate group's members beat any non-identical vector
    * (cosine exactly 1.0 requires bit-identical units); among equal
    * cosines the lowest id wins, which group representatives (min id)
    * preserve — identical to the all-pairs (cosine desc, id asc) order.
    */
  def nnWithinLabel(embeddings: DataFrame): DataFrame = {
    val u = embeddings.select(
      col("label"), col("vec_id"), normalized(col("embedding")).as("unit"))
    val groups = u
      .groupBy(col("label"), col("unit"))
      .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
      .repartition(col("label"))
    // members of a ≥2 group short-circuit: NN = lowest other id in group
    val dupAnswers = groups
      .filter(size(col("ids")) >= 2)
      .select(col("label"), col("ids"), explode(col("ids")).as("vec_id"))
      .select(col("label"), col("vec_id"),
        when(col("vec_id") === col("ids").getItem(0), col("ids").getItem(1))
          .otherwise(col("ids").getItem(0)).as("nn_vec_id"))
    val reps = groups.select(col("label"), col("unit"),
      col("ids").getItem(0).as("vec_id"), size(col("ids")).as("n_dups"))
    val a = reps.select(col("label"), col("vec_id"), col("unit"))
    val b = reps.select(col("label"), col("vec_id").as("nn_vec_id"),
      col("unit").as("nn_unit"))
    val repNN = a.join(b, "label")
      .filter(col("vec_id") =!= col("nn_vec_id"))
      .select(col("label"), col("vec_id"),
        dot(col("unit"), col("nn_unit")).as("cosine"), col("nn_vec_id"))
      .groupBy(col("label"), col("vec_id"))
      .agg(bestNeighbor(col("cosine"), col("nn_vec_id")).as("best"))
      .select(col("label"), col("vec_id"), (-col("best.neg_id")).as("nn_vec_id"))
    // only singleton groups still need the pairwise answer (dup-group reps
    // were answered above); dup-group reps DO remain as candidates in b
    val uniqueNN = repNN.join(
      reps.filter(col("n_dups") === 1).select(col("vec_id")),
      Seq("vec_id"), "left_semi")
    dupAnswers.unionByName(uniqueNN.select(col("label"), col("vec_id"), col("nn_vec_id")))
      .orderBy(col("vec_id"))
  }

  /** Hash-verifiable ANN recall audit: per query, the number of ANN
    * results and whether recall against the EXACT top-k (SQL-recomputable
    * by the oracle) clears `floor`. The ANN result LISTING is not
    * SQL-expressible (hash planes / trained centroids), but these claims
    * are deterministic — the same pattern as the Misra-Gries audit:
    * the oracle pins `n_results = k` and `recall_ge_floor = TRUE`, so a
    * recall regression breaks the hash instead of hiding behind a
    * rows-only check. Raw listings stay spec-tested with tighter floors.
    */
  def annRecallAudit(
      ann: DataFrame, exact: DataFrame, k: Int, floor: Double): DataFrame = {
    val hits = ann
      .join(exact.select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    ann.groupBy(col("query_id")).agg(count(lit(1)).as("n_results"))
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"), col("n_results"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") >= lit(k * floor))
          .as("recall_ge_floor"))
      .orderBy(col("query_id"))
  }

  /** ANN twin of [[nnWithinLabel]] — COVERAGE-AWARE DISPATCH.
    *
    * Round-5 forced-execution ScaleCheck measured the raw bucket path at
    * 491 s (20× corpus) where the exact dedupe-first path costs 5 s: on an
    * ISOTROPIC corpus SRP band buckets stay fat (4-bit bands ⇒ ~1/16 of a
    * label per bucket) and multi-probe × bucket-population explodes to
    * ~pairs×probes dot products, while the exact path's dedupe-first move
    * collapses replica mass before any pairwise work. An operator that is
    * strictly dominated on a MEASURABLE corpus property must not run
    * anyway — so this entry point prices both plans first
    * ([[annCostEstimate]]: two small aggs over the prebuilt cached index)
    * and takes the bucket path only when it is estimated to save at least
    * half the exact work (`costAdvantage`). Both paths return identical
    * schemas and — per the companion spec — identical top-1 answers on
    * this corpus, so dispatch never changes correctness, only cost.
    */
  def nnWithinLabelAnn(
      embeddings: DataFrame,
      nBits: Int = 64,
      bands: Int = 16,
      dim: Int = 64,
      costAdvantage: Double = 0.5): DataFrame = {
    val (bucketDots, exactDots) = annCostEstimate(embeddings, nBits, bands, dim)
    if (bucketDots < costAdvantage * exactDots)
      nnWithinLabelAnnBuckets(embeddings, nBits, bands, dim)
    else nnWithinLabel(embeddings)
  }

  /** Dispatch cost model for [[nnWithinLabelAnn]]: estimated dot-product
    * counts `(bucketPath, exactPath)`, from small aggregates over the
    * cached LSH index (the index is shared with the bucket path, so
    * pricing never duplicates the signing scan):
    *
    *   - bucket path = bands × Σ_{label,bucket} probeOcc × candOcc for
    *     BAND 0 — the exact expected size of the probe⋈candidate join,
    *     with probe occupancy counted from the real home+1-flip probe
    *     set (flip probes into EMPTY neighbor buckets — the clustered
    *     case — price as zero, which a Σn² model would overcharge).
    *     SRP bits are i.i.d., so band 0's histogram is representative
    *     of every band;
    *   - exact path = Σ_label nd² over DISTINCT unit vectors, because
    *     [[nnWithinLabel]] collapses identical vectors BEFORE pairwise
    *     work (the move the raw bucket path lacks).
    *
    * Structural consequence, worth stating: at the default 4-bit bands a
    * UNIFORM bucket histogram gives bucket ≈ (1+bitsPerBand)×n² ≥ n², so
    * fat-bucket corpora (isotropic data) always dispatch exact; the
    * bucket path wins only when buckets isolate small clusters AND flip
    * neighborhoods are sparse — precisely the corpus LSH is for.
    *
    * Public so specs can assert the dispatch decision itself, not just
    * its observable timing.
    */
  def annCostEstimate(
      embeddings: DataFrame,
      nBits: Int = 64,
      bands: Int = 16,
      dim: Int = 64): (Double, Double) = {
    val index = IndexCache.lsh(embeddings, nBits, bands, dim,
      carryCols = Seq("label"))
    val bitsPerBand = index.bitsPerBand
    val mask = (1L << bitsPerBand) - 1
    val home = col("sig").bitwiseAND(mask)
    val probeSet = array(home +: (0 until bitsPerBand).map(i =>
      home.bitwiseXOR(lit(1L << i))): _*)
    val probeOcc = index.signed
      .select(col("label"), explode(probeSet).as("bucket"))
      .groupBy(col("label"), col("bucket")).agg(count(lit(1)).as("p_n"))
    val candOcc = index.signed
      .groupBy(col("label"), home.as("bucket")).agg(count(lit(1)).as("c_n"))
    def scalar(df: DataFrame): Double =
      Option(df.first().get(0)).map(_.asInstanceOf[Long].toDouble)
        .getOrElse(0.0)
    val band0Dots = scalar(probeOcc
      .join(candOcc, Seq("label", "bucket"))
      .agg(sum(col("p_n") * col("c_n"))))
    val distinctSumSq = scalar(index.signed
      .select(col("label"), col("unit")).distinct()
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n"))))
    (bands.toDouble * band0Dots, distinctSumSq)
  }

  /** The raw SRP-LSH bucket path behind [[nnWithinLabelAnn]]: every
    * vector probes its band buckets (plus 1-bit-flip multi-probes) and
    * compares only same-label vectors sharing a bucket, exact-reranked.
    * SRP-LSH is DATA-INDEPENDENT — collision probability depends only on
    * the pair angle — so unlike IVF cells it degrades gracefully on the
    * isotropic driver corpus: a true NN at cosine ≈ 0.33 collides in ≥1 of
    * the 16 multi-probed bands with p ≈ 1 − 3·10⁻⁵ (per-band 4-bit
    * agreement 0.607⁴ plus the 1-flip term), measured as ~zero top-1
    * divergence in the companion spec.
    *
    * Still APPROXIMATE by construction: registered (via the dispatcher)
    * as its own rows-only query (`dedup_embedding_nn_ann`), with
    * [[nnWithinLabel]] the hash-checked exact twin. A pair sharing
    * several buckets is scored per occurrence and collapsed by the same
    * partial-aggregating argmax — repeated cheap dots beat a pair-dedup
    * shuffle. Vectors whose probed buckets hold no same-label candidate
    * fall back to the exact pass (coverage is total by construction).
    * Profitable when labels are large AND the embedding space is
    * clustered (buckets then isolate true neighbors); the dispatcher
    * prices exactly that condition.
    */
  def nnWithinLabelAnnBuckets(
      embeddings: DataFrame,
      nBits: Int = 64,
      bands: Int = 16,
      dim: Int = 64): DataFrame = {
    val index = IndexCache.lsh(embeddings, nBits, bands, dim,
      carryCols = Seq("label"))
    val bitsPerBand = index.bitsPerBand
    val mask = (1L << bitsPerBand) - 1
    def bandBucket(b: Int): Column =
      shiftright(col("sig"), b * bitsPerBand).bitwiseAND(mask)
    val signed = index.signed
    val probes = signed.select(
      col("label"), col("vec_id"), col("unit"),
      posexplode(array((0 until bands).flatMap { b =>
        bandBucket(b) +: (0 until bitsPerBand).map(i =>
          bandBucket(b).bitwiseXOR(lit(1L << i)))
      }: _*)).as(Seq("probe", "bucket")))
      .withColumn("band", (col("probe") / (1 + bitsPerBand)).cast("int"))
      .select(col("label"), col("band"), col("bucket"),
        col("vec_id"), col("unit"))
    val cands = signed.select(
      col("label"), col("vec_id").as("nn_vec_id"), col("unit").as("nn_unit"),
      posexplode(array((0 until bands).map(bandBucket): _*))
        .as(Seq("band", "bucket")))
    val annBest = probes.join(cands, Seq("label", "band", "bucket"))
      .filter(col("vec_id") =!= col("nn_vec_id"))
      .select(col("label"), col("vec_id"),
        dot(col("unit"), col("nn_unit")).as("cosine"), col("nn_vec_id"))
      .groupBy(col("label"), col("vec_id"))
      .agg(bestNeighbor(col("cosine"), col("nn_vec_id")).as("best"))
      .select(col("label"), col("vec_id"), (-col("best.neg_id")).as("nn_vec_id"))
    // exact fallback for vectors with zero same-label candidates in their
    // probed buckets (tiny set on any real corpus)
    val missed = signed.select(col("label"), col("vec_id"), col("unit"))
      .join(annBest.select(col("vec_id")), Seq("vec_id"), "left_anti")
    val full = signed.select(col("label"),
      col("vec_id").as("nn_vec_id"), col("unit").as("nn_unit"))
    val missedBest = missed
      .join(full, Seq("label"))
      .filter(col("vec_id") =!= col("nn_vec_id"))
      .select(col("label"), col("vec_id"),
        dot(col("unit"), col("nn_unit")).as("cosine"), col("nn_vec_id"))
      .groupBy(col("label"), col("vec_id"))
      .agg(bestNeighbor(col("cosine"), col("nn_vec_id")).as("best"))
      .select(col("label"), col("vec_id"), (-col("best.neg_id")).as("nn_vec_id"))
    annBest.unionByName(missedBest).orderBy(col("vec_id"))
  }

  // ----------------------------------------------------------- index cache

  /** One prebuilt index per (session, corpus plan, params): models the
    * production shape — indexes are built by an offline stage and queried
    * many times — inside the driver's one-shot query API. Keyed on the
    * corpus DataFrame's analyzed plan so different corpora (or different
    * sf dirs) never share an index; keyed on the session identity so a
    * stale cache can't outlive its SparkSession.
    */
  object IndexCache {
    private val ivfCache =
      scala.collection.concurrent.TrieMap.empty[(Int, String, String, Int, String), IvfIndex]
    private val ivfExactCache =
      scala.collection.concurrent.TrieMap.empty[(Int, String, String, Int, Int), IvfIndex]
    private val lshCache =
      scala.collection.concurrent.TrieMap.empty[(Int, String, String, Int, Int, String), LshIndex]
    private val pqCache =
      scala.collection.concurrent.TrieMap.empty[(Int, String, String, Int, Int, Int), PqModel]
    private val pqResidualCache =
      scala.collection.concurrent.TrieMap.empty[(Int, String, String, Int, Int, Int, Int), (Array[Array[Long]], PqModel)]
    // sessions that already carry the evict-on-stop listener
    private val hookedSessions =
      scala.collection.concurrent.TrieMap.empty[Int, Unit]

    private def corpusKey(df: DataFrame): (Int, String, String) = {
      val session = df.sparkSession
      val sid = System.identityHashCode(session)
      // evict this session's entries when its context ends: entries hold
      // strong refs to persisted DataFrames and must not outlive the
      // session that owns their cached blocks
      if (hookedSessions.putIfAbsent(sid, ()).isEmpty) {
        session.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
                : Unit = clearSession(sid)
          })
      }
      // canonicalized plan strings elide the file listing, so two reads of
      // DIFFERENT parquet dirs can stringify identically — the input file
      // set disambiguates; length+mtime invalidate the entry when a file
      // is rewritten IN PLACE under the same name (same-name staleness).
      // One listStatus per parent DIRECTORY, not one getFileStatus per
      // file: a many-thousand-part corpus must not pay thousands of
      // serial FS metadata round-trips on every query call.
      val conf = session.sparkContext.hadoopConfiguration
      val sortedFiles = df.inputFiles.sorted
      val stats: Map[String, String] = sortedFiles
        .groupBy(f => new org.apache.hadoop.fs.Path(f).getParent)
        .flatMap { case (dir, files) =>
          val wanted = files.map(f =>
            new org.apache.hadoop.fs.Path(f).getName).toSet
          try {
            dir.getFileSystem(conf).listStatus(dir).toSeq
              .filter(st => wanted(st.getPath.getName))
              .map(st => st.getPath.toString ->
                s"${st.getLen}:${st.getModificationTime}")
          } catch { case _: java.io.IOException => Nil }
        }
      def key(f: String): String = {
        val p = new org.apache.hadoop.fs.Path(f)
        // inputFiles and listStatus may differ in URI scheme spelling;
        // fall back to the bare name match within the same parent
        stats.getOrElse(p.toString,
          stats.collectFirst {
            case (k, v) if k.endsWith("/" + p.getName) => v
          }.getOrElse(""))
      }
      (sid, df.queryExecution.analyzed.canonicalized.toString,
        sortedFiles.map(f => s"$f:${key(f)}").mkString("|"))
    }

    /** An in-place rewrite reuses the plan string but changes the file
      * state. The stale entry must be actively UNPERSISTED, not just
      * re-keyed: Spark's CacheManager keys cached relations on the
      * canonicalized plan (which is identical for same-path reads), so a
      * rebuild's persist() would otherwise silently resurrect the old
      * cached blocks.
      */
    private def evictStale(sid: Int, plan: String, fileState: String): Unit = {
      ivfCache.keys
        .filter(k => k._1 == sid && k._2 == plan && k._3 != fileState)
        .foreach(k => ivfCache.remove(k).foreach(i =>
          try i.unpersist() catch { case _: Exception => () }))
      ivfExactCache.keys
        .filter(k => k._1 == sid && k._2 == plan && k._3 != fileState)
        .foreach(k => ivfExactCache.remove(k).foreach(i =>
          try i.unpersist() catch { case _: Exception => () }))
      lshCache.keys
        .filter(k => k._1 == sid && k._2 == plan && k._3 != fileState)
        .foreach(k => lshCache.remove(k).foreach(i =>
          try i.unpersist() catch { case _: Exception => () }))
      pqCache.keys
        .filter(k => k._1 == sid && k._2 == plan && k._3 != fileState)
        .foreach(k => pqCache.remove(k).foreach(m =>
          try m.unpersist() catch { case _: Exception => () }))
      pqResidualCache.keys
        .filter(k => k._1 == sid && k._2 == plan && k._3 != fileState)
        .foreach(k => pqResidualCache.remove(k).foreach { case (_, m) =>
          try m.unpersist() catch { case _: Exception => () } })
    }

    /** Drop (and unpersist) every cached index built under the given
      * session identity. Safe after the session is stopped — unpersist
      * failures on a dead context are swallowed.
      */
    def clearSession(sid: Int): Unit = {
      ivfCache.keys.filter(_._1 == sid).foreach { k =>
        ivfCache.remove(k).foreach(i =>
          try i.unpersist() catch { case _: Exception => () })
      }
      ivfExactCache.keys.filter(_._1 == sid).foreach { k =>
        ivfExactCache.remove(k).foreach(i =>
          try i.unpersist() catch { case _: Exception => () })
      }
      lshCache.keys.filter(_._1 == sid).foreach { k =>
        lshCache.remove(k).foreach(i =>
          try i.unpersist() catch { case _: Exception => () })
      }
      pqCache.keys.filter(_._1 == sid).foreach { k =>
        pqCache.remove(k).foreach(m =>
          try m.unpersist() catch { case _: Exception => () })
      }
      pqResidualCache.keys.filter(_._1 == sid).foreach { k =>
        pqResidualCache.remove(k).foreach { case (_, m) =>
          try m.unpersist() catch { case _: Exception => () } }
      }
      hookedSessions.remove(sid)
      ()
    }

    /** Drop (and unpersist) every cached index — the manual reset valve
      * for long-lived sessions that rebuild corpora under new file names
      * (mtime/size keying already handles in-place rewrites).
      */
    def clear(): Unit = {
      ivfCache.keys.foreach(k => ivfCache.remove(k).foreach(i =>
        try i.unpersist() catch { case _: Exception => () }))
      ivfExactCache.keys.foreach(k => ivfExactCache.remove(k).foreach(i =>
        try i.unpersist() catch { case _: Exception => () }))
      lshCache.keys.foreach(k => lshCache.remove(k).foreach(i =>
        try i.unpersist() catch { case _: Exception => () }))
      pqCache.keys.foreach(k => pqCache.remove(k).foreach(m =>
        try m.unpersist() catch { case _: Exception => () }))
      pqResidualCache.keys.foreach(k =>
        pqResidualCache.remove(k).foreach { case (_, m) =>
          try m.unpersist() catch { case _: Exception => () } })
      // hookedSessions intentionally NOT cleared: the sessions are still
      // live and already carry their evict-on-stop listener — forgetting
      // them here would register a duplicate listener per clear()+use
      // cycle (listeners are never deregistered)
    }

    def ivf(embeddings: DataFrame, nlist: Int,
        carryCols: Seq[String] = Nil): IvfIndex = {
      val (s, p, f) = corpusKey(embeddings)
      evictStale(s, p, f)
      ivfCache.getOrElseUpdate((s, p, f, nlist, carryCols.mkString(",")),
        buildIvfIndex(embeddings, nlist, carryCols = carryCols))
    }

    def ivfExact(embeddings: DataFrame, nlist: Int,
        iters: Int = 3): IvfIndex = {
      val (s, p, f) = corpusKey(embeddings)
      evictStale(s, p, f)
      ivfExactCache.getOrElseUpdate((s, p, f, nlist, iters),
        buildIvfIndexExact(embeddings, nlist, iters))
    }

    def lsh(embeddings: DataFrame, nBits: Int = 64, bands: Int = 16,
        dim: Int = 64, carryCols: Seq[String] = Nil): LshIndex = {
      val (s, p, f) = corpusKey(embeddings)
      evictStale(s, p, f)
      lshCache.getOrElseUpdate((s, p, f, nBits, bands, carryCols.mkString(",")),
        buildLshIndex(embeddings, nBits, bands, dim, carryCols = carryCols))
    }

    /** Cached flat-PQ model — trained once per (corpus, m, k, iters),
      * then shared by every [[pqTopK]]/[[ivfPqQuery]] call on the same
      * corpus. Same staleness/eviction contract as [[ivf]].
      */
    def pq(embeddings: DataFrame, m: Int = 8, k: Int = 16,
        iters: Int = 2): PqModel = {
      val (s, p, f) = corpusKey(embeddings)
      evictStale(s, p, f)
      pqCache.getOrElseUpdate((s, p, f, m, k, iters),
        buildPqModel(embeddings, m, k, iters))
    }

    /** Cached residual-PQ model (coarse centroids + codebooks trained on
      * cell residuals) — one offline build per (corpus, nlist, m, k,
      * iters); [[ivfPqResidualQuery]] queries it many times.
      */
    def pqResidual(embeddings: DataFrame, nlist: Int = 16, m: Int = 8,
        k: Int = 64, iters: Int = 2): (Array[Array[Long]], PqModel) = {
      val (s, p, f) = corpusKey(embeddings)
      evictStale(s, p, f)
      pqResidualCache.getOrElseUpdate((s, p, f, nlist, m, k, iters),
        buildPqResidualModel(embeddings, nlist, m, k, iters))
    }
  }

  // ---------------------------------------------------- int8 quantization

  /** Per-vector symmetric int8 quantization — the standard 4× index
    * compression step (scale = max|x|/127; q_i = round(x_i·127/max|x|)):
    * at 100 TB the quantized corpus is what stays resident for ANN rerank
    * while full-precision vectors stay on disk. Narrow map, zero shuffle.
    *
    * Determinism: elementwise (x·127)/max in IEEE double then half-away-
    * from-zero round — both identical in DuckDB (same expression tree, so
    * the oracle is bit-exact). |q_i| ≤ 127 + sub-ulp before rounding, so
    * the tinyint cast cannot overflow under ANSI. Zero vectors quantize
    * to all-zeros with scale 0. This is a build-stage corpus pass, not a
    * per-query hot loop — the interpreted HOF `transform` is acceptable
    * here (every per-query loop in this file is a codegen'd expression).
    */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val e = col("embedding")
    val mx = array_max(transform(e, x => abs(x.cast("double"))))
    embeddings.select(
      col("vec_id"),
      (mx / 127.0).as("scale"),
      when(mx === 0.0,
        transform(e, _ => lit(0).cast("tinyint")))
        .otherwise(transform(e,
          x => round(x.cast("double") * 127.0 / mx).cast("tinyint")))
        .as("qvec"))
  }

  /** Dequantized cosine vs exact cosine — the quantization-error audit
    * (max |Δcos| is the number that decides whether int8 rerank is safe).
    */
  def quantizationError(embeddings: DataFrame): DataFrame = {
    val q = quantizeInt8(embeddings)
    val deq = embeddings.join(q, "vec_id")
      .select(col("vec_id"),
        normalized(col("embedding")).as("u_exact"),
        normalized(transform(col("qvec"),
          x => x.cast("double") * col("scale"))).as("u_deq"))
    deq.select(col("vec_id"),
      (lit(1.0) - dot(col("u_exact"), col("u_deq"))).as("cos_err"))
  }

  // ---------------------------------------------- per-label diagnostics

  /** Per-label embedding diagnostics: centroid norm, mean squared vector
    * norm, and the within-label variance trace
    * (E[‖v‖²] − ‖centroid‖² = Σ_d Var[v_d]) — the compactness/diversity
    * audit a corpus build runs per cluster/source before trusting labels
    * for stratification or IVF training.
    *
    * Scale shape: one posexplode to (label, dim) with map-side-combinable
    * integer sums — the shuffle is labels×dims rows (corpus-size-
    * independent), then a labels-sized reduction. Nothing corpus-sized
    * crosses the network.
    *
    * Determinism: float components are fixed-pointed at 1e-6
    * (`round(v·1e6)` is exact in double — 24-bit float mantissa × 20-bit
    * scale < 53 bits), all sums run in integer/decimal space, and the
    * only float ops are final divisions/sqrt on exact integers — so both
    * engines produce bit-identical doubles and the oracle hash-compares.
    */
  def labelEmbeddingStats(embeddings: DataFrame): DataFrame = {
    val counts = embeddings.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"))
    val dec = "decimal(19,0)"
    val scaled = embeddings.select(
      col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("label"), col("dim"),
        round(col("v").cast("double") * 1000000.0).cast("long").as("vi"))
    val perDim = scaled
      .groupBy(col("label"), col("dim"))
      .agg(
        sum(col("vi")).as("sum_vi"),
        sum(col("vi").cast(dec) * col("vi").cast(dec)).as("sumsq_vi"))
    perDim
      .groupBy(col("label"))
      .agg(
        sum(col("sum_vi").cast(dec) * col("sum_vi").cast(dec)).as("csq"),
        sum(col("sumsq_vi")).as("ssq"))
      .join(broadcast(counts), Seq("label"))
      .select(
        col("label"),
        col("n_vectors"),
        (sqrt(col("csq").cast("double"))
          / (col("n_vectors").cast("double") * 1000000.0))
          .as("centroid_norm"),
        (col("ssq").cast("double")
          / (col("n_vectors").cast("double") * 1e12)).as("mean_sq_norm"))
      .withColumn("variance_trace",
        col("mean_sq_norm") - col("centroid_norm") * col("centroid_norm"))
      .orderBy(col("label"))
  }

  // ------------------------------------------------- kNN label audit

  /** Leave-one-out kNN majority-vote label audit: for a deterministic
    * md5-selected probe sample, predict each probe's label from its `k`
    * nearest OTHER vectors (exact integer squared-L2 on the
    * [[Clustering]] quantization lattice, ties → lowest vec_id; vote
    * ties → lowest label) and report prediction vs truth — the standard
    * "are my labels consistent with my embedding space" check before
    * trusting either for stratification, classifier training, or
    * semantic dedup. Majority-label disagreement concentrated in one
    * label = mislabeled slice or encoder blind spot.
    *
    * Everything is integer/lexicographic, so the DuckDB oracle replays
    * the identical neighbor sets and votes — hash-exact.
    *
    * 100 TB shape: the audit is SAMPLE-BOUNDED by design — `nProbes`
    * probes broadcast against one corpus scan (the [[bruteForceTopK]]
    * posture), so cost is O(nProbes × corpus) narrow work. The top-k cut
    * is TWO-PHASE like [[Clustering.diverseSample]]: phase 1 keeps each
    * partition's `k` smallest (dist, vec_id) per probe in a bounded
    * in-memory heap (narrow, no shuffle — lossless because a row outside
    * its partition's local smallest-k cannot be in the global
    * smallest-k), so the probe-keyed window sorts at most
    * k × partitions rows per probe — never a corpus-sized partition.
    * Corpus-wide labeling (not an audit) swaps the scan for IVF probe
    * cells ([[ivfQuery]]) — same vote logic over nprobe cells per query.
    */
  def knnLabelAudit(
      embeddings: DataFrame,
      k: Int = 5,
      nProbes: Int = 200): DataFrame = {
    val q = embeddings.select(
      col("vec_id"), col("label"),
      transform(
        col("embedding"),
        x => round((x.cast("double") + lit(Clustering.Shift))
          * lit(Clustering.Scale)).cast("long")).as("q"))
    // repo-standard pinned sample: smallest (md5(vec_id), vec_id) —
    // TakeOrderedAndProject, per-partition heaps, no global sort
    val probes = q
      .select(col("vec_id").as("probe_id"), col("label").as("true_label"),
        col("q").as("pq"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h"), col("probe_id"))
      .limit(nProbes)
      .drop("h")
    val scored = q
      .join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("true_label"), col("vec_id"),
        col("label"),
        graft.functions.VectorOps.vec_l2sq_long(col("q"), col("pq"))
          .as("dist"))
    // phase 1: bounded per-partition heap — keep the k smallest
    // (dist, vec_id) per probe per partition (worst kept row at the
    // head), so the window below never sees a corpus-sized row set.
    // Row-generic (label keeps whatever type the caller's corpus uses);
    // the heap keys (probe_id, vec_id, dist) are longs by construction
    val local = localTopKPerKey(scored, k, keyIdx = 0, distIdx = 4,
      idIdx = 2)
    // phase 2: exact top-k over the bounded survivor set
    val wNear = Window.partitionBy(col("probe_id"))
      .orderBy(col("dist"), col("vec_id"))
    val votes = local
      .withColumn("rn", row_number().over(wNear))
      .filter(col("rn") <= k)
      .groupBy(col("probe_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val wVote = Window.partitionBy(col("probe_id"))
      .orderBy(col("n_votes").desc, col("label"))
    votes
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("probe_id"), col("true_label"),
        col("label").as("predicted_label"), col("n_votes"),
        (col("label") === col("true_label")).as("correct"))
      .orderBy(col("probe_id"))
  }

  /** Bounded per-partition top-k pre-reduction (phase 1 of the two-phase
    * top-k used by [[knnLabelAudit]] and [[pqTopK]]): keep each
    * partition's `k` smallest (dist, id) rows per key in an in-memory
    * heap — narrow, no shuffle, LOSSLESS (a row outside its partition's
    * local smallest-k cannot be in the global smallest-k), so the exact
    * window in phase 2 sorts at most k × partitions rows per key instead
    * of a corpus-sized partition. Key/dist/id are positional long
    * columns; all other columns ride along untouched.
    */
  private def localTopKPerKey(
      df: DataFrame, k: Int,
      keyIdx: Int, distIdx: Int, idIdx: Int): DataFrame =
    df.mapPartitions { it =>
      val ord = Ordering.Tuple2(Ordering.Long, Ordering.Long)
        .on[org.apache.spark.sql.Row](r =>
          (r.getLong(distIdx), r.getLong(idIdx)))
      val heaps = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.PriorityQueue[
          org.apache.spark.sql.Row]]
      it.foreach { r =>
        val h = heaps.getOrElseUpdate(r.getLong(keyIdx),
          scala.collection.mutable.PriorityQueue.empty(ord))
        if (h.size < k) h.enqueue(r)
        else if (ord.lt(r, h.head)) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(org.apache.spark.sql.Encoders.row(df.schema))

  // ---------------------------------------------- product quantization

  /** Product-quantization codebooks (Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011 — the
    * compression layer of every billion-scale ANN deployment): split the
    * `dim`-dimensional lattice-quantized space into `m` contiguous
    * subspaces of dim/m components and train an independent `k`-centroid
    * codebook per subspace with the SAME integer-exact Lloyd recurrence
    * as [[Clustering.lloyd]] (md5-pinned seeds shared across subspaces,
    * assignment by exact squared L2 with ties → lowest code, update by
    * `sum div n`, empty codes keep their centroid). Everything stays on
    * the [[Clustering]] integer lattice, so a SQL engine unrolling the
    * same rounds reproduces every codebook cell bit for bit.
    *
    * Returns `cents(s)(j)` = centroid j of subspace s (k × dim/m longs
    * per subspace — driver-sized, like every codebook).
    *
    * 100 TB shape: each iteration is ONE corpus scan — a narrow
    * codegen'd per-subspace argmin (codebooks are plan literals) feeding
    * an explode to m rows per vector and a (sub, code)-keyed partial
    * aggregate of m·k·(dim/m + 1) cells; driver state is m·k·(dim/m)
    * longs. The scan-dominant cost model of PQ training.
    */
  def pqTrain(
      quant: DataFrame,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 2): Array[Array[Array[Long]]] = {
    require(m >= 1 && k >= 1 && iters >= 0)
    val seeds = quant
      .select(col("q"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"),
        col("vec_id"))
      .orderBy(col("h"), col("vec_id"))
      .limit(k)
      .collect()
      .map(_.getSeq[Long](0).toArray)
    if (seeds.isEmpty) return Array.empty
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim must be divisible by m = $m")
    val subDim = dim / m
    var cents: Array[Array[Array[Long]]] =
      Array.tabulate(m)(s => seeds.map(_.slice(s * subDim, (s + 1) * subDim)))
    for (_ <- 1 to iters) {
      // one codegen'd NearestCodeExpr per subspace against the FLAT
      // codebook literal — constant generated-code size in k (the
      // unrolled struct-argmin form breaks Janino's 64 KB method limit
      // at realistic code counts; see NearestCodeExpr)
      val perSub = (0 until m).map { s =>
        val sv = slice(col("q"), s * subDim + 1, subDim)
        val code = graft.functions.VectorOps
          .vec_nearest_code(sv, typedLit(cents(s).flatten.toSeq))
        struct(lit(s).as("sub"), code.as("code"), sv.as("sv"))
      }
      val sums = (0 until subDim).map(d => sum(col("e.sv")(d)).as(s"s$d"))
      val rows = quant
        .select(explode(array(perSub: _*)).as("e"))
        .groupBy(col("e.sub"), col("e.code"))
        .agg(sums.head, (sums.tail :+ count(lit(1)).as("n")): _*)
        .collect()
      val next = cents.map(_.map(_.clone()))
      rows.foreach { r =>
        val s = r.getInt(0); val j = r.getInt(1)
        val n = r.getLong(subDim + 2)
        var d = 0
        while (d < subDim) {
          next(s)(j)(d) = java.lang.Math.floorDiv(r.getLong(d + 2), n)
          d += 1
        }
      }
      cents = next
    }
    cents
  }

  /** Encode the quantized corpus against trained codebooks: one narrow
    * codegen'd scan → `(vec_id, codes array<int>)`, the 100 TB payoff —
    * m codes (m·log₂k bits ≈ 4-8 bytes) instead of dim floats (256
    * bytes at dim 64): the ADC scan that follows reads ~50× less.
    */
  def pqEncode(
      quant: DataFrame, cents: Array[Array[Array[Long]]]): DataFrame = {
    val m = cents.length
    require(m >= 1, "empty codebook")
    val subDim = cents(0)(0).length
    val codes = (0 until m).map { s =>
      graft.functions.VectorOps.vec_nearest_code(
        slice(col("q"), s * subDim + 1, subDim),
        typedLit(cents(s).flatten.toSeq))
    }
    quant.select(col("vec_id"), array(codes: _*).as("codes"))
  }

  /** PQ asymmetric-distance top-k (the ADC scan of Jégou et al. §IV):
    * for a deterministic md5-pinned probe set, rank the whole corpus by
    *
    *   adc(probe, vec) = Σ_s dtable(probe)(s)(codes(vec)(s))
    *
    * where `dtable(probe)(s)(j)` = exact integer ‖probe_s − cents(s)(j)‖²
    * (computed once per probe against the driver-sized codebooks and
    * broadcast as one flat k·m-long array per probe). The corpus-side
    * cost per (probe, vector) is m array lookups + adds over the 4-byte
    * code row — never the original vectors: this is the flat-PQ scan
    * that makes exhaustive reranking affordable at 100 TB, and it
    * composes with the IVF cell layout ([[ivfQuery]] / `writeIvfIndex`)
    * by running the same lookup inside nprobe cells instead of the full
    * corpus (IVF-PQ, the canonical billion-scale index).
    *
    * Integer-exact end to end (lattice quantization → integer Lloyd →
    * integer distance tables), so the DuckDB oracle replays training,
    * encoding, and the ADC ranking bit for bit.
    *
    * Top-k is two-phase ([[localTopKPerKey]]): bounded per-partition
    * heaps cut the corpus to k × partitions rows per probe before the
    * exact window — no corpus-sized sort partitions.
    *
    * Output: `(probe_id, rank, vec_id, adc_dist)`, ties → lowest vec_id.
    */
  def pqTopK(
      embeddings: DataFrame,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 2,
      nProbes: Int = 8,
      topK: Int = 5): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val model = IndexCache.pq(embeddings, m, k, iters)
    val kEff = model.kEff
    // md5-pinned probe sample with its quantized vectors (one narrow
    // TakeOrdered scan; the trained model comes from the cache)
    val probes = Clustering.quantized(embeddings)
      .select(col("vec_id"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"), col("q"))
      .orderBy(col("h"), col("vec_id"))
      .limit(nProbes)
      .select(col("vec_id"), col("q"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val dtables = probes.toSeq
      .map { case (pid, pq) => (pid, adcTableFlat(pq, model.cents)) }
      .toDF("probe_id", "tflat")
    val scored = model.codes
      .crossJoin(broadcast(dtables))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        adcColumn(m, kEff).as("adc_dist"))
    val local = localTopKPerKey(scored, topK, keyIdx = 0, distIdx = 2,
      idIdx = 1)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_dist"), col("vec_id"))
    local
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adc_dist"))
      .orderBy(col("probe_id"), col("rank"))
  }

  // ---------------------------------------- shared PQ query plumbing

  /** A trained PQ model: per-subspace codebooks plus the encoded corpus
    * (codes persisted like every prebuilt index here; residual models
    * carry a `cell` column beside the codes). Built once per (corpus,
    * params) via [[IndexCache.pq]]/[[IndexCache.pqResidual]] — training
    * is deterministic, so repeated queries must not re-scan the corpus.
    */
  final case class PqModel(
      cents: Array[Array[Array[Long]]], codes: DataFrame) {
    def kEff: Int = cents(0).length
    def subDim: Int = cents(0)(0).length
    def unpersist(): Unit = { codes.unpersist(); () }
  }

  /** Offline build of the flat-PQ model: quantize → train → encode →
    * persist. The [[IndexCache]]-backed stage behind [[pqTopK]] and
    * [[ivfPqQuery]].
    */
  def buildPqModel(
      embeddings: DataFrame,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 2): PqModel = {
    val quant = Clustering.quantized(embeddings).localCheckpoint(true)
    val cents = pqTrain(quant, m, k, iters)
    require(cents.nonEmpty, "PQ needs a non-empty corpus")
    val codes = pqEncode(quant, cents).persist(StorageLevel.MEMORY_AND_DISK)
    codes.count()
    PqModel(cents, codes)
  }

  /** Offline build of the RESIDUAL PQ model: integer-Lloyd coarse cells,
    * codebooks trained and codes encoded on `q − centroid(cell)`; the
    * codes table carries `cell`. Returns the coarse centroids with the
    * model — queries need them for probing and residual tables.
    */
  def buildPqResidualModel(
      embeddings: DataFrame,
      nlist: Int = 16,
      m: Int = 8,
      k: Int = 64,
      iters: Int = 2): (Array[Array[Long]], PqModel) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (coarse, assigned) = Clustering.fit(embeddings, nlist, 3)
    require(coarse.nonEmpty, "residual PQ needs a non-empty corpus")
    val coarseDf = broadcast(coarse.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "ccent"))
    val quant = Clustering.quantized(embeddings)
    val resid = quant
      .join(assigned.select(col("vec_id"), col("cluster").as("cell")),
        "vec_id")
      .join(coarseDf, "cell")
      .select(col("vec_id"),
        zip_with(col("q"), col("ccent"), (a, b) => a - b).as("q"),
        col("cell"))
      .localCheckpoint(true)
    val cents = pqTrain(resid.select("vec_id", "q"), m, k, iters)
    val codes = pqEncode(resid.select("vec_id", "q"), cents)
      .join(resid.select(col("vec_id"), col("cell")), "vec_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    codes.count()
    (coarse, PqModel(cents, codes))
  }

  /** Flat per-query ADC table: `tflat(s·kEff + j) = ‖qv_s − cents(s)(j)‖²`
    * in exact longs — index-for-index the math the oracle's SQL sums
    * replay. ONE definition shared by every PQ query path (flat,
    * composed, pruned, residual — the residual path passes the shifted
    * query `q − centroid(cell)` as `qv`).
    */
  private def adcTableFlat(
      qv: Array[Long], cents: Array[Array[Array[Long]]]): Seq[Long] = {
    val m = cents.length
    val kEff = cents(0).length
    val subDim = cents(0)(0).length
    val tflat = new Array[Long](m * kEff)
    for (s <- 0 until m; j <- 0 until kEff) {
      var acc = 0L
      var d = 0
      while (d < subDim) {
        val diff = qv(s * subDim + d) - cents(s)(j)(d)
        acc += diff * diff
        d += 1
      }
      tflat(s * kEff + j) = acc
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(tflat)
  }

  /** `Σ_s tflat[codes(s) + s·kEff]` as a codegen'd column (element_at is
    * 1-based; codes are 0-based).
    */
  private def adcColumn(m: Int, kEff: Int): Column = (0 until m)
    .map(s => element_at(col("tflat"), col("codes")(s) + lit(s * kEff + 1)))
    .reduce(_ + _)

  /** Two-phase ADC shortlist cut over (query_id, vec_id, adc_dist):
    * bounded per-partition heaps, then the exact window.
    */
  private def adcShortlist(cands: DataFrame, rerank: Int): DataFrame = {
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("vec_id"))
    localTopKPerKey(cands, rerank, keyIdx = 0, distIdx = 2, idIdx = 1)
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= rerank)
      .select(col("query_id"), col("vec_id"))
  }

  /** Exact cosine rerank of a (query_id, vec_id) shortlist against a
    * (vec_id, unit) table — the sole full-width vector reads in any PQ
    * query path. Ties → lowest vec_id; ranks from 1.
    */
  private def cosineRerank(
      shortlist: DataFrame,
      units: DataFrame,
      queryIds: Seq[Long],
      k: Int): DataFrame = {
    val wCos = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    shortlist
      .join(units, "vec_id")
      .join(broadcast(units.select(col("vec_id").as("query_id"),
        col("unit").as("q_unit")).filter(col("query_id").isin(queryIds: _*))),
        "query_id")
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
      .withColumn("rank", row_number().over(wCos))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Quantized query vectors fetched by id — one narrow filtered scan;
    * in production the query vectors arrive with the request.
    */
  private def quantizedQueries(
      embeddings: DataFrame,
      queryIds: Seq[Long]): Array[(Long, Array[Long])] =
    Clustering.quantized(embeddings)
      .filter(col("vec_id").isin(queryIds: _*))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))

  /** IVF-PQ query — the canonical billion-scale ANN layout (FAISS's
    * IVFPQ; Jégou et al. TPAMI 2011 §V), composed from this file's two
    * oracle-grade halves: the EXACT-Lloyd coarse quantizer
    * ([[buildIvfIndexExact]]) restricts each query to `nprobe` cells,
    * the PQ codes ([[pqTrain]]/[[pqEncode]]) rank the in-cell candidates
    * by ADC (m table lookups per candidate — no vector math, no vector
    * bytes), and only the top `rerank` ADC survivors per query are
    * reranked with exact float cosine. Codes are trained on raw vectors
    * (flat PQ); [[ivfPqResidualQuery]] is the residual-trained upgrade.
    *
    * Both the coarse index and the PQ model come from [[IndexCache]] —
    * repeated queries on the same corpus probe prebuilt structures, they
    * never retrain.
    *
    * 100 TB shape: at scale the celled corpus is the partitioned on-disk
    * table ([[graft.sinks.Sink.writeIvfPqIndex]], cell-pruned scans) with
    * the 4-8 byte code column stored alongside — a probe touches
    * nprobe/nlist of the corpus and reads codes, not vectors; the only
    * full-width vector reads are the ≤ queries × rerank shortlist rows.
    * Everything before the float rerank is integer-exact.
    *
    * Recall calibration on the synthetic corpus (ISOTROPIC uniform
    * vectors — PQ's worst case, no cluster structure for the codebooks
    * to exploit; real embedding corpora quantize better): 64 codes ×
    * 8 subspaces at rerank 64 measures recall@10 ≥ 0.7 per query at
    * both sf0.01 and sf0.1 (16 codes bottomed at 0.2-0.6). `rerank` is
    * the recall knob whose cost stays in the code domain — the
    * registered audit floor is 0.6 with that margin.
    */
  def ivfPqQuery(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      nlist: Int = 16,
      nprobe: Int = 12,
      m: Int = 8,
      kCodes: Int = 64,
      pqIters: Int = 2,
      rerank: Int = 64,
      k: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val index = IndexCache.ivfExact(embeddings, nlist)
    val model = IndexCache.pq(embeddings, m, kCodes, pqIters)
    val kEff = model.kEff
    val dtables = quantizedQueries(embeddings, queryIds).toSeq
      .map { case (qid, qv) => (qid, adcTableFlat(qv, model.cents)) }
      .toDF("query_id", "tflat")
    val queries = index.celled
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("unit").as("q_unit"))
      .withColumn("probe_cells",
        probeCells(index.centroids, col("q_unit"), nprobe))
      .select(col("query_id"), explode(col("probe_cells")).as("cell"))
    val cands = index.celled
      .join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .join(model.codes, "vec_id")
      .join(broadcast(dtables), "query_id")
      .select(col("query_id"), col("vec_id"),
        adcColumn(m, kEff).as("adc_dist"))
    cosineRerank(adcShortlist(cands, rerank),
      index.celled.select(col("vec_id"), col("unit")), queryIds, k)
  }

  /** RESIDUAL IVF-PQ (Jégou TPAMI'11 §V-A, the refinement FAISS's IVFPQ
    * ships by default): PQ codebooks are trained on the residuals
    * `r = q − coarse_centroid(cell)` instead of raw vectors — after the
    * coarse quantizer explains the cell-level structure, the residual
    * distribution is tighter and the same code budget quantizes it with
    * less error (the clustered-corpus spec measures the gap: 24 vs 15
    * hits at identical parameters; on the isotropic corpus, PQ's worst
    * case, it is ≈ flat). Everything stays on the integer lattice:
    * coarse centroids come from [[Clustering.fit]] (integer Lloyd),
    * residuals are long subtractions, probing ranks cells by integer L2
    * to the coarse centroids, and the ADC tables are per-(query, cell) —
    * `‖(q − c_cell)_s − pqcent‖²` — driver-computed and broadcast. The
    * only float math is the final cosine rerank of the shortlist.
    *
    * 100 TB shape: identical to [[ivfPqQuery]] (the codes column just
    * encodes residuals; candidates join their per-cell table by (cell,
    * query)); model and coarse centroids come from [[IndexCache]].
    */
  def ivfPqResidualQuery(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      nlist: Int = 16,
      nprobe: Int = 12,
      m: Int = 8,
      kCodes: Int = 64,
      pqIters: Int = 2,
      rerank: Int = 64,
      k: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (coarse, model) =
      IndexCache.pqResidual(embeddings, nlist, m, kCodes, pqIters)
    val kEff = model.kEff
    // per-(query, probed cell) residual ADC tables; cells ranked by
    // integer L2 to the coarse centroids (ties → lowest cell id)
    val probeRows = quantizedQueries(embeddings, queryIds).toSeq
      .flatMap { case (qid, qv) =>
        val byDist = coarse.zipWithIndex.map { case (c, j) =>
          var acc = 0L
          var d = 0
          while (d < qv.length) {
            val diff = qv(d) - c(d); acc += diff * diff; d += 1
          }
          (acc, j)
        }.sorted.take(nprobe)
        byDist.map { case (_, cellId) =>
          val cc = coarse(cellId)
          val rq = Array.tabulate(qv.length)(d => qv(d) - cc(d))
          (qid, cellId, adcTableFlat(rq, model.cents))
        }
      }.toDF("query_id", "cell", "tflat")
    val cands = model.codes
      .join(broadcast(probeRows), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        adcColumn(m, kEff).as("adc_dist"))
    val units = embeddings
      .select(col("vec_id"), normalized(col("embedding")).as("unit"))
    cosineRerank(adcShortlist(cands, rerank), units, queryIds, k)
  }

  /** [[ivfPqQuery]] against the PERSISTED layout
    * ([[graft.sinks.Sink.writeIvfPqIndex]] → `readIvfPqIndex`): the probe
    * cell union is computed driver-side and pushed as a static
    * `cell IN (...)` predicate (directory pruning, the
    * [[ivfQueryPruned]] contract), and the ADC candidate scan projects
    * `(vec_id, codes, cell)` ONLY — parquet COLUMN pruning keeps the
    * full-width `unit` vectors on disk for everything but the ≤ queries
    * × rerank shortlist rows (both prunings plan-asserted in
    * SimilarityIndexPersistSpec). Query vectors are re-quantized from
    * `embeddings` by id; in production they arrive with the request.
    * Results are bit-equal to [[ivfPqQuery]] under the same index
    * (identical codebooks, candidates, and tie rules).
    */
  def ivfPqQueryPruned(
      index: IvfIndex,
      pqCents: Array[Array[Array[Long]]],
      embeddings: DataFrame,
      queryIds: Seq[Long],
      nprobe: Int = 12,
      rerank: Int = 64,
      k: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val m = pqCents.length
    require(m >= 1, "empty PQ codebook")
    val kEff = pqCents(0).length
    val dtables = quantizedQueries(embeddings, queryIds).toSeq
      .map { case (qid, qv) => (qid, adcTableFlat(qv, pqCents)) }
      .toDF("query_id", "tflat")
    val queries = index.celled
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("unit").as("q_unit"))
      .withColumn("probe_cells",
        probeCells(index.centroids, col("q_unit"), nprobe))
      .select(col("query_id"), explode(col("probe_cells")).as("cell"))
    val probed: Seq[Int] = queries.select(col("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    val cands = index.celled
      .select(col("vec_id"), col("codes"), col("cell")) // NO unit: column prune
      .filter(col("cell").isin(probed: _*)) // static partition pruning
      .join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(dtables), "query_id")
      .select(col("query_id"), col("vec_id"),
        adcColumn(m, kEff).as("adc_dist"))
    cosineRerank(adcShortlist(cands, rerank),
      index.celled.select(col("vec_id"), col("unit")), queryIds, k)
  }

  /** [[ivfPqQueryPruned]] for EXTERNAL query vectors — production ANN
    * serving in its billion-scale layout: requests arrive as
    * `(query_id: Long, embedding)` rows carrying their own vectors
    * (never corpus members — no lookup scan, no self-exclusion), the
    * request batch is pinned once (`localCheckpoint` — the ADC-table
    * collect, the probe-cell collect, and both broadcast join sides must
    * read the SAME rows, [[ivfQueryVectors]]' determinism stance), and
    * everything downstream is the persisted IVF-PQ contract: static
    * `cell IN (...)` directory pruning, an ADC candidate scan that
    * projects `(vec_id, codes, cell)` ONLY (the full-width `unit`
    * vectors stay on disk for all but the ≤ batch × rerank shortlist
    * rows), and the exact float cosine rerank last.
    * [[graft.streaming.StreamAnnServe.servedPqWriter]] runs this per
    * micro-batch. Driver-side state per batch: batch × (m·kEff) ADC
    * longs + batch × nprobe probe ints — request-sized, never corpus-
    * sized.
    */
  def ivfPqQueryVectors(
      index: IvfIndex,
      pqCents: Array[Array[Array[Long]]],
      queries: DataFrame,
      nprobe: Int = 12,
      rerank: Int = 64,
      k: Int = 10): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val m = pqCents.length
    require(m >= 1, "empty PQ codebook")
    val kEff = pqCents(0).length
    // ONE pin job carries all three driver-side needs (Dataset.observe
    // — r18): the quantized query rows for the ADC tables, and the
    // probe-cell union for the static partition prune — the former
    // shape paid two more collect jobs over the just-pinned batch.
    // probe_cells rides the pinned rows too, so the broadcast probe
    // relation reads the SAME cells the union was built from.
    val qObs = org.apache.spark.sql.Observation()
    val pinned = queries.select(col("query_id"),
        normalized(col("embedding")).as("q_unit"),
        transform(col("embedding"), x =>
          round((x.cast("double") + lit(Clustering.Shift))
            * lit(Clustering.Scale)).cast("long")).as("q"))
      .withColumn("probe_cells",
        probeCells(index.centroids, col("q_unit"), nprobe))
      .observe(qObs,
        collect_list(struct(col("query_id"), col("q"))).as("qrows"),
        array_sort(array_distinct(
          flatten(collect_list(col("probe_cells"))))).as("cells"))
      .localCheckpoint(true)
    val dtables = qObs.get("qrows").asInstanceOf[Seq[Any]].toSeq
      .map { a =>
        val r = a.asInstanceOf[org.apache.spark.sql.Row]
        (r.getLong(0), adcTableFlat(r.getSeq[Long](1).toArray, pqCents))
      }
      .toDF("query_id", "tflat")
    val probes = pinned
      .select(col("query_id"), explode(col("probe_cells")).as("cell"))
    val probed: Seq[Int] = qObs.get("cells").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Int])
    val cands = index.celled
      .select(col("vec_id"), col("codes"), col("cell")) // NO unit: column prune
      .filter(col("cell").isin(probed: _*)) // static partition pruning
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(dtables), "query_id")
      .select(col("query_id"), col("vec_id"),
        adcColumn(m, kEff).as("adc_dist"))
    cosineRerankVectors(adcShortlist(cands, rerank),
      index.celled.select(col("vec_id"), col("unit")),
      pinned.select(col("query_id"), col("q_unit")), k)
  }

  /** [[cosineRerank]] with the query units handed in as `(query_id,
    * q_unit)` rows (external vectors) instead of fetched by corpus id.
    */
  private def cosineRerankVectors(
      shortlist: DataFrame,
      units: DataFrame,
      qUnits: DataFrame,
      k: Int): DataFrame = {
    val wCos = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    shortlist
      .join(units, "vec_id")
      .join(broadcast(qUnits), "query_id")
      .select(col("query_id"), col("vec_id"),
        dot(col("unit"), col("q_unit")).as("cosine"))
      .withColumn("rank", row_number().over(wCos))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }
}
