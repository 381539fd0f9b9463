package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism floor for CPU-dense pipelines.
  *
  * A Spark scan's parallelism comes from file splits; a fused
  * scan→tokenize/decode/hash pipeline therefore runs with however many
  * tasks the SOURCE provides. On a corpus of many large files that is
  * plenty. On a small corpus — or an unsplittable input (one gzip file,
  * one parquet row group, exactly the local bench layout) — the whole
  * CPU-dense pipeline serializes onto one task while the rest of the
  * machine idles, and a byte-based coalescer (AQE) cannot help because it
  * only ever REDUCES partition counts.
  *
  * [[bySessionCores]] pins such a pipeline to at least the session's
  * core count, but ONLY when the estimated input is too small to yield
  * that many scan splits anyway — so the added exchange fires exactly in
  * the regime where it is trivially cheap (input < cores × split size,
  * i.e. at most a few GB per 32-core node), and at real scale the call is
  * the identity and no shuffle is added to the plan. Everything derives
  * from the session (core count, shuffle partitions, split size) — no
  * constant tuned to a particular deployment.
  *
  * Only safe where results are partitioning-independent: exact/integer
  * aggregates, joins, windows with total orders — which is every operator
  * here that uses it (the engine's integer-lattice determinism stance).
  * Do NOT apply upstream of float-sum aggregates.
  */
object Fanout {
  def bySessionCores(df: DataFrame, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val np = math.max(spark.sparkContext.defaultParallelism,
      spark.sessionState.conf.numShufflePartitions)
    val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val inputBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (inputBytes >= BigInt(splitBytes) * np) df
    else if (keys.isEmpty) df.repartition(np)
    else df.repartition(np, keys: _*)
  }
}
