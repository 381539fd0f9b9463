package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for key-skewed joins at scale.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; this is
  * the explicit salting pattern for cases AQE cannot rewrite (e.g. a
  * hot-key aggregation feeding a join, or a build side that must be
  * replicated): the skewed side gets a random-but-deterministic salt in
  * [0, factor), the replicated side is exploded across all salt values, and
  * the join key becomes (key, salt) — splitting each hot key's rows across
  * `factor` tasks.
  */
object Skew {

  /** Deterministic salt from row identity (not rand() — reproducible). */
  def salt(idCol: Column, factor: Int): Column =
    pmod(xxhash64(idCol), lit(factor)).cast("int")

  /** Join `big` (skewed on `key`) with `small`, salting the big side and
    * replicating the small side `factor` ways.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      idCol: String,
      factor: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt(col(idCol), factor))
    val replicatedSmall = small
      .withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
