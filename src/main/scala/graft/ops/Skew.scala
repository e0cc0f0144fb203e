package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at scale. AQE's skew-join
  * splitting handles most cases automatically; these are the explicit
  * tools for when a key's fan-out must be bounded by construction
  * (e.g. a single pathological join key holding >1 executor's worth of
  * rows, or a global/near-global aggregation key).
  */
object Skew {

  /** Salted equi-join: the skewed (big) side gets a deterministic salt in
    * [0, salt); the other side is replicated `salt` times; the join key
    * becomes (keys, salt), splitting each hot key into `salt` independent
    * partitions. Use when `right` is too big to broadcast but small
    * enough to replicate `salt`×.
    *
    * The salt is derived by hashing ALL left columns — rows with the same
    * join key scatter across buckets, and the result is deterministic for
    * deterministic input.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salt: Int,
      joinType: String = "inner",
  ): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Two-phase salted sum for aggregations whose group key is too
    * low-cardinality to parallelize (worst case: a global sum feeding a
    * single reducer). Phase 1 aggregates per (keys, salt); phase 2 merges
    * the `salt` partials. Catalyst's map-side partial aggregation already
    * does this for most cases — reach for this only when the final
    * single-partition merge itself is the bottleneck.
    */
  def saltedSum(
      df: DataFrame,
      keys: Seq[String],
      valueCols: Seq[String],
      salt: Int,
  ): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val phase1Aggs = valueCols.map(c => sum(col(c)).as(c))
    val phase1 = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)
    val phase2Aggs = valueCols.map(c => sum(col(c)).as(c))
    if (keys.isEmpty) phase1.agg(phase2Aggs.head, phase2Aggs.tail: _*)
    else phase1.groupBy(keys.map(col): _*).agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  /** Top frequent keys of a column — the probe you run to decide whether
    * a join needs salting (and with which keys).
    */
  def keyHistogram(df: DataFrame, key: String, topK: Int = 20): DataFrame =
    df.groupBy(key).count().orderBy(col("count").desc).limit(topK)
}
