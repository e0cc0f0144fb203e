package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-based rolling aggregations — the RANGE-frame window family
  * (trailing sums/counts/means per key: "value in the last hour",
  * rate limits, moving averages over irregular event times).
  *
  * A RANGE frame is the correct tool where a ROWS frame is wrong:
  * the window is defined by the TIME distance [ts - span, ts], not a
  * row count, so irregularly-spaced events aggregate over exactly the
  * trailing interval, and equal-timestamp peers (RANGE includes all
  * frame peers) get identical results regardless of their tie order —
  * deterministic under any partitioning or retry.
  *
  * Scale shape: one shuffle keyed by `keys`, one within-partition sort
  * by time; EVERY aggregate over the same (keys, span) rides a single
  * Window node (one sort, verified in TimeSeriesSpec). Spark evaluates
  * trailing RANGE frames incrementally (sliding frame endpoints move
  * monotonically), so cost is O(rows) per partition after the sort,
  * not O(rows × frame size). A single hot key degrades to one
  * partition's sort — the standard salting escape applies.
  */
object TimeSeries {

  /** Adds one column per (name -> aggregate) computed over the trailing
    * RANGE frame [tsCol - span, tsCol] within each `keys` group. `span`
    * is inclusive on both ends, in `tsCol`'s own units (the column must
    * be numeric — e.g. epoch micros; use Queries-style tsUs derivation
    * for timestamps).
    */
  def rolling(
      df: DataFrame,
      tsCol: String,
      keys: Seq[String],
      span: Long,
      aggs: Seq[(String, Column)],
  ): DataFrame = {
    require(aggs.nonEmpty, "rolling needs at least one aggregate")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
      .rangeBetween(-span, 0)
    aggs.foldLeft(df) { case (acc, (name, a)) => acc.withColumn(name, a.over(w)) }
  }
}
