package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to each left row the most recent
  * right row whose time is <= the left row's time, per equi-key — the
  * time-series operator Spark has no native form of (TIME-series
  * lookups, slowly-changing dimensions, price-as-of-trade).
  *
  * Implementation is the UNION-AND-WINDOW formulation, not a range
  * join: tag both sides, union them, and carry the latest right payload
  * forward with last(ignoreNulls) over a (key, time)-ordered window.
  * Why this shape at 100 TB:
  *
  *   - ONE shuffle, keyed by the equi-key, and one within-partition
  *     sort — the same cost as the groupBys everywhere else in this
  *     library. A range-join formulation (l JOIN r ON l.k = r.k AND
  *     r.ts <= l.ts, then argmax) materializes every (left row × all
  *     earlier right rows) pair first — quadratic in right-rows-per-key
  *     before the argmax prunes it.
  *   - No broadcast requirement: both sides can be corpus-sized.
  *   - Skew exposure is a single hot key's row count in one sort —
  *     the standard salting escape applies if one key dominates.
  *
  * Tie rule: a right row AT the left row's timestamp matches
  * (inclusive as-of, DuckDB/pandas `merge_asof` semantics) — right
  * rows sort BEFORE left rows at equal timestamps via the side tag.
  * Multiple right rows at the same (key, ts) resolve to the last by
  * `rightTieCols` order; pass explicit tie columns when right
  * timestamps can collide.
  *
  * Null semantics: the latest right row attaches WHOLESALE, nulls
  * included — all payload columns come from the same right row. (A
  * per-column last(ignoreNulls) would backfill a legitimately-NULL
  * payload cell from an OLDER right row and could mix columns from
  * different right rows.) Implemented as one
  * last(struct(payloads), ignoreNulls) carried over the window —
  * right rows contribute a non-null struct even when every payload
  * inside is null, so only genuinely-preceding-row-less left rows
  * get all-null payloads.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      rightTieCols: Seq[String] = Nil,
  ): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keyCols.contains(c) || c == tsCol).toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    val clash = payloadCols.intersect(left.columns.toSeq)
    require(clash.isEmpty, s"right payload columns collide with left: ${clash.mkString(", ")}")

    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val ordered = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).asc +: col("_side").asc +: rightTieCols.map(col(_).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // One carried struct, not one last() per column: the latest right
    // row must win wholesale (nulls included). Right rows contribute a
    // non-null struct (left rows contribute null), so ignoreNulls skips
    // exactly the left rows — a null payload CELL inside the struct is
    // preserved, never backfilled from an older right row.
    val carried = u
      .withColumn("_pay",
        when(col("_side") === 0, struct(payloadCols.map(col): _*)))
      .withColumn("_pay", last(col("_pay"), ignoreNulls = true).over(ordered))
    val unpacked = payloadCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("_pay").getField(c))
    }
    unpacked.where(col("_side") === 1).drop("_side", "_pay")
  }
}
