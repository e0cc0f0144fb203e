package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to each left row the nearest right
  * row per equi-key — backward (most recent at-or-before, the default),
  * forward (earliest at-or-after), or nearest (closer of the two, ties
  * backward) — the time-series operator Spark has no native form of
  * (time-series lookups, slowly-changing dimensions, price-as-of-trade).
  * The full pandas `merge_asof` surface: direction + tolerance.
  *
  * Implementation is the UNION-AND-WINDOW formulation, not a range
  * join: tag both sides, union them, and carry the adjacent right row
  * forward (and/or backward) with last(ignoreNulls) over a (key, time)-
  * ordered window. Why this shape at 100 TB:
  *
  *   - ONE shuffle, keyed by the equi-key, and one within-partition
  *     sort (nearest adds a second sort, same exchange) — the same
  *     cost as the groupBys everywhere else in this library. A range
  *     join formulation (l JOIN r ON l.k = r.k AND r.ts <= l.ts, then
  *     argmax) materializes every (left row × all earlier right rows)
  *     pair first — quadratic in right-rows-per-key before the argmax
  *     prunes it.
  *   - No broadcast requirement: both sides can be corpus-sized.
  *   - Skew exposure is a single hot key's row count in one sort —
  *     the standard salting escape applies if one key dominates.
  *
  * Tie rule: a right row AT the left row's timestamp matches in every
  * direction (inclusive, DuckDB/pandas semantics) — right rows sort
  * BEFORE left rows at equal timestamps via the side tag. Multiple
  * right rows at the same (key, ts) resolve deterministically by
  * `rightTieCols` order: backward keeps the LAST, forward the FIRST;
  * pass explicit tie columns when right timestamps can collide.
  *
  * Null semantics: the matched right row attaches WHOLESALE, nulls
  * included — all payload columns come from the same right row. (A
  * per-column last(ignoreNulls) would backfill a legitimately-NULL
  * payload cell from an OLDER right row and could mix columns from
  * different right rows.) Implemented as one
  * last(struct(ts, payloads), ignoreNulls) carried over the window —
  * right rows contribute a non-null struct even when every payload
  * inside is null, so only genuinely match-less left rows get all-null
  * payloads.
  *
  * Tolerance: when set, a match farther than `tolerance` (in `tsCol`
  * units, inclusive) is dropped wholesale — the left row keeps all-null
  * payloads, exactly pandas `merge_asof(tolerance=...)`.
  */
object AsofJoin {

  val Backward = "backward"
  val Forward = "forward"
  val Nearest = "nearest"

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      rightTieCols: Seq[String] = Nil,
      direction: String = Backward,
      tolerance: Option[Long] = None,
  ): DataFrame = {
    require(Seq(Backward, Forward, Nearest).contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val payloadCols = right.columns.filterNot(c => keyCols.contains(c) || c == tsCol).toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    val clash = payloadCols.intersect(left.columns.toSeq)
    require(clash.isEmpty, s"right payload columns collide with left: ${clash.mkString(", ")}")
    // fail loudly instead of silently corrupting: _rts is the struct
    // field carrying the right timestamp, the rest are working columns
    val reserved = Seq("_rts", "_side", "_pay", "_pb", "_pf", "_pick")
    val reservedClash = (left.columns ++ right.columns).distinct.intersect(reserved)
    require(reservedClash.isEmpty,
      s"column names reserved by asofJoin: ${reservedClash.mkString(", ")}")

    // Null event times never participate in a match (pandas merge_asof
    // rejects null on-keys; DuckDB ASOF leaves them unmatched): a
    // null-ts RIGHT row would otherwise sort first under the ascending
    // backward order (Spark asc = nulls-first) and ride forward as a
    // bogus "predecessor" payload. Drop right nulls entirely; left
    // null-ts rows are kept (left-join cardinality) but forced
    // unmatched below.
    val l = left.withColumn("_side", lit(1))
    val r = right.where(col(tsCol).isNotNull).withColumn("_side", lit(0))
    val u0 = l.unionByName(r, allowMissingColumns = true)
    // One carried struct per direction (right ts rides inside as _rts for
    // the tolerance/nearest arithmetic); right rows contribute a
    // non-null struct (left rows null), so ignoreNulls skips exactly the
    // left rows — a null payload CELL inside the struct is preserved.
    val u = u0.withColumn("_pay", when(col("_side") === 0,
      struct(col(tsCol).as("_rts") +: payloadCols.map(col): _*)))

    def frame(spec: WindowSpec) =
      spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byKey = (cols: Seq[Column]) =>
      frame(Window.partitionBy(keyCols.map(col): _*).orderBy(cols: _*))
    // backward: ascending time; at equal ts rights precede lefts, later
    // tie columns win (LAST right row carried).
    val backOrder = col(tsCol).asc +: col("_side").asc +: rightTieCols.map(col(_).asc)
    // forward: descending traversal; at equal ts rights still precede
    // lefts, and descending tie columns leave the FIRST right row as the
    // last one traversed.
    val fwdOrder = col(tsCol).desc +: col("_side").asc +: rightTieCols.map(col(_).desc)

    val withDirs = direction match {
      case Backward => u.withColumn("_pb", last(col("_pay"), ignoreNulls = true).over(byKey(backOrder)))
      case Forward  => u.withColumn("_pf", last(col("_pay"), ignoreNulls = true).over(byKey(fwdOrder)))
      case Nearest  => u
        .withColumn("_pb", last(col("_pay"), ignoreNulls = true).over(byKey(backOrder)))
        .withColumn("_pf", last(col("_pay"), ignoreNulls = true).over(byKey(fwdOrder)))
    }

    val distBack = col(tsCol) - col("_pb").getField("_rts")
    val distFwd = col("_pf").getField("_rts") - col(tsCol)
    // tolerance filters each CANDIDATE before nearest chooses (pandas:
    // nearest-within-tolerance, not nearest-then-tolerance — a closer
    // but out-of-tolerance side must not shadow the in-tolerance one)
    def inTol(c: Column, dist: Column): Column = tolerance match {
      case None    => c
      case Some(t) => when(dist <= t, c)
    }
    val chosen = direction match {
      case Backward => inTol(col("_pb"), distBack)
      case Forward  => inTol(col("_pf"), distFwd)
      case Nearest =>
        val pb = inTol(col("_pb"), distBack)
        val pf = inTol(col("_pf"), distFwd)
        // ties (equal distance) go backward, as in pandas
        when(pb.isNotNull && (pf.isNull || distBack <= distFwd), pb).otherwise(pf)
    }

    // a left row with null ts has no defined as-of position (under the
    // descending forward order it would sort last and absorb a payload)
    val picked = withDirs.withColumn("_pick",
      when(col(tsCol).isNotNull, chosen))
    val unpacked = payloadCols.foldLeft(picked) { (df, c) =>
      df.withColumn(c, col("_pick").getField(c))
    }
    unpacked.where(col("_side") === 1)
      .drop("_side", "_pay", "_pb", "_pf", "_pick")
  }
}
