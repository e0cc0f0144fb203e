package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value). The reference library is
  * batch-only; these are the streaming extensions a training-data
  * pipeline needs, built on watermarked event time so state is bounded:
  *
  *   - [[windowedCounts]]: tumbling-window counts/sums per event type —
  *     incremental hash aggregation, late data dropped past the watermark;
  *   - [[sessionize]]: gap-based sessions per user via
  *     flatMapGroupsWithState — the custom-state escape hatch; emits one
  *     row per closed session, state evicted by event-time timeout.
  *
  * At scale, state is partitioned by the grouping key across executors;
  * the watermark bounds both state size and reprocessing depth.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionState(sessionStart: Long, lastSeen: Long, nEvents: Long, total: Double)

  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Tumbling-window aggregation with a watermark: safe incremental
    * aggregation in append mode.
    */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermark: String = "2 hours",
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact deduplication: drop events whose key was already
    * seen within the watermark horizon (`dropDuplicatesWithinWatermark`
    * keeps state bounded — the streaming twin of TextOps.exactDedup).
    */
  def dedupEvents(
      events: DataFrame,
      keyCols: Seq[String] = Seq("event_id"),
      watermark: String = "2 hours",
  ): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Gap-based sessionization: a session closes after `gapSeconds` of
    * user inactivity (or watermark timeout). One state object per user —
    * constant-size, evicted on timeout.
    */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      watermark: String = "2 hours",
  ): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000

    def close(userId: Long, s: SessionState): Session = Session(
      userId, new java.sql.Timestamp(s.sessionStart), new java.sql.Timestamp(s.lastSeen),
      s.nEvents, s.total)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(userId, _))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closedSessions = List.empty[Session]
            var cur = state.getOption
            // LATE events (within watermark, earlier batch missed them)
            // older than the open session's reach belong to separate,
            // already-gap-closed earlier sessions. This state model keeps
            // one open session per user, so they are emitted as closed
            // sessions rather than folded into the current one (which
            // would inflate counts and yield a session whose start
            // postdates its own member) — but same-batch late events
            // within one gap of EACH OTHER form one session, not N
            // singletons. They arrive here in sorted order, so a single
            // running accumulator sessionizes them among themselves.
            var lateCur: Option[SessionState] = None
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t > s.lastSeen + gapMs =>
                  // gap exceeded forward: close and start a new session.
                  // Any pending late run pertains to the session being
                  // closed (sorted order: no later event can precede the
                  // NEW session's start), so resolve it NOW — merge if it
                  // chained to within one gap of the (possibly
                  // backward-extended) start, else close it separately.
                  val resolved = lateCur match {
                    case Some(ls) if s.sessionStart - ls.lastSeen <= gapMs =>
                      SessionState(ls.sessionStart, s.lastSeen,
                        s.nEvents + ls.nEvents, s.total + ls.total)
                    case Some(ls) =>
                      closedSessions ::= close(userId, ls)
                      s
                    case None => s
                  }
                  lateCur = None
                  closedSessions ::= close(userId, resolved)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) if t < s.sessionStart - gapMs =>
                  lateCur match {
                    case Some(ls) if t <= ls.lastSeen + gapMs =>
                      lateCur = Some(ls.copy(lastSeen = math.max(ls.lastSeen, t),
                        nEvents = ls.nEvents + 1, total = ls.total + e.value))
                    case Some(ls) =>
                      closedSessions ::= close(userId, ls)
                      lateCur = Some(SessionState(t, t, 1, e.value))
                    case None =>
                      lateCur = Some(SessionState(t, t, 1, e.value))
                  }
                case Some(s) =>
                  // within the gap of the open session's span — possibly
                  // BEFORE its start (late): extends in either direction
                  cur = Some(s.copy(sessionStart = math.min(s.sessionStart, t),
                    lastSeen = math.max(s.lastSeen, t),
                    nEvents = s.nEvents + 1, total = s.total + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            // a late run that chained up to within one gap of the
            // (possibly backward-extended) open session belongs to it —
            // merge instead of emitting a spurious split
            (lateCur, cur) match {
              case (Some(ls), Some(s)) if s.sessionStart - ls.lastSeen <= gapMs =>
                cur = Some(SessionState(ls.sessionStart, s.lastSeen,
                  s.nEvents + ls.nEvents, s.total + ls.total))
              case (Some(ls), _) =>
                closedSessions ::= close(userId, ls)
              case _ => ()
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closedSessions.reverseIterator
          }
      }
  }

  /** Stream-stream interval join — the attribution shape: each left
    * event (e.g. a view) joins right events (e.g. purchases) of the
    * same key whose event time falls in [left_ts, left_ts + horizon].
    * Both sides carry watermarks and the join condition time-bounds the
    * right side relative to the left in BOTH directions, which is what
    * lets Spark derive state-eviction bounds: neither side's buffered
    * state outlives watermark + horizon. Inner join ⇒ matches emit as
    * soon as both sides arrive (append mode); at scale both streams
    * shuffle once on the key and state is per-key, horizon-bounded.
    *
    * `leftTimeCol`/`rightTimeCol` must be the WATERMARKED event-time
    * columns of their streams. Columns are referenced through the
    * passed frames, so callers filtering one source twice (a
    * self-join) must alias disambiguating names first.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      horizonSeconds: Long,
  ): DataFrame = {
    require(horizonSeconds > 0, "horizonSeconds must be positive")
    val keyCond = keyCols.map(k => left(k) === right(k)).reduce(_ && _)
    val timeCond = right(rightTimeCol) >= left(leftTimeCol) &&
      right(rightTimeCol) <= left(leftTimeCol) + expr(s"INTERVAL $horizonSeconds SECONDS")
    left.join(right, keyCond && timeCond, "inner")
  }
}
