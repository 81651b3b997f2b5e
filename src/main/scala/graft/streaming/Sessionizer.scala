package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful sessionization via flatMapGroupsWithState
  * (SURVEY §2.C11): custom per-key state the built-in
  * session_window cannot express (e.g. emitting per-session
  * aggregates with arbitrary logic).
  *
  * Two execution modes, dispatched on `readings.isStreaming`:
  *
  *  - **Batch**: Spark invokes the function once per key with all
  *    rows; every session (including the final one) is emitted in
  *    that single invocation and no state survives — the mode the
  *    C11 catalog entry and its SQL oracle run.
  *  - **Streaming**: open sessions live in GroupState across
  *    micro-batches with an EVENT-TIME TIMEOUT at (last event +
  *    gap): when the query watermark passes that point the session
  *    can never be extended, so the timeout invocation emits it and
  *    REMOVES the state. A sensor that goes silent therefore leaves
  *    neither an unemitted session nor leaked state — per-key state
  *    is bounded by the open-session record, and the key count by
  *    the watermark horizon, not the stream's lifetime. Callers
  *    must set `withWatermark` upstream (Spark rejects event-time
  *    timeouts on un-watermarked streams at query start); the
  *    cross-batch fold assumes batch boundaries respect event-time
  *    order for rows of one key (the watermarked-ingest contract,
  *    same as [[StatefulEwma]]).
  *
  * Rows arrive unsorted; the per-key sort below bounds memory by the
  * per-key row count within one (micro-)batch — for keys too hot for
  * that, the composed [[graft.operators.TimeSeriesOps.sessionize]]
  * (sort-based, spills) is the scale path.
  */
object Sessionizer extends Serializable {

  /** Input row. `ts` is the EVENT-TIME column (µs-precision
    * TimestampType upstream): in streaming execution it must be the
    * watermarked column itself — Spark's event-time-timeout check
    * requires the watermark-tagged attribute to reach the stateful
    * operator, so projecting it down to a long upstream would strip
    * the tag and fail the query at start.
    */
  case class Reading(user_id: Long, ts: java.time.Instant)
  case class Session(user_id: Long, n: Long, start_ms: Long, end_ms: Long)
  private def us(t: java.time.Instant): Long =
    t.getEpochSecond * 1000000L + t.getNano / 1000L
  /** One open (not yet closable) session: state carried across
    * micro-batches in streaming execution. */
  case class Open(start_us: Long, last_us: Long, n: Long)

  def sessionize(readings: Dataset[Reading], gapMinutes: Int)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def close(userId: Long, o: Open): Session =
      Session(userId, o.n, o.start_us / 1000, (o.last_us + gapUs) / 1000)

    /** Fold ascending-sorted timestamps of ONE (micro-)batch into
      * maximal gap-separated runs. */
    def runs(ts: Array[Long]): Vector[Open] = {
      var cur: Option[Open] = None
      val out = Vector.newBuilder[Open]
      for (t <- ts) cur match {
        case Some(o) if t - o.last_us < gapUs =>
          cur = Some(Open(o.start_us, t, o.n + 1))
        case Some(o) =>
          out += o; cur = Some(Open(t, t, 1))
        case None => cur = Some(Open(t, t, 1))
      }
      out.result() ++ cur
    }

    /** Merge the carried open session with this batch's runs.
      * The carried interval can sit ANYWHERE relative to the batch
      * (cross-batch arrival is only ordered up to the watermark
      * horizon), so the merge is interval-wise rather than assuming
      * the batch extends the carried tail: a run gap-separated
      * BEFORE the carried session closes immediately (a late region
      * that can only get later rows, conservatively emitted as its
      * own session), a run within the gap merges (start = min,
      * last = max — last_us can never regress, which is what keeps
      * the event-time timeout monotone), and a run gap-separated
      * AFTER closes the carried session and becomes the new open
      * one. Returns (closed sessions, still-open session).
      */
    def fold(userId: Long, carried: Option[Open], ts: Array[Long])
        : (Vector[Session], Option[Open]) = {
      var cur = carried
      val out = Vector.newBuilder[Session]
      for (b <- runs(ts)) cur match {
        case None => cur = Some(b)
        case Some(o) if b.start_us - o.last_us >= gapUs =>
          out += close(userId, o); cur = Some(b)
        case Some(o) if o.start_us - b.last_us >= gapUs =>
          out += close(userId, b)
        case Some(o) =>
          cur = Some(Open(math.min(o.start_us, b.start_us),
            math.max(o.last_us, b.last_us), o.n + b.n))
      }
      (out.result(), cur)
    }

    def emitBatch(userId: Long, rows: Iterator[Reading],
        state: GroupState[Open]): Iterator[Session] = {
      val ts = rows.map(r => us(r.ts)).toArray.sorted
      val (closed, open) = fold(userId, None, ts)
      (closed ++ open.map(close(userId, _))).iterator
    }

    def emitStreaming(userId: Long, rows: Iterator[Reading],
        state: GroupState[Open]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // Watermark passed last_us + gap: no in-horizon row can
        // extend this session. Emit and FREE the state.
        val done = close(userId, state.get)
        state.remove()
        Iterator.single(done)
      } else {
        val ts = rows.map(r => us(r.ts)).toArray.sorted
        val (closed, open) = fold(userId, state.getOption, ts)
        open match {
          case Some(o) =>
            // Event-time ms at which the open session becomes
            // unextendable; the timeout fires once the watermark
            // crosses it. The flatMapGroupsWithState operator drops
            // input rows behind the watermark (StreamingSpec pins
            // this), so surviving rows satisfy t >= watermark and
            // closeAt > watermark by construction — the branch below
            // is defense-in-depth against that filter ever changing,
            // because setTimeoutTimestamp THROWS on a timestamp at
            // or before the watermark and such a session could never
            // be extended anyway.
            val closeAtMs = (o.last_us + gapUs) / 1000
            if (closeAtMs <= state.getCurrentWatermarkMs()) {
              state.remove()
              return (closed :+ close(userId, o)).iterator
            }
            state.update(o)
            state.setTimeoutTimestamp(closeAtMs)
          case None => state.remove()
        }
        closed.iterator
      }
    }

    if (readings.isStreaming)
      readings.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout)(emitStreaming)
    else
      readings.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(emitBatch)
  }
}
