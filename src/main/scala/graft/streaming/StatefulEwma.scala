package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental per-key EWMA in keyed state — the streaming twin of
  * [[graft.operators.TimeSeriesOps.ewma]]'s batch fold. The
  * recurrence (s_0 = x_0; s_t = α·x_t + (1−α)·s_{t−1}) carries
  * across micro-batches in GroupState, so an unbounded sensor
  * history needs O(1) state per key where the batch form holds the
  * per-key series in an array.
  *
  * Within a micro-batch rows are folded in (t_us, event_id) order
  * (arrival order inside a batch is not meaningful); across batches
  * the fold continues from the saved accumulator — bit-identical to
  * the batch fold whenever batch boundaries respect event-time order
  * (the normal watermarked-ingest case, proven in StreamingSpec).
  *
  * State lifetime: with `idleMinutes > 0` (streaming queries with a
  * watermark upstream) a key whose last event falls `idleMinutes`
  * behind the watermark has its accumulator EVICTED via event-time
  * timeout — a churning key population (sensors decommissioned,
  * users gone) cannot grow state without bound. Eviction emits
  * nothing: the last update row already carried the final
  * accumulator, and a key that later returns simply restarts its
  * recurrence (s_0 = next value — the documented cold-start).
  * `idleMinutes = 0` retains state for the stream's lifetime, the
  * right call only for small fixed key populations (and the only
  * legal one when the input carries no watermark, e.g. the C24
  * catalog entry's single-batch file replay).
  */
object StatefulEwma extends Serializable {

  /** Input row. `ts` is the event-time column (µs TimestampType
    * upstream); for the TTL path it must be the WATERMARKED column
    * itself — see [[Sessionizer.Reading]].
    */
  case class Reading(user_id: Long, ts: java.time.Instant,
      event_id: Long, value: Double)
  case class EwmaRow(user_id: Long, n: Long, ewma: Double)
  case class State(ewma: Double, n: Long, last_us: Long)
  private def us(t: java.time.Instant): Long =
    t.getEpochSecond * 1000000L + t.getNano / 1000L

  def ewma(readings: Dataset[Reading], alpha: Double,
      idleMinutes: Int = 0)(
      implicit spark: SparkSession): Dataset[EwmaRow] = {
    import spark.implicits._
    require(idleMinutes >= 0, s"idleMinutes must be >= 0: $idleMinutes")
    val idleUs = idleMinutes * 60L * 1000000L
    // hoisted: the state functions ship to executors and must not
    // close over the (non-serializable) Dataset
    val streaming = readings.isStreaming

    def fold(userId: Long, rows: Iterator[Reading],
        state: GroupState[State]): Option[EwmaRow] = {
      val xs = rows.toArray.sortBy(r => (us(r.ts), r.event_id))
      if (xs.isEmpty) return None
      var (s, n) = state.getOption.map(st => (st.ewma, st.n)).getOrElse((0.0, 0L))
      for (r <- xs) {
        s = if (n == 0L) r.value else r.value * alpha + s * (1 - alpha)
        n += 1
      }
      val lastUs = us(xs.last.ts)
      state.update(State(s, n, lastUs))
      if (idleUs > 0 && streaming)
        // Rows behind the watermark are dropped by the operator, so
        // lastUs >= watermark and the TTL target is strictly past it
        // — the clamp is defense-in-depth (setTimeoutTimestamp
        // throws on a timestamp at or before the watermark).
        state.setTimeoutTimestamp(
          math.max((lastUs + idleUs) / 1000, state.getCurrentWatermarkMs() + 1))
      Some(EwmaRow(userId, n, s))
    }

    if (idleUs > 0 && streaming) {
      def update(userId: Long, rows: Iterator[Reading],
          state: GroupState[State]): Iterator[EwmaRow] =
        if (state.hasTimedOut) {
          // Idle past the TTL relative to the watermark: free the
          // accumulator. Nothing to emit — every prior row's update
          // already reached the sink.
          state.remove()
          Iterator.empty
        } else fold(userId, rows, state).iterator
      readings.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.EventTimeTimeout)(update)
    } else {
      def update(userId: Long, rows: Iterator[Reading],
          state: GroupState[State]): EwmaRow =
        fold(userId, rows, state).getOrElse {
          // Unreachable under NoTimeout (the function is only invoked
          // with data rows), but if dispatch ever changes, fail with
          // the cause instead of state.get's bare NoSuchElement.
          val st = state.getOption.getOrElse(throw new IllegalStateException(
            s"StatefulEwma: no rows and no state for key $userId " +
              "(unexpected invocation under NoTimeout)"))
          EwmaRow(userId, st.n, st.ewma)
        }
      readings.groupByKey(_.user_id)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
    }
  }
}
