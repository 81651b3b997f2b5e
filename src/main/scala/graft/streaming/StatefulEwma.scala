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
  */
object StatefulEwma {

  case class Reading(user_id: Long, t_us: Long, event_id: Long, value: Double)
  case class EwmaRow(user_id: Long, n: Long, ewma: Double)
  case class State(ewma: Double, n: Long)

  def ewma(readings: Dataset[Reading], alpha: Double)(
      implicit spark: SparkSession): Dataset[EwmaRow] = {
    import spark.implicits._

    def update(userId: Long, rows: Iterator[Reading],
        state: GroupState[State]): EwmaRow = {
      val xs = rows.toArray.sortBy(r => (r.t_us, r.event_id))
      var (s, n) = state.getOption.map(st => (st.ewma, st.n)).getOrElse((0.0, 0L))
      for (r <- xs) {
        s = if (n == 0L) r.value else r.value * alpha + s * (1 - alpha)
        n += 1
      }
      state.update(State(s, n))
      EwmaRow(userId, n, s)
    }

    readings.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }
}
