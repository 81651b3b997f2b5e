package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{Sessionizer, StreamingOps}
import QueryUtil._

/** Group C (streaming half) — Structured Streaming variants of the
  * pipeline (SURVEY §2.C9-C12). Each query runs a real streaming
  * plan over the test data to completion (memory sink), so its
  * output is comparable against a batch DuckDB oracle.
  */
object StreamingQueries {

  /** C9 — watermarked tumbling-window aggregation on the stream. */
  def c9(s: SparkSession, dir: String): DataFrame = {
    val agg = StreamingOps.readEventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(epochMs(col("window.start")).as("w_start_ms"),
        col("event_type"), col("n"), col("sum_value"))
    StreamingOps.runToTable(agg, s, "c9_stream_window", "complete")
  }

  val c9Sql: String =
    """SELECT (epoch_ms(ts) // 21600000) * 21600000 AS w_start_ms, event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** C10 — streaming dedup: first arrival per (user, type, day)
    * within the watermark; only the key set is emitted, so the
    * result is deterministic regardless of arrival order.
    */
  def c10(s: SparkSession, dir: String): DataFrame = {
    val dedup = StreamingOps.readEventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"), col("ts"))
      .dropDuplicates("user_id", "event_type", "day")
      .select("user_id", "event_type", "day")
    StreamingOps.runToTable(dedup, s, "c10_stream_dedup", "append")
  }

  val c10Sql: String =
    "SELECT DISTINCT user_id, event_type, strftime(ts, '%Y-%m-%d') AS day FROM events"

  /** C11 — stateful sessionization (flatMapGroupsWithState), batch
    * execution; identical session semantics to C3's native
    * session_window, via custom state logic.
    */
  def c11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val readings = events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"))
      .as[Sessionizer.Reading]
    Sessionizer.sessionize(readings, gapMinutes = 30)(s).toDF()
  }

  val c11Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, epoch_us(ts) AS t_us,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
      |sessions AS (
      |  SELECT user_id, t_us,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY t_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id, count(*) AS n,
      |  CAST(min(t_us) // 1000 AS BIGINT) AS start_ms,
      |  CAST((max(t_us) + 1800000000) // 1000 AS BIGINT) AS end_ms
      |FROM sessions GROUP BY user_id, sid""".stripMargin

  /** C12 — stream ⋈ static dim enrichment (broadcast) + windowless
    * aggregation, complete mode.
    */
  def c12(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "customer")
    val agg = StreamingOps.readEventsStream(s, dir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
    StreamingOps.runToTable(agg, s, "c12_stream_enrich", "complete")
  }

  val c12Sql: String =
    """SELECT c_mktsegment AS segment, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "c9_stream_window" -> (c9 _),
    "c10_stream_dedup" -> (c10 _),
    "c11_sessionize_state" -> (c11 _),
    "c12_stream_enrich" -> (c12 _))

  val oracles: Map[String, String] = Map(
    "c9_stream_window" -> c9Sql,
    "c10_stream_dedup" -> c10Sql,
    "c11_sessionize_state" -> c11Sql,
    "c12_stream_enrich" -> c12Sql)
}
