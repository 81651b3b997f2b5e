package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps
import QueryUtil._

/** Group C (batch half) — time-series analytics over the sensor
  * stream (SURVEY §2.C): the windowed/rolling/as-of operators a
  * sensor platform runs downstream of the reference's ETL.
  */
object TimeSeriesQueries {

  /** C1 — tumbling 1-hour windows per sensor type: epoch-aligned,
    * map-side partial agg, single shuffle.
    */
  def c1(s: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.windowed(events(s, dir), col("ts"), "1 hour", None, col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(epochMs(col("window.start")).as("w_start_ms"),
        col("event_type"), col("n"), col("sum_value"))

  val c1Sql: String =
    """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS w_start_ms, event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** C2 — sliding (hopping) windows, 1 hour wide every 30 minutes:
    * each event lands in exactly two epoch-aligned windows.
    */
  def c2(s: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.windowed(events(s, dir), col("ts"), "1 hour",
        Some("30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(epochMs(col("window.start")).as("w_start_ms"),
        col("event_type"), col("n"), col("sum_value"))

  val c2Sql: String =
    """SELECT (epoch_ms(ts) // 1800000) * 1800000 - o.off * 1800000 AS w_start_ms,
      |       event_type, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS off) o
      |GROUP BY 1, 2""".stripMargin

  /** C3 — session windows with a 30-minute gap per user: sessions
    * merge while consecutive events are < 30 min apart; session end
    * is last event + gap (Spark session_window semantics).
    */
  def c3(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"),
        epochMs(col("sw.start")).as("start_ms"),
        epochMs(col("sw.end")).as("end_ms"))

  val c3Sql: String =
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

  /** C4 — rolling mean/min/max/stddev over the last 10 readings per
    * sensor; stddev suppressed below 2 samples (engines disagree on
    * NaN-vs-NULL there).
    */
  def c4(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("t_us"), col("value"))
    val w = TimeSeriesOps.rollingFrame(col("user_id"),
      Seq(col("t_us"), col("event_id")), nRows = 10)
    // Exact decimal rolling sums → derived avg/sd are bit-identical
    // doubles on any engine (no float summation order, no rounding).
    val n = count(lit(1)).over(w)
    val sm = sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
    val sq = sum((col("value") * col("value")).cast("decimal(22,4)"))
      .over(w).cast("double")
    e.select(
      col("event_id"), col("user_id"),
      (sm / n).as("roll_avg"),
      min(col("value")).over(w).as("roll_min"),
      max(col("value")).over(w).as("roll_max"),
      when(n > 1, sqrt((sq - sm * sm / n) / (n - lit(1)))).as("roll_sd"))
  }

  val c4Sql: String =
    """SELECT event_id, user_id,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |    / count(*) OVER w AS roll_avg,
      |  min(value) OVER w AS roll_min,
      |  max(value) OVER w AS roll_max,
      |  CASE WHEN count(*) OVER w > 1 THEN
      |    sqrt((CAST(sum(CAST(value * value AS DECIMAL(22,4))) OVER w AS DOUBLE)
      |          - CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |            * CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |            / count(*) OVER w)
      |         / (count(*) OVER w - 1)) END AS roll_sd
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""".stripMargin

  /** C5 — downsample to per-(sensor, day) buckets: first/last
    * reading by event time plus min/max/sum/count (OHLC shape).
    */
  def c5(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(
        // ordering key includes event_id: same-timestamp readings
        // must resolve deterministically (QueryUtil's total-order
        // rule). min/max over a (t, id, value) struct == the oracle's
        // first/last(value ORDER BY t, id).
        min(struct(unix_micros(col("ts")).as("t"), col("event_id").as("i"),
          col("value").as("v")))("v").as("open"),
        max(struct(unix_micros(col("ts")).as("t"), col("event_id").as("i"),
          col("value").as("v")))("v").as("close"),
        min(col("value")).as("low"),
        max(col("value")).as("high"),
        moneySum(col("value")).as("sum_value"),
        count(lit(1)).as("n"))

  val c5Sql: String =
    """SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
      |  first(value ORDER BY epoch_us(ts), event_id) AS open,
      |  last(value ORDER BY epoch_us(ts), event_id) AS close,
      |  min(value) AS low, max(value) AS high,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  count(*) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  /** C6 — forward-fill over gaps: readings of type 'error' carry no
    * valid value; fill each from the user's latest valid reading.
    */
  def c6(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("t_us"),
      when(col("event_type") =!= "error", col("value")).as("v"))
    TimeSeriesOps.forwardFill(e, col("v"), col("user_id"),
        Seq(col("t_us"), col("event_id")), as = "v_filled")
      .select("event_id", "user_id", "v", "v_filled")
  }

  val c6Sql: String =
    """SELECT event_id, user_id, v,
      |  last_value(v IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY t_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS t_us,
      |        CASE WHEN event_type <> 'error' THEN value END AS v
      |      FROM events)""".stripMargin

  /** C7 — as-of join (attribution): for each purchase, the user's
    * latest click at-or-before the purchase. Composed union +
    * forward-fill (one shuffle, no inequality nested-loop join) —
    * see [[TimeSeriesOps.asOfJoin]].
    */
  def c7(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id").as("purchase_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    TimeSeriesOps.asOfJoin(purchases, clicks, key = "user_id",
        timeUs = "t_us", leftId = "purchase_id", rightId = "click_id",
        carry = Seq("click_value"))
      .select(col("purchase_id"), col("user_id"),
        col("matched_click_id").as("click_id"),
        col("matched_time_us").as("click_t_us"),
        col("matched_click_value").as("click_value"))
  }

  val c7Sql: String =
    """SELECT purchase_id, user_id, click_id, click_t_us, click_value FROM (
      |  SELECT p.event_id AS purchase_id, p.user_id,
      |         c.event_id AS click_id, epoch_us(c.ts) AS click_t_us,
      |         c.value AS click_value,
      |         row_number() OVER (PARTITION BY p.event_id
      |           ORDER BY epoch_us(c.ts) DESC NULLS LAST,
      |                    c.event_id DESC NULLS LAST) AS rn
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |    ON p.user_id = c.user_id AND epoch_us(c.ts) <= epoch_us(p.ts))
      |WHERE rn = 1""".stripMargin

  /** C8 — z-score anomaly flags vs per-sensor stats, exact-decimal
    * mean/variance so the threshold decision is engine-stable.
    */
  def c8(s: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.zscore(events(s, dir), col("user_id"), col("value"))
      .filter(abs(col("z")) > 2.5)
      .select(col("event_id"), col("user_id"), round(col("z"), 3).as("z"))

  val c8Sql: String =
    """WITH stats AS (
      |  SELECT user_id AS k,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean,
      |    sqrt((CAST(sum(CAST(value * value AS DECIMAL(22,4))) AS DOUBLE)
      |          - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |            * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))
      |         / (count(*) - 1)) AS sd
      |  FROM events GROUP BY user_id)
      |SELECT event_id, user_id, round((value - mean) / sd, 3) AS z
      |FROM events JOIN stats ON user_id = k
      |WHERE abs((value - mean) / sd) > 2.5""".stripMargin

  /** C13 — as-of join with a match-age tolerance (pandas
    * merge_asof `tolerance`): clicks older than 1 hour don't count
    * as attribution.
    */
  def c13(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id").as("purchase_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    TimeSeriesOps.asOfJoinTolerance(purchases, clicks, key = "user_id",
        timeUs = "t_us", leftId = "purchase_id", rightId = "click_id",
        carry = Seq("click_value"), toleranceUs = 3600L * 1000000L)
      .select(col("purchase_id"), col("user_id"),
        col("matched_click_id").as("click_id"),
        col("matched_time_us").as("click_t_us"),
        col("matched_click_value").as("click_value"))
  }

  val c13Sql: String =
    """SELECT purchase_id, user_id,
      |  CASE WHEN p_us - click_t_us <= 3600000000 THEN click_id END AS click_id,
      |  CASE WHEN p_us - click_t_us <= 3600000000 THEN click_t_us END AS click_t_us,
      |  CASE WHEN p_us - click_t_us <= 3600000000 THEN click_value END AS click_value
      |FROM (
      |  SELECT p.event_id AS purchase_id, p.user_id, epoch_us(p.ts) AS p_us,
      |         c.event_id AS click_id, epoch_us(c.ts) AS click_t_us,
      |         c.value AS click_value,
      |         row_number() OVER (PARTITION BY p.event_id
      |           ORDER BY epoch_us(c.ts) DESC NULLS LAST,
      |                    c.event_id DESC NULLS LAST) AS rn
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |    ON p.user_id = c.user_id AND epoch_us(c.ts) <= epoch_us(p.ts))
      |WHERE rn = 1""".stripMargin

  /** C14 — resample to a dense per-sensor daily grid with
    * forward-filled values across empty buckets.
    */
  def c14(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    TimeSeriesOps.resample(events(s, dir), col("user_id"),
        unix_micros(col("ts")), col("value"),
        intervalUs = dayUs, fillForward = true)
      .select(col("k").as("user_id"), col("bucket"), col("n"),
        col("sum_v").as("sum_value"), col("sum_v_filled").as("sum_value_filled"))
  }

  val c14Sql: String =
    """WITH b AS (
      |  SELECT user_id AS k,
      |    (epoch_us(ts) // 86400000000) * 86400000000 AS bucket, value AS v
      |  FROM events),
      |agg AS (
      |  SELECT k, bucket, count(*) AS n,
      |    CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      |  FROM b GROUP BY 1, 2),
      |grid AS (
      |  SELECT k, unnest(range(lo, hi + 86400000000, 86400000000)) AS bucket
      |  FROM (SELECT k, min(bucket) AS lo, max(bucket) AS hi FROM b GROUP BY k)),
      |joined AS (
      |  SELECT grid.k, grid.bucket, coalesce(agg.n, 0) AS n, agg.sum_v
      |  FROM grid LEFT JOIN agg ON grid.k = agg.k AND grid.bucket = agg.bucket)
      |SELECT k AS user_id, bucket, n, sum_v AS sum_value,
      |  last_value(sum_v IGNORE NULLS) OVER (
      |    PARTITION BY k ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_filled
      |FROM joined""".stripMargin

  /** C15 — linear interpolation across invalid readings ('error'
    * events carry no value): lerp between nearest valid neighbors.
    */
  def c15(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("t_us"),
      when(col("event_type") =!= "error", col("value")).as("v"))
    TimeSeriesOps.interpolateLinear(e, col("v"), col("user_id"),
        col("t_us"), "v_interp")
      .select("event_id", "user_id", "v", "v_interp")
  }

  val c15Sql: String =
    """SELECT event_id, user_id, v,
      |  CASE WHEN v IS NOT NULL THEN v
      |       WHEN pv IS NOT NULL AND nv IS NOT NULL
      |         THEN pv + (nv - pv) * (t_us - pt) / (nt - pt)
      |       WHEN pv IS NOT NULL THEN pv
      |       ELSE nv END AS v_interp
      |FROM (
      |  SELECT event_id, user_id, t_us, v,
      |    last_value(v IGNORE NULLS) OVER wb AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN t_us END IGNORE NULLS)
      |      OVER wb AS pt,
      |    first_value(v IGNORE NULLS) OVER wf AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN t_us END IGNORE NULLS)
      |      OVER wf AS nt
      |  FROM (SELECT event_id, user_id, epoch_us(ts) AS t_us,
      |          CASE WHEN event_type <> 'error' THEN value END AS v
      |        FROM events)
      |  WINDOW
      |    wb AS (PARTITION BY user_id ORDER BY t_us
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wf AS (PARTITION BY user_id ORDER BY t_us
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))""".stripMargin

  /** C16 — per-sensor EWMA (α = 0.1) over the time-ordered series,
    * via the two-level chunked fold ([[TimeSeriesOps.ewmaChunked]],
    * 1-day chunks): per-task state is bounded by one day of one
    * sensor, so a hot key with billions of readings never
    * materializes in a single task. The oracle mirrors the identical
    * two-level fold (per-chunk sequential folds, then the affine
    * composition y ↦ a·y + b over chunks in order), so the doubles
    * match bit-for-bit with no rounding.
    */
  def c16(s: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.ewmaChunked(events(s, dir), col("user_id"),
      unix_micros(col("ts")), col("event_id"),
      col("value"), alpha = 0.1, chunkUs = 86400000000L)
      .select(col("key").as("user_id"), col("n"), col("ewma"))

  val c16Sql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS t_us, event_id, value FROM events),
      |ch AS (
      |  SELECT user_id, t_us // 86400000000 AS chunk, count(*) AS n,
      |    list_reduce(list_prepend(1.0, list(value ORDER BY t_us, event_id)),
      |      (ew_a, ew_x) -> ew_a * 0.9) AS ca,
      |    list_reduce(list(value ORDER BY t_us, event_id),
      |      (ew_a, ew_x) -> ew_x * 0.1 + ew_a * 0.9) AS cbseed,
      |    list_reduce(list_prepend(0.0, list(value ORDER BY t_us, event_id)),
      |      (ew_a, ew_x) -> ew_x * 0.1 + ew_a * 0.9) AS cbzero
      |  FROM ev GROUP BY 1, 2),
      |ranked AS (
      |  SELECT user_id, chunk, n, ca, cbseed, cbzero,
      |    row_number() OVER (PARTITION BY user_id ORDER BY chunk) AS rn
      |  FROM ch)
      |SELECT user_id, CAST(sum(n) AS BIGINT) AS n,
      |  list_reduce(
      |    list([ca, CASE WHEN rn = 1 THEN cbseed ELSE cbzero END] ORDER BY chunk),
      |    (ew_a, ew_s) -> [ew_s[1], ew_a[2] * ew_s[1] + ew_s[2]])[2] AS ewma
      |FROM ranked GROUP BY user_id""".stripMargin

  /** C17 — rate of change per sensor: value delta over time delta
    * between consecutive readings (total order on (t, event_id)),
    * with a spike flag. Same-timestamp pairs are excluded (no
    * zero-division), and the rate expression is written identically
    * on both engines so doubles match bit-for-bit.
    */
  def c17(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("t_us"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t_us"), col("value"))
      .withColumn("pv", lag(col("value"), 1).over(w))
      .withColumn("pt", lag(col("t_us"), 1).over(w))
      .filter(col("pv").isNotNull && col("t_us") > col("pt"))
      .select(col("user_id"), col("event_id"),
        (col("t_us") / 1000).cast("long").as("t_ms"),
        ((col("value") - col("pv")) * 1000000.0 / (col("t_us") - col("pt")))
          .as("rate"))
      .withColumn("spike", abs(col("rate")) > 100.0)
  }

  val c17Sql: String =
    """WITH w AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t_us, value,
      |    lag(value) OVER win AS pv, lag(epoch_us(ts)) OVER win AS pt
      |  FROM events
      |  WINDOW win AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      |SELECT user_id, event_id, CAST(t_us // 1000 AS BIGINT) AS t_ms,
      |  (value - pv) * 1000000.0 / (t_us - pt) AS rate,
      |  abs((value - pv) * 1000000.0 / (t_us - pt)) > 100.0 AS spike
      |FROM w WHERE pv IS NOT NULL AND t_us > pt""".stripMargin

  /** C18 — range join: events against per-(sensor, day) calibration
    * intervals (first two hours of each sensor's day), via the
    * bucketed equi-join [[TimeSeriesOps.pointInIntervalJoin]] — the
    * scale-safe form of a `BETWEEN` theta join (plan audited: no
    * nested-loop join).
    */
  def c18(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"))
    val iv = e
      .withColumn("d", expr("t_us div 86400000000"))
      .groupBy("user_id", "d").agg(min(col("t_us")).as("s_us"))
      .withColumn("e_us", col("s_us") + lit(7200000000L))
      .select("user_id", "s_us", "e_us")
    TimeSeriesOps.pointInIntervalJoin(e, iv, "user_id",
        "t_us", "s_us", "e_us", bucketUs = 3600000000L)
      .select(col("user_id"), col("event_id"),
        expr("t_us div 1000").as("t_ms"),
        expr("s_us div 1000").as("w_start_ms"))
  }

  val c18Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events),
      |iv AS (
      |  SELECT user_id, t_us // 86400000000 AS d, min(t_us) AS s_us
      |  FROM e GROUP BY 1, 2)
      |SELECT e.user_id, e.event_id,
      |  CAST(e.t_us // 1000 AS BIGINT) AS t_ms,
      |  CAST(iv.s_us // 1000 AS BIGINT) AS w_start_ms
      |FROM e JOIN iv ON e.user_id = iv.user_id
      |  AND e.t_us BETWEEN iv.s_us AND iv.s_us + 7200000000""".stripMargin

  /** C19 — gap detection: silent periods > 2 hours between
    * consecutive readings of a sensor (the report an ops team pages
    * on). One lag window over the per-sensor total order.
    */
  def c19(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("t_us"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"))
      .withColumn("pt", lag(col("t_us"), 1).over(w))
      .filter(col("pt").isNotNull && col("t_us") - col("pt") > 7200000000L)
      .select(col("user_id"),
        expr("pt div 1000").as("gap_start_ms"),
        expr("t_us div 1000").as("gap_end_ms"),
        expr("(t_us - pt) div 1000").as("gap_ms"))
  }

  val c19Sql: String =
    """WITH w AS (
      |  SELECT user_id, epoch_us(ts) AS t_us,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS pt
      |  FROM events)
      |SELECT user_id,
      |  CAST(pt // 1000 AS BIGINT) AS gap_start_ms,
      |  CAST(t_us // 1000 AS BIGINT) AS gap_end_ms,
      |  CAST((t_us - pt) // 1000 AS BIGINT) AS gap_ms
      |FROM w WHERE pt IS NOT NULL AND t_us - pt > 7200000000""".stripMargin

  /** C20 — interval × interval overlap join: per-user activity
    * sessions (30-min gap) against per-(user, day) calibration
    * windows (first 4 hours of the sensor's day), via
    * [[TimeSeriesOps.intervalOverlapJoin]] — bucketed equi-join,
    * exactly-once pair emission, no theta join (the oracle is the
    * plain BETWEEN-style theta join, proving equivalence).
    */
  def c20(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"))
    val sessions = TimeSeriesOps.sessionizeUs(e, col("user_id"), col("t_us"),
        gapUs = 1800000000L)
      .groupBy(col("user_id"), col("__session_id"))
      .agg(min(col("t_us")).as("ls_us"), max(col("t_us")).as("le_us"))
      .drop("__session_id")
    val cal = e
      .withColumn("d", expr("t_us div 86400000000"))
      .groupBy("user_id", "d").agg(min(col("t_us")).as("rs_us"))
      .withColumn("re_us", col("rs_us") + lit(14400000000L))
      .select("user_id", "rs_us", "re_us")
    TimeSeriesOps.intervalOverlapJoin(sessions, cal, "user_id",
        "ls_us", "le_us", "rs_us", "re_us", bucketUs = 3600000000L)
      .select(col("user_id"),
        expr("ls_us div 1000").as("s_start_ms"),
        expr("le_us div 1000").as("s_end_ms"),
        expr("rs_us div 1000").as("cal_start_ms"),
        expr("(least(le_us, re_us) - greatest(ls_us, rs_us)) div 1000")
          .as("overlap_ms"))
  }

  val c20Sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS t_us FROM events),
      |flagged AS (
      |  SELECT user_id, t_us,
      |    CASE WHEN lag(t_us) OVER w IS NULL
      |           OR t_us - lag(t_us) OVER w >= 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us)),
      |sessions AS (
      |  SELECT user_id, min(t_us) AS ls_us, max(t_us) AS le_us
      |  FROM (SELECT user_id, t_us,
      |          sum(new_s) OVER (PARTITION BY user_id ORDER BY t_us
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |        FROM flagged)
      |  GROUP BY user_id, sid),
      |cal AS (
      |  SELECT user_id, min(t_us) AS rs_us, min(t_us) + 14400000000 AS re_us
      |  FROM e GROUP BY user_id, t_us // 86400000000)
      |SELECT s.user_id,
      |  CAST(s.ls_us // 1000 AS BIGINT) AS s_start_ms,
      |  CAST(s.le_us // 1000 AS BIGINT) AS s_end_ms,
      |  CAST(c.rs_us // 1000 AS BIGINT) AS cal_start_ms,
      |  CAST((least(s.le_us, c.re_us) - greatest(s.ls_us, c.rs_us)) // 1000
      |    AS BIGINT) AS overlap_ms
      |FROM sessions s JOIN cal c
      |  ON s.user_id = c.user_id
      |  AND s.ls_us <= c.re_us AND c.rs_us <= s.le_us""".stripMargin

  /** C21 — per-sensor CUSUM drift statistics (target 50, slack 5):
    * final positive/negative accumulators of the classic one-sided
    * CUSUM recurrences, via the two-level chunked fold
    * ([[TimeSeriesOps.cusumChunked]], 1-day chunks — per-task state
    * bounded by one day of one sensor). CUSUM segments are max-plus
    * maps s ↦ max(m, s + t), which compose associatively; the oracle
    * mirrors the identical per-chunk folds and cross-chunk
    * composition, so the doubles are bit-exact with no rounding.
    */
  def c21(s: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.cusumChunked(events(s, dir), col("user_id"),
      unix_micros(col("ts")), col("event_id"),
      col("value"), target = 50.0, slack = 5.0, chunkUs = 86400000000L)
      .select(col("key").as("user_id"), col("n"),
        col("cusum_pos"), col("cusum_neg"),
        (col("cusum_pos") > 2000.0 || col("cusum_neg") < -2000.0).as("drift"))

  val c21Sql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS t_us, event_id, value FROM events),
      |ch AS (
      |  SELECT user_id, t_us // 86400000000 AS chunk, count(*) AS n,
      |    list_reduce(
      |      list_prepend(CAST('-infinity' AS DOUBLE), list(value ORDER BY t_us, event_id)),
      |      (cs_a, cs_x) -> greatest(0.0, cs_a + (cs_x - 55.0))) AS mpos,
      |    list_reduce(list_prepend(0.0, list(value ORDER BY t_us, event_id)),
      |      (cs_a, cs_x) -> cs_a + (cs_x - 55.0)) AS tpos,
      |    list_reduce(
      |      list_prepend(CAST('infinity' AS DOUBLE), list(value ORDER BY t_us, event_id)),
      |      (cs_a, cs_x) -> least(0.0, cs_a + (cs_x - 45.0))) AS mneg,
      |    list_reduce(list_prepend(0.0, list(value ORDER BY t_us, event_id)),
      |      (cs_a, cs_x) -> cs_a + (cs_x - 45.0)) AS tneg
      |  FROM ev GROUP BY 1, 2),
      |agg AS (
      |  SELECT user_id, CAST(sum(n) AS BIGINT) AS n,
      |    list_reduce(
      |      list_prepend([CAST('-infinity' AS DOUBLE), 0.0],
      |        list([mpos, tpos] ORDER BY chunk)),
      |      (cs_a, cs_s) -> [greatest(cs_s[1], cs_a[1] + cs_s[2]), cs_a[2] + cs_s[2]]) AS rp,
      |    list_reduce(
      |      list_prepend([CAST('infinity' AS DOUBLE), 0.0],
      |        list([mneg, tneg] ORDER BY chunk)),
      |      (cs_a, cs_s) -> [least(cs_s[1], cs_a[1] + cs_s[2]), cs_a[2] + cs_s[2]]) AS rneg
      |  FROM ch GROUP BY user_id)
      |SELECT user_id, n,
      |  greatest(rp[1], rp[2]) AS cusum_pos,
      |  least(rneg[1], rneg[2]) AS cusum_neg,
      |  greatest(rp[1], rp[2]) > 2000.0 OR least(rneg[1], rneg[2]) < -2000.0 AS drift
      |FROM agg""".stripMargin

  /** C23 — forward as-of join (pandas `direction="forward"`): for
    * each click, the user's EARLIEST purchase at-or-after the click —
    * conversion attribution. Same union + ordered-fill composition as
    * C7, run in reverse time order ([[TimeSeriesOps.asOfJoinForward]]).
    */
  def c23(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    TimeSeriesOps.asOfJoinForward(clicks, purchases, key = "user_id",
        timeUs = "t_us", leftId = "click_id", rightId = "purchase_id",
        carry = Seq("purchase_value"))
      .select(col("click_id"), col("user_id"),
        col("matched_purchase_id").as("purchase_id"),
        col("matched_time_us").as("purchase_t_us"),
        col("matched_purchase_value").as("purchase_value"))
  }

  val c23Sql: String =
    """SELECT click_id, user_id, purchase_id, purchase_t_us, purchase_value FROM (
      |  SELECT c.event_id AS click_id, c.user_id,
      |         p.event_id AS purchase_id, epoch_us(p.ts) AS purchase_t_us,
      |         p.value AS purchase_value,
      |         row_number() OVER (PARTITION BY c.event_id
      |           ORDER BY epoch_us(p.ts) ASC NULLS LAST,
      |                    p.event_id ASC NULLS LAST) AS rn
      |  FROM (SELECT * FROM events WHERE event_type = 'click') c
      |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |    ON c.user_id = p.user_id AND epoch_us(p.ts) >= epoch_us(c.ts))
      |WHERE rn = 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "c23_asof_forward" -> (c23 _),
    "c21_cusum" -> (c21 _),
    "c20_interval_overlap" -> (c20 _),
    "c19_gap_report" -> (c19 _),
    "c18_range_join" -> (c18 _),
    "c17_rate_of_change" -> (c17 _),
    "c16_ewma" -> (c16 _),
    "c15_interpolate" -> (c15 _),
    "c13_asof_tolerance" -> (c13 _),
    "c14_resample" -> (c14 _),
    "c1_tumbling_window" -> (c1 _),
    "c2_sliding_window" -> (c2 _),
    "c3_session_window" -> (c3 _),
    "c4_rolling_stats" -> (c4 _),
    "c5_downsample" -> (c5 _),
    "c6_gap_fill" -> (c6 _),
    "c7_asof_join" -> (c7 _),
    "c8_anomaly_zscore" -> (c8 _))

  val oracles: Map[String, String] = Map(
    "c23_asof_forward" -> c23Sql,
    "c21_cusum" -> c21Sql,
    "c20_interval_overlap" -> c20Sql,
    "c19_gap_report" -> c19Sql,
    "c18_range_join" -> c18Sql,
    "c17_rate_of_change" -> c17Sql,
    "c16_ewma" -> c16Sql,
    "c15_interpolate" -> c15Sql,
    "c13_asof_tolerance" -> c13Sql,
    "c14_resample" -> c14Sql,
    "c1_tumbling_window" -> c1Sql,
    "c2_sliding_window" -> c2Sql,
    "c3_session_window" -> c3Sql,
    "c4_rolling_stats" -> c4Sql,
    "c5_downsample" -> c5Sql,
    "c6_gap_fill" -> c6Sql,
    "c7_asof_join" -> c7Sql,
    "c8_anomaly_zscore" -> c8Sql)
}
