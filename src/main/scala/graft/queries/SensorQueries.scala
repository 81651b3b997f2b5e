package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline._
import QueryUtil._

/** Group A — the reference pipeline's own surface (SURVEY §2.A),
  * re-expressed Spark-first over the `events` "sensor readings"
  * table (user_id≈tagid, ts≈t_stamp, value≈reading) and the
  * `customer` metadata dimension.
  */
object SensorQueries {

  private def ev(s: SparkSession, dir: String): DataFrame = events(s, dir)

  /** A1 — DataProcessor._validate_schema (main_pipeline.py:202-211):
    * cast-to-expected, required-column presence, pruning, and
    * null-fill of optional absent columns.
    */
  private val a1Expected = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", IntegerType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("unit", StringType, nullable = true)))

  def a1(s: SparkSession, dir: String): DataFrame =
    SchemaEnforcer.enforce(ev(s, dir), a1Expected)

  val a1Sql: String =
    """SELECT event_id, CAST(user_id AS INT) AS user_id, event_type,
      |       value, CAST(NULL AS VARCHAR) AS unit
      |FROM events""".stripMargin

  /** A2 — integrity filter (dataintegrity != 0 analog,
    * main_pipeline.py:197): validity predicate pushed to the scan.
    */
  def a2(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .filter(SensorPipeline.integrityFilter(col("value"), 0.0, 150.0))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))

  val a2Sql: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE value IS NOT NULL AND NOT isnan(value)
      |  AND value >= 0.0 AND value <= 150.0
      |GROUP BY event_type""".stripMargin

  /** A3 — epoch-ms → timestamp conversion + calendar derivations
    * (main_pipeline.py:198). Round-trips ts through epoch ms like
    * the reference's raw `t_stamp`.
    */
  def a3(s: SparkSession, dir: String): DataFrame = {
    val withEpoch = ev(s, dir).select(col("event_id"),
      epochMs(col("ts")).as("t_stamp"))
    withEpoch.select(
      col("event_id"),
      col("t_stamp"),
      date_format(SensorPipeline.epochMsToTs(col("t_stamp")),
        "yyyy-MM-dd HH:mm:ss").as("dt_str"),
      hour(SensorPipeline.epochMsToTs(col("t_stamp"))).cast("int").as("hr"))
  }

  val a3Sql: String =
    """SELECT event_id, epoch_ms(ts) AS t_stamp,
      |       strftime(make_timestamp(epoch_ms(ts) * 1000), '%Y-%m-%d %H:%M:%S') AS dt_str,
      |       CAST(hour(make_timestamp(epoch_ms(ts) * 1000)) AS INT) AS hr
      |FROM events""".stripMargin

  /** A4 — broadcast metadata enrichment join
    * (main_pipeline.py:196): readings ⋈ dim, left, dim broadcast.
    */
  def a4(s: SparkSession, dir: String): DataFrame = {
    val joined = SensorPipeline.enrich(
      ev(s, dir), t(s, dir, "customer"), "user_id", "c_custkey")
    joined.groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
  }

  val a4Sql: String =
    """SELECT c.c_mktsegment AS segment, count(*) AS n,
      |       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1""".stripMargin

  /** A5 — regex sensor-pattern selection
    * (main_pipeline.py:343-350), kept distributed: pattern-filter
    * the tag dim, left-semi broadcast join the readings.
    */
  def a5(s: SparkSession, dir: String): DataFrame = {
    val tags = ev(s, dir).select(col("event_type").as("tagpath")).distinct()
    val sel = SensorPipeline.selectByTagPatterns(
      ev(s, dir), tags, Seq("^(er|si)", "ew$"), "event_type", "tagpath", "tagpath")
    sel.groupBy("event_type").agg(count(lit(1)).as("n"))
  }

  val a5Sql: String =
    """SELECT event_type, count(*) AS n
      |FROM events
      |WHERE regexp_matches(event_type, '^(er|si)') OR regexp_matches(event_type, 'ew$')
      |GROUP BY event_type""".stripMargin

  /** A6 — monthly pruning (filter_tables,
    * main_pipeline.py:179-187): the `*_YYYY_MM` cutoff comparison as
    * a partition-key predicate.
    */
  def a6(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("part_key", date_format(col("ts"), "yyyy_MM_dd"))
      .filter(col("part_key") >= "2024_01_15")
      .groupBy("part_key")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))

  val a6Sql: String =
    """SELECT strftime(ts, '%Y_%m_%d') AS part_key, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE strftime(ts, '%Y_%m_%d') >= '2024_01_15'
      |GROUP BY 1""".stripMargin

  /** A7 — incremental cutoff (_get_cutoff_date,
    * main_pipeline.py:331-341): cutoff = least(max ts of existing
    * data, fixed "now" − lookback), computed in-plan (scalar agg
    * cross join) instead of a driver collect.
    */
  def a7(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val existing = e.filter(col("ts") < lit("2024-01-10").cast("timestamp"))
    val cutoff = existing.agg(
      date_trunc("second",
        least(max(col("ts")),
          lit("2024-02-10").cast("timestamp") - expr("INTERVAL 30 DAYS")))
        .as("cutoff"))
    e.crossJoin(broadcast(cutoff))
      .filter(col("ts") >= col("cutoff"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), max(epochMs(col("ts"))).as("max_ms"))
  }

  val a7Sql: String =
    """WITH cutoff AS (
      |  SELECT date_trunc('second',
      |           least(max(ts), TIMESTAMP '2024-02-10' - INTERVAL 30 DAY)) AS c
      |  FROM events WHERE ts < TIMESTAMP '2024-01-10')
      |SELECT user_id, count(*) AS n, max(epoch_ms(ts)) AS max_ms
      |FROM events, cutoff WHERE ts >= cutoff.c
      |GROUP BY user_id""".stripMargin

  /** A8 — keep-latest dedup per (sensor, minute bucket)
    * (dropDuplicates(["datetime"]), main_pipeline.py:328) with a
    * deterministic winner: max event time, then max id.
    */
  def a8(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(
      col("user_id"),
      (floor(epochMs(col("ts")) / 60000L) * 60000L).as("minute_ms"),
      epochMs(col("ts")).as("t_ms"),
      col("event_id"), col("value"))
    SensorPipeline.dedupLatest(e,
        keys = Seq(col("user_id"), col("minute_ms")),
        orderDesc = Seq(col("t_ms"), col("event_id")))
      .select("user_id", "minute_ms", "event_id", "value")
  }

  val a8Sql: String =
    """SELECT user_id, minute_ms, event_id, value FROM (
      |  SELECT user_id,
      |         (epoch_ms(ts) // 60000) * 60000 AS minute_ms,
      |         event_id, value,
      |         row_number() OVER (
      |           PARTITION BY user_id, (epoch_ms(ts) // 60000) * 60000
      |           ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin

  /** A9 — wide per-sensor pivot (_write_outputs,
    * main_pipeline.py:305-329): the reference's driver-side loop
    * over tagpaths becomes one groupBy().pivot() with an explicit
    * value list (no plan-time distinct scan).
    */
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def a9(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(moneySum(col("value")))

  val a9Sql: String = {
    val cols = eventTypes.map(et =>
      s"CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (event_type = '$et') AS DOUBLE) AS $et")
    s"SELECT user_id, ${cols.mkString(", ")} FROM events GROUP BY user_id"
  }

  /** A10 — size-capped partitioned sink + read-back
    * (S3Writer.write_optimized, main_pipeline.py:222-230):
    * partitionBy(sensor) + maxRecordsPerFile, then validate by
    * re-reading. The oracle aggregates the source directly, proving
    * the write/read round-trip is lossless.
    */
  def a10(s: SparkSession, dir: String): DataFrame = {
    // fixed per-process path, overwritten each run — repeated
    // bench/verify invocations must not accumulate temp copies
    val out = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_a10_${java.lang.ProcessHandle.current().pid()}").toString
    OptimizedWriter.writeOptimized(
      ev(s, dir).select(col("event_id"), col("event_type"),
        epochMs(col("ts")).as("t_ms"), col("value")),
      out, partitionCols = Seq("event_type"), maxRecordsPerFile = 20000)
    s.read.parquet(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"),
        min(col("t_ms")).as("min_ms"), max(col("t_ms")).as("max_ms"))
  }

  val a10Sql: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |       min(epoch_ms(ts)) AS min_ms, max(epoch_ms(ts)) AS max_ms
      |FROM events GROUP BY event_type""".stripMargin

  /** A11 — union-by-name of monthly chunks
    * (unionByName, main_pipeline.py:303), with deliberately
    * permuted column order per chunk to exercise name resolution.
    */
  def a11(s: SparkSession, dir: String): DataFrame = {
    // One materialized scan feeding all 31 "daily table" chunks —
    // the reference reads one JDBC table per period; emulating that
    // from a single file must not cost 31 rescans.
    // Sorted within partitions by day before caching (no shuffle):
    // each cached batch then spans few day values, so the 31 chunk
    // filters prune batches via in-memory min/max stats instead of
    // re-scanning the whole cache 31 times.
    val e = ev(s, dir).withColumn("d", dayofmonth(col("ts")).cast("int"))
      .select("event_id", "user_id", "d", "value")
      .sortWithinPartitions("d")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunks = (1 to 31).map { d =>
      val c = e.filter(col("d") === d)
      if (d % 2 == 0) c.select("value", "d", "user_id", "event_id")
      else c.select("event_id", "user_id", "d", "value")
    }
    chunks.reduce(_ unionByName _)
      .groupBy("d")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
  }

  val a11Sql: String =
    """SELECT CAST(day(ts) AS INT) AS d, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1""".stripMargin

  /** A12 — output validation (Airflow S3-key check analog): per
    * (sensor, day) partition stats with emptiness flags.
    */
  def a12(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        min(epochMs(col("ts"))).as("min_ms"))
      .filter(col("n") > 0)

  val a12Sql: String =
    """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
      |       count(DISTINCT user_id) AS n_users, min(epoch_ms(ts)) AS min_ms
      |FROM events GROUP BY 1, 2 HAVING count(*) > 0""".stripMargin

  /** A13 — append-mode incremental merge
    * (SensorDataPipeline._write_outputs append branch,
    * main_pipeline.py:322-328): existing output ∪ late-arriving
    * re-extraction, keep-latest dedup on the natural key — the
    * idempotent "re-run a day" path.
    */
  def a13(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("event_id"), col("user_id"),
      epochMs(col("ts")).as("t_ms"), col("value"))
    val existing = e.filter(col("t_ms") % 1000 < 800)  // prior run's slice
    val reExtract = e.filter(col("t_ms") % 1000 >= 500) // overlapping re-pull
    val merged = existing.unionByName(reExtract)
    SensorPipeline.dedupLatest(merged,
        keys = Seq(col("event_id")),
        orderDesc = Seq(col("t_ms")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
  }

  val a13Sql: String =
    """SELECT user_id, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE epoch_ms(ts) % 1000 < 800 OR epoch_ms(ts) % 1000 >= 500
      |GROUP BY user_id""".stripMargin

  /** Materialize a round-trip aggregate and remove its scratch
    * directory: the collect is bounded (one row per event_type), and
    * eager evaluation is what lets the temp data be deleted before
    * this returns — repeated harness runs leave nothing behind.
    */
  private def collectAndClean(s: SparkSession, agg: DataFrame,
      scratch: java.io.File): DataFrame = {
    val rows = agg.collect()
    val schema = agg.schema
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    rm(scratch)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** A14 — CSV source round-trip: readings exported to CSV and read
    * back through the schema-enforced CSV reader
    * ([[graft.sources.Tables.loadCsv]] — explicit schema, no
    * inference scan). The oracle aggregates the parquet source
    * directly, so a PASS proves the CSV write/read path is lossless
    * (longs exact, doubles via shortest-round-trip text). The
    * scratch directory is deleted before returning.
    */
  def a14(s: SparkSession, dir: String): DataFrame = {
    val out = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_a14_${java.lang.ProcessHandle.current().pid()}")
    ev(s, dir).select(col("event_id"), col("user_id"), col("event_type"),
        epochMs(col("ts")).as("t_ms"), col("value"))
      .write.mode("overwrite").option("header", "true").csv(out.toString)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("t_ms", LongType),
      StructField("value", DoubleType)))
    collectAndClean(s,
      graft.sources.Tables.loadCsv(s, out.toString, schema)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"),
          min(col("t_ms")).as("min_ms"), max(col("t_ms")).as("max_ms")),
      out)
  }

  val a14Sql: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |       min(epoch_ms(ts)) AS min_ms, max(epoch_ms(ts)) AS max_ms
      |FROM events GROUP BY 1""".stripMargin

  /** A15 — JSON-lines source round-trip, the
    * [[graft.sources.Tables.loadJson]] twin of A14 (same
    * no-inference rule; a second wire format a sensor fleet actually
    * emits).
    */
  def a15(s: SparkSession, dir: String): DataFrame = {
    val out = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_a15_${java.lang.ProcessHandle.current().pid()}")
    ev(s, dir).select(col("event_id"), col("user_id"), col("event_type"),
        epochMs(col("ts")).as("t_ms"), col("value"))
      .write.mode("overwrite").json(out.toString)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("t_ms", LongType),
      StructField("value", DoubleType)))
    collectAndClean(s,
      graft.sources.Tables.loadJson(s, out.toString, schema)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"),
          min(col("t_ms")).as("min_ms"), max(col("t_ms")).as("max_ms")),
      out)
  }

  val a15Sql: String = a14Sql

  /** A16 — ORC source round-trip, the columnar sibling of A14/A15
    * ([[graft.sources.Tables.loadOrc]]): ORC is the second
    * vectorized, pushdown-capable columnar format a lakehouse
    * actually stores, and the round-trip proves the write/read path
    * is lossless for longs, doubles and strings under the same
    * schema-enforced no-inference rule. Same oracle as A14 (the
    * parquet source aggregated directly).
    */
  def a16(s: SparkSession, dir: String): DataFrame = {
    val out = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_a16_${java.lang.ProcessHandle.current().pid()}")
    ev(s, dir).select(col("event_id"), col("user_id"), col("event_type"),
        epochMs(col("ts")).as("t_ms"), col("value"))
      .write.mode("overwrite").orc(out.toString)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("t_ms", LongType),
      StructField("value", DoubleType)))
    collectAndClean(s,
      graft.sources.Tables.loadOrc(s, out.toString, schema)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"),
          min(col("t_ms")).as("min_ms"), max(col("t_ms")).as("max_ms")),
      out)
  }

  val a16Sql: String = a14Sql

  /** A17 — JDBC SINK round-trip, the write-back half of the
    * reference's DatabaseManager
    * (/root/reference/main_pipeline.py:137-169 reads Postgres; a
    * lakehouse engine also PUBLISHES serving/dimension tables back
    * over JDBC): the events projection is written to an embedded
    * Derby database through Spark's batched JDBC writer
    * (batchsize-bounded inserts, one connection per partition —
    * the shape that scales to a partitioned warehouse load), read
    * back through the JDBC source, and aggregated — proving the
    * write→read loop lossless for longs, doubles and strings. Same
    * oracle as A14. The PARTITIONED read path (range predicates,
    * fetchsize) is exercised separately in SourcesSpec; this entry
    * pins the sink. The Derby database is shut down and deleted
    * after the result materializes (the A14/A15 collectAndClean
    * discipline).
    */
  def a17(s: SparkSession, dir: String): DataFrame = {
    val dbDir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_a17_${java.lang.ProcessHandle.current().pid()}")
    val url = s"jdbc:derby:$dbDir/a17db;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    ev(s, dir).select(col("event_id"), col("user_id"), col("event_type"),
        epochMs(col("ts")).as("t_ms"), col("value"))
      .write.mode("overwrite")
      .format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "events_rt")
      .option("batchsize", "1000")
      .save()
    val back = s.read.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "events_rt")
      .load()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"),
        min(col("t_ms")).as("min_ms"), max(col("t_ms")).as("max_ms"))
    val rows = back.collect()
    val schema = back.schema
    try { // embedded Derby: a successful shutdown THROWS 08006
      java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir/a17db;shutdown=true")
      ()
    } catch {
      // 08006 = database shut down; XJ004 = database not found (a
      // retry after a prior shutdown). Anything else is a REAL
      // failure — rethrow rather than deleting dbDir under live
      // Derby file handles.
      case e: java.sql.SQLException
          if e.getSQLState == "08006" || e.getSQLState == "XJ004" => ()
    }
    collectAndClean(s,
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema), dbDir)
  }

  val a17Sql: String = a14Sql

  val queries: Map[String, QFn] = Map(
    "a17_jdbc_roundtrip" -> (a17 _),
    "a16_orc_roundtrip" -> (a16 _),
    "a15_json_roundtrip" -> (a15 _),
    "a14_csv_roundtrip" -> (a14 _),
    "a13_incremental_merge" -> (a13 _),
    "a1_schema_enforce" -> (a1 _),
    "a2_integrity_filter" -> (a2 _),
    "a3_epoch_convert" -> (a3 _),
    "a4_enrich_join" -> (a4 _),
    "a5_tag_regex" -> (a5 _),
    "a6_month_prune" -> (a6 _),
    "a7_incremental_cutoff" -> (a7 _),
    "a8_dedup_latest" -> (a8 _),
    "a9_sensor_pivot" -> (a9 _),
    "a10_write_optimized" -> (a10 _),
    "a11_union_months" -> (a11 _),
    "a12_output_validate" -> (a12 _))

  val oracles: Map[String, String] = Map(
    "a17_jdbc_roundtrip" -> a17Sql,
    "a16_orc_roundtrip" -> a16Sql,
    "a15_json_roundtrip" -> a15Sql,
    "a14_csv_roundtrip" -> a14Sql,
    "a13_incremental_merge" -> a13Sql,
    "a1_schema_enforce" -> a1Sql,
    "a2_integrity_filter" -> a2Sql,
    "a3_epoch_convert" -> a3Sql,
    "a4_enrich_join" -> a4Sql,
    "a5_tag_regex" -> a5Sql,
    "a6_month_prune" -> a6Sql,
    "a7_incremental_cutoff" -> a7Sql,
    "a8_dedup_latest" -> a8Sql,
    "a9_sensor_pivot" -> a9Sql,
    "a10_write_optimized" -> a10Sql,
    "a11_union_months" -> a11Sql,
    "a12_output_validate" -> a12Sql)
}
