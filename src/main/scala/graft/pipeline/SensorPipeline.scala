package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schemas of the sensor domain, after the reference's
  * PipelineSchemas (/root/reference/main_pipeline.py:76-97).
  * Mapped onto the test corpus: `events` plays SENSOR_RAW
  * (user_id≈tagid, ts≈t_stamp, value) and `customer` plays the tag
  * metadata dimension.
  */
object SensorSchemas {
  val Tags: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("tagpath", StringType, nullable = false),
    StructField("description", StringType, nullable = true),
    StructField("unit", StringType, nullable = true)))

  val SensorRaw: StructType = StructType(Seq(
    StructField("tagid", IntegerType, nullable = false),
    StructField("t_stamp", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("dataintegrity", IntegerType, nullable = false)))

  val Output: StructType = StructType(Seq(
    StructField("datetime", TimestampType, nullable = false),
    StructField("sensor_value", DoubleType, nullable = true)))
}

/** Cast-to-expected + required-column validation + column pruning —
  * the reference's DataProcessor._validate_schema
  * (/root/reference/main_pipeline.py:202-211), expressed as a single
  * declarative select so Catalyst prunes the scan to exactly the
  * expected columns.
  */
object SchemaEnforcer {
  def enforce(df: DataFrame, expected: StructType): DataFrame = {
    val have = df.columns.toSet
    val missing = expected.fields.filter(f => !f.nullable && !have.contains(f.name))
    require(missing.isEmpty,
      s"Missing required field(s): ${missing.map(_.name).mkString(", ")}")
    val cols: Seq[Column] = expected.fields.toSeq.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }
}

/** Monthly-table pruning, after DataProcessor.filter_tables
  * (/root/reference/main_pipeline.py:179-187): keep names shaped
  * `*_YYYY_MM` whose (year, month) >= cutoff. At scale the same
  * predicate lands on a parquet partition column (see
  * [[SensorPipeline.monthKey]]) so pruning happens at planning time,
  * not by listing tables on the driver.
  */
object TableFilter {
  private val MonthSuffix = raw".*_(\d+)_(\d+)$$".r

  def filterTables(tables: Seq[String], cutoffYear: Int, cutoffMonth: Int): Seq[String] =
    tables.filter {
      case MonthSuffix(y, m) =>
        val (yy, mm) = (y.toInt, m.toInt)
        yy > cutoffYear || (yy == cutoffYear && mm >= cutoffMonth)
      case _ => false
    }
}

/** The reference's core transform chain re-expressed declaratively:
  * integrity filter + broadcast metadata join + epoch→timestamp
  * (DataProcessor.process_sensor_data,
  * /root/reference/main_pipeline.py:189-200).
  */
object SensorPipeline {

  /** `table_YYYY_MM` as a partition-column expression: the scalable
    * twin of [[TableFilter]] — the same cutoff comparison becomes a
    * partition-pruning predicate.
    */
  def monthKey(ts: Column): Column = date_format(ts, "yyyy_MM")

  /** Integrity predicate. The reference drops dataintegrity == 0
    * rows; the general form is a pluggable validity predicate over
    * the reading (non-null, finite, in-range). Pushed to the scan.
    */
  def integrityFilter(value: Column, lo: Double, hi: Double): Column =
    value.isNotNull && !value.isNaN && value >= lo && value <= hi

  /** Epoch-milliseconds → timestamp, the reference's
    * `to_timestamp(t_stamp / 1000)` (main_pipeline.py:198) without
    * the double-division precision loss.
    */
  def epochMsToTs(tStampMs: Column): Column = timestamp_millis(tStampMs)

  /** Readings ⋈ tag metadata with an explicit broadcast of the dim
    * side (main_pipeline.py:196). Left join: readings with unknown
    * tags survive with null metadata, as in the reference.
    */
  def enrich(readings: DataFrame, tags: DataFrame, readingKey: String,
      tagKey: String): DataFrame =
    readings.join(broadcast(tags), readings(readingKey) === tags(tagKey), "left")

  /** Regex tag selection (SensorDataPipeline._get_matching_ids,
    * main_pipeline.py:343-350). The reference collects matching ids
    * to the driver and interpolates them into SQL; at scale that is
    * a driver bottleneck, so here the pattern match stays in the
    * plan: filter the (small) tag dim with `rlike`, then left-semi
    * broadcast join the readings against it.
    */
  def selectByTagPatterns(readings: DataFrame, tags: DataFrame,
      patterns: Seq[String], readingKey: String, tagKey: String,
      pathCol: String): DataFrame = {
    val cond = patterns.map(p => col(pathCol).rlike(p)).reduce(_ || _)
    val wanted = tags.filter(cond).select(col(tagKey).as("__tag_key"))
    readings.join(broadcast(wanted),
      readings(readingKey) === col("__tag_key"), "left_semi")
  }

  /** Keep-latest dedup per (sensor, timestamp-bucket) — the
    * reference's dropDuplicates(["datetime"]) per tag
    * (main_pipeline.py:328) generalized to an explicit deterministic
    * winner: greatest event time, then greatest id.
    */
  def dedupLatest(df: DataFrame, keys: Seq[Column], orderDesc: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(orderDesc.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
