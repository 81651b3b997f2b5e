package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end sensor batch job — the declarative twin of the
  * reference's SensorDataPipeline.run
  * (/root/reference/main_pipeline.py:262-329): pattern-select →
  * integrity filter → incremental cutoff → broadcast enrichment →
  * keep-latest dedup → partitioned, size-capped write → read-back
  * validation.
  *
  * Differences by design (scale): no driver-side collect loops —
  * the cutoff is a scalar subplan, tag selection is a semi-join,
  * the per-sensor output split is `partitionBy`, and validation is
  * an aggregation over the read-back, not an S3 listing.
  */
class SensorJob(spark: SparkSession, config: PipelineConfig) {

  /** One declarative plan from raw readings to writable output. */
  def transform(readings: DataFrame, tags: DataFrame,
      existing: Option[DataFrame]): DataFrame = {
    val selected = SensorPipeline.selectByTagPatterns(
      readings, tags, config.sensorPatterns, "tagid", "id", "tagpath")
    val valid = selected.filter(
      SensorPipeline.integrityFilter(col("value"),
        config.integrityMin, config.integrityMax))
    val withTs = valid
      .withColumn("datetime", SensorPipeline.epochMsToTs(col("t_stamp")))
    val incremental = existing match {
      case Some(prev) =>
        val cutoff = prev.agg(least(
          max(col("datetime")),
          lit(config.defaultStartDate).cast("timestamp") +
            expr(s"INTERVAL ${config.lookbackDays} DAYS")).as("__cutoff"))
        withTs.crossJoin(broadcast(cutoff))
          .filter(col("datetime") >= col("__cutoff")).drop("__cutoff")
      case None =>
        withTs.filter(col("datetime") >=
          lit(config.defaultStartDate).cast("timestamp"))
    }
    val enriched = SensorPipeline.enrich(incremental, tags, "tagid", "id")
      .drop("id", "description", "unit")
    // t_stamp is constant within a (tagid, datetime) group, so the
    // conflict winner needs a further total-order key: greatest
    // value wins deterministically (re-extraction overlaps must
    // resolve the same way on every run and partitioning).
    SensorPipeline.dedupLatest(enriched,
      keys = Seq(col("tagid"), col("datetime")),
      orderDesc = Seq(col("t_stamp"), col("value")))
  }

  /** Write one directory per tagpath with bounded file sizes. */
  def write(output: DataFrame): Unit =
    OptimizedWriter.writeOptimized(output, config.outputDir,
      partitionCols = Seq("tagpath"),
      maxRecordsPerFile = config.maxRecordsPerFile,
      mode = config.writeMode.toLowerCase match {
        case "overwrite" => org.apache.spark.sql.SaveMode.Overwrite
        case "append" => org.apache.spark.sql.SaveMode.Append
        case "ignore" => org.apache.spark.sql.SaveMode.Ignore
        case "error" | "errorifexists" | "default" =>
          org.apache.spark.sql.SaveMode.ErrorIfExists
        case other =>
          throw new IllegalArgumentException(s"unknown write mode: $other")
      })

  /** Read-back validation: per-sensor row counts and time ranges. */
  def validate(): DataFrame =
    spark.read.parquet(config.outputDir)
      .groupBy("tagpath")
      .agg(count(lit(1)).as("n"),
        min(col("datetime")).as("min_dt"), max(col("datetime")).as("max_dt"))

  def run(readings: DataFrame, tags: DataFrame,
      existing: Option[DataFrame] = None): DataFrame =
    try {
      write(transform(readings, tags, existing))
      validate()
    } finally {
      // reference parity: _cleanup unpersists and clears the cache
      // after a run (main_pipeline.py:352-358)
      spark.catalog.clearCache()
    }
}

object SensorJob {

  /** Continuous sensor job with hot-reloadable config — the engine
    * twin of the reference's config-refresh orchestration
    * (Config_manager_dag.py + ConfigManager,
    * /root/reference/main_pipeline.py:44-73). The reference has an
    * Airflow DAG periodically pushing fresh config into variables
    * that the next scheduled batch reads; here the config FILE is
    * reread on the driver at every micro-batch boundary, so
    * operators update thresholds by rewriting one small JSON
    * document — no job restart, no scheduler.
    *
    * Per batch: reread config → integrity filter with the CURRENT
    * bounds → hand the filtered frame and the config snapshot to
    * `sink` (write, enrich, alert — caller's choice; the config
    * carries outputDir/writeMode for sinks that want them).
    *
    * Scale note: the reread is one driver-side file read per
    * micro-batch (milliseconds against a batch that processes
    * millions of rows); the config values enter the plan as
    * literals, so each batch's filter is codegen'd with the
    * constants of that batch — no per-row indirection.
    */
  def streamWithConfigReload(stream: DataFrame, configPath: String)
      (sink: (DataFrame, Long, PipelineConfig) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val cfg = PipelineConfig.fromJsonFile(configPath)
        val filtered = batch.filter(SensorPipeline.integrityFilter(
          col("value"), cfg.integrityMin, cfg.integrityMax))
        sink(filtered, batchId, cfg)
      }
}
