package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7
  * (build plan). Each inventory line is one `queries` key with a
  * DuckDB oracle in `oracleSql` (rows-only entries omit the oracle).
  */
object SparkEntry {

  /** Flagship: the reference pipeline end-to-end on sf0.001 —
    * schema-enforce → integrity filter → broadcast metadata
    * enrichment → epoch conversion → monthly pruning → keep-latest
    * dedup → per-segment rollup. Mirrors
    * /root/reference/main_pipeline.py:262-329 as one declarative
    * plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val events = graft.queries.QueryUtil.events(spark, dir)
    val customers = spark.read.parquet(s"$dir/customer.parquet")
    val enriched = SensorPipeline.enrich(
        events.filter(SensorPipeline.integrityFilter(col("value"), 0.0, 1e6)),
        customers, "user_id", "c_custkey")
      .withColumn("month_key", SensorPipeline.monthKey(col("ts")))
      .filter(col("month_key") >= "2024_01")
    val deduped = SensorPipeline.dedupLatest(enriched,
      keys = Seq(col("user_id"), unix_millis(col("ts"))),
      orderDesc = Seq(col("event_id")))
    deduped.groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 2).as("avg_value"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SensorQueries.queries ++ RelationalQueries.queries ++
      TimeSeriesQueries.queries ++ TrainingDataQueries.queries ++
      StreamingQueries.queries

  def oracleSql: Map[String, String] =
    SensorQueries.oracles ++ RelationalQueries.oracles ++
      TimeSeriesQueries.oracles ++ TrainingDataQueries.oracles ++
      StreamingQueries.oracles
}
