package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

import graft.pipeline.PipelineConfig

/** Partitioned JDBC reads — the reference's DatabaseManager
  * (/root/reference/main_pipeline.py:137-169): parallel range
  * partitioning on the sensor key, bounded fetch size.
  *
  * Exercised end-to-end in SourcesSpec against an embedded Derby
  * database: the partitioned read (partitionColumn / lowerBound /
  * upperBound / numPartitions / fetchsize) splits into the
  * configured number of range scans and matches the parquet source
  * bit-for-bit; the `query` pushdown path runs a server-side
  * aggregate. The `load` path is the standard Spark JDBC source.
  */
object Jdbc {

  /** JDBC reader options for a partitioned sensor-table read. */
  def connectionOptions(url: String, user: String, password: String,
      config: PipelineConfig, partitionColumn: String = "tagid",
      lowerBound: Long = 1L, upperBound: Long = 100000L): Map[String, String] =
    Map(
      "url" -> url,
      "user" -> user,
      "password" -> password,
      "fetchsize" -> config.jdbcFetchSize.toString,
      "numPartitions" -> config.jdbcNumPartitions.toString,
      "partitionColumn" -> partitionColumn,
      "lowerBound" -> lowerBound.toString,
      "upperBound" -> upperBound.toString)

  def reader(spark: SparkSession, options: Map[String, String]): DataFrameReader =
    spark.read.format("jdbc").options(options)

  def queryTable(spark: SparkSession, options: Map[String, String],
      query: String): DataFrame =
    reader(spark, options).option("query", query).load()
}
