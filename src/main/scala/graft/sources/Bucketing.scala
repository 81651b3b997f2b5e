package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table support (SURVEY §6): pre-shuffle a fact table
  * into N buckets on its join key so later joins and aggregations
  * on that key run shuffle-free. This is the batch-layer answer to
  * "the same join runs every day at 100 TB" — pay the shuffle once
  * at ingest, not per query.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (idempotent:
    * replaces any previous table and stale location).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val stale = new java.io.File(warehouse, table.toLowerCase)
    if (stale.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(stale)
    }
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed: lives in spark.sql.warehouse.dir
  }

  /** Join two same-bucketed tables on their bucket key — planner
    * sees matching hash distributions and elides both exchanges.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
