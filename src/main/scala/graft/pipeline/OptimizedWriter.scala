package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Size-capped, partition-laid-out parquet sink.
  *
  * The reference's S3Writer.write_optimized
  * (/root/reference/main_pipeline.py:222-230) runs `df.count()` on
  * the driver to choose a repartition factor and loops over distinct
  * tagpaths collecting them to the driver
  * (main_pipeline.py:309-329) — both are driver bottlenecks at
  * scale. Here the same outcome (bounded file sizes, one directory
  * per sensor) is a single distributed write: `partitionBy` lays out
  * one directory per partition value and `maxRecordsPerFile` caps
  * file sizes without a driver-side count.
  */
object OptimizedWriter {
  def writeOptimized(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Int = 100000,
      mode: SaveMode = SaveMode.Overwrite,
      format: String = "parquet"): Unit = {
    val w = df.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .format(format)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .save(path)
  }
}
