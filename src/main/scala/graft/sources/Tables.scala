package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access over a scale-factor directory.
  *
  * The reference loads parquet with schema enforcement and local/S3
  * fallback (/root/reference/main_pipeline.py:108-134). Here the
  * equivalent is a thin reader; schema enforcement is the separate
  * [[graft.pipeline.SchemaEnforcer]] so it composes with any source.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Try a list of candidate paths in order, like the reference's
    * DataLoader.try_load (main_pipeline.py:108-120, local path first
    * then S3, degrading gracefully), returning the first that reads.
    * With a schema, the read is schema-enforced (no footer-inference
    * dependency on column order; missing columns fail the candidate,
    * moving on to the next path).
    */
  def tryLoad(spark: SparkSession, paths: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Option[DataFrame] =
    paths.iterator.flatMap { p =>
      try {
        val reader = schema.fold(spark.read)(s => spark.read.schema(s))
        val df = reader.parquet(p)
        // force resolution so a missing/corrupt candidate fails HERE
        // (and falls through), not at first action downstream
        df.schema
        Some(df)
      } catch { case _: Exception => None }
    }.nextOption()

  /** Schema-enforced CSV read: an explicit schema (no inference
    * scan — at 100 TB an inference pass is a full extra read) with
    * malformed rows quarantined rather than failing the job.
    *
    * `multiLine` stays OFF by default: it is required for payloads
    * with embedded newlines inside quoted fields, but it makes files
    * non-splittable (one task per file) — at scale, prefer escaping
    * newlines at write time and keep splittable reads.
    */
  def loadCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      header: Boolean = true, multiLine: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("multiLine", multiLine.toString)
      .csv(path)

  /** Schema-enforced JSON-lines read; same no-inference rule. */
  def loadJson(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)
}
