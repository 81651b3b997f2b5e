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
    * dependency on column order), and each candidate's FOOTER is
    * inspected before acceptance: a user-supplied schema skips
    * footer inference, so without the explicit check a candidate
    * missing requested columns (or with a corrupt footer) would be
    * returned as the hit and only surface as nulls — or a task
    * failure — at first action downstream. Field-name matching is
    * case-insensitive, mirroring Spark's default resolution, and each
    * matched field's footer type must be readable as the requested
    * type by the PARQUET READER itself — deliberately narrower than
    * `Cast.canUpCast`, which admits conversions like double→string
    * or timestamp↔timestamp_ntz that are legal casts but that the
    * vectorized parquet reader cannot perform (accepting those would
    * move the failure right back to first action, the exact problem
    * this check exists to prevent). Allowed: exact match plus the
    * reader's numeric widenings (byte/short/int→long,
    * byte/short/int/float→double, date→timestamp_ntz).
    */
  def tryLoad(spark: SparkSession, paths: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Option[DataFrame] =
    paths.iterator.flatMap { p =>
      try {
        // Footer inference runs ONCE per candidate — missing paths
        // and corrupt footers fail HERE (and fall through to the
        // next candidate), not at first action downstream; the
        // no-schema case returns this same reader rather than
        // re-reading the footer.
        val inferred = spark.read.parquet(p)
        schema match {
          case None => Some(inferred)
          case Some(s) =>
            val byName = inferred.schema.fields
              .map(f => f.name.toLowerCase -> f.dataType).toMap
            val compatible = s.fields.forall { want =>
              byName.get(want.name.toLowerCase)
                .exists(parquetReadableAs(_, want.dataType))
            }
            if (compatible) Some(spark.read.schema(s).parquet(p))
            else None
        }
      } catch { case _: Exception => None }
    }.nextOption()

  /** Footer type `have` is readable as requested type `want` by the
    * parquet reader: exact match or one of the reader's supported
    * widenings (SPARK-40876 family). See [[tryLoad]] for why this is
    * narrower than `Cast.canUpCast`.
    */
  private def parquetReadableAs(
      have: org.apache.spark.sql.types.DataType,
      want: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    have == want || ((have, want) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (ByteType | ShortType | IntegerType | FloatType, DoubleType) => true
      case (DateType, TimestampNTZType) => true
      case _ => false
    })
  }

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

  /** Schema-enforced ORC read — the second columnar wire format
    * (Spark-native, vectorized, predicate-pushdown-capable like
    * parquet); declared schema wins over the file footer so a
    * drifted producer fails loud instead of silently widening.
    */
  def loadOrc(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema)
      .orc(path)
}
