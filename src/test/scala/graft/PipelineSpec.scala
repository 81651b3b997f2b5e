package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline._

class PipelineSpec extends AnyFunSuite {
  import SparkTestBase._

  test("SchemaEnforcer casts, prunes, and null-fills optional columns") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.5)).toDF("id", "name", "v")
    val expected = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", DoubleType, nullable = true),
      StructField("missing_opt", StringType, nullable = true)))
    val out = SchemaEnforcer.enforce(df, expected)
    assert(out.schema.fieldNames.toSeq == Seq("id", "v", "missing_opt"))
    assert(out.schema("id").dataType == IntegerType)
    val row = out.head()
    assert(row.getInt(0) == 1 && row.getDouble(1) == 2.5 && row.isNullAt(2))
  }

  test("SchemaEnforcer rejects a missing required column") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    val expected = StructType(Seq(StructField("zz", LongType, nullable = false)))
    val e = intercept[IllegalArgumentException](SchemaEnforcer.enforce(df, expected))
    assert(e.getMessage.contains("zz"))
  }

  test("TableFilter keeps only *_YYYY_MM tables at/after the cutoff") {
    val tables = Seq("sensor_2024_01", "sensor_2024_07", "sensor_2025_01",
      "sensor_2023_12", "notdated", "x_2024")
    assert(TableFilter.filterTables(tables, 2024, 7) ==
      Seq("sensor_2024_07", "sensor_2025_01"))
  }

  test("dedupLatest keeps the greatest (order, id) row per key") {
    import spark.implicits._
    val df = Seq((1, 10L, 100L, "old"), (1, 20L, 101L, "new"),
      (1, 20L, 99L, "tie_lower_id"), (2, 5L, 1L, "only")).toDF("k", "t", "id", "tag")
    val out = SensorPipeline.dedupLatest(df, Seq(col("k")),
      Seq(col("t"), col("id"))).orderBy("k")
      .select("k", "tag").as[(Int, String)].collect().toSeq
    assert(out == Seq((1, "new"), (2, "only")))
  }

  test("OptimizedWriter caps records per file and lays out partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft_writer").toString
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("status", col("o_orderstatus"))
    OptimizedWriter.writeOptimized(df, out, Seq("status"), maxRecordsPerFile = 100)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("status=")))
    val back = spark.read.parquet(out)
    assert(back.count() == df.count())
    // each parquet file respects the record cap
    val perFile = back.groupBy(input_file_name()).count().agg(max("count")).head().getLong(0)
    assert(perFile <= 100)
  }
}
