package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.OptimizedWriter
import graft.sources.Tables

class SourcesSpec extends AnyFunSuite {
  import SparkTestBase._

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("value", DoubleType)))

  private lazy val sample =
    graft.queries.QueryUtil.events(spark, sf)
      .select("event_id", "user_id", "value").limit(200)

  test("CSV round-trip with explicit schema (no inference pass)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = Tables.loadCsv(spark, dir, schema)
    assert(back.schema == schema)
    assert(back.count() == sample.count())
    assert(back.agg(sum(col("event_id"))).head().getLong(0) ==
      sample.agg(sum(col("event_id"))).head().getLong(0))
  }

  test("JSON-lines round-trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    sample.write.mode("overwrite").json(dir)
    val back = Tables.loadJson(spark, dir, schema)
    assert(back.count() == sample.count())
  }

  test("malformed CSV rows are nulled, not fatal (PERMISSIVE)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part.csv"),
      "event_id,user_id,value\n1,2,3.5\nnot,a,number\n4,5,6.5\n")
    val back = Tables.loadCsv(spark, dir, schema)
    assert(back.count() == 3)
    assert(back.filter(col("value").isNull).count() == 1)
  }

  test("CSV round-trip preserves quotes, commas, and embedded newlines") {
    import spark.implicits._
    val tricky = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "quote \" inside"),
      (4L, "newline\ninside"),
      (5L, "both \", and\nmore")).toDF("id", "s")
    val sc = StructType(Seq(StructField("id", LongType), StructField("s", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_qcsv").toString
    tricky.write.mode("overwrite").option("header", "true").csv(dir)
    // default read (multiLine=false) splits inside quoted newlines —
    // embedded-newline payloads NEED the multiLine flag
    val back = Tables.loadCsv(spark, dir, sc, multiLine = true)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      tricky.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("OptimizedWriter emits ORC when asked") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    OptimizedWriter.writeOptimized(sample, dir, partitionCols = Seq(),
      maxRecordsPerFile = 1000, format = "orc")
    assert(spark.read.orc(dir).count() == sample.count())
  }
}
