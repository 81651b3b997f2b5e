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

  test("tryLoad falls through missing paths to the first readable one") {
    // the reference's DataLoader.try_load shape: preferred path
    // missing -> fall back; nothing readable -> None, not an exception
    val dir = java.nio.file.Files.createTempDirectory("graft_tryload").toString
    sample.write.mode("overwrite").parquet(s"$dir/good")
    val hit = Tables.tryLoad(spark,
      Seq(s"$dir/missing_primary", s"$dir/good", s"$dir/also_missing"))
    assert(hit.isDefined)
    assert(hit.get.count() == 200)
    // schema-enforced variant: read columns in declared order
    val enforced = Tables.tryLoad(spark,
      Seq(s"$dir/missing_primary", s"$dir/good"),
      Some(StructType(Seq(StructField("value", DoubleType),
        StructField("event_id", LongType)))))
    assert(enforced.get.columns.toSeq == Seq("value", "event_id"))
    assert(Tables.tryLoad(spark, Seq(s"$dir/nope1", s"$dir/nope2")).isEmpty)
  }

  test("tryLoad rejects candidates whose footer lacks requested columns") {
    // A user-supplied schema skips footer inference, so without an
    // explicit footer check a column-incomplete candidate would be
    // accepted and yield nulls at first action. It must instead fail
    // the candidate and fall through to a complete one.
    val dir = java.nio.file.Files.createTempDirectory("graft_tryload2").toString
    sample.select("event_id").write.mode("overwrite").parquet(s"$dir/partial")
    sample.write.mode("overwrite").parquet(s"$dir/full")
    val want = StructType(Seq(StructField("event_id", LongType),
      StructField("value", DoubleType)))
    val hit = Tables.tryLoad(spark,
      Seq(s"$dir/partial", s"$dir/full"), Some(want))
    assert(hit.isDefined)
    assert(hit.get.filter(col("value").isNull).count() == 0,
      "must have fallen through to the complete candidate")
    assert(Tables.tryLoad(spark, Seq(s"$dir/partial"), Some(want)).isEmpty)
  }

  test("tryLoad rejects candidates whose column types are incompatible") {
    // Name-only footer validation accepts a string `value` where the
    // request says double — moving the failure back to first action,
    // the exact problem the check exists to prevent. Type-incompatible
    // candidates must fall through; safe up-casts (int -> long) must
    // still be accepted.
    val dir = java.nio.file.Files.createTempDirectory("graft_tryload3").toString
    sample.withColumn("value", col("value").cast("string"))
      .write.mode("overwrite").parquet(s"$dir/stringy")
    sample.write.mode("overwrite").parquet(s"$dir/typed")
    val want = StructType(Seq(StructField("event_id", LongType),
      StructField("value", DoubleType)))
    val hit = Tables.tryLoad(spark, Seq(s"$dir/stringy", s"$dir/typed"), Some(want))
    assert(hit.isDefined)
    assert(hit.get.schema("value").dataType == DoubleType)
    assert(Tables.tryLoad(spark, Seq(s"$dir/stringy"), Some(want)).isEmpty)
    // widening is allowed: an int footer satisfies a long request —
    // and the widened read must actually MATERIALIZE, not just pass
    // the check (the whole point is moving failures earlier)
    sample.withColumn("event_id", col("event_id").cast("int"))
      .write.mode("overwrite").parquet(s"$dir/narrow")
    val widened = Tables.tryLoad(spark, Seq(s"$dir/narrow"),
      Some(StructType(Seq(StructField("event_id", LongType)))))
    assert(widened.isDefined && widened.get.count() == 200)
    // Cast-legal but reader-impossible conversions must reject too:
    // canUpCast admits double -> string, but the parquet reader
    // cannot perform it — accepting would defer the failure to first
    // action, the exact bug the check prevents.
    assert(Tables.tryLoad(spark, Seq(s"$dir/typed"),
      Some(StructType(Seq(StructField("value", StringType))))).isEmpty)
  }

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

  test("ORC round-trip with explicit schema is bit-lossless") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    sample.write.mode("overwrite").orc(dir)
    val back = Tables.loadOrc(spark, dir, schema)
    assert(back.schema == schema)
    assert(back.collect().map(_.toSeq).toSet ==
      sample.collect().map(_.toSeq).toSet,
      "every row must survive the ORC write/read unchanged")
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

  private val derbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  private lazy val jdbcEvents = graft.queries.QueryUtil.events(spark, sf)
    .select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("t_us"), col("value"))

  /** Embedded Derby (on the Spark classpath) stands in for the
    * reference's warehouse DB — a real in-process JDBC endpoint.
    * Loaded once through Spark's JDBC sink (the write half of the
    * source); evaluates lazily so every test sees the same table.
    */
  private lazy val derbyUrl: String = {
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft_derby").toString)
    val url = "jdbc:derby:memory:graft_src;create=true"
    jdbcEvents.write.format("jdbc")
      .option("url", url)
      .option("dbtable", "sensor_events")
      .option("driver", derbyDriver)
      .mode("overwrite")
      .save()
    url
  }

  test("partitioned JDBC read from an embedded database matches parquet bit-for-bit") {
    // The partitioned read path (partitionColumn/lowerBound/
    // upperBound/numPartitions/fetchsize) runs end-to-end here
    // instead of only building options.
    val url = derbyUrl
    val events = jdbcEvents
    val bounds = events.agg(min("event_id"), max("event_id")).head()
    val opts = graft.sources.Jdbc.connectionOptions(url, "", "",
      graft.pipeline.PipelineConfig(),
      partitionColumn = "event_id",
      lowerBound = bounds.getLong(0), upperBound = bounds.getLong(1)) +
      ("driver" -> derbyDriver)
    val back = graft.sources.Jdbc.reader(spark, opts)
      .option("dbtable", "sensor_events").load()
    // the range partitioning must actually split the scan
    assert(back.rdd.getNumPartitions ==
      graft.pipeline.PipelineConfig().jdbcNumPartitions)
    assert(back.count() == events.count())
    // bit-for-bit: long/double columns round-trip exactly through JDBC
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
  }

  test("JDBC query-pushdown read returns the filtered aggregate") {
    val opts = Map("url" -> derbyUrl, "driver" -> derbyDriver)
    // Derby folds unquoted identifiers to upper case; the Spark JDBC
    // sink created the columns quoted lower-case, so quote them here.
    val agg = graft.sources.Jdbc.queryTable(spark, opts,
      """SELECT "user_id", count(*) AS "n" FROM sensor_events GROUP BY "user_id"""")
    val expect = graft.queries.QueryUtil.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(agg.count() == expect.count())
    assert(agg.exceptAll(expect).isEmpty)
  }

  test("OptimizedWriter emits ORC when asked") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    OptimizedWriter.writeOptimized(sample, dir, partitionCols = Seq(),
      maxRecordsPerFile = 1000, format = "orc")
    assert(spark.read.orc(dir).count() == sample.count())
  }
}
