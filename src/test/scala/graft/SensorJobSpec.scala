package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline._

class SensorJobSpec extends AnyFunSuite {
  import SparkTestBase._

  /** events/customer recast into the reference's SENSOR_RAW/TAGS
    * shape (tagid, t_stamp ms, value / id, tagpath).
    */
  private def sensorShaped() = {
    val readings = graft.queries.QueryUtil.events(spark, sf).select(
      col("user_id").cast("int").as("tagid"),
      unix_millis(col("ts")).as("t_stamp"),
      col("value"),
      lit(1).as("dataintegrity"))
    val tags = spark.read.parquet(s"$sf/customer.parquet").select(
      col("c_custkey").cast("int").as("id"),
      concat(lit("sensors/"), col("c_mktsegment")).as("tagpath"),
      col("c_name").as("description"),
      lit("unit").as("unit"))
    (readings, tags)
  }

  test("SensorJob runs end-to-end: select, filter, enrich, dedup, write, validate") {
    val out = java.nio.file.Files.createTempDirectory("graft_job").toString
    val config = PipelineConfig(
      outputDir = out,
      sensorPatterns = Seq("^sensors/(BUILDING|MACHINERY)"),
      defaultStartDate = "2024-01-01",
      integrityMin = 0.0, integrityMax = 1e6,
      maxRecordsPerFile = 500)
    val (readings, tags) = sensorShaped()
    val job = new SensorJob(spark, config)
    val report = job.run(readings, tags)
    val byTag = report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // only pattern-matched segments survive, and partition dirs exist
    assert(byTag.keySet == Set("sensors%2FBUILDING", "sensors%2FMACHINERY") ||
      byTag.keySet == Set("sensors/BUILDING", "sensors/MACHINERY"))
    assert(byTag.values.forall(_ > 0))
    // count matches the declarative transform
    val expected = job.transform(readings, tags, None).count()
    assert(byTag.values.sum == expected)
  }

  test("streamWithConfigReload hot-swaps integrity bounds between micro-batches") {
    val src = java.nio.file.Files.createTempDirectory("graft_cfg_src").toString
    val cfgPath = java.nio.file.Files.createTempDirectory("graft_cfg")
      .resolve("pipeline.json").toString
    def writeCfg(min: Double, max: Double): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath),
        s"""{"integrityMin": $min, "integrityMax": $max}""")
    def writeRows(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      import spark.implicits._
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(src)
    }
    val ns = 1000000L * 1000
    // batch 1 under bounds [0, 10]: value 50 must be dropped
    writeCfg(0.0, 10.0)
    writeRows(Seq(
      (1L, 1 * ns, 10L, "click", 5.0, "{}"),
      (2L, 2 * ns, 10L, "click", 50.0, "{}")))
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[Long], Double)] // (batchId, surviving ids, cfg max)
    val stream = spark.readStream
      .schema(graft.streaming.StreamingOps.eventsSchema())
      .parquet(src)
    val q = SensorJob.streamWithConfigReload(stream, cfgPath) {
      (batch, batchId, cfg) =>
        val ids = batch.select("event_id").collect().map(_.getLong(0)).toSet
        seen.synchronized { seen += ((batchId, ids, cfg.integrityMax)) }
    }.start()
    try {
      q.processAllAvailable()
      // hot-swap: widen the bounds, no restart — batch 2 must keep 50
      writeCfg(0.0, 100.0)
      writeRows(Seq(
        (3L, 3 * ns, 11L, "click", 50.0, "{}"),
        (4L, 4 * ns, 11L, "click", 500.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = seen.synchronized { seen.sortBy(_._1).toList }
    assert(byBatch.map(_._3) == List(10.0, 100.0)) // each batch saw its file's bounds
    assert(byBatch.head._2 == Set(1L))        // 50.0 dropped under max=10
    assert(byBatch(1)._2 == Set(3L))          // 50.0 kept, 500.0 dropped under max=100
  }

  test("incremental cutoff drops rows before the existing watermark") {
    val (readings, tags) = sensorShaped()
    val config = PipelineConfig(sensorPatterns = Seq(".*"),
      defaultStartDate = "2024-01-05", lookbackDays = 10,
      integrityMax = 1e6)
    val job = new SensorJob(spark, config)
    val existing = readings.limit(0)
      .withColumn("datetime", SensorPipeline.epochMsToTs(col("t_stamp")))
    val full = job.transform(readings, tags, None).count()
    val all = job.transform(readings, tags,
      Some(readings.withColumn("datetime",
        SensorPipeline.epochMsToTs(col("t_stamp"))))).count()
    // cutoff = least(max ts, start+10d) = Jan 15 → fewer rows than the
    // Jan 5 default-start run
    assert(all < full)
    assert(full > 0)
  }
}
