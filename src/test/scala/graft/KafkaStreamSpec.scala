package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.KafkaStream
import graft.streaming.StreamingOps

/** Kafka source wiring (no broker or connector in the sandbox —
  * the spec pins the option map the reader would receive and the
  * value-decode logic on a substituted stream source, per the
  * source-agnostic split documented on [[KafkaStream]]).
  */
class KafkaStreamSpec extends AnyFunSuite {
  import SparkTestBase._

  test("option map carries subscription, offsets, and rate limit") {
    val cfg = KafkaStream.KafkaConfig(
      bootstrapServers = "broker1:9092,broker2:9092",
      subscribe = "sensors",
      startingOffsets = "earliest",
      maxOffsetsPerTrigger = Some(50000L),
      extra = Map("kafka.security.protocol" -> "SSL"))
    val opts = KafkaStream.options(cfg)
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "sensors")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("maxOffsetsPerTrigger") == "50000")
    assert(opts("failOnDataLoss") == "true")
    assert(opts("kafka.security.protocol") == "SSL")
    // pattern subscription swaps the option *name*, not a value
    val pat = KafkaStream.options(cfg.copy(
      subscribeMode = "subscribePattern", subscribe = "sensors-.*"))
    assert(pat("subscribePattern") == "sensors-.*" && !pat.contains("subscribe"))
    assertThrows[IllegalArgumentException] {
      KafkaStream.KafkaConfig("b:9092", "t", subscribeMode = "topics")
    }
  }

  test("value decode yields the sensor schema; bad payloads dropped") {
    // Kafka's value column is binary; substitute a file-backed text
    // stream cast to binary — the decode path cannot tell the
    // difference, which is the point of the source-agnostic split.
    val dir = java.nio.file.Files.createTempDirectory("graft_kafka").toString
    val ns = 1000000L * 1000
    val good1 = s"""{"event_id":1,"ts":${1 * ns},"user_id":10,"event_type":"click","value":1.5,"props":"{}"}"""
    val good2 = s"""{"event_id":2,"ts":${2 * ns},"user_id":11,"event_type":"view","value":2.5,"props":"{}"}"""
    val bad = """this is not json"""
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/batch.txt"),
      s"$good1\n$bad\n$good2\n".getBytes("UTF-8"))
    val raw = spark.readStream.text(dir)
      .select(col("value").cast("binary").as("value"))
    val decoded = KafkaStream.decodeSensorJson(raw)
    // plan-compatibility contract: identical schema to the file source
    assert(decoded.schema == StreamingOps
      .readEventsStream(spark, sf).schema)
    val got = StreamingOps.runToTable(decoded, spark, "kafka_decode", "append")
      .orderBy("event_id").collect()
    assert(got.length == 2, "undecodable payload must be dropped, not fatal")
    assert(got(0).getLong(0) == 1L && got(1).getLong(0) == 2L)
    assert(got(0).getAs[java.sql.Timestamp]("ts").getTime == 1000L) // 1e9 ns = 1000 ms
    assert(got(0).getDouble(4) == 1.5)
  }

  test("corrupt-record policy matrix: envelope damage drops, field damage nulls") {
    // The full decode policy, pinned case by case (scaladoc on
    // decodeSensorJson): a poison payload must never fail the query;
    // envelope-level damage silently drops the record; field-level
    // damage nulls the field and leaves quarantine to the downstream
    // integrity filter.
    val dir = java.nio.file.Files.createTempDirectory("graft_kafka_policy").toString
    val payloads = Seq(
      /* kept, fully valid   */ """{"event_id":1,"ts":1000,"user_id":10,"event_type":"click","value":1.5,"props":"{}"}""",
      /* dropped: not JSON   */ """%%% total garbage %%%""",
      /* dropped: JSON null  */ """null""",
      /* dropped: no id      */ """{"ts":1000,"user_id":11,"event_type":"view","value":2.0,"props":"{}"}""",
      /* kept: extra field   */ """{"event_id":2,"ts":2000,"user_id":12,"event_type":"view","value":2.5,"props":"{}","debug":true}""",
      /* kept: bad value type*/ """{"event_id":3,"ts":3000,"user_id":13,"event_type":"click","value":"not-a-double","props":"{}"}""",
      /* kept: missing value */ """{"event_id":4,"ts":4000,"user_id":14,"event_type":"click","props":"{}"}""",
      /* dropped: empty      */ """""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/batch.txt"),
      payloads.mkString("\n").getBytes("UTF-8"))
    val raw = spark.readStream.text(dir)
      .select(col("value").cast("binary").as("value"))
    val q = KafkaStream.decodeSensorJson(raw)
      .writeStream.format("memory")
      .queryName("kafka_policy").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"poison payload failed the query: ${q.exception}")
      val got = spark.table("kafka_policy").orderBy("event_id")
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      assert(got.toSeq == Seq(
        (1L, Some(1.5)),   // valid survives intact
        (2L, Some(2.5)),   // extra field ignored
        (3L, None),        // type-mismatched field -> null column
        (4L, None)),       // absent field -> null column
        s"policy matrix mismatch: ${got.toSeq}")
      // and the null-valued survivors are exactly what the standard
      // integrity filter quarantines downstream
      val clean = spark.table("kafka_policy")
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          col("value").between(0.0, 1e6))
        .collect().map(_.getLong(0)).sorted
      assert(clean.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("readSensorSource selects between file and kafka sources") {
    val viaSelector = StreamingOps.readSensorSource(spark,
      StreamingOps.FileSource(sf))
    val direct = StreamingOps.readEventsStream(spark, sf)
    assert(viaSelector.schema == direct.schema)
    assert(viaSelector.isStreaming)
    // the kafka arm builds a reader eagerly; without the connector
    // on the classpath load() must fail with a missing-data-source
    // error (not an option-validation one) — proving the options
    // passed reader construction
    val err = intercept[Exception] {
      StreamingOps.readSensorSource(spark, StreamingOps.KafkaSource(
        KafkaStream.KafkaConfig("b:9092", "t")))
    }
    assert(err.getMessage.toLowerCase.contains("kafka"))
  }
}
