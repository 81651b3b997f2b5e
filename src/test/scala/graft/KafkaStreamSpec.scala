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
