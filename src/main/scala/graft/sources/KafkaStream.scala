package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka source wiring for the sensor stream — the north star's
  * named IoT ingestion path ("Structured Streaming with Kafka/IoT
  * sources"; the reference's batch analog is the JDBC ingest in
  * /root/reference/main_pipeline.py:137-169).
  *
  * Split deliberately in two:
  *   - [[options]] / [[readRaw]] build the `format("kafka")` reader —
  *     a thin, declarative option map (subscribe, offsets, rate
  *     limit). Runs wherever the spark-sql-kafka connector is on the
  *     classpath; this sandbox has no broker or connector jar, so
  *     the option builder is what the spec pins.
  *   - [[decodeSensorJson]] turns any frame bearing a Kafka-shaped
  *     binary/string `value` column into the schema-enforced sensor
  *     event stream. It is source-agnostic on purpose: the spec
  *     drives it from a memory stream, production drives it from
  *     [[readRaw]], and the downstream plan (watermarks, windows,
  *     enrichment — StreamingOps/SensorJob) is identical either way.
  *
  * JSON decode uses the same explicit schema as the file source (no
  * inference; malformed payloads become null structs and are
  * dropped, the streaming twin of PERMISSIVE quarantine).
  */
object KafkaStream {

  /** Declarative connection config. `subscribeMode` is one of
    * subscribe | subscribePattern | assign (Kafka source option
    * names); `maxOffsetsPerTrigger` is the per-micro-batch rate
    * limit — the knob that keeps a backlogged topic from producing
    * an unboundedly large first batch after restart.
    */
  case class KafkaConfig(
      bootstrapServers: String,
      subscribe: String,
      subscribeMode: String = "subscribe",
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = true,
      extra: Map[String, String] = Map.empty) {
    require(Set("subscribe", "subscribePattern", "assign")(subscribeMode),
      s"subscribeMode must be subscribe|subscribePattern|assign, got $subscribeMode")
  }

  /** The exact option map handed to the DataStreamReader. */
  def options(cfg: KafkaConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      cfg.subscribeMode -> cfg.subscribe,
      "startingOffsets" -> cfg.startingOffsets,
      "failOnDataLoss" -> cfg.failOnDataLoss.toString) ++
      cfg.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      cfg.extra

  /** Raw Kafka records (key, value, topic, partition, offset,
    * timestamp, ...). Requires the spark-sql-kafka connector on the
    * classpath (standard Spark distribution artifact; not in this
    * sandbox).
    */
  def readRaw(s: SparkSession, cfg: KafkaConfig): DataFrame =
    options(cfg).foldLeft(s.readStream.format("kafka")) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  /** Kafka `value` JSON bytes → schema-enforced sensor events with
    * event-time `ts` (µs timestamp, same normalization as the file
    * source).
    *
    * Corrupt-record policy (pinned in KafkaStreamSpec's policy
    * matrix — the query NEVER fails on payload content):
    *
    *   - ENVELOPE damage drops the record: non-JSON garbage, a JSON
    *     `null` literal, an empty payload, or a parseable object
    *     missing `event_id` (the identity without which the row
    *     cannot be attributed, deduped, or audited) — all fall to
    *     the null-struct / null-event_id filter.
    *   - FIELD damage keeps the record: a type-mismatched or absent
    *     non-identity field (e.g. `value: "abc"`) becomes a null
    *     COLUMN (from_json's partial-result PERMISSIVE mode), and
    *     the record flows on — the downstream integrity filter
    *     (A2 / sensorFileSinkJob's value guard) is the single place
    *     that quarantines semantic nulls, same as for file-sourced
    *     rows. Unknown extra fields are ignored.
    *
    * Dropping at decode rather than failing is the streaming twin of
    * the PERMISSIVE-quarantine batch ingest; a poison payload in a
    * production topic must not wedge the query into a crash loop.
    */
  def decodeSensorJson(raw: DataFrame): DataFrame =
    raw
      .select(from_json(col("value").cast("string"),
        graft.streaming.StreamingOps.eventsSchema()).as("r"))
      .filter(col("r").isNotNull && col("r.event_id").isNotNull)
      .select(col("r.*"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** The production sensor stream: Kafka source + JSON decode. Plan-
    * compatible with [[graft.streaming.StreamingOps.readEventsStream]]
    * — every downstream operator accepts either.
    */
  def readSensorStream(s: SparkSession, cfg: KafkaConfig): DataFrame =
    decodeSensorJson(readRaw(s, cfg))
}
