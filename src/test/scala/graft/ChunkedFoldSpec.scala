package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps

/** Scale proof for the chunked EWMA/CUSUM folds (VERDICT r3 §1):
  * a single hot key with 10^6 readings must complete without any
  * task materializing the whole series, and the two-level fold must
  * agree with the plain sequential recurrence to float precision.
  */
class ChunkedFoldSpec extends AnyFunSuite {
  import SparkTestBase._

  private val N = 1000000

  /** One sensor, 10^6 readings at 1 kHz, deterministic values. */
  private def hotKey =
    spark.range(N).select(lit(7L).as("k"), (col("id") * 1000L).as("t"),
      col("id").as("tie"), (col("id") % 97).cast("double").as("v"))

  private def seqEwma(alpha: Double): Double = {
    var s = 0.0
    var i = 0
    while (i < N) {
      val x = (i % 97).toDouble
      s = if (i == 0) x else x * alpha + s * (1 - alpha)
      i += 1
    }
    s
  }

  private def seqCusum(up: Double, dn: Double): (Double, Double) = {
    var p = 0.0; var m = 0.0; var i = 0
    while (i < N) {
      val x = (i % 97).toDouble
      p = math.max(0.0, p + (x - up))
      m = math.min(0.0, m + (x - dn))
      i += 1
    }
    (p, m)
  }

  test("chunked EWMA: 10^6-row single key completes; matches the sequential fold") {
    val out = TimeSeriesOps.ewmaChunked(hotKey, col("k"), col("t"), col("tie"),
      col("v"), alpha = 0.1, chunkUs = 1000000L) // 1000 rows per chunk
    val p = out.queryExecution.executedPlan.toString()
    // level 1 aggregates per (key, chunk) — the whole-series
    // collect_list shape must never come back
    assert(p.linesIterator.exists(l =>
      l.contains("ObjectHashAggregate") && l.contains("__chunk")))
    assert(!p.contains("Window"))
    val row = out.collect().head
    assert(row.getAs[Long]("n") == N.toLong)
    assert(math.abs(row.getAs[Double]("ewma") - seqEwma(0.1)) <= 1e-9)
  }

  test("chunked CUSUM: 10^6-row single key completes; matches the sequential fold") {
    val out = TimeSeriesOps.cusumChunked(hotKey, col("k"), col("t"), col("tie"),
      col("v"), target = 50.0, slack = 5.0, chunkUs = 1000000L)
    val row = out.collect().head
    val (ep, en) = seqCusum(55.0, 45.0)
    assert(row.getAs[Long]("n") == N.toLong)
    // CUSUM accumulators can reach ~1e5 here; compare relatively
    assert(math.abs(row.getAs[Double]("cusum_pos") - ep) <=
      1e-9 * math.max(1.0, math.abs(ep)))
    assert(math.abs(row.getAs[Double]("cusum_neg") - en) <=
      1e-9 * math.max(1.0, math.abs(en)))
  }

  test("chunk width does not change the result beyond float precision") {
    val wide = TimeSeriesOps.ewmaChunked(hotKey, col("k"), col("t"), col("tie"),
      col("v"), alpha = 0.1, chunkUs = 7777000L).collect().head
    val narrow = TimeSeriesOps.ewmaChunked(hotKey, col("k"), col("t"), col("tie"),
      col("v"), alpha = 0.1, chunkUs = 1000000L).collect().head
    assert(wide.getAs[Long]("n") == narrow.getAs[Long]("n"))
    assert(math.abs(wide.getAs[Double]("ewma") - narrow.getAs[Double]("ewma")) <= 1e-9)
  }

  test("chunked and single-level folds agree on real sensor data") {
    val e = graft.queries.QueryUtil.events(spark, sf)
    val chunked = TimeSeriesOps.ewmaChunked(e, col("user_id"),
      unix_micros(col("ts")), col("event_id"), col("value"),
      alpha = 0.1, chunkUs = 86400000000L)
      .select(col("key"), col("ewma").as("ch"))
    val plain = TimeSeriesOps.ewma(e, col("user_id"),
      Seq(unix_micros(col("ts")).as("t_us"), col("event_id")),
      col("value"), alpha = 0.1)
      .select(col("key"), col("ewma").as("pl"))
    val diffs = chunked.join(plain, "key")
      .select(max(abs(col("ch") - col("pl"))).as("d")).collect().head
    assert(diffs.getAs[Double]("d") <= 1e-9)

    val cChunked = TimeSeriesOps.cusumChunked(e, col("user_id"),
      unix_micros(col("ts")), col("event_id"), col("value"),
      target = 50.0, slack = 5.0, chunkUs = 86400000000L)
      .select(col("key"), col("cusum_pos").as("cp"), col("cusum_neg").as("cn"))
    val cPlain = TimeSeriesOps.cusum(e, col("user_id"),
      Seq(unix_micros(col("ts")).as("t_us"), col("event_id")),
      col("value"), target = 50.0, slack = 5.0)
      .select(col("key"), col("cusum_pos").as("pp"), col("cusum_neg").as("pn"))
    val cd = cChunked.join(cPlain, "key")
      .select(max(abs(col("cp") - col("pp"))).as("dp"),
        max(abs(col("cn") - col("pn"))).as("dn")).collect().head
    assert(cd.getAs[Double]("dp") <= 1e-6 && cd.getAs[Double]("dn") <= 1e-6)
  }
}
