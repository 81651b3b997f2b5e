package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Round-12 operators: incremental span dedup (d46 — the d30
  * build-once/probe-many amortization applied to d39's span grain)
  * and its index contracts.
  */
class Round12OpsSpec extends AnyFunSuite {
  import SparkTestBase._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def scratch(): String =
    java.nio.file.Files.createTempDirectory("graft_spanidx_").toString

  test("spanDedupIncremental: indexed spans lose, batch firsts win, rebuild is exact") {
    import spark.implicits._
    val ingested = Seq(
      (1L, "a b c d"),
      (2L, "e f g h")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b x y"),   // "a b" ingested -> drops; "x y" fresh first
      (11L, "x y c d"),   // "x y" second in batch; "c d" ingested
      (12L, "p q p q")    // intra-batch repeat: second drops
    ).toDF("doc_id", "text")
    val idx = scratch()
    Dedup.buildSpanIndex(ingested, "doc_id", "text", idx, width = 2)
    val out = Dedup.spanDedupIncremental(batch, "doc_id", "text", idx)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(10L) == ((2L, 1L, md5hex("x y"))))
    assert(out(11L) == ((2L, 0L, md5hex(""))))
    assert(out(12L) == ((2L, 1L, md5hex("p q"))))
  }

  test("incremental equals batch-global spanDedup when ingestion order matches id order") {
    // The documented coincidence: with every ingested id below every
    // batch id, the incremental result must equal global spanDedup
    // over the union, restricted to the batch — on a corpus with
    // cross-slice, intra-batch, and intra-doc span sharing.
    import spark.implicits._
    val mk = (i: Long) => {
      val shared = s"s${i % 7} t${i % 7}"            // cross-doc shared span
      val cohort = s"c${i / 10} k${i / 10}"          // 10-doc cohort span
      val unique = s"u$i v$i w$i z$i"                // two unique spans
      (i, s"$shared $cohort $unique")
    }
    val all = (0L until 120L).map(mk).toDF("doc_id", "text")
    val ingested = all.filter(col("doc_id") < 80)
    val batch = all.filter(col("doc_id") >= 80)
    val idx = scratch()
    Dedup.buildSpanIndex(ingested, "doc_id", "text", idx, width = 2)
    val inc = Dedup.spanDedupIncremental(batch, "doc_id", "text", idx)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val global = Dedup.spanDedup(all, "doc_id", "text", width = 2)
      .filter(col("doc_id") >= 80)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(inc == global)
    assert(inc.values.exists(_._2 > 0) && inc.values.exists(v => v._2 < v._1),
      "fixture must exercise both kept and dropped spans")
  }

  test("span index: probe adopts the meta width; a contradiction throws; append extends the set") {
    import spark.implicits._
    val idx = scratch()
    Dedup.buildSpanIndex(Seq((1L, "a b c d")).toDF("doc_id", "text"),
      "doc_id", "text", idx, width = 2)
    val e = intercept[IllegalStateException] {
      Dedup.spanDedupIncremental(
        Seq((2L, "a b")).toDF("doc_id", "text"), "doc_id", "text", idx,
        width = 4)
    }
    assert(e.getMessage.contains("width=2"))

    // append: batch-2 survivors become index members for batch 3
    Dedup.appendSpanIndex(Seq((2L, "x y a b")).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    val out = Dedup.spanDedupIncremental(
      Seq((3L, "x y q r")).toDF("doc_id", "text"), "doc_id", "text", idx)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(3L) == ((2L, 1L, md5hex("q r"))),
      "appended span 'x y' must now suppress batch-3 occurrences")
    // the append must not have duplicated already-present keys
    val n = spark.read.parquet(s"$idx/spans").count()
    val distinctN = spark.read.parquet(s"$idx/spans").distinct().count()
    assert(n == distinctN, "span index must stay a set after append")
  }
}
