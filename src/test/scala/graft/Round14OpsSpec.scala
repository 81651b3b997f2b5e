package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.streaming.StreamingOps

/** Round-14 contracts: crash-retry convergence of the ingest loops
  * (the re-delivered-epoch window where the first attempt already
  * mutated the index), the staged span-index rebuild, and the
  * defensive content guard on the MinHash index append.
  */
class Round14OpsSpec extends AnyFunSuite {
  import SparkTestBase._

  private def scratch(): String =
    java.nio.file.Files.createTempDirectory("graft_r14_").toString

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def streamDocsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.map { case (id, text) =>
      (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def sinkIds(outDir: String): Set[Long] =
    spark.read.option("basePath", outDir).parquet(s"$outDir/epoch=*")
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("spanIngestEpoch: a re-delivered epoch converges to the first attempt's admitted set") {
    // The ADVICE-r13 loss window: attempt 1 admits a doc, appends its
    // spans, then crashes before the checkpoint commit. The replayed
    // epoch re-gates against the MUTATED index — without retry
    // awareness the admitted doc scores novel_pm = 0, is dropped from
    // the overwrite, and is gone from the sink forever. Calling the
    // epoch function twice with the same epochId IS the replay.
    val idx = scratch()
    val out = scratch()
    Dedup.buildSpanIndex(docsDf(Seq(1L -> "a b c d")),
      "doc_id", "text", idx, width = 2)
    val batch = streamDocsDf(Seq(
      10L -> "p q r s",   // fresh -> admitted
      11L -> "a b c d"))  // pre-ingested -> rejected
    val n1 = StreamingOps.spanIngestEpoch(batch, 0L, "doc_id", "text",
      idx, out, minNovelPm = 500L)
    assert(n1 == 1L)
    assert(sinkIds(out) == Set(10L))
    // replay: same epoch, same rows, index already mutated by attempt 1
    val n2 = StreamingOps.spanIngestEpoch(batch, 0L, "doc_id", "text",
      idx, out, minNovelPm = 500L)
    assert(n2 == 1L, "replay must converge, not re-gate the admission away")
    assert(sinkIds(out) == Set(10L),
      "the sink must still carry attempt 1's admitted doc after replay")
    // and the index gained nothing on replay (append idempotence)
    val keys = Dedup.spanIndexKeys(spark, idx).count()
    val n3 = StreamingOps.spanIngestEpoch(batch, 0L, "doc_id", "text",
      idx, out, minNovelPm = 500L)
    assert(n3 == 1L && Dedup.spanIndexKeys(spark, idx).count() == keys)
  }

  test("spanIngestLoop: literal kill-restart — a deleted commit marker replays the epoch losslessly") {
    // The end-to-end form of the case above: run the loop, then
    // simulate a crash between appendSpanIndex and the checkpoint
    // commit by deleting the commit marker; a restart from the same
    // checkpoint re-delivers that epoch for real.
    val srcDir = scratch(); val outDir = scratch()
    val ckpt = scratch(); val idx = scratch()
    Dedup.buildSpanIndex(docsDf(Seq(1L -> "a b c d")),
      "doc_id", "text", idx, width = 2)
    streamDocsDf(Seq(10L -> "p q r s", 11L -> "a b c d"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    def run(): Unit = {
      val q = StreamingOps.spanIngestLoop(
        spark.readStream.schema(StreamingOps.documentsSchema).parquet(srcDir),
        "doc_id", "text", idx, outDir, ckpt)
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
    }
    run()
    assert(sinkIds(outDir) == Set(10L))
    // crash simulation: the epoch's effects (sink write + index
    // append) happened, the commit did not
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit))
    assert(commits.nonEmpty, "the run must have committed at least one epoch")
    val last = commits.maxBy(_.getName.toLong)
    assert(last.delete(), s"could not delete commit marker $last")
    // the checksum sidecar too, or the replayed commit's rename fails
    val crc = new java.io.File(last.getParent, s".${last.getName}.crc")
    if (crc.exists) crc.delete()
    run() // restart: the uncommitted epoch is re-delivered
    assert(sinkIds(outDir) == Set(10L),
      "kill-restart replay must keep attempt 1's admitted doc in the sink")
    val novel = Dedup.spanNovelty(docsDf(Seq(30L -> "p q")),
      "doc_id", "text", idx).head().getLong(2)
    assert(novel == 0L, "the admitted doc's spans stay ingested across replay")
  }

  test("buildSpanIndex rebuild is staged: the new index swaps in whole, and meta-without-spans refuses") {
    val idx = scratch()
    Dedup.buildSpanIndex(docsDf(Seq(1L -> "a b c d")),
      "doc_id", "text", idx, width = 2)
    // rebuild over the live index (different corpus, different width)
    Dedup.buildSpanIndex(docsDf(Seq(2L -> "w x y z")),
      "doc_id", "text", idx, width = 4)
    val out = Dedup.spanNovelty(docsDf(Seq(9L -> "w x y z")),
      "doc_id", "text", idx).head()
    assert(out.getLong(2) == 0L, "the rebuilt index must own the new corpus")
    // half-built index: meta present, spans gone -> probes must refuse
    // loudly instead of declaring an empty table ('everything novel')
    Dedup.deleteSpanIndex(spark, idx)
    Dedup.buildSpanIndex(docsDf(Seq(3L -> "m n o k")),
      "doc_id", "text", idx, width = 2)
    spark.sql(s"DROP TABLE IF EXISTS ${spark.catalog.listTables()
      .filter(col("name").startsWith("graft_span_idx_")).collect()
      .map(_.name)
      .find(n => spark.table(n).inputFiles.exists(_.contains(
        new java.io.File(idx).getName))).get}")
    graft.engine.Scratch.delete(s"$idx/spans")
    val e = intercept[IllegalStateException] {
      Dedup.spanNovelty(docsDf(Seq(9L -> "m n")), "doc_id", "text", idx)
    }
    assert(e.getMessage.contains("no span data files"))
  }

  test("appendIndex drops already-indexed content before deriving sig/band deltas") {
    // Contract violation guard: a caller passing a row whose CONTENT
    // hash is already indexed must not double-represent that content
    // in the LSH tables under the new id.
    val idx = scratch()
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    Dedup.buildIndex(docsDf(Seq(1L -> txt)), "doc_id", "text", idx,
      numPerms = 16)
    Dedup.appendIndex(docsDf(Seq(
        7L -> txt,                                         // exact_index dup
        8L -> "fresh uniq1 uniq2 uniq3 uniq4 uniq5 uniq6") // genuinely new
      ), "doc_id", "text", idx)
    val sigIds = spark.read.parquet(s"$idx/sigs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sigIds == Set(1L, 8L),
      s"the dup's sig must not land under the new id, got $sigIds")
    val bandIds = spark.read.parquet(s"$idx/bands")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!bandIds.contains(7L),
      "the dup's band keys must not land under the new id")
  }
}
