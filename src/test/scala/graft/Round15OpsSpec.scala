package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.streaming.StreamingOps

/** Round-15 contracts: the c28 single-epoch oracle invariant under a
  * multi-file arrival corpus, and kill-restart convergence of the
  * composed gate across the half-appended window (crash BETWEEN
  * appendSpanIndex and appendIvfIndex: fates committed, span index
  * mutated, IVF not).
  */
class Round15OpsSpec extends AnyFunSuite {
  import SparkTestBase._

  private def scratch(): String =
    java.nio.file.Files.createTempDirectory("graft_r15_").toString

  private def streamDocsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.map { case (id, text) =>
      (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def onesWeights = spark.range(0, 64)
    .select(col("id").as("feature"), lit(1L).as("weight"))

  private def gateCfg(thresholdPm: Long) = StreamingOps.IngestGateConfig(
    weights = onesWeights, weightDim = 64, thresholdPm = thresholdPm,
    embedDim = 16, maxCos = 0.95, minNovelPm = 900L, rebuildFactor = 0.0)

  private def gateBase(spanIdx: String, ivfIdx: String): Unit = {
    val base = streamDocsDf((0L until 20L).map(i =>
      i -> s"b${i}a b${i}b b${i}c b${i}d b${i}e b${i}f b${i}g b${i}h"))
    Dedup.buildSpanIndex(base, "doc_id", "text", spanIdx, width = 2)
    Similarity.buildIvfIndex(
      graft.functions.HashEmbed.embed(base, "doc_id", "text", 16)
        .select(col("doc_id"), col("emb").as("ev")),
      "doc_id", "ev", ivfIdx, kCentroids = 4)
  }

  private def gateFates(outDir: String): Map[Long, String] =
    spark.read.option("basePath", outDir).parquet(s"$outDir/epoch=*")
      .select("doc_id", "fate").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def filesUnder(dir: String): Set[String] = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) return Set.empty
    val s = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(_.toString).toSet
    } finally s.close()
  }

  test("ingestGateLoop: a multi-file arrival corpus still gates in exactly ONE epoch (the c28 oracle invariant)") {
    // The c28 oracle models admission vs the INGESTED corpus only —
    // it is exact iff the whole arrival slice lands as one
    // micro-batch. The file source with no maxFilesPerTrigger takes
    // every available file in the first batch; this pins that
    // behavior under the exact condition the oracle worries about
    // (a driver corpus that splits into multiple parquet files).
    val srcDir = scratch(); val outDir = scratch(); val ckpt = scratch()
    val spanIdx = scratch(); val ivfIdx = scratch()
    gateBase(spanIdx, ivfIdx)
    // three separate files, written before the stream starts
    streamDocsDf(Seq(100L -> "fa1 fa2 fa3 fa4 fa5 fa6 fa7 fa8"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    streamDocsDf(Seq(101L -> "fb1 fb2 fb3 fb4 fb5 fb6 fb7 fb8"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    streamDocsDf(Seq(102L -> "fa1 fa2 fa3 fa4 fa5 fa6 fa7 fa8")) // dup of 100
      .coalesce(1).write.mode("append").parquet(srcDir)
    val nFiles = new java.io.File(srcDir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nFiles >= 3, s"setup must produce >=3 source files, got $nFiles")
    val q = StreamingOps.ingestGateLoop(
      spark.readStream.schema(StreamingOps.documentsSchema).parquet(srcDir),
      "doc_id", "text", spanIdx, ivfIdx, gateCfg(thresholdPm = 1000L),
      outDir, ckpt)
    try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
    val epochs = new java.io.File(outDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("epoch="))
    assert(epochs.length == 1,
      s"all source files must land in one epoch, got " +
        epochs.map(_.getName).mkString(","))
    // single-epoch semantics: 102 is an intra-batch copy of 100 —
    // admission is vs the INGESTED corpus, so BOTH admit (what the
    // oracle computes); cross-epoch feedback would have rejected 102
    val fates = gateFates(outDir)
    assert(fates == Map(100L -> "admitted", 101L -> "admitted",
      102L -> "admitted"), s"got $fates")
  }

  test("ingestGateEpoch: crash BETWEEN the two appends — fates committed, span mutated, IVF not — converges on retry") {
    // The r14 verdict's new window: appendSpanIndex ran, the process
    // died before appendIvfIndex. The retry must (a) honor the
    // committed fates verbatim, (b) re-append spans idempotently
    // (no duplicate keys), (c) land the missing IVF rows — ending in
    // exactly the state an uninterrupted epoch produces.
    val outDir = scratch(); val spanIdx = scratch(); val ivfIdx = scratch()
    gateBase(spanIdx, ivfIdx)
    val batch = streamDocsDf(Seq(
      100L -> "fr1 fr2 fr3 fr4 fr5 fr6 fr7 fr8", // admitted
      101L -> "b0a b0b b0c b0d b0e b0f b0g b0h")) // near_dup of ingested
    val counter = new java.util.concurrent.atomic.AtomicLong(-1L)
    def epoch(): Long = StreamingOps.ingestGateEpoch(batch, 0L,
      "doc_id", "text", spanIdx, ivfIdx, gateCfg(thresholdPm = 1000L),
      outDir, counter)
    // attempt 1 runs to completion, then the IVF append's effect is
    // surgically removed (delete every file it added): byte-for-byte
    // the state of a crash after appendSpanIndex committed and before
    // appendIvfIndex wrote anything to the index location (its delta
    // staging lives in scratch, not under the index).
    val ivfBefore = filesUnder(ivfIdx)
    val n1 = epoch()
    assert(n1 == 1L)
    val fates1 = gateFates(outDir)
    assert(fates1 == Map(100L -> "admitted", 101L -> "near_dup"))
    val spanKeysAfter1 = Dedup.spanIndexKeys(spark, spanIdx).count()
    val ivfRowsAfter1 = Similarity.ivfLists(spark, ivfIdx).count()
    (filesUnder(ivfIdx) -- ivfBefore).foreach { f =>
      assert(new java.io.File(f).delete(), s"could not delete $f")
    }
    assert(Similarity.ivfLists(spark, ivfIdx).count() == ivfRowsAfter1 - 1,
      "the crash simulation must remove exactly the appended vector")
    // the retry: committed fates are the source of truth — no re-gate
    // (a re-gate would flip 100 to span_dup against its own spans)
    val n2 = epoch()
    assert(n2 == 1L, "retry must honor the committed fates")
    assert(gateFates(outDir) == fates1, "fates must replay verbatim")
    assert(Dedup.spanIndexKeys(spark, spanIdx).count() == spanKeysAfter1,
      "span re-append must converge, not duplicate")
    assert(Similarity.ivfLists(spark, ivfIdx).count() == ivfRowsAfter1,
      "the missing IVF rows must land on retry")
    val vids = Similarity.ivfLists(spark, ivfIdx)
      .filter(col("vid") === 100L).count()
    assert(vids == 1L, s"vid 100 must appear exactly once, got $vids")
    // and a third call (retry of a fully-converged epoch) is a no-op
    val n3 = epoch()
    assert(n3 == 1L &&
      Similarity.ivfLists(spark, ivfIdx).count() == ivfRowsAfter1 &&
      Dedup.spanIndexKeys(spark, spanIdx).count() == spanKeysAfter1)
  }
}
