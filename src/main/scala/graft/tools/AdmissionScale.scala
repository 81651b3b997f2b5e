package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashEmbed
import graft.similarity.Similarity

/** Admission-path (c26) scale + recall measurement: wall time of the
  * index build and the streaming-shaped probe, plus GROUND-TRUTH
  * admission recall on planted near-duplicates, across synthetic
  * corpus octaves under exactly the deployed r13 sizing policy —
  * `kc = clamp(⌈√N⌉, 16, KCentroidsMax)`,
  * `nprobe = adaptiveNprobe(kc) = max(4, ⌈√kc⌉)`. The r11 verdict's
  * open question was whether the admission gate actually CATCHES
  * near-dups under a sublinear probe budget; this is the harness
  * behind the GATE_SF1.md admission-recall table (the c26 oracle
  * proves exactness of the computation, not recall of the policy).
  * The 800k/1.6M octaves sit PAST the retired 600-centroid clamp
  * (kc = ⌈√N⌉ > LitCentroidMax there), so they exercise the
  * boxed-literal exact ranking end to end — recall and per-arrival
  * candidate growth at those octaves are the scale evidence for it.
  *
  * Corpus: deterministic token sequences (xxhash64-derived — no RNG
  * state, reproducible anywhere). Arrivals are half PLANTED
  * near-dups (an ingested doc's text plus one appended token — the
  * "same page re-crawled with a footer change" shape, cosine ≈ 0.99
  * against its source) and half fresh documents. A near-dup is
  * CAUGHT when the gate reports `admit = false`; a fresh arrival is
  * correctly admitted when absent from the report or `admit = true`.
  *
  * Usage: java -cp ... graft.tools.AdmissionScale [nDocs ...]
  *        (default octaves: 12500 50000 200000 800000)
  */
object AdmissionScale {

  /** Deterministic `tokensPerDoc`-token text for a seed id; `salt`
    * partitions the generator into independent streams (ingested vs
    * fresh-arrival texts).
    */
  def docText(seed: Column, tokensPerDoc: Int, vocab: Int,
      salt: Int): Column =
    concat_ws(" ", (0 until tokensPerDoc).map(j =>
      concat(lit("w"), pmod(xxhash64(seed, lit(j), lit(salt)),
        lit(vocab.toLong)))): _*)

  /** The ingested corpus: `(doc_id, text)`, ids `[0, n)`. */
  def ingested(s: SparkSession, n: Long, tokensPerDoc: Int = 30,
      vocab: Int = 5000, partitions: Int = 32): DataFrame =
    s.range(0L, n, 1L, partitions).select(col("id").as("doc_id"),
      docText(col("id"), tokensPerDoc, vocab, salt = 0).as("text"))

  /** Arrival batch: `nDup` planted near-dups (source doc
    * `doc_id mod n`, text + one appended token) then `nFresh` fresh
    * docs; arrival ids start at `n`.
    */
  def arrivals(s: SparkSession, n: Long, nDup: Int, nFresh: Int,
      tokensPerDoc: Int = 30, vocab: Int = 5000): DataFrame = {
    val dups = s.range(n, n + nDup).select(col("id").as("doc_id"),
      concat(docText(pmod(col("id"), lit(n)), tokensPerDoc, vocab, 0),
        lit(" zz")).as("text"), lit(true).as("is_dup"))
    val fresh = s.range(n + nDup, n + nDup + nFresh)
      .select(col("id").as("doc_id"),
        docText(col("id"), tokensPerDoc, vocab, salt = 7).as("text"),
        lit(false).as("is_dup"))
    dups.unionByName(fresh)
  }

  /** One measured admission cycle at the deployed policy. Returns
    * (kc, nprobe, buildSec, probeSec, caughtDups, nDups,
    * admittedFresh, nFresh, candRows).
    */
  def run(s: SparkSession, n: Long, nDup: Int, nFresh: Int,
      dim: Int = 16, nprobeOverride: Int = 0):
      (Int, Int, Double, Double, Long, Int, Long, Int, Long) = {
    val idx = graft.engine.Scratch.dir("graft_admscale_")
    try {
      val corpus = HashEmbed.embed(ingested(s, n), "doc_id", "text", dim)
        .select(col("doc_id"), col("emb").as("ev"))
      val kc = math.min(Similarity.KCentroidsMax.toLong,
        math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
      val np = if (nprobeOverride > 0) nprobeOverride
        else Similarity.adaptiveNprobe(kc)
      val t0 = System.nanoTime()
      Similarity.buildIvfIndex(corpus, "doc_id", "ev", idx, kCentroids = kc)
      val buildSec = (System.nanoTime() - t0) / 1e9

      val arr = arrivals(s, n, nDup, nFresh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      arr.count()
      val q = HashEmbed.embed(arr, "doc_id", "text", dim)
        .select(col("doc_id"), col("emb").as("ev"))
      val t1 = System.nanoTime()
      val cand = Similarity
        .litIndexCandidates(s, q, idx, "doc_id", "ev", nprobe = np)
      val report = cand
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_cands"), max(col("cos")).as("max_cos"))
        .withColumn("admit", col("max_cos") < 0.95)
        .join(arr.select(col("doc_id"), col("is_dup")), "doc_id")
        .groupBy("is_dup")
        .agg(count(lit(1)).as("n_reported"),
          sum(when(!col("admit"), 1L).otherwise(0L)).as("n_rejected"),
          sum(col("n_cands")).as("cand_rows"))
        .collect().map(r => r.getBoolean(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val probeSec = (System.nanoTime() - t1) / 1e9
      arr.unpersist()
      val (dupRep, dupRej, dupCands) = report.getOrElse(true, (0L, 0L, 0L))
      val (freshRep, freshRej, freshCands) =
        report.getOrElse(false, (0L, 0L, 0L))
      // caught = reported AND rejected; fresh admitted = not rejected
      // (absent from the report is trivially admitted)
      (kc, np, buildSec, probeSec, dupRej, nDup,
        nFresh - freshRej, nFresh, dupCands + freshCands)
    } finally graft.engine.Scratch.delete(idx)
  }

  def main(args: Array[String]): Unit = {
    val octaves = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(12500L, 50000L, 200000L, 800000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-admission-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(f"${"docs"}%8s ${"kc"}%5s ${"nprobe"}%6s ${"build_s"}%8s " +
      f"${"probe_s"}%8s ${"recall"}%7s ${"fresh_ok"}%8s ${"cand/q"}%8s")
    octaves.foreach { n =>
      Seq(0, 2).foreach { npo => // deployed adaptive policy, then the r11 pin
        val (kc, np, b, p, caught, nd, adm, nf, cands) =
          run(spark, n, nDup = 200, nFresh = 200, nprobeOverride = npo)
        val tag = if (npo == 0) "adaptive" else s"pin$npo"
        println(f"$n%8d $kc%5d $np%6d $b%8.1f $p%8.1f " +
          f"${caught.toDouble / nd}%7.3f ${adm.toDouble / nf}%8.3f " +
          f"${cands / (nd + nf)}%8d  ($tag)")
      }
    }
    spark.stop()
  }
}
