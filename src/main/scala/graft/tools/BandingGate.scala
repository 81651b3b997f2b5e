package graft.tools

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Banding auto-tuner gate at the 100×-documents octave: measures,
  * on the narrow-vocabulary gate corpus (`data/sf10_docs`,
  * tools/gen_docs.py), what [[graft.dedup.Dedup.chooseBanding]]
  * resolves to with NO explicit parameters, and the resulting
  * end-to-end cost and true-edge recall against
  *  - the numPerms=16 legacy default (the measured ~420 s cliff and
  *    the recall-maximal ground-truth edge set), and
  *  - the hand-tuned numPerms=24 run (the round-8 remedy the tuner
  *    must rediscover within ~1.5×).
  * Measurement tooling, not part of the query surface; the numbers
  * land in GATE_SF1.md's round-9 addendum.
  *
  * Usage: java -cp ... graft.tools.BandingGate [<docsDir>]
  */
object BandingGate {
  def main(args: Array[String]): Unit = {
    val tuneOnly = args.contains("--tune-only")
    val dir = args.filterNot(_ == "--tune-only")
      .headOption.getOrElse("data/sf10_docs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-banding-gate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs = spark.read.parquet(s"$dir/documents.parquet")

    def timed[T](what: String)(f: => T): (T, Double) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[banding-gate] $what%-34s ${dt}%8.1f s")
      (r, dt)
    }

    val (choice, tChoice) = timed("chooseBanding (tuner alone)") {
      Dedup.chooseBanding(docs, "doc_id", "text")
    }
    choice.stats.foreach(s => println(
      f"[banding-gate]   p=${s.numPerms}%2d waste=${s.sampleWasted}/${s.sampleCandidates} predictedRatio=${s.predictedWasteRatio}%.1f"))
    println(s"[banding-gate] chosen numPerms = ${choice.numPerms} " +
      s"(corpus ${choice.corpusDocs} docs, ~${choice.estReps} reps)")
    if (tuneOnly) { spark.stop(); return }

    def edges(numPerms: Int): Set[(Long, Long)] =
      Dedup.minhashVerifiedPairs(docs, "doc_id", "text", numPerms = numPerms)
        .filter(col("jac_pm") >= 500).select("d1", "d2")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // Ground truth: the recall-maximal 16-perm run (the cliff being
    // fixed — also the baseline wall-clock).
    val (base, t16) = timed("pairs @ numPerms=16 (legacy)") { edges(16) }
    // The hand-tuned round-8 remedy.
    val (e24, t24) = timed("pairs @ numPerms=24 (hand-tuned)") { edges(24) }
    // The auto path: NO banding parameters anywhere.
    val (eAuto, tAuto) = timed("pairs @ AUTO (tuner included)") {
      Dedup.minhashVerifiedPairs(docs, "doc_id", "text")
        .filter(col("jac_pm") >= 500).select("d1", "d2")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // End-to-end d18 (cluster assignment) at defaults, the gate leg.
    val (_, tD18) = timed("dupClusters @ AUTO end-to-end") {
      Dedup.dupClusters(docs, "doc_id", "text", algo = "star").count()
    }

    def pct(e: Set[(Long, Long)]) = 100.0 * (e & base).size / base.size
    println(f"[banding-gate] true edges (jac>=0.5 @16): ${base.size}")
    println(f"[banding-gate] recall @24: ${pct(e24)}%.1f%% (${e24.size} edges)")
    println(f"[banding-gate] recall @auto: ${pct(eAuto)}%.1f%% (${eAuto.size} edges)")
    println(f"[banding-gate] time ratio auto/hand-tuned: ${tAuto / t24}%.2f " +
      f"(target <= 1.5); speedup vs legacy: ${t16 / tAuto}%.1fx")
    spark.stop()
  }
}
