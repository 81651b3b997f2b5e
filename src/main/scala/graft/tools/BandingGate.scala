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
  * r16 (`--perms`): the ladder is an argument, so the gate can
  * answer the r15 verdict's escalation question — does extending
  * past 24 (8 perms/band: 32, 10 perms/band: 40) pay for itself on
  * the corpus where 24 missed the waste target (the sf10 500k-doc
  * spot corpus), or is the 24 cap the measured optimum through the
  * next octave? `--ladder-only` runs, per candidate width, the FULL
  * verified-pairs leg (wall-clock + edge recall vs the first
  * width's edge set) without the legacy/auto/d18 legs.
  *
  * Usage: java -cp ... graft.tools.BandingGate [<docsDir>]
  *          [--perms 16,20,24,32,40] [--tune-only | --ladder-only]
  */
object BandingGate {
  def main(args: Array[String]): Unit = {
    val tuneOnly = args.contains("--tune-only")
    val ladderOnly = args.contains("--ladder-only")
    var permArg: Seq[Int] = Seq(16, 20, 24)
    var dir = "data/sf10_docs"
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--perms" =>
          permArg = args(i + 1).split(",").map(_.trim.toInt).toSeq; i += 2
        case "--tune-only" | "--ladder-only" => i += 1
        case p => dir = p; i += 1
      }
    }
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
      Dedup.chooseBanding(docs, "doc_id", "text", permCandidates = permArg)
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

    if (ladderOnly) {
      // Per-width verified-pairs leg: recall is measured against the
      // NARROWEST width's edge set (recall-maximal — collision
      // probability only falls as bands widen), cost is wall-clock.
      var base: Set[(Long, Long)] = Set.empty
      permArg.foreach { p =>
        val (e, t) = timed(f"pairs @ numPerms=$p%2d") { edges(p) }
        if (base.isEmpty) base = e
        val recall =
          if (base.isEmpty) 100.0 else 100.0 * (e & base).size / base.size
        println(f"[banding-gate]   p=$p%2d edges=${e.size}%7d " +
          f"recall-vs-p${permArg.head}=${recall}%.1f%% wall=${t}%.1f s")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

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
