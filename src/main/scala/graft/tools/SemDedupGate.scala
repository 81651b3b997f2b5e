package graft.tools

import org.apache.spark.sql.functions._

import graft.queries.TrainingDataQueries

/** SemDeDup cap gate at the 200k-vector octave: measures, on the
  * gate embeddings (`data/sf10_docs`), the adaptive cap's dedup
  * recall against within-cluster brute force — the contract the
  * round-8 gate found the fixed 512 cap silently breaking right at
  * N ≈ 260k (max cluster 531). Ground truth = the same clustering
  * (identical k, seeds, Lloyd step) with the cap at its 65536
  * ceiling, so every within-cluster pair is compared; recall = the
  * fraction of its detected duplicates the capped run also detects.
  * Measurement tooling, not part of the query surface; numbers land
  * in GATE_SF1.md's round-9 addendum.
  *
  * Usage: java -cp ... graft.tools.SemDedupGate [<dir> ...]
  */
object SemDedupGate {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "data/sf10_docs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-semdedup-gate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    dirs.foreach { dir =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val adaptiveCap = TrainingDataQueries.semdedupCap(n)
      def dups(cap: Int): Map[Long, Long] =
        TrainingDataQueries.semanticDedupImpl(emb, cap = cap)
          .filter(col("is_dup")).select("vec_id", "keeper_id")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val maxCluster = TrainingDataQueries.semanticDedupImpl(emb)
        .groupBy("cluster_id").count().agg(max("count")).head().getLong(0)
      spark.catalog.clearCache()
      val truth = dups(65536)
      spark.catalog.clearCache()
      val fixed = dups(512)
      spark.catalog.clearCache()
      val adaptive = dups(adaptiveCap)
      spark.catalog.clearCache()
      def recall(got: Map[Long, Long]) =
        if (truth.isEmpty) 1.0
        else got.keySet.intersect(truth.keySet).size.toDouble / truth.size
      println(f"[semdedup-gate] $dir: N=$n maxCluster=$maxCluster " +
        f"adaptiveCap=$adaptiveCap trueDups=${truth.size}")
      println(f"[semdedup-gate]   recall fixed-512: ${100 * recall(fixed)}%.2f%% " +
        f"(${fixed.size} dups)")
      println(f"[semdedup-gate]   recall adaptive:  ${100 * recall(adaptive)}%.2f%% " +
        f"(${adaptive.size} dups)")
    }
    spark.stop()
  }
}
