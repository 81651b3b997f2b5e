package graft.tools

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Recall@k comparison of [[Similarity.ivfTopK]]'s coarse
  * quantizers (lowid vs seeded kmeans at 1..3 Lloyd iterations)
  * against brute force, per corpus dir — the measurement behind the
  * d19 quantizer choice. Measurement tooling, not query surface.
  *
  * Usage: java -cp ... graft.tools.IvfCheck [<dir>...]
  */
object IvfCheck {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-ivf-check")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      // enough queries for recall resolution, few enough that the
      // brute-force ground truth stays feasible at 200k vectors
      val qMod = math.max(5L, n / 200)
      val queries = emb.filter(col("vec_id") % qMod === 0)
      val nq = queries.count()
      val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 3)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(q: String, iters: Int): Double = {
        val t0 = System.nanoTime()
        val got = Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 3,
            kCentroids = 16, nprobe = 4, quantizer = q, lloydIters = iters)
          .select("q_id", "n_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val rec = (exact & got).size.toDouble / exact.size
        println(f"IVFCHECK $dir n=$n nq=$nq $q%-7s iters=$iters recall@3=$rec%.3f sec=$dt%.1f")
        rec
      }
      recall("lowid", 1)
      for (i <- 1 to 3) recall("kmeans", i)
    }
    spark.stop()
  }
}
