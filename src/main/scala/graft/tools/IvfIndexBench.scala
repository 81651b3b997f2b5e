package graft.tools

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Amortization evidence for d37: time buildIvfIndex once, then
  * repeated [[Similarity.ivfProbe]] batches against it, vs the same
  * batches through fused [[Similarity.ivfTopK]] (which re-runs the
  * quantizer every call). Measurement tooling, not query surface.
  *
  * Usage: java -cp ... graft.tools.IvfIndexBench [<dirOrSynthToken>] [<kCentroids>] [<batches>]
  */
object IvfIndexBench {
  def main(args: Array[String]): Unit = {
    val tok = args.headOption.getOrElse("/root/repo/data/sf10_docs")
    val kc = args.lift(1).map(_.toInt).getOrElse(64)
    val batches = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-ivf-index-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = tok match {
      case s if s.startsWith("synth:") =>
        val parts = s.split(":")
        IvfCheck.synth(spark, parts(2).toLong, parts(1) == "clustered")
      case dir => spark.read.parquet(s"$dir/embeddings.parquet")
    }
    val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_ivfbench_${java.lang.ProcessHandle.current().pid()}").toString
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tBuild = time {
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx, kCentroids = kc)
    }
    // distinct query batch per iteration so no result is cache-warm
    def batch(i: Int) = emb.filter(col("vec_id") % 100 === i)
    val tProbe = (0 until batches).map { i =>
      time(Similarity.ivfProbe(batch(i), idx, "vec_id", "embedding",
        k = 5, nprobe = 4).count())
    }
    val tFused = (0 until batches).map { i =>
      val dt = time(Similarity.ivfTopK(batch(i), emb, "vec_id", "embedding",
        k = 5, kCentroids = kc, nprobe = 4).count())
      spark.catalog.clearCache() // drop ivfTopK's internal persists
      dt
    }
    println(f"IVFBENCH $tok kc=$kc build=$tBuild%.2f " +
      f"probe_each=[${tProbe.map(t => f"$t%.2f").mkString(",")}] " +
      f"fused_each=[${tFused.map(t => f"$t%.2f").mkString(",")}] " +
      f"probe_sum=${tProbe.sum}%.2f fused_sum=${tFused.sum}%.2f " +
      f"amortized_speedup=${tFused.sum / math.max(tProbe.sum, 1e-9)}%.2fx")
    spark.stop()
  }
}
