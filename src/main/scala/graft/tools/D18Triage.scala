package graft.tools

/** Isolate the d18_dup_clusters core-count inversion (r16 verdict #4:
  * 2.63 s @8c → 6.71 s @32c at sf0.1): run dupClusters under an
  * explicit (master cores, shuffle partitions) pair so the two knobs
  * the bench couples (local[$cpus] AND shufflePartitions=$cpus) can
  * be separated, and report the star-CC round count + wall time.
  *
  *   sbt "runMain graft.tools.D18Triage <sfDir> <cores> <shufflePartitions>"
  */
object D18Triage {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val sp = if (args.length > 2) args(2).toInt else cores
    val spark = graft.engine.Session
      .builder(master = s"local[$cores]", shufflePartitions = sp,
        appName = s"graft-d18-triage-c$cores-sp$sp")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm pass at the smallest SF (JIT/codegen), then 2 timed passes
    val warm = "/root/testdata/sf0.001"
    for (dir <- Seq(warm, sfDir, sfDir)) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("d18_dup_clusters")(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[d18] dir=$dir cores=$cores sp=$sp rows=$n wall=$dt%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
