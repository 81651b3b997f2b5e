package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for a set of catalog keys to
  * per-query files — the optimization-round evidence contract
  * (`plans/rNN/<key>_before.txt` / `..._after.txt`).
  *
  *   sbt "runMain graft.tools.PlanDump <outDir> <suffix> <k1,k2,...> [sfDir]"
  *
  * Uses the same session posture as the bench (Session defaults) so
  * the dumped plan is the shape the bench times; sfDir defaults to
  * sf0.01 — plan SHAPE (exchanges, join strategies, pushdown) is
  * SF-independent for these queries, only AQE's runtime coalescing
  * differs, and the dump shows the static plan anyway.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <k1,k2,..> [sfDir]")
    val outDir = args(0)
    val suffix = args(1)
    val keys = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = graft.engine.Session
      .builder(master = "local[4]", shufflePartitions = 4,
        appName = "graft-plandump")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (name <- keys) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
