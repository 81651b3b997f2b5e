package graft.tools

/** Runs the c28 catalog entry standalone against a given SF dir and
  * prints the per-fate counts — the sandbox diagnostic for "does the
  * composed ingest gate exercise all four fates on this corpus", the
  * same sweep that chose the catalog thresholds. Measurement tooling,
  * not query surface.
  *
  * Usage: java -cp ... graft.tools.GateCheck [<sfDir>]
  */
object GateCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-gate-check")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = graft.queries.StreamingQueries.c28(spark, dir)
    out.groupBy("fate").count().orderBy("fate").show(false)
    spark.stop()
  }
}
