package graft.tools

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Prints what [[Dedup.chooseBanding]] resolves (width + per-width
  * waste stats) on a given documents dir, for both the RAW scan —
  * the frame every catalog entry (including d14's Curator, since
  * round 10) actually tunes on — and the exact-dedup survivor frame,
  * kept as the equivalence check that the two frames resolve the
  * same width (they must: the tuner content-dedups its sample). The
  * diagnostic for "did the tuner's choice, not its job cost, change
  * a bench key's steady-state plan". Measurement tooling, not query
  * surface.
  *
  * Usage: java -cp ... graft.tools.TuneCheck [--curate] [<docsDir>]
  * `--curate` additionally times the full Curator.curate pipeline at
  * the resolved banding (cold, then memo-warm) — the d14 shape at
  * whatever octave the dir holds.
  */
object TuneCheck {
  def main(args: Array[String]): Unit = {
    val doCurate = args.contains("--curate")
    val dir = args.filterNot(_ == "--curate")
      .headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-tune-check")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val uniq = docs
      .withColumn("content_hash", Dedup.contentHash(col("text")))
      .withColumn("__keep", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("content_hash")))
      .filter(col("doc_id") === col("__keep"))
      .drop("content_hash", "__keep")
    for ((label, df) <- Seq("raw-scan" -> docs, "survivors" -> uniq)) {
      val t0 = System.nanoTime()
      val c = Dedup.chooseBanding(df, "doc_id", "text")
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TUNECHECK $label%-9s -> numPerms=${c.numPerms} " +
        f"corpusDocs=${c.corpusDocs} estReps=${c.estReps} tuneSec=$dt%.2f " +
        c.stats.map(s => f"p=${s.numPerms}:waste=${s.sampleWasted}/${s.sampleCandidates}:ratio=${s.predictedWasteRatio}%.2f")
          .mkString(" "))
    }
    if (doCurate) {
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val kept = graft.dedup.Curator.curate(spark, docs).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val ts = Dedup.tunerStats
        spark.catalog.clearCache()
        println(f"TUNECHECK curate pass=$pass kept=$kept sec=$dt%.1f " +
          f"tunerRuns=${ts.runs} memoHits=${ts.memoHits}")
      }
    }
    spark.stop()
  }
}
