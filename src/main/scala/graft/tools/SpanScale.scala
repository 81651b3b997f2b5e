package graft.tools

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Span-dedup (d39) scale measurement: wall time and span-population
  * shape across synthetic corpus octaves with an adversarial
  * boilerplate span shared by EVERY document — the hot-key shape the
  * operator's partial-aggregated first-owner claim is about (a
  * row_number window over span_key would funnel all N occurrences of
  * that span through one task; the `min(struct)` partial agg
  * collapses them map-side). Near-linear wall-time across octaves
  * with max-multiplicity = N is the evidence quoted in GATE_SF1.md.
  *
  * Corpus shape per doc (width-8 spans): one boilerplate span shared
  * by all docs, one span shared within a 100-doc cohort, two spans
  * unique to the doc.
  *
  * Usage: java -cp ... graft.tools.SpanScale [nDocs ...]
  *        (default octaves: 50000 200000 800000)
  */
object SpanScale {
  def main(args: Array[String]): Unit = {
    val octaves = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(50000L, 200000L, 800000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-span-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(f"${"docs"}%8s ${"spans"}%10s ${"kept"}%10s " +
      f"${"max_mult"}%9s ${"sec"}%7s")
    octaves.foreach { n =>
      val docs = spark.range(0, n, 1, cpus.toInt * 2).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          // boilerplate: identical 8-token span in EVERY doc
          lit("the quick brown fox jumps over lazy dogs"),
          // cohort span: shared by the doc's 100-doc cohort
          concat_ws(" ", (0 until 8).map(j =>
            concat(lit(s"c${j}_"), (col("id") / 100).cast("long"))): _*),
          // two unique spans
          concat_ws(" ", (0 until 16).map(j =>
            concat(lit(s"u${j}_"), col("id"))): _*)).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count() // materialize outside the timed region

      val t0 = System.nanoTime()
      val out = Dedup.spanDedup(docs, "doc_id", "text", width = 8)
        .agg(sum("n_spans"), sum("kept_spans")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9

      // the hottest span is the boilerplate: multiplicity n by
      // construction (every doc carries it once)
      println(f"$n%8d ${out.getLong(0)}%10d ${out.getLong(1)}%10d " +
        f"$n%9d $sec%7.1f")
      docs.unpersist()
    }
    spark.stop()
  }
}
