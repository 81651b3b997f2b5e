package graft.tools

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** ANN parameter sweep: recall@3 vs brute force and measured
  * candidates-per-query for multi-probe LSH configs, across one or
  * more SF dirs. Produces the numbers quoted in the
  * [[graft.similarity.Similarity.annTopK]] scaladoc and the scale
  * gate tables; not part of the query surface.
  *
  * Usage: java -cp ... graft.tools.AnnSweep <sfDir> [<sfDir> ...]
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-ann-sweep")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(f"${"dir"}%-22s ${"N"}%7s ${"planes"}%6s ${"tables"}%6s ${"radius"}%6s ${"recall@3"}%9s ${"cand/q"}%9s ${"frac"}%7s")
    dirs.foreach { dir =>
      val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = corpus.count()
      val queries = corpus.filter(col("vec_id") < 10)
      val exact = Similarity
        .bruteForceTopK(queries, corpus, "vec_id", "embedding", 3)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val adaptive = Similarity.adaptivePlanes(n)
      // the 16-table rows measure the bounded recall-recovery arm
      // for large-N unclustered corpora (recall ~ 1-(1-r1)^tables)
      val configs: Seq[(Int, Int, Int)] = Seq(
        (adaptive, Similarity.adaptiveTables(adaptive), 2), // the defaults
        (adaptive, 8, 2), (adaptive, 4, 2), (adaptive + 1, 8, 2),
        (adaptive, 16, 2), (adaptive - 1, 16, 2)).distinct
      configs.foreach { case (p, t, r) =>
        val cand = Similarity.annCandidates(queries, corpus, "vec_id",
          "embedding", p, t, r)
        val nc = cand.count()
        val approx = Similarity.annTopK(queries, corpus, "vec_id",
          "embedding", 3, planes = p, tables = t, probeRadius = r)
          .select("q_id", "n_id").collect()
          .map(row => (row.getLong(0), row.getLong(1))).toSet
        val recall = (exact & approx).size.toDouble / exact.size
        println(f"$dir%-22s $n%7d $p%6d $t%6d $r%6d $recall%9.3f ${nc / 10.0}%9.1f ${nc / 10.0 / n}%7.3f")
      }
    }
    spark.stop()
  }
}
