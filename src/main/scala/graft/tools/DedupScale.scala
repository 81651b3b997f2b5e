package graft.tools

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Dedup-family scale measurement: bucket occupancy and candidate
  * counts vs corpus size for the MinHash (d7), SimHash (d8), and
  * SemDeDup (d32) paths, across one or more SF dirs. The flat-
  * occupancy claims quoted in GATE_SF1.md come from this tool; it is
  * measurement tooling, not part of the query surface.
  *
  * Usage: java -cp ... graft.tools.DedupScale <sfDir> [<sfDir> ...]
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "data/sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-dedup-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(f"${"dir"}%-18s ${"docs"}%8s ${"reps"}%8s " +
      f"${"mh_bkt"}%8s ${"mh_avg"}%7s ${"mh_max"}%7s ${"mh_pairs"}%9s " +
      f"${"sh_max"}%7s ${"sh_pairs"}%9s ${"sd_k"}%5s ${"sd_maxc"}%8s")
    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val reps = Dedup.contentReps(docs, "doc_id", "text").count()

      // MinHash band buckets at the d7 defaults (prededup'd, same
      // length filter as minhashVerifiedPairs)
      val mhOcc = Dedup.lshBands(
          Dedup.contentReps(docs, "doc_id", "text"), "doc_id", "text")
        .groupBy("band", "band_hash").count()
        .agg(count(lit(1)), avg("count"), max("count")).collect()(0)
      val mhPairs = Dedup.minhashVerifiedPairs(docs, "doc_id", "text").count()

      // SimHash combination-band occupancy at the d8 defaults
      val shSigs = Dedup.contentReps(docs, "doc_id", "text")
        .select(col("doc_id"),
          graft.functions.TextHash.simhash(
            graft.functions.TextHash.word_gram_hashes(
              col("text"), 3, distinct = false), 30).as("sh"))
      val shCols = Dedup.simhashCombos(30, 3).zipWithIndex.map {
        case (segs, cid) =>
          val key = segs.foldLeft(lit(0L)) { case (acc, (off, w)) =>
            shiftleft(acc, w).bitwiseOR(
              shiftright(col("sh"), off).bitwiseAND(lit((1L << w) - 1)))
          }
          struct(lit(cid).as("band"), key.as("band_bits"))
      }
      val shMax = shSigs.select(explode(array(shCols: _*)).as("bb"))
        .groupBy("bb.band", "bb.band_bits").count()
        .agg(max("count")).collect()(0).getLong(0)
      val shPairs = Dedup.simhashPairs(docs, "doc_id", "text").count()

      // SemDeDup cluster balance at the adaptive k
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val sdK = graft.queries.TrainingDataQueries.semdedupK(emb.count())
      val sdMaxC = graft.queries.TrainingDataQueries
        .semanticDedupImpl(emb)
        .groupBy("cluster_id").count().agg(max("count")).collect()(0).getLong(0)

      println(f"$dir%-18s $n%8d $reps%8d " +
        f"${mhOcc.getLong(0)}%8d ${mhOcc.getDouble(1)}%7.2f ${mhOcc.getLong(2)}%7d $mhPairs%9d " +
        f"$shMax%7d $shPairs%9d $sdK%5d $sdMaxC%8d")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
