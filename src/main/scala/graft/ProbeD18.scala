package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextHash
import org.apache.spark.sql.expressions.Window

object ProbeD18 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $tag%-14s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    for (round <- 1 to 3) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val near = time("nearPairs")(
        graft.dedup.Dedup.minhashVerifiedPairs(docs, "doc_id", "text")
          .filter(col("jac_pm") >= 500).select("d1", "d2").count())
      val ex = time("exactPairs")(
        docs.select(col("doc_id"), graft.dedup.Dedup.contentHash(col("text")).as("h"))
          .withColumn("m", min(col("doc_id")).over(Window.partitionBy("h")))
          .filter(col("doc_id") =!= col("m")).count())
      val full = time("dupClusters")(
        graft.dedup.Dedup.dupClusters(docs, "doc_id", "text").count())
      System.err.println(s"[probe] round $round near=$near exact=$ex rows=$full")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
