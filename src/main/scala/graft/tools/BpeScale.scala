package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** BPE (d38) merge-table-scale measurement: tokenCount wall time
  * across realistic vocab sizes (1k / 8k / 32k merges — real
  * tokenizers carry 30k-60k), for the r12 native rank-cursor kernel
  * and, at the sizes where it is still runnable, the r11 replace
  * fold. The fold's cost is O(merges × Passes) string scans per word
  * whether or not a merge fires — the octave table this prints is
  * the evidence behind retiring it from the hot path (GATE_SF1.md
  * r12); the kernel's per-word cost is independent of vocab size.
  *
  * Usage: java -cp ... graft.tools.BpeScale [sfDir]
  *        (default corpus: data/sf1.0 — 50k documents)
  */
object BpeScale {

  /** Deterministic WELL-FORMED merge table of `m` merges over
    * [a-z0-9]: breadth-first pairing of already-formable symbols
    * with single characters (the chained shape of a trained vocab),
    * so early merges are short pairs that actually fire on real
    * text. Distinct sides by construction.
    */
  def syntheticMerges(m: Int): Seq[(String, String)] = {
    val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val formed = scala.collection.mutable.ArrayBuffer[String](chars: _*)
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var i = 0
    while (out.length < m) {
      val l = formed(i)
      chars.foreach { r =>
        if (out.length < m && l != r) {
          out += ((l, r))
          formed += (l + r)
        }
      }
      i += 1
    }
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("data/sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-bpe-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = graft.queries.QueryUtil.spread(
        spark.read.parquet(s"$sfDir/documents.parquet"))
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()

    def mergesDf(ms: Seq[(String, String)]) = ms.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "left", "right")

    println(f"${"path"}%7s ${"merges"}%7s ${"docs"}%7s ${"tokens"}%12s ${"sec"}%8s")
    Seq(16, 1000, 8000, 32000).foreach { m =>
      val ms = syntheticMerges(m)
      val t0 = System.nanoTime()
      val total = Bpe.tokenCount(docs, mergesDf(ms), "doc_id", "text")
        .agg(sum("n_tokens")).head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"${"kernel"}%7s $m%7d $nDocs%7d $total%12d $sec%8.1f")
    }
    // the r11 fold, on a 500-doc slice (full-corpus runs at >=8k
    // merges are minutes-to-hours — the point of the kernel)
    val slice = docs.filter(col("doc_id") % 100 === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSlice = slice.count()
    Seq(16, 1000).foreach { m =>
      val ms = syntheticMerges(m)
      val t0 = System.nanoTime()
      val total = slice.select(
        explode(Bpe.encodeDelimited(col("text"), ms)).as("e"))
        .select((length(col("e")) -
          length(replace(col("e"), lit("|"))) - lit(1)).cast("long").as("n"))
        .agg(sum("n")).head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"${"fold"}%7s $m%7d $nSlice%7d $total%12d $sec%8.1f")
    }
    spark.stop()
  }
}
