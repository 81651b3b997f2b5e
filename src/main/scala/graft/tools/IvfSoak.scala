package graft.tools

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Long-horizon soak of the IVF ingest append path — the two costs
  * the r14 verdict flagged as bounded-but-unmeasured in
  * [[graft.similarity.Similarity.appendIvfIndex]]:
  *
  *   (a) the per-epoch idempotence anti-join's `vid` column scan of
  *       the whole lists table (linear in index size, file-count
  *       sensitive), and
  *   (b) small-file accrual: `repartition(cid)` + `partitionBy(cid)`
  *       append writes ~one file per TOUCHED cid per epoch, so a
  *       long-running [[graft.streaming.StreamingOps.ivfIngestLoop]]
  *       accrues ~epochs x nprobe-ish files between drift rebuilds.
  *
  * Per epoch the soak times the full probe+gate (the loop's read
  * side), the append, and an isolated vid-scan proxy
  * (`ivfLists.select("vid").count`), and samples the lists file
  * count; at the end it times [[Similarity.rebuildIvfIndex]] (the
  * compaction event the drift contract already schedules) and
  * re-times an epoch against the compacted index.
  *
  * Measurement tooling, not query surface. Usage:
  *   runMain graft.tools.IvfSoak [embParquet] [buildN] [epochs] [perEpoch]
  * defaults: data/sf10/embeddings.parquet 1000000 250 1000
  */
object IvfSoak {
  def main(args: Array[String]): Unit = {
    val emb = args.lift(0).getOrElse("data/sf10/embeddings.parquet")
    val buildN = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val epochs = args.lift(2).map(_.toInt).getOrElse(250)
    val perEpoch = args.lift(3).map(_.toLong).getOrElse(1000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-ivf-soak")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = spark.read.parquet(emb)
      .select(col("vec_id").as("vid"), col("embedding").as("v"))
    val total = vecs.count()
    require(total >= buildN + epochs * perEpoch,
      s"corpus $total too small for buildN=$buildN + $epochs x $perEpoch")
    val idx = graft.engine.Scratch.dir("graft_ivf_soak_")
    val kc = Similarity.sqrtKc(buildN)
    println(s"IVFSOAK corpus=$total buildN=$buildN kc=$kc " +
      s"epochs=$epochs perEpoch=$perEpoch")
    var t0 = System.nanoTime()
    Similarity.buildIvfIndex(vecs.filter(col("vid") < buildN),
      "vid", "v", idx, kCentroids = kc)
    println(f"IVFSOAK build ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def listFiles(): Long = {
      val gen = new java.io.File(idx).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
        .maxBy(_.getName.drop(4).toInt)
      var n = 0L
      val stack = collection.mutable.Stack[java.io.File](
        Seq("lists", "tail").map(new java.io.File(gen, _))
          .filter(_.isDirectory): _*)
      while (stack.nonEmpty) {
        val d = stack.pop()
        Option(d.listFiles()).getOrElse(Array()).foreach { f =>
          if (f.isDirectory) stack.push(f)
          else if (f.getName.endsWith(".parquet")) n += 1
        }
      }
      n
    }

    // The tail segment's isolated read cost (r15 verdict #7: the one
    // probe branch WITHOUT dynamic partition pruning — a plain filter
    // over the one-file-per-epoch tail). Timed as the same kind of
    // proxy as vidscan: a full (vid, cid) scan + filter of the tail
    // alone, so a growing tail-filter cost cannot hide inside the
    // combined probe number.
    def tailSplit(): (Double, Long) = {
      val gen = new java.io.File(idx).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
        .maxBy(_.getName.drop(4).toInt)
      val tail = new java.io.File(gen, "tail")
      if (!tail.isDirectory) return (0.0, 0L)
      val t = System.nanoTime()
      val rows = spark.read.parquet(tail.toString)
        .filter(col("cid") >= 0).select("vid").count()
      ((System.nanoTime() - t) / 1e9, rows)
    }

    println("IVFSOAK epoch probe_s append_s vidscan_s tailscan_s tailrows files")
    val arrivalBase = buildN
    var probeSum = 0.0; var appendSum = 0.0
    for (e <- 0 until epochs) {
      val lo = arrivalBase + e * perEpoch
      val batch = vecs.filter(col("vid") >= lo && col("vid") < lo + perEpoch)
        .persist()
      batch.count()
      // the loop's read side: probe + gate (c26/ivfIngestEpoch
      // shape). Probed under a distinct id name: the lists table's
      // internal column is `vid`, and a query frame whose id is ALSO
      // `vid` makes the probe join's projection ambiguous.
      t0 = System.nanoTime()
      val kcNow = Similarity.ivfIndexMeta(spark, idx)._3
      Similarity.litIndexCandidates(spark,
          batch.select(col("vid").as("qid"), col("v")), idx, "qid", "v",
          nprobe = Similarity.adaptiveNprobe(kcNow))
        .groupBy(col("qid")).agg(max(col("cos")).as("mc"))
        .filter(col("mc") >= 0.95).count()
      val probeS = (System.nanoTime() - t0) / 1e9
      // the append (idempotence anti-join + delta stage + write)
      t0 = System.nanoTime()
      Similarity.appendIvfIndex(batch, "vid", "v", idx)
      val appendS = (System.nanoTime() - t0) / 1e9
      // isolated vid-scan proxy (what the anti-join reads)
      t0 = System.nanoTime()
      Similarity.ivfLists(spark, idx).select("vid").count()
      val scanS = (System.nanoTime() - t0) / 1e9
      batch.unpersist()
      probeSum += probeS; appendSum += appendS
      if (e < 3 || (e + 1) % 25 == 0) {
        val (tailS, tailRows) = tailSplit()
        println(f"IVFSOAK $e%5d $probeS%7.2f $appendS%8.2f $scanS%9.2f " +
          f"$tailS%10.2f $tailRows%8d ${listFiles()}%6d")
      }
    }
    println(f"IVFSOAK totals probe=$probeSum%.1f append=$appendSum%.1f " +
      f"files=${listFiles()}")
    // the drift contract's compaction event: rebuild rewrites every
    // list into one generation of ~kc files
    t0 = System.nanoTime()
    Similarity.rebuildIvfIndex(spark, idx)
    println(f"IVFSOAK rebuild ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      f"files=${listFiles()} kc=${Similarity.ivfIndexMeta(spark, idx)._3}")
    // post-compaction epoch: the same append against a compact index
    val lo = arrivalBase + epochs * perEpoch
    val batch = vecs.filter(col("vid") >= lo && col("vid") < lo + perEpoch)
      .persist()
    batch.count()
    t0 = System.nanoTime()
    Similarity.appendIvfIndex(batch, "vid", "v", idx)
    val postS = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    Similarity.ivfLists(spark, idx).select("vid").count()
    println(f"IVFSOAK post-rebuild append=$postS%.2f " +
      f"vidscan=${(System.nanoTime() - t0) / 1e9}%.2f")
    batch.unpersist()
    graft.engine.Scratch.delete(idx)
    spark.stop()
  }
}
