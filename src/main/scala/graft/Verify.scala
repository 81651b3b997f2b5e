package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [query ...]")
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.engine.Session
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
        appName = "graft-verify")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Diagnosability for the six banding-dependent keys (d7/d13/d14/
    // d18/d24/d30): their oracles bake a static width (16 unless
    // GRAFT_BANDING_PERMS pins one) while the Spark side auto-tunes —
    // parity silently depends on the tuner resolving the same width.
    // Record what the queries actually used on THIS corpus next to
    // the results, so a red hash compare is attributable to tuner
    // drift (resolved != oracle) vs a real pipeline bug in one
    // artifact read. With GRAFT_BANDING_PERMS pinned, BOTH sides use
    // the pin — drift is impossible and the tuner sampling jobs are
    // skipped, not spent; likewise when the [query ...] filter
    // selects no banding-dependent key there is nothing to diagnose.
    val bandingKeys = Set("d7_dedup_minhash", "d13_minhash_jaccard_verify",
      "d14_corpus_curate", "d18_dup_clusters", "d24_curation_report",
      "d30_incremental_dedup")
    val bandingSelected = only.isEmpty || only.exists(bandingKeys)
    val pinned = graft.queries.TrainingDataQueries.catalogPerms
    if (bandingSelected) try {
      val json =
        if (pinned > 0)
          s"""{"resolved_perms":$pinned,"pinned_perms":$pinned,""" +
            s""""oracle_perms":$pinned,"match":true}"""
        else {
          val choice = graft.dedup.Dedup.chooseBanding(
            spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
          s"""{"resolved_perms":${choice.numPerms},"pinned_perms":0,""" +
            s""""oracle_perms":16,"corpus_docs":${choice.corpusDocs},""" +
            s""""match":${choice.numPerms == 16}}"""
        }
      Files.writeString(Paths.get(s"$outDir/banding.json"), json)
    } catch { case e: Throwable =>
      System.err.println(s"[verify] banding dump failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
