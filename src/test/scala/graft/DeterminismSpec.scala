package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-independence: query results must be identical under
  * different parallelism (the driver's oracle runs at a different
  * cpu count than local dev — order-sensitive float sums or missing
  * tie-breakers would pass locally and fail there).
  */
class DeterminismSpec extends AnyFunSuite {
  import SparkTestBase._

  // representative order-sensitive shapes: float aggs, windows,
  // ranks, LSH joins, cosine folds
  private val sample = Seq("b1_agg", "b5_window_funcs", "b6_topk_group",
    "c4_rolling_stats", "c8_anomaly_zscore", "d9_cosine_topk",
    "d13_minhash_jaccard_verify", "d15_train_split",
    // r2 additions: collect-order folds, iterative CC, IVF argmax,
    // hash sampling, posting-list pair generation, row-hash salting
    "c16_ewma", "c17_rate_of_change", "c18_range_join",
    "d18_dup_clusters", "d19_ivf_ann", "d20_stratified_sample",
    "d21_decontaminate", "d22_term_topk", "b18_skew_salted_join",
    "c5_downsample")

  private def fingerprint(name: String, partitions: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
      val df = SparkEntry.queries(name)(spark, sf)
      val cols = df.columns.sorted
      df.selectExpr(cols.map(c => s"cast(`$c` as string)"): _*)
        .collect()
        .map(_.toSeq.map(String.valueOf).mkString("|"))
        .sorted.toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (name <- sample) {
    test(s"$name is identical at 2 vs 13 shuffle partitions") {
      assert(fingerprint(name, 2) == fingerprint(name, 13))
    }
  }
}
