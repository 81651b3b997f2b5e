package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation (SURVEY §2.D14): the
  * composition an LLM data pipeline actually runs —
  *
  *  1. exact dedup: keep the smallest doc id per normalized content
  *     hash;
  *  2. near-dup removal: MinHash-LSH candidate pairs among the
  *     exact-dedup survivors, verified by exact shingle Jaccard;
  *     the larger id of each pair >= `jacPmThreshold` is dropped
  *     (greedy, deterministic);
  *  3. quality gate: lexical-diversity / stopword per-milles and a
  *     token-count range.
  *
  * Every stage is an equi-join on a derived key — the whole
  * pipeline is shuffle-bounded and scales with corpus size, not
  * pair count.
  */
object Curator {

  def curate(spark: SparkSession, docs: DataFrame,
      jacPmThreshold: Int = 500,
      minTokens: Int = 5, maxTokens: Int = 10000): DataFrame = {
    // 1. exact dedup: keep the min-id row per content hash with a
    // window filter — one shuffle over the corpus, no agg+join pair.
    val uniqueDocs = docs
      .withColumn("content_hash", Dedup.contentHash(col("text")))
      .withColumn("__keep", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("content_hash")))
      .filter(col("doc_id") === col("__keep"))
      .drop("content_hash", "__keep")

    // 2. near-dup drop among survivors
    val nearDup = Dedup.minhashVerifiedPairs(uniqueDocs, "doc_id", "text")
      .filter(col("jac_pm") >= jacPmThreshold)
      .select(col("d2").as("doc_id")).distinct()
    val deduped = uniqueDocs.join(nearDup, Seq("doc_id"), "left_anti")

    // 3. quality gate
    val toks = split(trim(lower(col("text"))), "\\s+")
    deduped
      .withColumn("ws_tokens", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stop", size(filter(toks,
        t => t.isin(Seq("the", "a", "of", "and", "to", "in").map(lit(_)): _*)))
        .cast("long"))
      .filter(expr("n_distinct * 10000 div ws_tokens") > 3000 &&
        expr("n_stop * 10000 div ws_tokens") < 4000 &&
        col("ws_tokens").between(minTokens, maxTokens))
      .select(col("doc_id"), col("lang"), col("ws_tokens"))
  }
}
