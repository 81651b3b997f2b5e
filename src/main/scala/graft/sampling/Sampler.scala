package graft.sampling

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Deterministic sampling for corpus curation (SURVEY §2.D20).
  *
  * A document's sampling decision is a pure function of its content
  * hash — not of row order, partitioning, RNG seeds, or cluster
  * size — so a sample is reproducible across runs, engines, and
  * re-shards, and a re-run over an extended corpus keeps every
  * previously selected document (the property an incremental
  * training-data pipeline needs). Same construction as the
  * content-hash train/val/test split (D15).
  */
object Sampler {

  /** Keep a row iff `hash(text + "|" + salt) mod 1000 < rate_pm`
    * for its stratum's per-mille rate. `rates` is a small dim table
    * `(stratumCol, rate_pm)` and rides a broadcast join, so the
    * sample is one scan over the corpus with no shuffle.
    *
    * Typical use: downsample the dominant language/source so the
    * training mix matches a target distribution.
    */
  def stratified(docs: DataFrame, rates: DataFrame, stratumCol: String,
      textCol: String, salt: String): DataFrame =
    docs.join(broadcast(rates), Seq(stratumCol))
      .withColumn("samp_pm", pmod(
        TextHash.poly_hash(concat(col(textCol), lit("|" + salt))), lit(1000L)))
      .filter(col("samp_pm") < col("rate_pm"))
}
