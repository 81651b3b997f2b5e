package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** CCNet-style perplexity quality tiers (Wenzek et al., "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl
  * Data", LREC 2020 §4.3): score every document by the cross-entropy
  * of a language model trained on a TRUSTED reference slice, then
  * split the corpus into head / middle / tail thirds of the score —
  * CCNet's quality buckets, the standard pre-training corpus triage
  * (head = most reference-like, tail = least).
  *
  * The LM is the [[Dsir]] family's hashed-bigram multinomial
  * (word-bigram hashes folded into [[Dsir.DefaultBuckets]] PRIME
  * buckets — see Dsir's resonance note) and the log is the same
  * BIT-LENGTH log2, so thousands-of-term sums are integer-exact in
  * any engine. Per-bucket cost (a smoothed negative log-likelihood):
  *
  *   cost(b) = ilog2(Nr + B) − ilog2(cr(b) + 1)   (≥ 0)
  *
  * with cr the reference count and Nr its total; a document's score
  * is the per-gram milli cost `cpt_pm = Σ cost · 1000 div n_grams` —
  * low = fluent under the reference LM (CCNet's low perplexity).
  *
  * Unlike d52's contrastive importance ratio (target-vs-raw, an
  * absolute threshold), the tier split is CORPUS-RELATIVE — and the
  * classic ntile(3) would be a single-partition window over every
  * document. Instead the cutoffs come from a HISTOGRAM of cpt_pm:
  * the domain is bounded (cost per gram ≤ 63 bits → cpt_pm ≤ 63000),
  * so the histogram is a ≤63k-row dim-class frame regardless of
  * corpus size; its cumulative sum yields the two tercile cutoff
  * VALUES, which broadcast back onto the fully map-side scoring
  * pass. Equal scores land in the same tier (a value split, exactly
  * how CCNet applies its sampled thresholds) — tier sizes are thirds
  * up to boundary ties. The corpus is never globally sorted, never
  * shuffled per document, never windowed.
  */
object Perplexity {

  private def ilog2(x: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros(x)

  /** Per-bucket smoothed NLL costs of the reference LM, as one
    * array for literal re-entry. Dim-class: ≤ `buckets` rows
    * collected.
    */
  def bucketCosts(docs: DataFrame, textCol: String, isRef: Column,
      buckets: Int): Array[Long] = {
    val grams = TextHash.word_gram_hashes(col(textCol), 2, distinct = false)
    val counts = docs.filter(isRef)
      .select(explode(grams).as("__g"))
      .select((col("__g") % buckets).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("cr"))
      .collect()
    val nr = counts.map(_.getLong(1)).sum
    val c0 = ilog2(nr + buckets)
    val s = Array.fill(buckets)(c0) // empty bucket: cr = 0 → cost c0
    counts.foreach { r =>
      s(r.getLong(0).toInt) = c0 - ilog2(r.getLong(1) + 1)
    }
    s
  }

  /** Scores + tier labels for every document:
    * (id, n_grams, cost_ilog, cpt_pm, tier). Documents with < 2
    * tokens have no bigrams — n_grams 0, cost 0, NULL cpt_pm/tier
    * (CCNet drops them from the buckets).
    */
  def tiers(docs: DataFrame, idCol: String, textCol: String,
      isRef: Column, buckets: Int = Dsir.DefaultBuckets): DataFrame = {
    val costLit = lit(bucketCosts(docs, textCol, isRef, buckets))
    val grams = TextHash.word_gram_hashes(col(textCol), 2, distinct = false)
    val scored = docs
      .select(col(idCol), grams.as("__gs"))
      .select(col(idCol),
        size(col("__gs")).cast("long").as("n_grams"),
        aggregate(col("__gs"), lit(0L),
          (a, g) => a + element_at(costLit, (g % buckets).cast("int") + 1))
          .as("cost_ilog"))
      .withColumn("cpt_pm",
        when(col("n_grams") > 0, expr("cost_ilog * 1000 div n_grams")))
    // bounded-domain histogram (≤ ~63k distinct milli scores): the
    // only window in the operator runs over THIS dim-class frame
    val hist = scored.filter(col("n_grams") > 0)
      .groupBy("cpt_pm").agg(count(lit(1)).as("hc"))
    val cum = hist.withColumn("cum",
      sum(col("hc")).over(Window.orderBy("cpt_pm")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val cuts = cum
      .crossJoin(hist.agg(sum(col("hc")).as("n")))
      .agg(
        min(when(col("cum") * 3 >= col("n"), col("cpt_pm"))).as("c1"),
        min(when(col("cum") * 3 >= col("n") * 2, col("cpt_pm"))).as("c2"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("tier",
        when(col("n_grams") === 0, lit(null).cast("long"))
          .when(col("cpt_pm") <= col("c1"), 1L)
          .when(col("cpt_pm") <= col("c2"), 2L)
          .otherwise(3L))
      .select(col(idCol), col("n_grams"), col("cost_ilog"),
        col("cpt_pm"), col("tier"))
  }
}
