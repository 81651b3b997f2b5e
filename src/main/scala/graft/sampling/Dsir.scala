package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** DSIR-shaped data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every document
  * by how much more it resembles a trusted TARGET distribution than
  * the RAW corpus, using bag-of-hashed-n-gram multinomial LMs —
  * per-doc importance weight = Σ_b c_doc(b)·(log p_target(b) −
  * log p_raw(b)) over hashed bigram buckets.
  *
  * Integer-exactness policy (the same rule as the engine's other
  * scoring ops): the log is the BIT-LENGTH log2 — ilog2(x) =
  * floor(log2(x)) — computed with integer ops only, so a
  * thousands-of-term weight sum is reproducible bit-for-bit on any
  * engine, where a float `ln` sum drifts by ulps and flips
  * threshold decisions. With add-one smoothing and the
  * normalization constant folded in:
  *
  *   s(b) = ilog2(ct(b)+1) − ilog2(cr(b)+1) + ilog2(Nr+B) − ilog2(Nt+B)
  *
  * Selection is threshold-based (weight per 1000 grams >= 0 ⇔ the
  * doc resembles the target more than the raw corpus under the
  * coarse log) — no global sort, no sampled randomness.
  *
  * 100 TB shape: pass 1 is ONE corpus gram scan aggregated to <= B
  * rows (map-side partial combine — the shuffle carries at most B
  * rows per task regardless of corpus size); the bucket LMs are a
  * dim-class collect that re-enters the plan as a single
  * array-literal data node; pass 2 scores every document entirely
  * MAP-SIDE (an array fold against the literal — no explode, no
  * join, no exchange: the per-doc output is shuffle-free). Nothing
  * corpus-sized is collected, broadcast, or shuffled.
  */
object Dsir {

  /** Bucket count — PRIME, deliberately. The gram hashes are base-31
    * polynomial folds, so two token streams that differ in one
    * position differ in every gram hash by δ·31^k; for structured
    * vocabularies (tokenizer artifacts, templated text) δ·31^k
    * readily contains small power-of-two factors — 31+1 = 32 — and a
    * power-of-two modulus then maps DISTINCT dialects onto identical
    * buckets, silently zeroing the very signal the LM ratio measures
    * (observed: two fully disjoint synthetic dialects collapsing to
    * the same 4 buckets under % 256). A prime modulus shares no
    * factor with any δ·31^k·2^j, so the collapse cannot happen
    * structurally.
    */
  val DefaultBuckets: Int = 2039

  private def ilog2(x: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros(x)

  /** Per-bucket scores s(b) as one Array, plus the counts behind it.
    * `isTarget` marks the trusted slice (evaluated per document);
    * raw = every document.
    */
  def bucketScores(docs: DataFrame, textCol: String, isTarget: Column,
      buckets: Int): Array[Long] = {
    val grams = TextHash.word_gram_hashes(col(textCol), 2, distinct = false)
    val counts = docs
      .select(explode(grams).as("__g"), isTarget.as("__t"))
      .select((col("__g") % buckets).as("__b"), col("__t"))
      .groupBy("__b")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("ct"))
      .collect() // dim-class: <= `buckets` rows
    val nr = counts.map(_.getLong(1)).sum
    val nt = counts.map(_.getLong(2)).sum
    val c0 = ilog2(nr + buckets) - ilog2(nt + buckets)
    val s = Array.fill(buckets)(c0) // empty bucket: ilog2(1)-ilog2(1)+c0
    counts.foreach { r =>
      s(r.getLong(0).toInt) =
        ilog2(r.getLong(2) + 1) - ilog2(r.getLong(1) + 1) + c0
    }
    s
  }

  /** Importance weights + selection flags for every document:
    * (id, n_grams, w_ilog, wpt_pm, selected). Documents with < 2
    * tokens have no bigrams — n_grams 0, weight 0, NULL wpt/selected.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = DefaultBuckets): DataFrame = {
    val sLit = lit(bucketScores(docs, textCol, isTarget, buckets))
    val grams = TextHash.word_gram_hashes(col(textCol), 2, distinct = false)
    docs
      .select(col(idCol), grams.as("__gs"))
      .select(col(idCol),
        size(col("__gs")).cast("long").as("n_grams"),
        aggregate(col("__gs"), lit(0L),
          (a, g) => a + element_at(sLit, (g % buckets).cast("int") + 1))
          .as("w_ilog"))
      .withColumn("wpt_pm",
        when(col("n_grams") > 0, expr("w_ilog * 1000 div n_grams")))
      .withColumn("selected", col("wpt_pm") >= 0)
  }
}
