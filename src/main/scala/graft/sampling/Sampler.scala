package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The per-mille sampling bucket of a document — the pure
    * content-hash function every deterministic sampler here keys on.
    */
  private def sampPm(textCol: String, salt: String): Column =
    pmod(TextHash.poly_hash(concat(col(textCol), lit("|" + salt))),
      lit(1000L))

  /** Mixture balancing (Pile/Dolma-style source mixing): derive the
    * per-stratum `rate_pm` that downsamples each stratum toward an
    * EQUAL share of a global token budget of
    * `totalTokens * budgetNumer / budgetDenom`. Strata below their
    * share keep everything (rate 1000 — this operator never
    * upsamples); oversized strata are cut to
    * `budget_s * 1000 div toks_s`. All arithmetic is integer
    * (BIGINT), so the derived rates are engine- and shard-stable.
    *
    * The corpus is scanned once, aggregated per
    * `(stratum, samp_pm)` — at most `1000 × #strata` rows, a
    * combiner-friendly partial agg — and every budget decision is
    * made on that bounded frame. Feed the result straight to
    * [[stratified]] (same `textCol`/`salt`) to materialize the
    * sampled corpus; [[mixReport]] summarizes the decision instead.
    */
  def mixRates(docs: DataFrame, stratumCol: String, textCol: String,
      salt: String, budgetNumer: Long = 1L, budgetDenom: Long = 2L): DataFrame =
    ratesFromBuckets(tokenBuckets(docs, stratumCol, textCol, salt),
      stratumCol, budgetNumer, budgetDenom)

  /** Per-stratum before/after summary of the [[mixRates]] decision:
    * `docs_in, toks_in, rate_pm, docs_out, toks_out`. The bounded
    * bucket frame (≤ 1000 × #strata rows) is collected EAGERLY and
    * both the rate derivation and the selected-count roll-up run on
    * the driver-local literal — the corpus is scanned exactly once
    * and, unlike the pre-r12 persist, nothing stays cached after the
    * call (the old version leaked its persisted buckets into
    * long-lived sessions).
    */
  def mixReport(docs: DataFrame, stratumCol: String, textCol: String,
      salt: String, budgetNumer: Long = 1L, budgetDenom: Long = 2L): DataFrame = {
    val s = docs.sparkSession
    val b = tokenBuckets(docs, stratumCol, textCol, salt)
    val buckets = s.createDataFrame(
      java.util.Arrays.asList(b.collect(): _*), b.schema)
    val rates = ratesFromBuckets(buckets, stratumCol, budgetNumer, budgetDenom)
    buckets.join(broadcast(rates), Seq(stratumCol))
      .groupBy(stratumCol, "docs_in", "toks_in", "rate_pm")
      .agg(
        sum(when(col("samp_pm") < col("rate_pm"), col("__docs"))
          .otherwise(0L)).as("docs_out"),
        sum(when(col("samp_pm") < col("rate_pm"), col("__toks"))
          .otherwise(0L)).as("toks_out"))
  }

  /** Curriculum staging by EXACT score quartiles — without a global
    * sort. Training curricula order data from low to high quality
    * (or the reverse); the naive staging is
    * `ntile(4) OVER (ORDER BY score)`, a single-partition window
    * that serializes the whole corpus through one task. This
    * computes the same quartile boundaries from a bounded score
    * HISTOGRAM instead: integer scores collapse to one row per
    * distinct value (a combiner-friendly partial agg), the
    * cumulative walk and boundary extraction run on that bounded
    * frame, and each document gets its stage map-side from the
    * three boundary LITERALS (collected eagerly — one row).
    *
    * `stage(d) = #{k in 1..3 : score(d) > q_k}` with
    * `q_k = min score whose cumulative count ≥ ceil(k·N/4)` — ties
    * share a stage (documents with equal score are never split
    * across stages, so the assignment is deterministic without a
    * per-document rank). Output: `(id, score, stage)` with stage in
    * 0..3, 0 = lowest quartile.
    *
    * `scored` must carry an integer score column with a bounded
    * domain (e.g. a per-mille in [-10000, 10000]) — the histogram
    * size is the number of DISTINCT scores, not N.
    */
  def quartileStages(scored: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    val slim = scored.select(col(idCol), col(scoreCol).cast("long"))
    val hist = slim.groupBy(scoreCol).agg(count(lit(1)).as("__cnt"))
    // both windows run on the bounded histogram, not the corpus: the
    // single-partition sort they imply holds ≤ #distinct-scores rows,
    // and N comes from the unbounded frame of the SAME window sort
    // (a separate hist.agg would re-run the histogram shuffle)
    val byScore = org.apache.spark.sql.expressions.Window.orderBy(scoreCol)
    val cum = hist
      .withColumn("__cum", sum(col("__cnt")).over(
        byScore.rowsBetween(Long.MinValue, 0)))
      .withColumn("__n", sum(col("__cnt")).over(
        byScore.rowsBetween(Long.MinValue, Long.MaxValue)))
    // the three boundaries are collected EAGERLY (one row, three
    // longs — far below any dim-table collect) and applied as plan
    // literals: the returned frame is one zero-shuffle corpus
    // projection that depends on no cached state. This trades the
    // pre-r12 persisted (id, score) projection — a corpus-sized
    // cache leaked into long-lived sessions — for one extra corpus
    // scan of cheap column arithmetic, the right trade at 100 TB.
    val b = cum.agg(
      min(when(expr(s"__cum >= (1 * __n + 3) div 4"), col(scoreCol))).as("q1"),
      min(when(expr(s"__cum >= (2 * __n + 3) div 4"), col(scoreCol))).as("q2"),
      min(when(expr(s"__cum >= (3 * __n + 3) div 4"), col(scoreCol))).as("q3"))
      .head()
    def q(i: Int): Column =
      if (b.isNullAt(i)) lit(null).cast("long") else lit(b.getLong(i))
    slim.select(col(idCol), col(scoreCol),
      ((col(scoreCol) > q(0)).cast("long") +
        (col(scoreCol) > q(1)).cast("long") +
        (col(scoreCol) > q(2)).cast("long")).as("stage"))
  }

  private def ratesFromBuckets(buckets: DataFrame, stratumCol: String,
      budgetNumer: Long, budgetDenom: Long): DataFrame = {
    require(budgetNumer >= 0 && budgetDenom > 0,
      s"budget fraction must be >= 0 with a positive denominator, " +
        s"got $budgetNumer/$budgetDenom")
    val perStratum = buckets
      .groupBy(stratumCol)
      .agg(sum(col("__docs")).as("docs_in"), sum(col("__toks")).as("toks_in"))
    val totals = perStratum
      .agg(sum(col("toks_in")).as("__tot"), count(lit(1)).as("__nstrata"))
    perStratum.crossJoin(broadcast(totals))
      .withColumn("rate_pm", least(lit(1000L),
        expr(s"__tot * $budgetNumer div ($budgetDenom * __nstrata) " +
          "* 1000 div greatest(toks_in, 1)")))
      .select(col(stratumCol), col("docs_in"), col("toks_in"),
        col("rate_pm"))
  }

  /** One corpus scan folded to at most `1000 × #strata` rows:
    * document and whitespace-token counts per
    * `(stratum, samp_pm)` cell.
    */
  private def tokenBuckets(docs: DataFrame, stratumCol: String,
      textCol: String, salt: String): DataFrame =
    docs
      .select(col(stratumCol),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("__tok"),
        sampPm(textCol, salt).as("samp_pm"))
      .groupBy(stratumCol, "samp_pm")
      .agg(count(lit(1)).as("__docs"), sum(col("__tok")).as("__toks"))
}
