package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic feature-hashing text embedder (SURVEY §2.D — the
  * embedding-GENERATION stage of a training-data pipeline).
  *
  * Production pipelines embed documents with a neural encoder behind
  * a batched model-serving UDF; every downstream similarity operator
  * here (d9/d10/d11/d17/d19/d32/d37/d42/d43) consumes the resulting
  * vector column. This operator is the deterministic stand-in for
  * that stage — the classic hashing-trick projection (feature
  * hashing à la Weinberger et al. / sklearn's HashingVectorizer
  * composed with a fixed signed projection): real Spark-side
  * plumbing (schema, zero-shuffle scan shape, exact arithmetic),
  * swap-in point for a model UDF clearly marked.
  *
  * Semantics (pinned, exact-integer):
  *   - tokens: whitespace split of `lower(trim(text))`, hashed with
  *     the shared [[TextHash]] poly hash `h(t)`
  *   - component j of the raw projection, j in [0, dim):
  *     `w(t, j) = (h(t) * (2j+1)) mod 2001 - 1000` — an integer in
  *     [-1000, 1000] (the odd multiplier decorrelates components;
  *     everything stays in BIGINT range)
  *   - embedding[j] = `sum_t w(t, j) * 1000 div n_tokens` — the
  *     per-token mean in exact milli-units, `div` truncating toward
  *     zero identically in Spark and DuckDB
  *
  * Execution shape: one projection over the corpus scan — the token
  * array is hashed ONCE per document and every component folds over
  * that shared array (no per-component re-tokenization, no explode,
  * no shuffle, no UDF). Downstream operators cast the BIGINT
  * milli-vector to float/double as the d17 quantizer does.
  */
object HashEmbed {

  /** Modulus of the signed projection: weights land in
    * [-1000, 1000].
    */
  val ProjMod = 2001L

  /** Embed `docs` into a `dim`-component integer milli-vector.
    * Output: `(id, n_tokens, emb array<long>)`.
    */
  def embed(docs: DataFrame, id: String, text: String,
      dim: Int = 16): DataFrame = {
    require(dim >= 1, s"embedding dim must be >= 1, got $dim")
    val toks: Column = split(trim(lower(col(text))), "\\s+")
    docs
      .select(col(id), size(toks).cast("long").as("n_tokens"),
        transform(toks, t => TextHash.poly_hash(t)).as("__th"))
      .select(col(id), col("n_tokens"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          aggregate(col("__th"), lit(0L), (acc, h) =>
            acc + (h * (j.cast("long") * lit(2L) + lit(1L))) % lit(ProjMod)
              - lit(1000L))).as("__sums"))
      .select(col(id), col("n_tokens"),
        expr("transform(__sums, es_s -> es_s * 1000L div n_tokens)").as("emb"))
  }
}
