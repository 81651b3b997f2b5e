package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
    *
    * The O(tokens × dim) projection loop runs in the native
    * [[HashedProjection]] expression over the token-hash array (the
    * native 1-gram [[WordGramHashes]] kernel — for n=1 the gram
    * combiner is the identity, so its hashes ARE the per-token poly
    * hashes). The higher-order-function formulation this replaces
    * (`transform(sequence(...), j -> aggregate(tokens, ...))`)
    * evaluated a boxed lambda per (token, component) pair — measured
    * ~20 s for 45k docs × 16 dims at sf1.0; the native loop is tens
    * of milliseconds. Only the final `dim`-element normalization
    * stays a HOF.
    */
  def embed(docs: DataFrame, id: String, text: String,
      dim: Int = 16): DataFrame = {
    require(dim >= 1, s"embedding dim must be >= 1, got $dim")
    docs
      .select(col(id),
        TextHash.word_gram_hashes(col(text), 1, distinct = false).as("__th"))
      .select(col(id), size(col("__th")).cast("long").as("n_tokens"),
        hashed_projection(col("__th"), dim).as("__sums"))
      .select(col(id), col("n_tokens"),
        expr("transform(__sums, es_s -> es_s * 1000L div n_tokens)").as("emb"))
  }

  /** Column face of [[HashedProjection]]. */
  def hashed_projection(tokenHashes: Column, dim: Int): Column =
    org.apache.spark.sql.graftshims.SparkShims.column(
      HashedProjection(
        org.apache.spark.sql.graftshims.SparkShims.expression(tokenHashes),
        dim))
}

/** Native signed-projection kernel of [[HashEmbed]]: component j of
  * the output is `Σ_h (h·(2j+1) mod ProjMod) − 1000` over the input
  * token-hash array — one tight O(tokens × dim) loop per row instead
  * of a boxed lambda per (token, component) pair.
  */
case class HashedProjection(child: Expression, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(arr: ArrayData): ArrayData = {
    val sums = new Array[Long](dim)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < dim) {
        sums(j) += h * (2 * j + 1) % HashEmbed.ProjMod - 1000L
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sums)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hashedProjection", this,
      classOf[HashedProjection].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): HashedProjection =
    copy(child = c)
}
