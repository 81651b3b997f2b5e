package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Registers graft's native expressions with the Catalyst function
  * registry, so they are first-class in SQL text as well as the
  * Column API:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT poly_hash(text), simhash(word_gram_hashes(text, 3), 30) FROM docs")
  * }}}
  *
  * Also installable on an existing session via
  * [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("poly_hash",
      info("poly_hash", "poly_hash(str) - base-31 polynomial hash mod 1e9+7"),
      (es: Seq[Expression]) => PolyHash(es.head)),
    ("shingle_hashes",
      info("shingle_hashes", "shingle_hashes(str, k) - rolling k-char shingle hashes"),
      (es: Seq[Expression]) => ShingleHashes(es.head, intArg(es(1))),
    ),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(hashes, k) - k-permutation MinHash signature"),
      (es: Seq[Expression]) => MinHashSig(es.head, intArg(es(1)))),
    ("simhash",
      info("simhash", "simhash(hashes, bits) - majority-bit SimHash"),
      (es: Seq[Expression]) => SimHash(es.head, intArg(es(1)))),
    ("word_gram_hashes",
      info("word_gram_hashes", "word_gram_hashes(str, n[, distinct]) - word n-gram hashes"),
      (es: Seq[Expression]) => WordGramHashes(es.head, intArg(es(1)),
        if (es.size > 2) boolArg(es(2)) else false)),
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - deterministic left-fold dot product"),
      (es: Seq[Expression]) => VecDot(es.head, es(1))),
    ("hashed_projection",
      info("hashed_projection",
        "hashed_projection(token_hashes, dim) - signed hashing-trick projection sums"),
      (es: Seq[Expression]) => HashedProjection(es.head, intArg(es(1)))),
    ("top_k",
      info("top_k", "top_k(score, id, k) - bounded-heap top-k aggregate"),
      (es: Seq[Expression]) =>
        TopKAgg(es.head, es(1), intArg(es(2))).toAggregateExpression()))

  private def intArg(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"expected int literal, got $other")
  }

  private def boolArg(e: Expression): Boolean = e.eval(null) match {
    case b: Boolean => b
    case other => throw new IllegalArgumentException(s"expected bool literal, got $other")
  }

  /** Install on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, inf, builder) =>
      registry.registerFunction(FunctionIdentifier(name), inf, builder)
    }
  }
}
