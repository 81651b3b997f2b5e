package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftshims.SparkShims
import org.apache.spark.sql.types.BinaryType

/** Driver-held Bloom filters as codegen'd map-side predicates.
  *
  * This is the same machinery Spark's own `InjectRuntimeFilter` uses
  * for runtime row pruning ([[BloomFilterMightContain]] — a codegen'd
  * `Predicate`, not a UDF), exposed as a library primitive so an
  * operator can prune a corpus-sized stream against a dim-class key
  * set BEFORE any exchange. The contract that makes the results
  * exact despite the approximation: a Bloom filter has NO false
  * negatives, so `might_contain` may only pass extra rows, never
  * drop a real match — any operator that confirms survivors with an
  * exact join downstream produces bit-identical results to the
  * bloom-free plan, at a fraction of the shuffled bytes.
  *
  * Scale economics (the reason this exists): a broadcast-hash
  * relation costs >= 16 bytes/entry plus the join's probe; the bloom
  * costs ~1.2 bytes/entry at 1% fpp and rides the scan as a plain
  * filter inside whole-stage codegen. At 10^8 keys that is ~120 MB
  * of plan literal — large but shippable where the hash relation is
  * not; past that, shard the key set and AND the filters, or fall
  * back to a shuffle semi-join.
  */
object Bloom {

  /** Build a driver-held filter over a LongType column. Runs one
    * `count()` to size the filter plus Spark's distributed
    * `stat.bloomFilter` aggregate — two jobs over the (dim-class)
    * build side, zero jobs over anything corpus-sized.
    */
  def buildLong(df: DataFrame, colName: String, fpp: Double = 0.01): Array[Byte] = {
    val n = math.max(1L, df.count())
    val bf = df.stat.bloomFilter(colName, n, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(filter, c)` over a LongType column `c`: true for
    * every value that was put in the filter (no false negatives),
    * true with probability ~fpp for values that were not. Embeds the
    * serialized filter as a binary literal — foldable, so the
    * predicate is codegen'd and pushed wherever a deterministic
    * filter can go (in particular: below the exchange, onto the
    * scan-side of the plan).
    */
  def might_contain(filter: Array[Byte], c: Column): Column =
    SparkShims.column(BloomFilterMightContain(
      Literal(filter, BinaryType), SparkShims.expression(c)))
}
