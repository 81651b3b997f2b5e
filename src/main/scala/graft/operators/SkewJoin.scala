package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-join salting (SURVEY §6) for when AQE's runtime
  * skew split is unavailable (e.g. the skewed side feeds a
  * non-splittable stage) or the skew is known ahead of time.
  *
  * The hot side gets a uniform salt in [0, saltFactor); the other
  * side is replicated saltFactor times. The join key becomes
  * (key, salt), so one hot key spreads over saltFactor partitions.
  * Replication cost is bounded: use it with a dim-sized right side
  * or a filtered hot-key subset (hybrid strategy: salt only the
  * keys above a frequency threshold, hash-join the rest).
  */
object SkewJoin {

  /** Inner equi-join with the left side salted and the right side
    * replicated. `saltFactor` ≈ the per-key parallelism wanted for
    * the hottest key.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1)
    val salted = left.withColumn("__salt",
      // deterministic spread: stable hash of the whole row modulo
      // saltFactor (monotonically_increasing_id would break retry
      // idempotence)
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Hybrid: salt only keys whose frequency exceeds `hotThreshold`;
    * everything else takes the plain hash join. One extra pass to
    * find hot keys (cheap aggregation, broadcastable result).
    */
  def hybridSkewJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, hotThreshold: Long): DataFrame = {
    val hotKeys = left.groupBy(col(key)).count()
      .filter(col("count") > hotThreshold).select(col(key))
    val leftHot = left.join(broadcast(hotKeys), Seq(key), "left_semi")
    val leftCold = left.join(broadcast(hotKeys), Seq(key), "left_anti")
    val rightHot = right.join(broadcast(hotKeys), Seq(key), "left_semi")
    saltedJoin(leftHot, rightHot, key, saltFactor)
      .unionByName(leftCold.join(right, Seq(key)))
  }
}
