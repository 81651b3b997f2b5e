package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.sources.Bucketing

/** The explicit scale machinery: salting produces the same rows as
  * a plain join while spreading hot keys; bucketed joins elide the
  * shuffle (asserted on the physical plan).
  */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestBase._

  test("saltedJoin matches the plain join result") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val plain = li.join(o, Seq("k")).count()
    val salted = SkewJoin.saltedJoin(li, o, "k", saltFactor = 4).count()
    assert(salted == plain)
  }

  test("hybridSkewJoin matches the plain join result") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val plain = li.join(o, Seq("k")).count()
    val hybrid = SkewJoin.hybridSkewJoin(li, o, "k",
      saltFactor = 4, hotThreshold = 4).count()
    assert(hybrid == plain)
  }

  test("bucketed join elides both shuffles") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_bucketed", "k", buckets = 8)
    Bucketing.writeBucketed(o, "o_bucketed", "k", buckets = 8)
    // force a sort-merge join so the bucketed distributions (not a
    // broadcast) are what satisfies the join requirement
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "o_bucketed", "k")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      assert(joined.count() == li.join(o, Seq("k")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
