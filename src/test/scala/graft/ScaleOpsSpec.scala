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

  test("shardPack: nshards is the scale knob — splitting is a stable permutation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val at64 = graft.queries.TrainingDataQueries.shardPack(docs, 64)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val at256 = graft.queries.TrainingDataQueries.shardPack(docs, 256)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same corpus, same membership — a reassignment, not a resample
    assert(at64.keySet == at256.keySet)
    // content addressing is permutation-stable across the knob:
    // 256 = 4 * 64, so the fine shard refines the coarse one — no
    // document crosses to an unrelated shard when the count is raised
    at256.foreach { case (id, s256) =>
      assert(at64(id) == s256 % 64,
        s"doc $id moved: shard64=${at64(id)} shard256=$s256")
    }
    // per-shard row counts shrink with the knob: the max-occupancy
    // shard at 256 is strictly smaller than at 64 (this is what
    // keeps a shard executor-sized as the corpus grows)
    def maxOcc(m: Map[Long, Long]) =
      m.values.groupBy(identity).map(_._2.size).max
    assert(maxOcc(at256) < maxOcc(at64),
      s"max occupancy ${maxOcc(at256)} !< ${maxOcc(at64)}")
    // and no hot shard: at ~2 docs/shard expected, balls-in-bins max
    // load is O(log n / log log n) — 6x the mean covers it with margin
    assert(maxOcc(at256) * 256 <= 6 * at256.size,
      s"hot shard: max ${maxOcc(at256)} vs mean ${at256.size / 256.0}")
  }
}
