package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

class TopKAggSpec extends AnyFunSuite {
  import SparkTestBase._

  test("top_k aggregate matches the window row_number formulation") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val viaAgg = o.groupBy("o_custkey")
      .agg(TopKAgg.top_k(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).as("rk"),
        col("col.id").as("o_orderkey"), col("col.score").as("o_totalprice"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk").cast("long").as("rk"),
        col("o_orderkey"), col("o_totalprice"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("top_k_distinct: duplicates count once, state stays bounded, merge is partition-invariant") {
    import spark.implicits._
    // 500 distinct ids, each arriving 1..4 times, shuffled across rows
    val rows = (0L until 500L).flatMap(i =>
      Seq.fill(1 + (i % 4).toInt)((1, -i.toDouble, i)))
    def run(parts: Int) = rows.toDF("g", "score", "id").repartition(parts)
      .groupBy("g")
      .agg(TopKAgg.top_k_distinct(col("score"), col("id"), 16).as("top"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    val a = run(1)
    assert(a == (0L until 16L).map(i => (-i.toDouble, i)),
      "the 16 best DISTINCT ids exactly once each, best-first")
    assert(run(11) == a, "associative merge: any partitioning, same sketch")
  }

  test("top_k keeps at most k and orders score desc, id asc") {
    import spark.implicits._
    val df = Seq((1, 5.0, 10L), (1, 5.0, 9L), (1, 7.0, 1L), (1, 3.0, 2L),
      (2, 1.0, 1L)).toDF("k", "score", "id")
    val rows = df.groupBy("k")
      .agg(TopKAgg.top_k(col("score"), col("id"), 2).as("top"))
      .orderBy("k").collect()
    val g1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(g1 == Seq((7.0, 1L), (5.0, 9L))) // tie at 5.0 -> smaller id
    val g2 = rows(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(g2 == Seq((1.0, 1L)))
  }

  test("cappedBucket accepts integer ids (cast to long inside the agg)") {
    import spark.implicits._
    val df = Seq((1, 7), (1, 3), (1, 9), (2, 4)).toDF("bucket", "id")
    val out = df.groupBy("bucket")
      .agg(graft.dedup.Dedup.cappedBucket(col("id"), 2).as("ds"))
      .orderBy("bucket").collect()
    assert(out(0).getSeq[Long](1) == Seq(3L, 7L)) // capped at 2 smallest ids
    assert(out(1).getSeq[Long](1) == Seq(4L))
  }
}
