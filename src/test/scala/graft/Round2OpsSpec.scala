package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.functions.TextHash
import graft.operators.TimeSeriesOps
import graft.similarity.Similarity

/** Semantic checks for the round-2 operators (d18-d20, b16, c16)
  * against independent naive implementations.
  */
class Round2OpsSpec extends AnyFunSuite {
  import SparkTestBase._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("d18: clusters equal naive union-find over the same edges") {
    val near = Dedup.minhashVerifiedPairs(docs, "doc_id", "text")
      .filter(col("jac_pm") >= 500)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    // independent exact-dup edges: group by the normalized text
    // itself (true identity, no hash involved)
    val byText = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase))
      .groupBy(_._2).values.map(_.map(_._1).sorted)
    val exact = byText.filter(_.length > 1)
      .flatMap(g => g.tail.map(d => (g.head, d)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (near ++ exact).foreach { case (a, b) => union(a, b) }
    val want = ids.map(i => i -> find(i)).toMap
    val got = Dedup.dupClusters(docs, "doc_id", "text")
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("d18: csize counts cluster members") {
    val rows = Dedup.dupClusters(docs, "doc_id", "text").collect()
    val sizes = rows.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    rows.foreach(r => assert(r.getLong(2) == sizes(r.getLong(1))))
  }

  test("d24: fate attribution is exhaustive and kept equals curate") {
    val fates = graft.dedup.Curator.fates(spark, docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fates.values.sum == docs.count())
    assert(fates.getOrElse("kept", 0L) ==
      graft.dedup.Curator.curate(spark, docs).count())
  }

  test("d19: IVF top-k is well-formed and overlaps brute force") {
    val q = embs.filter(col("vec_id") % 50 === 0)
    val ivf = Similarity.ivfTopK(q, embs, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(ivf.nonEmpty)
    // ranks are 1..m with cosine non-increasing, neighbor != query
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4; case _ => true })
    }
    assert(ivf.forall(r => r._1 != r._3))
    val bf = Similarity.bruteForceTopK(q, embs, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val hits = ivf.groupBy(_._1).map { case (qid, rows) =>
      rows.map(_._3).toSet.intersect(bf(qid).map(_._2).toSet).size
    }.sum
    assert(hits.toDouble / (bf.size * 5) >= 0.2, s"IVF recall too low: $hits")
  }

  test("d20: every kept row satisfies the content-hash rate rule") {
    import spark.implicits._
    val rates = Seq(("en", 400L), ("zh", 800L), ("de", 1000L),
      ("es", 1000L), ("fr", 1000L)).toDF("lang", "rate_pm")
    val rateMap = Map("en" -> 400L, "zh" -> 800L, "de" -> 1000L,
      "es" -> 1000L, "fr" -> 1000L)
    val kept = graft.sampling.Sampler
      .stratified(docs.repartition(7), rates, "lang", "text", "strat")
      .select("doc_id", "lang", "samp_pm").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val wantKept = docs.select("doc_id", "lang", "text").collect().flatMap { r =>
      val pm = math.floorMod(
        TextHash.polyHashStr(r.getString(2) + "|strat"), 1000L)
      if (pm < rateMap(r.getString(1))) Some((r.getLong(0), r.getString(1), pm))
      else None
    }.toSet
    assert(kept == wantKept)
  }

  test("b16: sketch accuracy flags hold") {
    val rows = queries.RelationalQueries.b16(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"HLL out of bound for ${r.getString(0)}")
      assert(r.getBoolean(4), s"quantile out of bound for ${r.getString(0)}")
    }
  }

  test("c16: EWMA equals the naive sequential fold") {
    val events = queries.QueryUtil.events(spark, sf)
    val naive = events
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .groupBy(_._1).view.mapValues { rs =>
        val xs = rs.map(_._2).sortBy(x => (x._1, x._2)).map(_._3)
        xs.tail.foldLeft(xs.head)((acc, x) => x * 0.1 + acc * 0.9)
      }.toMap
    val got = TimeSeriesOps.ewma(events, col("user_id"),
      Seq(unix_micros(col("ts")).as("t_us"), col("event_id")),
      col("value"), alpha = 0.1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == naive.keySet)
    got.foreach { case (k, (n, e)) => assert(e == naive(k), s"key $k") }
  }
}
