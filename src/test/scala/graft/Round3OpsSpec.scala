package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeriesOps
import graft.queries.{RelationalQueries, SensorQueries, StreamingQueries,
  TimeSeriesQueries, TrainingDataQueries}

/** Semantic checks for the round-3 operators against independent
  * naive implementations and invariants.
  */
class Round3OpsSpec extends AnyFunSuite {
  import SparkTestBase._

  // ---- intervalOverlapJoin (c20) -----------------------------------

  test("intervalOverlapJoin equals the naive theta join, exactly once per pair") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i.toLong % 5, s, s + rnd.nextInt(5000))  // key, ls, le
    }
    val right = (1 to 150).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i.toLong % 5, s, s + rnd.nextInt(8000))
    }
    val l = spark.createDataFrame(left).toDF("k", "ls", "le")
    val r = spark.createDataFrame(right).toDF("k", "rs", "re")
    val got = TimeSeriesOps.intervalOverlapJoin(l, r, "k",
        "ls", "le", "rs", "re", bucketUs = 1000L)
      .select("k", "ls", "le", "rs", "re").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toSeq
    val want = for {
      (lk, ls, le) <- left
      (rk, rs, re) <- right
      if lk == rk && ls <= re && rs <= le
    } yield (lk, ls, le, rs, re)
    // exact multiset equality: every overlapping pair exactly once
    assert(got.sorted == want.sorted)
  }

  test("intervalOverlapJoin drops empty and over-long intervals (guarded)") {
    val l = spark.createDataFrame(Seq(
      (1L, 100L, 50L),              // empty (e < s): dropped
      (1L, 0L, Long.MaxValue / 2),  // over-long: dropped
      (1L, 100L, 200L))).toDF("k", "ls", "le")
    val r = spark.createDataFrame(Seq((1L, 150L, 250L))).toDF("k", "rs", "re")
    val got = TimeSeriesOps.intervalOverlapJoin(l, r, "k",
      "ls", "le", "rs", "re", bucketUs = 100L, maxBuckets = 16)
    assert(got.count() == 1)
  }

  // ---- cusum (c21) --------------------------------------------------

  test("cusum equals the naive sequential fold bit-for-bit") {
    val e = graft.queries.QueryUtil.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id"), col("value"))
    val rows = e.collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
    val want = rows.groupBy(_._1).map { case (k, xs) =>
      val vs = xs.map(_._2).sortBy(t => (t._1, t._2)).map(_._3)
      val pos = vs.foldLeft(0.0)((a, x) => math.max(0.0, a + (x - 55.0)))
      val neg = vs.foldLeft(0.0)((a, x) => math.min(0.0, a + (x - 45.0)))
      k -> (pos, neg)
    }
    val got = TimeSeriesOps.cusum(e, col("user_id"),
        Seq(col("t_us"), col("event_id")), col("value"),
        target = 50.0, slack = 5.0)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got == want)  // exact double equality: same fold order
  }

  // ---- forward as-of (c23) -----------------------------------------

  test("asOfJoinForward equals the naive earliest-at-or-after match") {
    val q = TimeSeriesQueries.c23(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    val e = graft.queries.QueryUtil.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val purchases = e.filter(_._4 == "purchase")
    val want = e.filter(_._4 == "click").map { case (cid, u, t, _) =>
      val cands = purchases.filter(p => p._2 == u && p._3 >= t)
      cid -> (if (cands.isEmpty) -1L
              else cands.minBy(p => (p._3, p._1))._1)
    }.toMap
    assert(q == want)
  }

  // ---- doc chunking (d25) ------------------------------------------

  test("d25: chunks tile every document with the declared stride and overlap") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = TrainingDataQueries.d25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, cs) =>
      val text = docs(id)
      val sorted = cs.sortBy(_._2)
      // indices are 0..n-1, starts are idx*150, last chunk reaches the end
      sorted.zipWithIndex.foreach { case ((_, idx, start, len, h), i) =>
        assert(idx == i && start == i * 150L)
        val expect = text.substring(start.toInt,
          math.min(text.length, start.toInt + 200))
        assert(len == expect.length)
        assert(h == java.security.MessageDigest.getInstance("MD5")
          .digest(expect.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
      }
      assert(sorted.last._3 + sorted.last._4 >= text.length)
    }
  }

  // ---- sequence packing (d26) --------------------------------------

  test("d26: hierarchical cumsum equals the naive global running sum") {
    val got = TrainingDataQueries.d26(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    var cum = 0L
    got.foreach { case (_, nTok, packId, packOff) =>
      assert(packId == cum / 2048)
      assert(packOff == cum % 2048)
      cum += nTok
    }
    // offsets stay inside the budget by construction
    assert(got.forall(_._4 < 2048))
  }

  test("d26: packing is partition-count independent") {
    val a = TrainingDataQueries.d26(spark, sf).collect().toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      assert(TrainingDataQueries.d26(spark, sf).collect().toSet == a)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  // ---- cube / range frame (b19, b20) -------------------------------

  test("b19: cube totals line up across grouping sets") {
    val rows = RelationalQueries.b19(spark, sf).collect()
    val grand = rows.filter(_.getLong(2) == 3)
    assert(grand.length == 1)
    val total = grand.head.getLong(3)
    // each dimension's subtotal slice re-adds to the grand total
    assert(rows.filter(_.getLong(2) == 1).map(_.getLong(3)).sum == total)
    assert(rows.filter(_.getLong(2) == 2).map(_.getLong(3)).sum == total)
    assert(rows.filter(_.getLong(2) == 0).map(_.getLong(3)).sum == total)
  }

  test("b20: range frame equals naive trailing-window scan") {
    val rows = graft.queries.QueryUtil.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("t"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = rows.map { case (id, u, t, _) =>
      id -> rows.count(x => x._2 == u && x._3 >= t - 3600000 && x._3 <= t).toLong
    }.toMap
    val got = RelationalQueries.b20(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == want)
  }

  // ---- SQL surface (b21) -------------------------------------------

  test("b21: SQL-registered functions equal the Column API results") {
    val viaSql = RelationalQueries.b21(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(3))).toMap
    val viaApi = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextHash.poly_hash(col("text")).as("h"),
        size(graft.functions.TextHash.word_gram_hashes(col("text"), 2,
          distinct = true)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(viaSql == viaApi)
  }

  // ---- source round-trips (a14, a15) -------------------------------

  test("a14/a15: csv and json round-trips preserve aggregates exactly") {
    val fromCsv = SensorQueries.a14(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val fromJson = SensorQueries.a15(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val fromParquet = graft.queries.QueryUtil.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        graft.queries.QueryUtil.moneySum(col("value")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(fromCsv == fromParquet)
    assert(fromJson == fromParquet)
  }

  // ---- gap report (c19) --------------------------------------------

  test("c19: reported gaps match a naive per-key scan") {
    val rows = graft.queries.QueryUtil.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).flatMap { case (u, xs) =>
      xs.sortBy(x => (x._2, x._3)).sliding(2).collect {
        case Array(a, b) if b._2 - a._2 > 7200000000L =>
          (u, a._2 / 1000, b._2 / 1000)
      }
    }.toSet
    val got = TimeSeriesQueries.c19(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  // ---- stream-stream join (c22) ------------------------------------

  test("c22: stream-stream join equals the batch time-bounded join") {
    val got = StreamingQueries.c22(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = graft.queries.QueryUtil.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = (for {
      p <- e.filter(_._4 == "purchase")
      c <- e.filter(_._4 == "click")
      if p._2 == c._2 && c._3 >= p._3 - 3600000000L && c._3 <= p._3
    } yield (p._1, c._1)).toSet
    assert(got == want)
  }

  // ---- rank suite (b22) --------------------------------------------

  test("b22: ntile/percent_rank/cume_dist match naive definitions") {
    val rows = RelationalQueries.b22(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    rows.groupBy(_._2).foreach { case (_, xs) =>
      val n = xs.length
      val sorted = xs.sortBy(x => (x._4, x._1))  // pct_rank then key
      sorted.zipWithIndex.foreach { case ((_, _, quartile, pct, cume), i) =>
        assert(pct == (if (n == 1) 0.0 else i.toDouble / (n - 1)))
        assert(cume == (i + 1).toDouble / n)
        // ntile: first n%4 buckets one row larger
        val big = n % 4
        val base = n / 4
        val expect =
          if (i < big * (base + 1)) i / (base + 1) + 1
          else big + (i - big * (base + 1)) / base + 1
        assert(quartile == expect)
      }
    }
  }

  // ---- tf-idf (d28) -------------------------------------------------

  test("d28: top terms match a naive tf-idf over the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
        .split("\\s+").toSeq).toMap
    val tf = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, o) => (id, t) -> o.size.toLong }
    }
    val dfm = tf.keys.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val want = docs.keys.flatMap { id =>
      docs(id).distinct
        .map(t => (t, tf((id, t)), dfm(t)))
        .sortBy { case (t, f, d) => (-f, d, t) }
        .take(3).zipWithIndex
        .map { case ((t, f, d), i) => (id, t, f, d, i + 1L) }
    }.toSet
    val got = TrainingDataQueries.d28(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
  }

  // ---- lm quality (d29) --------------------------------------------

  test("d29: rare/oov rates match a naive corpus scan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
        .split("\\s+").toSeq).toMap
    val freq = docs.values.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val vocab = freq.toSeq.sortBy { case (t, c) => (-c, t) }.take(1000)
      .map(_._1).toSet
    val got = TrainingDataQueries.d29(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = docs.map { case (id, ts) =>
      val rare = ts.count(freq(_) <= 2).toLong
      val oov = ts.count(!vocab(_)).toLong
      (id, ts.length.toLong, rare * 1000 / ts.length, oov * 1000 / ts.length)
    }.toSet
    assert(got == want)
  }

  // ---- winsorize (d27) ---------------------------------------------

  test("d27: winsorized mean is between p05 and p95 and n sums to corpus") {
    val rows = TrainingDataQueries.d27(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (p05, p95, mw) = (r.getDouble(2), r.getDouble(3), r.getDouble(5))
      assert(mw >= p05 - 1e-9 && mw <= p95 + 1e-9)
    }
  }
}
