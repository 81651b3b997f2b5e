package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, TopKAgg}
import graft.operators.TimeSeriesOps

/** Randomized cross-validation (fixed seeds — reproducible): the
  * distributed operators must agree with naive single-machine
  * implementations on arbitrary inputs, not just the fixtures.
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestBase._

  private def randomText(rnd: scala.util.Random, maxLen: Int): String = {
    val chars = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJ0123456789 .,! "
    (0 until rnd.nextInt(maxLen)).map(_ => chars(rnd.nextInt(chars.length))).mkString
  }

  test("wordGramHashesStr agrees with composed tokenize/hash/combine") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val s = randomText(rnd, 120)
      val n = 1 + rnd.nextInt(4)
      val th = s.trim.toLowerCase.split("\\s+").toSeq.map(TextHash.polyHashStr)
      val naive =
        if (th.length < n) Seq.empty
        else th.sliding(n).map(_.reduceLeft((a, h) => (a * 31 + h) % TextHash.P)).toSeq
      assert(TextHash.wordGramHashesStr(s, n, distinct = false).toSeq == naive,
        s"text=<$s> n=$n")
    }
  }

  test("shingle rolling hash agrees with per-substring hashing") {
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 50) {
      val s = randomText(rnd, 80)
      val k = 1 + rnd.nextInt(9)
      val naive =
        if (s.length < k) Seq.empty
        else (0 to s.length - k).map(i => TextHash.polyHashStr(s.substring(i, i + k)))
      assert(TextHash.shingleHashesStr(s, k).toSeq == naive, s"text=<$s> k=$k")
    }
  }

  test("HashEmbed agrees with a naive per-token projection on random texts") {
    import spark.implicits._
    val rnd = new scala.util.Random(44)
    val dim = 6
    val corpus = (1 to 40).map(i => (i.toLong, randomText(rnd, 100)))
    val got = graft.functions.HashEmbed
      .embed(corpus.toDF("doc_id", "text"), "doc_id", "text", dim)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[Long](2).toVector))).toMap
    corpus.foreach { case (id, text) =>
      val hs = text.trim.toLowerCase.split("\\s+").map(TextHash.polyHashStr)
      val want = (0 until dim).toVector.map { j =>
        hs.map(h => (h * (2 * j + 1)) % graft.functions.HashEmbed.ProjMod
          - 1000L).sum * 1000L / hs.length
      }
      assert(got(id) == ((hs.length.toLong, want)), s"doc $id text=<$text>")
    }
  }

  test("dupClusters equals union-find on randomized duplicated corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "theta", "kappa", "lambda", "sigma", "omega", "quick", "brown", "fox")
    def sentence() =
      (0 until 12 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (round <- 1 to 3) {
      val bases = (0 until 10).map(_ => sentence())
      // each doc copies some base verbatim (exact dups) or with a
      // small tail tweak (near dups); ids shuffled
      val docs = rnd.shuffle((1L to 40L).toList).map { i =>
        val b = bases(rnd.nextInt(bases.size))
        val text = rnd.nextInt(3) match {
          case 0 => b
          case 1 => b + " zz" + rnd.nextInt(3)
          case _ => b.toUpperCase
        }
        (i, text, "en")
      }.toDF("doc_id", "text", "lang")
      val got = graft.dedup.Dedup.dupClusters(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // independent union-find over independently recomputed edges
      val near = graft.dedup.Dedup.minhashVerifiedPairs(docs, "doc_id", "text")
        .filter(col("jac_pm") >= 500).select("d1", "d2")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val exact = docs.collect()
        .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase))
        .groupBy(_._2).values.map(_.map(_._1).sorted)
        .filter(_.length > 1).flatMap(g => g.tail.map((g.head, _)))
      val parent = scala.collection.mutable.Map((1L to 40L).map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      (near ++ exact).foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (1L to 40L).map(i => i -> find(i)).toMap
      assert(got == want, s"round $round")
      // the small-large-star path must produce identical clusters
      val gotStar = graft.dedup.Dedup
        .dupClusters(docs, "doc_id", "text", algo = "star")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotStar == want, s"round $round (star)")
      spark.catalog.clearCache()
    }
  }

  test("ccSmallLargeStar labels a 256-node path in O(log n) rounds") {
    import spark.implicits._
    // Deep chain: the adversarial shape for min-label propagation
    // (diameter = n). The star variant must converge in ~2*log2(n)
    // alternating rounds and still label every node with the
    // component minimum.
    val n = 256
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("d1", "d2")
    val (labels, rounds) = graft.dedup.Dedup.ccSmallLargeStar(edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until n.toLong).map(_ -> 0L).toMap)
    assert(rounds <= 2 * 8 + 2, s"rounds=$rounds for a ${n}-node path")
    labels.unpersist()
  }

  test("CC checkpoint freeing never evicts a caller's cache buffer") {
    import spark.implicits._
    // Regression (r8): the CC loop frees superseded checkpoint RDDs
    // by diffing getPersistentRDDs around the eager localCheckpoint.
    // When that checkpoint is ALSO the first materialization of an
    // upstream persisted dataset, the upstream cache buffer RDD
    // registers inside the diff window — and the old id-diff would
    // unpersist it on the first freeRdds call, silently recomputing
    // the upstream plan every later round. The tracked set must be
    // restricted to (materialized) checkpoint RDDs.
    val sc = spark.sparkContext
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("d1", "d2").persist()
    try {
      val before = sc.getPersistentRDDs.keySet
      val (labels, _) = graft.dedup.Dedup.ccMinLabel(edges)
      labels.count()
      val after = sc.getPersistentRDDs
      // the caller's cache buffer (registered mid-loop, NOT a
      // checkpoint) must still be live
      val survivingBuffers = (after.keySet -- before)
        .filter(id => after.get(id).exists(r => !r.isCheckpointed))
      assert(survivingBuffers.nonEmpty,
        "caller's cache buffer RDD was evicted by the CC checkpoint freeing")
      labels.unpersist()
    } finally edges.unpersist()
  }

  test("ccSmallLargeStar equals ccMinLabel on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(49)
    for (round <- 1 to 3) {
      // mix of components: random sparse edges over 60 nodes, plus a
      // guaranteed chain and an isolated 2-clique
      val edges = (List.fill(45)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
          ++ List((70L, 71L), (71L, 72L), (72L, 73L), (90L, 91L)))
        .filter { case (a, b) => a != b }
        .toDF("d1", "d2")
      val (star, _) = graft.dedup.Dedup.ccSmallLargeStar(edges)
      val (minl, _) = graft.dedup.Dedup.ccMinLabel(edges)
      val g = star.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val w = minl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(g == w, s"round $round")
      star.unpersist(); minl.unpersist()
    }
  }

  test("ewma agrees with naive fold on random per-key series") {
    import spark.implicits._
    val rnd = new scala.util.Random(48)
    val rows = (1L to 300L).map { i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(100000).toLong, i, rnd.nextDouble() * 100)
    }
    val df = rows.toDF("k", "t", "id", "v")
    val got = TimeSeriesOps.ewma(df, col("k"),
      Seq(col("t"), col("id")), col("v"), alpha = 0.25)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val want = rows.groupBy(_._1).view.mapValues { rs =>
      val xs = rs.sortBy(r => (r._2, r._3)).map(_._4)
      xs.tail.foldLeft(xs.head)((acc, x) => x * 0.25 + acc * 0.75)
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(v == want(k), s"key $k") }
  }

  test("TopKAgg agrees with multiset sort-take on random groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(44)
    for (_ <- 1 to 5) {
      val data = List.fill(60)(
        (rnd.nextInt(4), rnd.nextInt(11).toDouble - 5, rnd.nextInt(31).toLong))
      val got = data.toDF("g", "score", "id").groupBy("g")
        .agg(TopKAgg.top_k(col("score"), col("id"), 3).as("top"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getDouble(0), x.getLong(1))).toList)
        .toMap
      val want = data.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3))
          .sortBy { case (s, i) => (-s, i) }.take(3)
      }
      assert(got == want)
    }
  }

  test("asOfJoin agrees with naive latest-at-or-before search") {
    import spark.implicits._
    val rnd = new scala.util.Random(45)
    for (_ <- 1 to 5) {
      val lefts = List.fill(12)((rnd.nextInt(3), rnd.nextInt(50).toLong))
      val rRows = List.fill(12)((rnd.nextInt(3), rnd.nextInt(50).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong, i * 1.5) }
      val l = lefts.zipWithIndex
        .map { case ((k, t), i) => (k, t, 1000L + i) }.toDF("k", "t_us", "lid")
      val r = rRows.toDF("k", "t_us", "rid", "v")
      val got = TimeSeriesOps.asOfJoin(l, r, "k", "t_us", "lid", "rid", Seq("v"))
        .collect()
        .map(x => x.getLong(2) -> (if (x.isNullAt(3)) None else Some(x.getLong(3))))
        .toMap
      val want = lefts.zipWithIndex.map { case ((k, t), i) =>
        val candidates = rRows.filter(rr => rr._1 == k && rr._2 <= t)
        val best = if (candidates.isEmpty) None
        else Some(candidates.maxBy(rr => (rr._2, rr._3))._3)
        (1000L + i) -> best
      }.toMap
      assert(got == want, s"lefts=$lefts rights=$rRows")
    }
  }

  test("sessionizeUs island assignment agrees with a naive gap scan") {
    import spark.implicits._
    val rnd = new scala.util.Random(46)
    for (_ <- 1 to 5) {
      val gapUs = 1000L
      // distinct (k,t): identical timestamps make window order within
      // a key nondeterministic for the naive comparison
      val data = List.fill(25)((rnd.nextInt(3), rnd.nextInt(10000).toLong)).distinct
      val got = TimeSeriesOps.sessionizeUs(
          data.toDF("k", "t_us"), col("k"), col("t_us"), gapUs)
        .groupBy("k").agg(countDistinct(col("__session_id")).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1).toInt).toMap
      val want = data.groupBy(_._1).map { case (k, rs) =>
        val ts = rs.map(_._2).sorted
        k -> (1 + ts.sliding(2).count {
          case Seq(a, b) => b - a >= gapUs
          case _ => false
        })
      }
      assert(got == want, s"data=$data")
    }
  }
}
