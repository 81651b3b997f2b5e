package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.{HashedLinear, TextHash}
import graft.queries.TrainingDataQueries
import graft.sampling.Sampler

/** Round-11 operators: corpus-level span dedup (d39), source-mixture
  * balancing (d40), and the hashed-feature linear quality gate (d41).
  */
class Round11OpsSpec extends AnyFunSuite {
  import SparkTestBase._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("spanDedup keeps only the global first occurrence of each span") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // both spans are firsts
      (2L, "a b x y"),   // "a b" first-owned by doc 1
      (3L, "c d a b"),   // both spans first-owned by doc 1
      (4L, "a b c"),     // partial tail span "c" is unique
      (5L, "p q p q")    // intra-doc repeat: second occurrence drops
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", width = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, md5hex("a b c d"))))
    assert(out(2L) == ((2L, 1L, md5hex("x y"))))
    // every span dropped -> rebuilt text is the empty string
    assert(out(3L) == ((2L, 0L, md5hex(""))))
    assert(out(4L) == ((2L, 1L, md5hex("c"))))
    assert(out(5L) == ((2L, 1L, md5hex("p q"))))
  }

  test("d39 matches a brute-force reference on the test corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val segsOf = docs.map { case (id, text) =>
      id -> text.trim.split("\\s+").grouped(8).map(_.mkString(" ")).toVector
    }
    val firstOwner = collection.mutable.Map.empty[String, (Long, Int)]
    for ((id, segs) <- segsOf; (sp, i) <- segs.zipWithIndex)
      if (!firstOwner.contains(sp)) firstOwner(sp) = (id, i)
    val expect = segsOf.map { case (id, segs) =>
      val kept = segs.zipWithIndex.filter { case (sp, i) =>
        firstOwner(sp) == ((id, i))
      }.map(_._1)
      id -> ((segs.size.toLong, kept.size.toLong, md5hex(kept.mkString(" "))))
    }.toMap
    val got = TrainingDataQueries.d39(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expect)
  }

  test("mixRates: oversized strata cut to an equal token share, small keep all") {
    import spark.implicits._
    // stratum A: 10 docs x 10 tokens = 100; B: 10 x 30 = 300.
    // budget = 400/2 = 200, equal share 100: A keeps all (rate 1000),
    // B cut to 100*1000 div 300 = 333.
    val docs = (0 until 10).flatMap { i =>
      Seq(("A", (s"a$i " * 10).trim), ("B", (s"b$i " * 30).trim))
    }.toDF("src", "text")
    val rates = Sampler.mixRates(docs, "src", "text", "t")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rates("A") == ((10L, 100L, 1000L)))
    assert(rates("B") == ((10L, 300L, 333L)))
  }

  test("mixReport selected counts equal the stratified sample it implies") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val report = Sampler.mixReport(docs, "source", "text", "mix")
    val rows = report.collect()
    // brute-force the selection rule per document
    val rates = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    val picked = docs.select("source", "text").collect().filter { r =>
      val pm = TextHash.polyHashStr(r.getString(1) + "|mix") % 1000
      pm < rates(r.getString(0))
    }
    val wantDocsOut = picked.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    rows.foreach { r =>
      assert(r.getLong(4) == wantDocsOut.getOrElse(r.getString(0), 0).toLong,
        s"docs_out for ${r.getString(0)}")
    }
    // and the composition path returns exactly that sample
    val sampled = Sampler.stratified(docs,
      Sampler.mixRates(docs, "source", "text", "mix"), "source", "text", "mix")
    assert(sampled.count() == rows.map(_.getLong(4)).sum)
  }

  test("scorePm matches brute force and pins toward-zero truncation") {
    import spark.implicits._
    val dim = 8
    // doc 1 sums to -47 over 7 tokens: -47000/7 = -6714.28..., a
    // genuinely fractional negative quotient
    val corpus = Seq((1L, "a a a a a a d"), (2L, "x x"), (3L, "q"))
    val docs = corpus.toDF("doc_id", "text")
    val weights = (0 until dim).map(f => (f.toLong, f.toLong * 3 - 11))
      .toDF("feature", "weight")
    val wOf = weights.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = HashedLinear.scorePm(docs, weights, dim, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    corpus.foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
      val sum = toks.map(t => wOf(TextHash.polyHashStr(t) % dim)).sum
      // Java long division truncates toward zero — the exact
      // semantics `div` (Spark) and `//` (DuckDB) share
      val want = (toks.length.toLong, sum * 1000 / toks.length, sum * 1000 / toks.length >= 0)
      assert(got(id) == want, s"doc $id")
    }
    // at least one case must actually exercise a negative untruncated
    // quotient, else the truncation pin is vacuous
    assert(got.values.exists(v => v._2 < 0 && v._2 % 1000 != 0),
      "test vocab no longer produces a negative non-integral score; adjust weights")
  }

  /** Independent reference of the seeded-kmeans assignment
    * ([[graft.similarity.Similarity.kmeansCentroids]] + argmax):
    * md5-smallest seeds, one exact-integer Lloyd step over
    * milli-quantized components, cosine argmax with ties to the
    * smallest centroid id. Written against the SPEC, not the code —
    * a change to either implementation that diverges fails here.
    */
  private def refAssign(vecs: Seq[(Long, Array[Float])],
      kc: Int): Map[Long, Long] = {
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    val v = vecs.map { case (id, f) => id -> f.map(_.toDouble) }
      .filter { case (_, d) => math.sqrt(dot(d, d)) > 0 }
    val seeds = v.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(kc).map { case (id, d) => id -> d }
    def assign(cents: Seq[(Long, Array[Double])]): Map[Long, Long] =
      v.map { case (id, d) =>
        val nrm = math.sqrt(dot(d, d))
        id -> cents.map { case (cid, c) =>
          (dot(d, c) / (nrm * math.sqrt(dot(c, c))), -cid)
        }.zip(cents.map(_._1)).maxBy(_._1)._2
      }.toMap
    val a0 = assign(seeds)
    val byC = v.groupBy { case (id, _) => a0(id) }
    val cents1 = byC.toSeq.map { case (cid, members) =>
      val dim = members.head._2.length
      cid -> Array.tabulate(dim) { p =>
        members.map { case (_, d) => math.floor(d(p) * 1000).toLong }
          .sum.toDouble / members.size / 1000.0
      }
    }
    assign(cents1)
  }

  private val clusterVecs: Seq[(Long, Array[Float])] = Seq(
    // two directions in 3-space plus a straggler between them
    (10L, Array(1f, 0.1f, 0f)), (11L, Array(0.9f, 0f, 0.1f)),
    (12L, Array(1f, 0f, 0f)), (13L, Array(0.95f, 0.05f, 0f)),
    (20L, Array(0f, 1f, 0.1f)), (21L, Array(0.1f, 0.9f, 0f)),
    (22L, Array(0f, 1f, 0f)),
    (30L, Array(0.6f, 0.6f, 0.2f)))

  test("clusterReport matches the independent kmeans reference") {
    import spark.implicits._
    val labelOf: Map[Long, Int] =
      Map(10L -> 1, 11L -> 1, 12L -> 1, 13L -> 2,
        20L -> 3, 21L -> 3, 22L -> 3, 30L -> 3)
    val df = clusterVecs.map { case (id, v) => (id, v, labelOf(id)) }
      .toDF("vec_id", "embedding", "label")
    val ref = refAssign(clusterVecs, kc = 2)
    val want = ref.groupBy(_._2).map { case (cid, members) =>
      val labels = members.keys.toSeq.map(labelOf(_).toLong)
      val byLabel = labels.groupBy(identity).view.mapValues(_.size.toLong)
      val (topL, topN) = byLabel.toSeq.maxBy { case (l, n) => (n, -l) }
      cid -> ((members.size.toLong, byLabel.size.toLong, topL, topN,
        topN * 1000 / members.size))
    }
    val got = graft.similarity.Similarity
      .clusterReport(df, "vec_id", "embedding", "label", kCentroids = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          // top_label keeps the label's NATIVE type (int here) — the
          // long cast used to null string labels silently
          r.getAs[Number](3).longValue(), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got == want)
    assert(got.size == 2, "both seeds must retain members on this corpus")
    // string labels must survive natively (the pre-r12 long cast
    // collapsed them to one null label at purity 1000)
    val sdf = clusterVecs.map { case (id, v) =>
      (id, v, s"t${labelOf(id)}") }.toDF("vec_id", "embedding", "label")
    val sgot = graft.similarity.Similarity
      .clusterReport(sdf, "vec_id", "embedding", "label", kCentroids = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(sgot == want.map { case (cid, w) => cid -> s"t${w._3}" })
  }

  test("clusterBalancedSample: equal-share rates, content-hash selection") {
    import spark.implicits._
    val df = clusterVecs.toDF("vec_id", "embedding")
    val ref = refAssign(clusterVecs, kc = 2)
    val nc = ref.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val (tot, ncl) = (nc.values.sum, nc.size.toLong)
    val want = ref.flatMap { case (id, cid) =>
      val rate = math.min(1000L, tot * 1L / (2L * ncl) * 1000L / math.max(nc(cid), 1L))
      val pm = TextHash.polyHashStr(s"$id|cbal") % 1000
      if (pm < rate) Some(id -> ((cid, pm, rate))) else None
    }
    val got = graft.similarity.Similarity
      .clusterBalancedSample(df, "vec_id", "embedding", kCentroids = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
    // the rule must actually thin something on this corpus, or the
    // equal-share arithmetic is untested
    assert(got.size < ref.size)
  }

  test("HashEmbed matches a brute-force reference, including negative truncation") {
    import spark.implicits._
    val dim = 4
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "x"), (3L, "a b a"))
    val got = graft.functions.HashEmbed
      .embed(corpus.toDF("doc_id", "text"), "doc_id", "text", dim)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[Long](2).toVector))).toMap
    corpus.foreach { case (id, text) =>
      val hs = text.trim.toLowerCase.split("\\s+").map(TextHash.polyHashStr)
      val want = (0 until dim).toVector.map { j =>
        val s = hs.map(h => (h * (2 * j + 1)) % graft.functions.HashEmbed.ProjMod - 1000L).sum
        s * 1000L / hs.length // Java /: toward-zero, the pinned div
      }
      assert(got(id) == ((hs.length.toLong, want)), s"doc $id")
    }
    // the fixture must exercise a negative truncated component, or
    // the toward-zero pin is vacuous
    assert(got.values.exists(_._2.exists(c => c < 0 && c % 1000 != 0)),
      "fixture no longer produces a negative non-integral component")
  }

  test("quartileStages: exact boundaries, ties share a stage, bounded window") {
    import spark.implicits._
    // N=8: q1 = min score with cum >= 2 -> 1; q2 (cum >= 4) -> 3;
    // q3 (cum >= 6) -> 4. The three 4s land in ONE stage.
    val scored = Seq(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 4L, 6L -> 4L, 7L -> 4L, 8L -> 10L).toDF("doc_id", "score_pm")
    val df = Sampler.quartileStages(scored, "doc_id", "score_pm")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 2L, 8L -> 3L)
    assert(got == want)
    // every Window in the plan sorts the bounded HISTOGRAM (grouped
    // on score), never per-document rows — the plan-shape shuffle
    // count is pinned on real data in PlanAuditSpec (local
    // relations here bypass the cache and duplicate the tiny
    // boundary subtree, which is irrelevant at scale)
    val p = df.queryExecution.executedPlan.toString()
    assert(p.linesIterator.filter(_.contains("Window"))
      .forall(_.contains("__cnt")),
      "quartile windows must run over histogram counts only")
  }

  test("scorePm is zero-shuffle and rejects malformed weight tables") {
    import spark.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val weights = Seq((0L, 1L), (1L, -1L)).toDF("feature", "weight")
    val df = HashedLinear.scorePm(docs, weights, 2, "doc_id", "text")
    df.collect()
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "hashed-linear scoring must not shuffle")
    intercept[IllegalArgumentException] {
      HashedLinear.scorePm(docs,
        Seq((0L, 1L), (0L, 2L)).toDF("feature", "weight"), 2, "doc_id", "text")
    }
    intercept[IllegalArgumentException] {
      HashedLinear.scorePm(docs,
        Seq((5L, 1L)).toDF("feature", "weight"), 2, "doc_id", "text")
    }
  }
}
