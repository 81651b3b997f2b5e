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
