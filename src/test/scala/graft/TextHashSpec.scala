package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextHash

class TextHashSpec extends AnyFunSuite {
  import SparkTestBase._

  def naiveShingles(s: String, k: Int): Array[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) Array.empty
    else (0 to cps.length - k)
      .map(i => TextHash.polyHashStr(new String(cps, i, k))).toArray
  }

  test("polyHashStr matches the documented fold") {
    var h = 0L
    for (c <- "hello world") h = (h * 31 + c) % TextHash.P
    assert(TextHash.polyHashStr("hello world") == h)
    assert(TextHash.polyHashStr("hello world") == 204910434L) // cross-checked in DuckDB
    assert(TextHash.polyHashStr("") == 0L)
  }

  test("rolling shingle hashes equal naive per-shingle hashes") {
    for (s <- Seq("abcdefghij", "spark graft engine", "aaaaaaaaa", "short"))
      assert(TextHash.shingleHashesStr(s, 8).toSeq == naiveShingles(s, 8).toSeq)
  }

  test("hashes iterate Unicode code points, not UTF-16 units") {
    // U+1D49C (𝒜) is an astral char: one code point, two UTF-16 units.
    // The oracle (DuckDB unicode()) sees one element of value 0x1D49C.
    assert(TextHash.polyHashStr("𝒜") == 0x1D49CL % TextHash.P)
    assert(TextHash.polyHashStr("a𝒜b") ==
      (('a'.toLong * 31 + 0x1D49CL) % TextHash.P * 31 + 'b') % TextHash.P)
    // Shingles advance by code point: "a𝒜b" has exactly two 2-cp shingles.
    val sh = TextHash.shingleHashesStr("a𝒜b", 2)
    assert(sh.toSeq == naiveShingles("a𝒜b", 2).toSeq)
    assert(sh.length == 2)
  }

  test("PolyHash expression (codegen path) matches local function") {
    import spark.implicits._
    val texts = Seq("alpha beta", "", "Mixed CASE 123!", "astral a𝒜b ✓")
    val got = texts.toDF("t")
      .select(TextHash.poly_hash(col("t")).as("h")).as[Long].collect()
    assert(got.toSeq == texts.map(TextHash.polyHashStr))
  }

  test("MinHashSig is a per-slot minimum of permuted hashes") {
    import spark.implicits._
    val hs = Seq(7L, 13L, 29L)
    val got = Seq(1).toDF("x")
      .select(TextHash.minhash_sig(
        array(hs.map(lit): _*), 4).as("sig"))
      .as[Seq[Long]].head()
    val want = (0 until 4).map { j =>
      hs.map(h => (TextHash.minA(j) * h + TextHash.minB(j)) % TextHash.P).min
    }
    assert(got == want)
  }

  test("SimHash sets exactly the majority bits") {
    import spark.implicits._
    // two elements with bit0 set, one without -> bit0 set;
    // only one element with bit1 set -> bit1 unset
    val got = Seq(1).toDF("x")
      .select(TextHash.simhash(array(lit(1L), lit(3L), lit(0L)), 30).as("s"))
      .as[Long].head()
    assert((got & 1L) == 1L)
    assert((got & 2L) == 0L)
  }

  test("SortedIntersectCount equals set intersection on random sorted inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(50)
    val cases = (1 to 40).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (a, b, (a.toSet & b.toSet).size.toLong)
    }
    val got = cases.toDF("a", "b", "want")
      .select(TextHash.sorted_intersect_count(col("a"), col("b")).as("got"),
        col("want"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // empty sides
    val e = Seq((Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
      .select(TextHash.sorted_intersect_count(col("a"), col("b"))).head().getLong(0)
    assert(e == 0L)
  }
}
