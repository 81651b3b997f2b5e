package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.{RelationalQueries, TrainingDataQueries}

/** Round-8 operators: independent GROUPING SETS (b23), boilerplate
  * n-gram coverage (d34), normalization dedup (d35), and the media
  * thumbnail pass (d36).
  */
class Round8OpsSpec extends AnyFunSuite {
  import SparkTestBase._

  test("b23 emits exactly the two requested grouping sets") {
    val rows = RelationalQueries.b23(spark, sf)
      .select("o_orderstatus", "o_orderpriority", "gid", "n").collect()
    // gid 1 = priority aggregated away (per-status row), gid 2 = the
    // per-priority row; the pair cell (0) and grand total (3) must
    // NOT appear — that is what distinguishes this from cube/rollup
    assert(rows.map(_.getLong(2)).toSet == Set(1L, 2L))
    rows.foreach { r =>
      if (r.getLong(2) == 1L) assert(r.isNullAt(1) && !r.isNullAt(0))
      else assert(r.isNullAt(0) && !r.isNullAt(1))
    }
    // each set partitions the table: its counts sum to the row count
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    Seq(1L, 2L).foreach { g =>
      assert(rows.filter(_.getLong(2) == g).map(_.getLong(3)).sum == total)
    }
  }

  test("d34 coverage is exact against a local recount") {
    val out = TrainingDataQueries.d34(spark, sf)
      .select("doc_id", "n_grams", "n_frequent", "bp_pm").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val gramsOf = docs.map { case (id, text) =>
      id -> text.trim.toLowerCase.split("\\s+").toSeq
        .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }
    val df = gramsOf.values.flatten
      .groupBy(identity).view.mapValues(_.size).toMap
    val frequent = df.filter(_._2 >= 5).keySet
    assert(out.nonEmpty)
    gramsOf.filter(_._2.nonEmpty).foreach { case (id, gs) =>
      val nf = gs.count(frequent)
      val (gotN, gotF, gotPm) = out(id)
      assert(gotN == gs.size, s"doc $id n_grams")
      assert(gotF == nf, s"doc $id n_frequent")
      assert(gotPm == nf.toLong * 1000 / gs.size, s"doc $id bp_pm")
    }
  }

  test("d35 collapses punctuation/case/whitespace variants, keeps others") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_d35").toString
    Seq(
      (0L, "Hello, World!  foo", "en", "src0", 18L),
      (1L, "hello world foo", "en", "src0", 15L),
      (2L, "hello   WORLD\tfoo.", "en", "src0", 18L),
      (3L, "hello world bar", "en", "src0", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TrainingDataQueries.d35(spark, dir)
      .select("doc_id", "keeper_id", "is_dup").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(0L) == ((0L, false)))
    assert(out(1L) == ((0L, true)), "case/punct variant must collapse to doc 0")
    assert(out(2L) == ((0L, true)), "whitespace variant must collapse to doc 0")
    assert(out(3L) == ((3L, false)), "different content must survive")
  }

  test("d35 is strictly coarser than d1 exact dedup") {
    // every byte-exact duplicate group is also a normalization-dup
    // group; the reverse need not hold
    val d1Dups = TrainingDataQueries.d1(spark, sf)
      .filter(col("n_copies") > 1).agg(sum(col("n_copies"))).collect()(0)
    val exactDupDocs = if (d1Dups.isNullAt(0)) 0L else d1Dups.getLong(0)
    val d35Groups = TrainingDataQueries.d35(spark, sf)
      .filter(col("is_dup")).count()
    // exact groups of size n contribute n-1 is_dup rows at minimum
    assert(d35Groups >= 0L)
    val d1Groups = TrainingDataQueries.d1(spark, sf)
      .filter(col("n_copies") > 1).count()
    assert(d35Groups >= exactDupDocs - d1Groups,
      "norm dedup must flag at least every non-keeper exact duplicate")
  }

  test("d36 thumbnails match a brute-force recompute and span the payload") {
    val out = TrainingDataQueries.d36(spark, sf)
      .select("doc_id", "t1", "t2", "t3", "t4").collect()
      .map(r => r.getLong(0) ->
        Array(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(length(col("text")) >= 4 && col("n_chars") >= 4)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == docs.keySet, "one thumbnail per pruned-in doc")
    docs.foreach { case (id, text) =>
      val expect = graft.multimodal.Media.thumbBytes(
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8), 4)
      val got = out(id)
      (0 until 4).foreach { i =>
        assert(got(i) == expect(i), s"doc $id segment $i")
      }
      // each mean lies within the payload's code-point range
      val cps = text.codePoints().toArray
      got.foreach { m =>
        assert(m >= cps.min && m <= cps.max, s"doc $id mean out of range")
      }
    }
  }

  test("d34 fractional minDf resolves against the corpus and matches its absolute twin") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = TrainingDataQueries.boilerplateNgrams(docs, Left(1L))
      .count() // gram-bearing docs = rows of any run
    // a fraction that ceils to exactly df=5 must be bit-identical to
    // the absolute default
    val frac = 4.5 / n
    assert(math.ceil(frac * n).toLong == 5L)
    val abs = TrainingDataQueries.boilerplateNgrams(docs, Left(5L))
      .orderBy("doc_id").collect()
    val rel = TrainingDataQueries.boilerplateNgrams(docs, Right(frac))
      .orderBy("doc_id").collect()
    assert(abs.sameElements(rel))
    // threshold 1 makes every gram frequent: full coverage everywhere
    val all = TrainingDataQueries.boilerplateNgrams(docs, Right(1e-9))
    assert(all.filter(col("n_frequent") =!= col("n_grams")).count() == 0)
    intercept[IllegalArgumentException] {
      TrainingDataQueries.boilerplateNgrams(docs, Right(1.5))
    }
    intercept[IllegalArgumentException] {
      TrainingDataQueries.boilerplateNgrams(docs, Left(0L))
    }
  }

  test("d36 guard counts code points, not UTF-16 units (astral chars)") {
    // U+1D11E is 2 UTF-16 units / 1 code point. Spark's length() is
    // UTF8String.numChars — code points — matching DuckDB's length()
    // and Media.thumbBytes' segmentation, so a 2-astral-char text
    // (4 UTF-16 units, 2 code points) must be EXCLUDED by the
    // length >= 4 guard on both engines; 4 astral chars pass and
    // every span is non-empty.
    val g = new String(Character.toChars(0x1D11E))
    import spark.implicits._
    val probe = Seq((1L, g * 2), (2L, g * 4)).toDF("doc_id", "text")
    val kept = probe.filter(length(col("text")) >= 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L),
      s"length() must count code points; kept=$kept")
    val thumb = graft.multimodal.Media.thumbBytes(
      (g * 4).getBytes(java.nio.charset.StandardCharsets.UTF_8), 4)
    assert(thumb.forall(_ == 0x1D11E.toDouble),
      "every span non-empty at exactly n == segments")
  }

  test("d36 segment boundaries partition the code points exactly") {
    // floor-boundary spans are disjoint, ordered, and cover [0, n)
    Seq(4, 5, 7, 63, 64, 1000).foreach { n =>
      val bounds = (0 to 4).map(i => i * n / 4)
      assert(bounds.head == 0 && bounds.last == n)
      assert(bounds.sliding(2).forall { case Seq(a, b) => a < b },
        s"n=$n: every span non-empty")
    }
  }
}
