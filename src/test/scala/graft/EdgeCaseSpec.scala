package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{Curator, Dedup}
import graft.similarity.Similarity

/** Degenerate and adversarial inputs: empty corpus, single document,
  * fully-duplicated corpus (pathological dedup skew), astral Unicode.
  * Every operator must degrade gracefully — no crashes, no surprise
  * rows.
  */
class EdgeCaseSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  private val empty = mkDocs(Seq.empty)

  test("dedup operators return no rows on an empty corpus") {
    assert(Dedup.exact(empty, "doc_id", "text").count() == 0)
    assert(Dedup.minhashVerifiedPairs(empty, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(empty, "doc_id", "text").count() == 0)
    assert(Dedup.dupClusters(empty, "doc_id", "text").count() == 0)
    assert(Curator.curate(spark, empty).count() == 0)
  }

  test("single-document corpus: no pairs, one singleton cluster") {
    val one = mkDocs(Seq((7L, "a quick brown fox jumps over the lazy dog", "en")))
    assert(Dedup.minhashVerifiedPairs(one, "doc_id", "text").count() == 0)
    val cl = Dedup.dupClusters(one, "doc_id", "text").collect()
    assert(cl.length == 1 && cl.head.getLong(1) == 7L && cl.head.getLong(2) == 1L)
  }

  test("fully-duplicated corpus collapses to one cluster, one keeper") {
    val n = 40
    val same = mkDocs((1L to n.toLong).map(i =>
      (i, "identical content repeated for the skew pathology case", "en")))
    val ex = Dedup.exact(same, "doc_id", "text").collect()
    assert(ex.length == 1 && ex.head.getLong(1) == 1L && ex.head.getLong(2) == n)
    val cl = Dedup.dupClusters(same, "doc_id", "text").collect()
    assert(cl.forall(_.getLong(1) == 1L))
    assert(cl.forall(_.getLong(2) == n))
    val curated = Curator.curate(spark, same).collect()
    assert(curated.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("astral Unicode text flows through hashing/dedup consistently") {
    val docs = mkDocs(Seq(
      (1L, "mathematical 𝒜𝒷𝒸 letters with 中文 and emoji 🎉 content here", "en"),
      (2L, "mathematical 𝒜𝒷𝒸 letters with 中文 and emoji 🎉 content here", "en"),
      (3L, "entirely different words in this one", "en")))
    val ex = Dedup.exact(docs, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    assert(ex.length == 1 && ex.head.getLong(1) == 1L && ex.head.getLong(2) == 2L)
    val cl = Dedup.dupClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(1L) == 1L && cl(2L) == 1L && cl(3L) == 3L)
  }

  test("d5 fingerprinting survives documents with fewer than 4 shingles") {
    val dir = java.nio.file.Files.createTempDirectory("graft_d5").toString
    mkDocs(Seq((1L, "tiny", "en"),
      (2L, "a somewhat longer document body so shingles exist here", "en")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("d5_fingerprint")(spark, dir).collect()
    val tiny = rows.find(_.getLong(0) == 1L).get
    assert(tiny.getLong(1) == 0 && tiny.isNullAt(2) && tiny.isNullAt(4))
    assert(rows.find(_.getLong(0) == 2L).get.getLong(1) > 0)
  }

  test("zero-norm vectors are excluded, not NaN-ranked") {
    val e = Seq(
      (1L, Array(1f, 0f), "a"), (2L, Array(0.9f, 0.1f), "a"),
      (3L, Array(0f, 0f), "a")) // zero vector
      .toDF("vec_id", "embedding", "label")
    val bf = Similarity.bruteForceTopK(e.filter(col("vec_id") === 1), e,
      "vec_id", "embedding", 5).collect()
    assert(bf.map(_.getLong(2)).toSet == Set(2L)) // 3 excluded, no NaN rank
    val nd = Similarity.nearDupPairs(e, "vec_id", "embedding", "label", 0.4)
    assert(nd.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("empty embedding set: brute-force and IVF return no rows") {
    val e = Seq.empty[(Long, Array[Float], String)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 5).count() == 0)
    assert(Similarity.ivfTopK(e, e, "vec_id", "embedding", 5).count() == 0)
  }
}
