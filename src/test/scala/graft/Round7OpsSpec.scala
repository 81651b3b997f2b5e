package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.TrainingDataQueries

/** Round-7 training-data operators: intra-doc repetition filtering
  * (d31), semantic dedup via seeded k-means clusters (d32), and
  * deterministic shard assignment (d33).
  */
class Round7OpsSpec extends AnyFunSuite {
  import SparkTestBase._

  test("d31 flags a pathologically repetitive document") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_d31").toString
    Seq(
      (0L, Seq.fill(40)("spam ham").mkString(" "), "en", "src0", 100L),
      (1L, (1 to 80).map(i => s"w$i").mkString(" "), "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TrainingDataQueries.d31(spark, dir)
      .select("doc_id", "dup3_pm", "top2_pm", "rep_ok")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(0L).getBoolean(3), "repeated 2-token phrase must be flagged")
    // "spam ham spam ham ...": every 3-gram repeats, and the top
    // 2-gram ("spam ham") covers half the token positions
    assert(out(0L).getLong(1) > 9000)
    assert(out(0L).getLong(2) > 5000)
    assert(out(1L).getBoolean(3), "all-distinct tokens must pass")
    assert(out(1L).getLong(1) == 0L)
  }

  test("d31 agrees with a brute-force local recount") {
    val out = TrainingDataQueries.d31(spark, sf)
      .select("doc_id", "dup2_pm").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, dup2) =>
      val toks = docs(id).trim.toLowerCase.split("\\s+").toSeq
      val g2 = toks.sliding(2).map(_.mkString(" ")).toSeq
      assert(dup2 == (g2.size - g2.distinct.size) * 10000 / g2.size,
        s"doc $id")
    }
  }

  test("d32 output is a consistent dedup assignment") {
    val rows = TrainingDataQueries.d32(spark, sf)
      .select("vec_id", "cluster_id", "keeper_id", "is_dup").collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.length == n, "every nonzero vector gets a verdict")
    val cluster = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (id, keeper, dup) = (r.getLong(0), r.getLong(2), r.getBoolean(3))
      if (dup) {
        assert(keeper < id, s"keeper must be a lower id: $id -> $keeper")
        assert(cluster(keeper) == cluster(id),
          s"keeper of $id must share its cluster")
      } else assert(keeper == id)
    }
    assert(rows.map(_.getLong(1)).distinct.length <=
      TrainingDataQueries.semdedupK(n), "at most the adaptive k clusters")
  }

  test("d32 extra Lloyd iterations keep a valid assignment; characterize the delta") {
    // SemDeDup proper iterates k-means to convergence; the exact-
    // BIGINT step is iteration-safe, so iters=2 must still produce a
    // consistent verdict for every vector. The dup-detection delta
    // (refined centroids re-block some boundary pairs) is reported,
    // not asserted — it is corpus-dependent by nature.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def run(iters: Int) = {
      val out = TrainingDataQueries.semanticDedupImpl(emb, iters = iters)
        .select("vec_id", "keeper_id", "is_dup").collect()
      spark.catalog.clearCache()
      out
    }
    val one = run(1)
    val two = run(2)
    assert(two.length == one.length, "every vector keeps a verdict at iters=2")
    two.foreach { r =>
      if (r.getBoolean(2)) assert(r.getLong(1) < r.getLong(0))
      else assert(r.getLong(1) == r.getLong(0))
    }
    val d1 = one.count(_.getBoolean(2)); val d2 = two.count(_.getBoolean(2))
    info(s"dup detections: iters=1 -> $d1, iters=2 -> $d2 (N=${one.length})")
    // the knob must reject nonsense
    intercept[IllegalArgumentException] {
      TrainingDataQueries.semanticDedupImpl(emb, iters = 0)
    }
  }

  test("d32 duplicates really exceed the cosine threshold") {
    val sim = graft.similarity.Similarity
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000).cast("long") / lit(1000.0))
          .as("e"))
    val dups = TrainingDataQueries.d32(spark, sf).filter(col("is_dup"))
      .select(col("vec_id"), col("keeper_id"))
      .join(e.select(col("vec_id"), col("e").as("e1")), "vec_id")
      .join(e.select(col("vec_id").as("keeper_id"), col("e").as("e2")),
        "keeper_id")
      .withColumn("cos",
        sim.dot(col("e1"), col("e2")) / (sim.norm2(col("e1")) * sim.norm2(col("e2"))))
    assert(dups.filter(col("cos") < 0.4).count() == 0)
  }

  test("d31/d32/d33 degrade to zero rows on an empty corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r7e").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Array[Float], Long)]
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(TrainingDataQueries.d31(spark, dir).count() == 0)
    assert(TrainingDataQueries.d32(spark, dir).count() == 0)
    assert(TrainingDataQueries.d33(spark, dir).count() == 0)
  }

  test("d32 drops zero-norm vectors instead of dividing by zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r7z").toString
    val vecs = Seq(
      (0L, Array.fill(64)(0.0f), 0L),
      (1L, Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f), 0L),
      (2L, Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f), 0L))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = TrainingDataQueries.d32(spark, dir)
      .orderBy("vec_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "the zero vector must be excluded, not NaN-compared")
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getBoolean(3) && r2.getLong(2) == 1L,
      "identical unit vectors are semantic duplicates")
  }

  test("d32 is bounded and exact on a fully-degenerate corpus") {
    import spark.implicits._
    // 600 identical vectors collapse into one cluster — beyond the
    // 512 candidate cap, so this exercises the capped pair join:
    // every member must still pair with the min id (rank 1 is always
    // inside the cap), never all-pairs.
    val dir = java.nio.file.Files.createTempDirectory("graft_r7d").toString
    (0L until 600L).map(i => (i, Array.tabulate(64)(d => (d + 1) * 0.1f), 0L))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = TrainingDataQueries.d32(spark, dir).collect()
    assert(out.length == 600)
    out.foreach { r =>
      val (id, keeper, dup) = (r.getLong(0), r.getLong(2), r.getBoolean(3))
      if (id == 0L) assert(!dup && keeper == 0L)
      else assert(dup && keeper == 0L, s"vec $id must dedup to 0")
    }
  }

  test("semdedupK scales with sqrt(N) inside broadcast-safe bounds") {
    val k = TrainingDataQueries.semdedupK _
    assert(k(0) == 8 && k(100) == 10 && k(10000) == 100)
    assert(k(1L << 40) == 65536, "ceiling bounds the broadcast table")
    val pts = Seq(1L, 500L, 2000L, 20000L, 1000000L, 1L << 40)
    assert(pts.map(k) == pts.map(k).sorted, "k must be monotone in N")
  }

  test("semdedupCap scales past the fixed-512 boundary, stays join-bounded") {
    val c = TrainingDataQueries.semdedupCap _
    // fixed floor while 2*sqrt(N) fits under it
    assert(c(0) == 512 && c(2000) == 512 && c(65536) == 512)
    // past the floor: 2 * ceil(sqrt(N)) — at the r8 gate's 200k
    // vectors this is 896, a ~1.7x margin over the measured max
    // cluster (531) that the old fixed 512 was silently under
    assert(c(65537) > 512)
    assert(c(200000) == 896)
    assert(c(200000) > 531, "must cover the measured 100x-gate max cluster")
    assert(c(1L << 62) == 65536, "ceiling matches semdedupK's")
    val pts = Seq(1L, 65536L, 200000L, 1000000L, 1L << 40)
    assert(pts.map(c) == pts.map(c).sorted, "cap must be monotone in N")
  }

  test("d32 candidate cap's recall bound: pairs past the cap are missed, raising cap recovers them") {
    import spark.implicits._
    // The documented bound (scaladoc on semanticDedupImpl): dups are
    // only detected against the `cap` lowest ids of a cluster. Build
    // the adversarial witness — 512 mutually-orthogonal background
    // vectors (ids 0..511) plus a true duplicate pair at ids
    // 512/513 — and force one cluster (k=1) so the pair ranks past
    // the cap on BOTH sides.
    def oneHot(pos: Int): Array[Float] =
      Array.tabulate(600)(d => if (d == pos) 1.0f else 0.0f)
    val rows = (0L until 512L).map(i => (i, oneHot(i.toInt), 0L)) ++
      Seq((512L, oneHot(599), 0L), (513L, oneHot(599), 0L))
    val df = rows.toDF("vec_id", "embedding", "label")
    val capped = TrainingDataQueries.semanticDedupImpl(df, k = 1, cap = 512)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(!capped(512L) && !capped(513L),
      "both members past the cap: the pair is (by design) never compared")
    assert((0L until 512L).forall(i => !capped(i)),
      "orthogonal backgrounds are not dups")
    // the bound is the cap, not the algorithm: a cap covering the
    // cluster finds the pair again
    val uncapped = TrainingDataQueries.semanticDedupImpl(df, k = 1, cap = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
      .map(t => t._1 -> t).toMap
    assert(!uncapped(512L)._3 && uncapped(513L)._3 &&
      uncapped(513L)._2 == 512L)
    // (On real corpora the adaptive k — not the cap — is the lever:
    // expected cluster size √N stays under the cap until N ~ 260k,
    // per the semdedupK scaladoc. This witness corpus is mutually
    // orthogonal, so no k can split it into meaningful clusters —
    // every assignment ties at cosine 0 and collapses to one
    // cluster, which is exactly why it exhibits the worst case.)
  }

  test("d33 positions are dense ranks within stable shards") {
    val out = TrainingDataQueries.d33(spark, sf).cache()
    try {
      val n = spark.read.parquet(s"$sf/documents.parquet").count()
      assert(out.count() == n)
      assert(out.filter(col("shard") < 0 || col("shard") >= 64).count() == 0)
      // dense 1..count positions per shard
      val bad = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
          min(col("pos")).as("mn"), countDistinct(col("pos")).as("nd"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1 ||
          col("nd") =!= col("n"))
      assert(bad.count() == 0, "positions must be a dense 1..n per shard")
      // deterministic: a second run is byte-identical
      val again = TrainingDataQueries.d33(spark, sf)
      assert(out.exceptAll(again).count() == 0 &&
        again.exceptAll(out).count() == 0)
    } finally out.unpersist()
  }
}
