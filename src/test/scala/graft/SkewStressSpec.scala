package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.functions._

import graft.dedup.{Curator, Dedup}
import graft.operators.SkewJoin

/** Adversarial scale-stress gate (VERDICT r3 §1): the skew defenses
  * — content-hash prededup, the maxBucket posting-list cap, salting
  * — demonstrated against hostile synthetic corpora rather than
  * argued. Companion evidence: ChunkedFoldSpec drives the 10^6-row
  * hot-sensor series through the chunked EWMA/CUSUM folds.
  *
  * Corpus sizes are test-scale; every assertion is on a
  * SIZE-INDEPENDENT property (pair counts bounded by the cap, not
  * the corpus; zero sort-fallback tasks; per-salt spread), so a
  * pass here is evidence about the shape, not about fitting in
  * memory at this particular n.
  */
class SkewStressSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTestBase._
  import spark.implicits._

  /** Execute `df` and assert every ObjectHashAggregate in the final
    * adaptive plan stayed hash-based (the Session fallback-threshold
    * invariant, checked on the operator's own metric).
    */
  private def assertHashAggNoFallback(df: DataFrame): Unit = {
    df.count()
    val aggs = collectWithSubqueries(df.queryExecution.executedPlan) {
      case o: ObjectHashAggregateExec => o
    }
    assert(aggs.nonEmpty, "expected ObjectHashAggregate in the plan")
    aggs.foreach { o =>
      assert(o.metrics("numTasksFallBacked").value == 0L,
        s"ObjectHashAggregate fell back to sort-based: $o")
    }
  }

  /** 5 000 exact copies of one document + 1 500 distinct documents
    * (30 of them forming 15 planted near-dup pairs). The worst case
    * for similarity keys: every copy collides on EVERY band.
    */
  private lazy val dupHeavy: DataFrame = {
    val mega = (0 until 5000).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog and then " +
        "proceeds to file a detailed incident report about the whole affair"))
    val distinct = (0 until 1500).map(i =>
      (5000L + i, s"document number $i talks about topic ${i % 37} in a " +
        s"moderately unique way with payload ${i * 2654435761L} and " +
        s"closing remark ${i % 97}"))
    // 15 near-dup pairs: single-word edits of documents 0..14
    val nearDups = (0 until 15).map(i =>
      (6500L + i, s"document number $i talks about topic ${i % 37} in a " +
        s"moderately unique way with payload ${i * 2654435761L} and " +
        s"closing remark ALTERED"))
    (mega ++ distinct ++ nearDups).toDF("doc_id", "text")
  }

  /** 3 000 documents sharing one long boilerplate prefix with a
    * short unique suffix — distinct content hashes (prededup can't
    * help), but the shared shingles drive many docs into the same
    * LSH band buckets.
    */
  private lazy val boilerplate: DataFrame =
    (0 until 3000).map(i =>
      (i.toLong, "this message is confidential and intended solely for the " +
        "use of the individual to whom it is addressed if you have " +
        "received this email in error please notify the sender and delete " +
        "all copies any unauthorized review disclosure or distribution is " +
        s"prohibited unique trailer $i")).toDF("doc_id", "text")

  test("dup-heavy corpus: prededup keeps copies out of every band bucket") {
    val pairs = Dedup.minhashVerifiedPairs(dupHeavy, "doc_id", "text")
      .select("d1", "d2").collect()
    // copies of the mega-doc (ids < 5000) are exact-dedup's job —
    // none of them may surface as near-dup candidates (only the one
    // representative, id 0, may appear)
    assert(pairs.forall(r =>
      (r.getLong(0) == 0L || r.getLong(0) >= 5000L) &&
        (r.getLong(1) == 0L || r.getLong(1) >= 5000L)),
      "exact copies leaked into near-dup candidate buckets")
    // the planted near-dup pairs are still found through the defense
    val planted = pairs.count(r => r.getLong(0) >= 5000L && r.getLong(1) >= 6500L)
    assert(planted >= 12, s"lost planted near-dups to the skew defense: $planted")
  }

  test("dup-heavy corpus: exact dedup contracts 5000 copies to one group") {
    val g = Dedup.exact(dupHeavy, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    assert(g.length == 1 && g.head.getAs[Long]("n_copies") == 5000L &&
      g.head.getAs[Long]("keeper_id") == 0L)
  }

  test("dup-heavy corpus: dupClusters contracts before the CC loop; copies share one cluster") {
    val clusters = Dedup.dupClusters(dupHeavy, "doc_id", "text")
    val mega = clusters.filter(col("doc_id") < 5000)
      .agg(countDistinct(col("cluster_id")).as("k"),
        max(col("csize")).as("sz")).head()
    assert(mega.getAs[Long]("k") == 1L, "copies split across clusters")
    assert(mega.getAs[Long]("sz") == 5000L)
    // each planted near-dup pair collapses into its original's cluster
    val planted = clusters.filter(col("doc_id") >= 6500)
      .join(clusters.select(col("doc_id").as("orig_id"),
        col("cluster_id").as("orig_cluster")),
        col("doc_id") - 1500L === col("orig_id"))
    assert(planted.filter(col("cluster_id") =!= col("orig_cluster")).count() == 0)
    spark.catalog.clearCache() // dupClusters retains persists by contract
  }

  test("boilerplate corpus: raw band buckets are hostile, capped pipeline stays bounded") {
    // evidence the corpus actually saturates banding: at least one
    // raw (uncapped) posting list far exceeds the 512 cap
    val rawMax = Dedup.lshBands(boilerplate, "doc_id", "text")
      .groupBy("band", "band_hash").count()
      .agg(max("count")).head().getLong(0)
    assert(rawMax > 512, s"corpus not hostile enough: max raw bucket $rawMax")
    // the defended pipeline completes with the pair count bounded by
    // the cap (per bucket: C(512,2) pairs max), not by the corpus
    val pairs = Dedup.minhashVerifiedPairs(boilerplate, "doc_id", "text")
    val n = pairs.count()
    assert(n <= 4L * 512L * 511L / 2L,
      s"pair expansion exceeded the per-bucket cap bound: $n")
  }

  test("boilerplate corpus: capped bucket aggregation executes hash-based (no sort fallback)") {
    val sigBands = Dedup.lshBands(boilerplate, "doc_id", "text")
      .groupBy("band", "band_hash")
      .agg(Dedup.cappedBucket(col("doc_id"), 512).as("ds"))
    assertHashAggNoFallback(sigBands)
    // and the capped list never exceeds its bound
    assert(sigBands.agg(max(size(col("ds")))).head().getInt(0) <= 512)
  }

  test("boilerplate corpus: simhash banding under the same defenses") {
    val pairs = Dedup.simhashPairs(boilerplate, "doc_id", "text")
    // completes, bounded; near-identical boilerplate docs legitimately
    // collide, but through capped buckets only
    assert(pairs.count() <= 4L * 512L * 511L / 2L)
    spark.catalog.clearCache() // simhashPairs retains its signature persist
  }

  test("dup-heavy corpus: curation pipeline survives and keeps one copy") {
    val curated = Curator.curate(spark, dupHeavy.withColumn("lang", lit("en")))
    val keptCopies = curated.filter(col("doc_id") < 5000).count()
    assert(keptCopies == 1L, s"curation kept $keptCopies of 5000 exact copies")
    spark.catalog.clearCache()
  }

  test("salted join spreads a hot key across salts near-uniformly") {
    val hot = spark.range(200000).select(lit(42L).as("k"),
      col("id").as("payload"))
    val cold = spark.range(8000).select((col("id") % 997).as("k"),
      col("id").as("payload"))
    val left = hot.unionByName(cold)
    val dim = spark.range(1000).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("attr"))
    // correctness first: salted result == plain join result
    val salted = SkewJoin.saltedJoin(left, dim, "k", saltFactor = 8)
    val plain = left.join(dim, "k")
    assert(salted.count() == plain.count())
    // the hot key's rows must spread over all 8 salts with no salt
    // holding a disproportionate share (deterministic xxhash spread)
    val spread = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(8)))
      .filter(col("k") === 42L)
      .groupBy("__salt").count().collect()
    assert(spread.length == 8, "hot key missing salts")
    val counts = spread.map(_.getLong(1))
    assert(counts.max <= 2L * counts.min,
      s"salt spread too skewed: ${counts.mkString(",")}")
  }

  test("hybrid skew join matches the plain join on a skewed corpus") {
    val left = spark.range(100000)
      .select(when(col("id") % 10 =!= 0, col("id") % 997).otherwise(7L).as("k"),
        col("id").as("payload"))
    val dim = spark.range(997).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("attr"))
    val hybrid = SkewJoin.hybridSkewJoin(left, dim, "k",
      saltFactor = 4, hotThreshold = 1000L)
    val plain = left.join(dim, "k")
    assert(hybrid.count() == plain.count())
    val ha = hybrid.groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val pa = plain.groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    assert(ha.exceptAll(pa).isEmpty && pa.exceptAll(ha).isEmpty)
  }
}
