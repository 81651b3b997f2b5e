package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sampling.Dsir

/** Data-selection and quality-filter contracts: DSIR importance
  * weighting (d52), CDC chunk dedup (d53), containment (d54), the
  * streaming decontamination gate (c29), CCNet perplexity tiers
  * (d59), the Gopher/C4 batteries (d62/d63), line dedup (d64), and
  * the composed web-cleaning recipe (d67).
  */
class DataSelectionSpec extends AnyFunSuite {
  import SparkTestBase._

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (id, text, lang) =>
      (id, text, lang, "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // ---- d52_dsir_select ---------------------------------------------

  test("d52: Spark `div` truncates toward zero, matching the oracle's `//`") {
    // the weight can be negative; a floor-vs-trunc mismatch between
    // engines would silently shift every negative wpt_pm by one
    val r = spark.sql(
      "SELECT CAST(-5 div 2 AS BIGINT) AS a, CAST(5 div 2 AS BIGINT) AS b, " +
        "CAST(-5 % 2 AS BIGINT) AS c").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((-2L, 2L, -1L)),
      "DuckDB gives (-2, 2, -1); both engines must truncate")
  }

  test("d52: weights separate target-dialect docs from raw-only docs") {
    // two disjoint dialects; target = dialect A. Every A bigram
    // bucket has ct ~ cr (s > 0 after normalization), every B bucket
    // has ct = 0 (s < 0) — weights must split by sign.
    val a = (0L until 30L).map(i =>
      (i, (0 until 20).map(j => s"al${(i + j) % 7}").mkString(" "), "en"))
    val b = (30L until 60L).map(i =>
      (i, (0 until 20).map(j => s"be${(i + j) % 7}").mkString(" "), "de"))
    val w = Dsir.importanceWeights(docsDf(a ++ b), "doc_id", "text",
      isTarget = col("lang") === "en", buckets = 251)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val aMin = a.map(x => w(x._1)).min
    val bMax = b.map(x => w(x._1)).max
    // every target doc outweighs every raw-only doc (bucket
    // collisions may pull an individual A doc toward 0, never below
    // the B dialect whose buckets all carry ct = 0)
    assert(aMin > bMax,
      s"min target weight $aMin must exceed max raw-only weight $bMax")
    assert(bMax < 0, s"raw-only docs must score negative, got $bMax")
  }

  test("d52: a power-of-two bucket modulus collapses structured dialects; the prime default cannot") {
    import graft.functions.TextHash
    // base-31 folds: swapping 'al' -> 'be' shifts every gram hash by
    // δ·31^k, and δ·(31+1) carries a 2^5 factor — so % 256 maps the
    // two DISJOINT dialects onto identical buckets (zero signal),
    // which is why Dsir.DefaultBuckets is prime
    val aG = TextHash.wordGramHashesStr("al0 al1 al2 al3 al4", 2, distinct = false)
    val bG = TextHash.wordGramHashesStr("be0 be1 be2 be3 be4", 2, distinct = false)
    assert(aG.map(_ % 256).toSet == bG.map(_ % 256).toSet,
      "the resonance this guards against must actually exist at 2^k")
    assert(aG.map(_ % 251).toSet.intersect(bG.map(_ % 251).toSet).isEmpty,
      "a prime modulus must keep the disjoint dialects apart")
  }

  test("d52: the scoring pass is map-side — no exchange in the per-doc plan") {
    val d = spark.read.parquet(s"${SparkTestBase.sf}/documents.parquet")
    val out = Dsir.importanceWeights(d, "doc_id", "text",
      isTarget = col("lang") === "en")
    val p = out.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"),
      "pass 2 must be scan -> project against the score literal: " +
        "no explode, no join, no shuffle")
  }

  test("d52: documents with < 2 tokens get n_grams 0 and NULL selection") {
    val w = Dsir.importanceWeights(
      docsDf(Seq((1L, "solo", "en"), (2L, "two tokens here", "en"))),
      "doc_id", "text", isTarget = col("lang") === "en", buckets = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.isNullAt(3), r.isNullAt(4)))).toMap
    assert(w(1L) == ((0L, 0L, true, true)),
      s"a bigram-less doc must be (0, 0, NULL, NULL), got ${w(1L)}")
    assert(w(2L)._1 == 2L && !w(2L)._3,
      "a 3-token doc has 2 bigrams and a concrete wpt_pm")
  }

  // ---- d53_cdc_chunks ----------------------------------------------

  // ---- d62_gopher_rules / d63_c4_filters ---------------------------

  private def gopherRows(rows: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_gq_").toString
    docsDf(rows.map { case (id, t) => (id, t, "en") })
      .write.parquet(s"$dir/documents.parquet")
    graft.queries.TrainingDataQueries.queries("d62_gopher_rules")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("d62: each Gopher rule fires alone and is attributed to its own flag") {
    def words(n: Int, w: Int => String) = (0 until n).map(w).mkString(" ")
    val clean = "the and " + words(58, i => s"word$i")
    val tooShort = "the and " + words(8, i => s"word$i")
    val thinWords = "the and " + words(58, _ => "ab")
    val symbolic = "the and " + words(48, i => s"word$i") + " " +
      words(10, i => s"tag#$i")
    val numeric = "the and " + words(38, i => s"word$i") + " " +
      words(20, i => s"${i}00")
    val noStops = words(60, i => s"zq${i}word")
    val out = gopherRows(Seq(1L -> clean, 2L -> tooShort, 3L -> thinWords,
      4L -> symbolic, 5L -> numeric, 6L -> noStops))
    def flags(id: Long) = (6 to 11).map(out(id).getBoolean) // r_wc..keep
    assert(flags(1L) == Seq(true, true, true, true, true, true), s"clean: ${flags(1L)}")
    assert(flags(2L) == Seq(false, true, true, true, true, false))
    assert(flags(3L) == Seq(true, false, true, true, true, false))
    assert(flags(4L) == Seq(true, true, false, true, true, false))
    assert(flags(5L) == Seq(true, true, true, false, true, false))
    assert(flags(6L) == Seq(true, true, true, true, false, false))
  }

  test("d62: the word-count bound is exact at 50") {
    def doc(n: Int) = "the and " + (0 until n - 2).map(i => s"word$i").mkString(" ")
    val out = gopherRows(Seq(1L -> doc(50), 2L -> doc(49)))
    assert(out(1L).getBoolean(6), "50 words is in range")
    assert(!out(2L).getBoolean(6), "49 words is not")
  }

  test("d63: C4 line retention, sentence floor, and page-level drops") {
    val multi = Seq(
      "A good first sentence.",       // kept
      "no terminal punctuation here", // dropped
      "Enable javascript to view.",   // dropped: javascript
      "Another fine one!",            // kept
      "And a third?"                  // kept
    ).mkString("\n")
    val docLines = docsDf(Seq(
      (1L, multi, "en"),
      (2L, "Lorem ipsum dolor sit. Second one. Third here.", "en"),
      (3L, "Code page { body }. Second one. Third here.", "en"),
      (4L, "One sentence only.", "en")
    )).select(col("doc_id"), split(col("text"), "\n").as("lines"))
    val out = graft.queries.TrainingDataQueries.c4Filters(docLines)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 5L && out(1L).getLong(2) == 3L,
      s"3 of 5 lines retained, got ${out(1L)}")
    assert(out(1L).getBoolean(7), "the multi-line page keeps")
    assert(out(2L).getBoolean(4) && !out(2L).getBoolean(7),
      "lorem ipsum drops the page")
    assert(out(3L).getBoolean(5) && !out(3L).getBoolean(7),
      "a curly brace drops the page")
    assert(!out(4L).getBoolean(6) && !out(4L).getBoolean(7),
      "fewer than 3 sentences drops the page")
  }

  test("d64: a banner line shared by >= 5 docs flags; rarer lines and blanks don't") {
    val banner = "Subscribe to our newsletter today."
    val rows = (0L until 6L).map(i =>
        (i, s"Unique body $i text.\n\n  $banner  ", "en")) ++
      Seq((10L, "Entirely alone here.", "en")) ++
      (20L until 24L).map(i => (i, s"Body $i.\nRare shared line", "en"))
    val docLines = docsDf(rows)
      .select(col("doc_id"), split(col("text"), "\n").as("lines"))
    val out = graft.queries.TrainingDataQueries
      .lineDedupReport(docLines, minDf = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (0L until 6L).foreach { i =>
      val (n, dup, pm) = out(i)
      assert(n == 2L, s"blank line must not count: doc $i has $n lines")
      assert(dup == 1L, s"the banner (df=6, trimmed) must flag in doc $i")
      val expectPm = banner.length * 1000L /
        (banner.length + s"Unique body $i text.".length)
      assert(pm == expectPm, s"doc $i dup_pm $pm != $expectPm")
    }
    assert(out(10L) == ((1L, 0L, 0L)), "a singleton doc has no dup lines")
    (20L until 24L).foreach { i =>
      assert(out(i)._2 == 0L, s"df=4 line must NOT flag (doc $i)")
    }
  }

  test("d62/d63/d64: every keep/flag branch fires on the driver corpus (the c28 rule)") {
    import graft.queries.TrainingDataQueries
    val dir = SparkTestBase.sf
    def keeps(key: String) = TrainingDataQueries.queries(key)(spark, dir)
      .select("keep").collect().map(_.getBoolean(0)).toSet
    assert(keeps("d62_gopher_rules") == Set(true, false),
      "Gopher battery must keep some docs and drop some at every SF")
    assert(keeps("d63_c4_filters") == Set(true, false),
      "C4 battery must keep some docs and drop some at every SF")
    val dup = TrainingDataQueries.queries("d64_line_dedup")(spark, dir)
      .select("dup_lines").collect().map(_.getLong(0))
    assert(dup.exists(_ > 0) && dup.contains(0L),
      "line dedup must flag the injected banner and leave unique docs clean")
  }

  // ---- d67_web_recipe ----------------------------------------------

  test("d67: fate equals first failing stage; multiple fates fire on the driver corpus") {
    import graft.queries.TrainingDataQueries
    val rows = TrainingDataQueries.queries("d67_web_recipe")(
        spark, SparkTestBase.sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getString(5)))
    rows.foreach { case (id, c4, gop, ppl, dup, fate) =>
      val want = if (!c4) "c4" else if (!gop) "gopher"
        else if (!ppl) "ppl_tail" else if (!dup) "exact_dup" else "kept"
      assert(fate == want, s"doc $id: $fate != $want")
    }
    val fates = rows.map(_._6).toSet
    assert(Set("kept").subsetOf(fates) && fates.size >= 3,
      s"the driver corpus must exercise several fates, got $fates")
  }

  test("d67: an exact duplicate that survives every filter gets fate exact_dup, keeper kept") {
    import graft.queries.TrainingDataQueries
    val dir = java.nio.file.Files.createTempDirectory("graft_wr_").toString
    // reference-vocabulary 60-word text (passes gopher; webify gives
    // it 5 sentence-lines -> passes c4; lowest LM cost -> head tier)
    val good = "the a " + (0 until 58).map(i => s"wr${i % 9}tok").mkString(" ")
    val alien = (0 until 58).map(i => s"zz${i}q$i").mkString(" ") + " the a"
    // ids ≡ 3 (mod 4): no page-drop tail from the webify injection
    val rows = Seq(3L -> good, 103L -> good, 7L -> alien, 11L -> alien,
      15L -> alien, 19L -> alien)
    docsDf(rows.map { case (id, t) =>
      (id, t, if (id == 3L || id == 103L) "en" else "de") })
      .write.parquet(s"$dir/documents.parquet")
    val out = TrainingDataQueries.queries("d67_web_recipe")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out(3L) == "kept", s"keeper must survive, got ${out(3L)}")
    assert(out(103L) == "exact_dup",
      s"the copy must attribute to dedup, got ${out(103L)}")
  }

  test("d67: keeper is chosen among filter SURVIVORS — a dup group whose " +
      "min-id copy fails a filter still keeps one copy") {
    import graft.queries.TrainingDataQueries
    val dir = java.nio.file.Files.createTempDirectory("graft_wr2_").toString
    val good = "the a " + (0 until 58).map(i => s"wr${i % 9}tok").mkString(" ")
    val alien = (0 until 58).map(i => s"zz${i}q$i").mkString(" ") + " the a"
    // doc 2 (%4=2) gets the '{' boilerplate tail injected -> fails c4;
    // doc 103 (%4=3, %3=1) gets no injection -> survives every stage.
    // RefinedWeb order (dedup on filter output) demands 103 is KEPT;
    // a whole-corpus min-id keeper would mislabel it exact_dup and
    // the group would lose every copy.
    val rows = Seq(2L -> good, 103L -> good, 7L -> alien, 11L -> alien,
      15L -> alien, 19L -> alien)
    docsDf(rows.map { case (id, t) =>
      (id, t, if (id == 2L || id == 103L) "en" else "de") })
      .write.parquet(s"$dir/documents.parquet")
    val out = TrainingDataQueries.queries("d67_web_recipe")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out(2L) == "c4", s"injected-brace copy must fail c4, got ${out(2L)}")
    assert(out(103L) == "kept",
      s"surviving copy must be the keeper, got ${out(103L)}")
  }

  // ---- d59_ppl_tiers -----------------------------------------------

  test("d59: reference-like docs tier head, mixed docs middle, alien docs tail") {
    import graft.sampling.Perplexity
    // three score plateaus: X = pure reference vocabulary (low NLL),
    // Y = half reference / half alien, Z = pure alien (every bigram
    // bucket empty in the reference LM -> the max smoothed cost)
    val x = (0L until 20L).map(i => (i, "xa xb xc xd xe xa xb xc xd xe", "en"))
    val y = (20L until 40L).map(i => (i, "xa xb yq yr xa xb yq yr", "de"))
    val z = (40L until 60L).map(i => (i, "za zb zc zd za zb zc zd", "de"))
    val out = Perplexity.tiers(docsDf(x ++ y ++ z), "doc_id", "text",
      isRef = col("lang") === "en", buckets = 251)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    val (cx, cy, cz) = (out(0L)._1, out(20L)._1, out(40L)._1)
    assert(cx < cy && cy < cz,
      s"per-gram cost must order ref < mixed < alien, got $cx $cy $cz")
    x.foreach(d => assert(out(d._1)._2 == 1L, s"doc ${d._1} not head"))
    y.foreach(d => assert(out(d._1)._2 == 2L, s"doc ${d._1} not middle"))
    z.foreach(d => assert(out(d._1)._2 == 3L, s"doc ${d._1} not tail"))
  }

  test("d59: documents with < 2 tokens get NULL cpt_pm and NULL tier") {
    import graft.sampling.Perplexity
    val out = Perplexity.tiers(
      docsDf(Seq((1L, "solo", "en"), (2L, "a b c d", "en"),
        (3L, "e f g h", "en"), (4L, "i j k l", "en"))),
      "doc_id", "text", isRef = col("lang") === "en", buckets = 251)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 0L)
    assert(out(1L).isNullAt(3) && out(1L).isNullAt(4),
      "a doc with no bigrams has no perplexity and no tier")
    assert((2L to 4L).forall(i => !out(i).isNullAt(4)))
  }

  test("d59: with all-distinct scores the tiers are exact thirds") {
    import graft.sampling.Perplexity
    // alien fraction rises with id -> strictly increasing NLL
    val docs = (0L until 9L).map { i =>
      val ref = (0 until (18 - i.toInt * 2)).map(j => s"r${j % 5}")
      val alien = (0 until (i.toInt * 2)).map(j => s"q${i}_$j")
      (i, (ref ++ alien).mkString(" "), if (i == 0) "en" else "de")
    }
    val rows = Perplexity.tiers(docsDf(docs), "doc_id", "text",
      isRef = col("lang") === "en", buckets = 251)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._2).distinct.length == 9, "scores must be distinct")
    val byTier = rows.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    assert(byTier(1L).size == 3 && byTier(2L).size == 3 && byTier(3L).size == 3,
      s"distinct scores must split 3/3/3, got $byTier")
    assert(byTier(1L) == rows.sortBy(_._2).take(3).map(_._1).toSet,
      "the head tier must hold the three lowest-cost docs")
  }

  test("d53: chunks partition each document's token stream exactly") {
    val d = spark.read.parquet(s"${SparkTestBase.sf}/documents.parquet")
    val perDoc = Dedup.cdcChunks(d, "doc_id", "text")
      .groupBy("doc_id")
      .agg(sum(col("chunk_len")).as("toks"),
        count(lit(1)).as("n"), min(col("idx")).as("lo"),
        max(col("idx")).as("hi"))
    val toks = d.select(col("doc_id"),
      size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("nt"))
    val bad = perDoc.join(toks, "doc_id")
      .filter(col("toks") =!= col("nt") || col("lo") =!= 1 ||
        col("hi") =!= col("n"))
      .count()
    assert(bad == 0, s"$bad documents have non-partitioning chunks")
  }

  test("d53: a head insertion re-aligns every later chunk (the CDC property)") {
    val base = (0 until 200).map(i => s"tok${i * 37 % 101}x$i").mkString(" ")
    val chunks = Dedup.cdcChunks(
      docsDf(Seq((1L, base, "en"), (2L, s"inserted $base", "en"))),
      "doc_id", "text")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getLong(3), r.getLong(4), r.getLong(2))).toSet }
    val nA = chunks(1L).size
    assert(nA >= 5, s"setup must produce several chunks, got $nA")
    val shared = (chunks(1L) intersect chunks(2L)).size
    assert(shared >= nA - 1,
      s"CDC must re-align after the touched window: $shared of $nA " +
        "chunks shared (a fixed-stride chunker would share 0)")
  }

  test("d53: empty and single-token documents chunk totally") {
    val rows = Dedup.cdcChunks(
      docsDf(Seq((1L, "", "en"), (2L, "solo", "en"))), "doc_id", "text")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // "" still splits to one empty token under \s+ (the engine-wide
    // tokenization rule) -> one chunk of length 1; "solo" likewise
    assert(rows.forall(_._3 >= 1) && rows.map(_._1) == Set(1L, 2L),
      s"got $rows")
  }

  test("d53: chunking is map-side — no exchange before the chunk-key agg") {
    val d = spark.read.parquet(s"${SparkTestBase.sf}/documents.parquet")
    val p = Dedup.cdcChunks(d, "doc_id", "text")
      .queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"),
      "boundaries, slices and folds must run inside the scan's " +
        "project; only chunk summaries may shuffle (in the consumer)")
  }

  // ---- d54_containment ---------------------------------------------

  test("d54: containment catches the snippet that Jaccard structurally misses") {
    // 600-token article + a 40-token excerpt: J ~= 38/598 < the d6
    // threshold, C = 1.0 — exactly the quote/boilerplate class
    val words = (0 until 600).map(i => s"w${i * 13 % 887}q$i")
    val article = words.mkString(" ")
    val snippet = words.slice(200, 240).mkString(" ")
    val filler = (0 until 50).map(i => s"zz$i yy$i xx$i").mkString(" ")
    val out = Dedup.containmentPairs(
      docsDf(Seq((1L, article, "en"), (2L, snippet, "en"),
        (3L, filler, "en"))),
      "doc_id", "text").collect()
    assert(out.length == 1, s"exactly the (snippet, article) pair: " +
      out.map(_.toSeq).mkString(";"))
    val r = out.head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L,
      "orientation must be small-side-first")
    assert(r.getLong(5) == 1000L,
      s"a verbatim excerpt is 1000‰ contained, got ${r.getLong(5)}")
    // and the pair is invisible to symmetric Jaccard at d6's floor
    val jacPm = r.getLong(4) * 1000 /
      (r.getLong(2) + r.getLong(3) - r.getLong(4))
    assert(jacPm < 100, s"setup must be sub-Jaccard-threshold, got $jacPm")
  }

  test("d54: bounded candidates equal the naive all-pairs containment on sf0.001") {
    import graft.functions.TextHash
    val d = spark.read.parquet(s"${SparkTestBase.sf}/documents.parquet")
    val grams = d.select(col("doc_id"),
      array_sort(TextHash.word_gram_hashes(col("text"), 3, distinct = true))
        .as("gs"))
      .filter(size(col("gs")) >= 1)
    val eg = grams.select(col("doc_id"), explode(col("gs")).as("g"))
    val rare = eg.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 20).select("g")
    val cand = eg.join(rare, "g").select(col("doc_id").as("d1"), col("g"))
      .join(eg.join(rare, "g").select(col("doc_id").as("d2"), col("g")), "g")
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("d1", "d2")
    val expected = cand
      .join(grams.select(col("doc_id").as("d1"), col("gs").as("gs1")), "d1")
      .join(grams.select(col("doc_id").as("d2"), col("gs").as("gs2")), "d2")
      .select(
        when(size(col("gs1")) <= size(col("gs2")), col("d1"))
          .otherwise(col("d2")).as("small_id"),
        when(size(col("gs1")) <= size(col("gs2")), col("d2"))
          .otherwise(col("d1")).as("big_id"),
        TextHash.sorted_intersect_count(col("gs1"), col("gs2")).as("shared"),
        least(size(col("gs1")), size(col("gs2"))).cast("long").as("n_small"))
      .withColumn("cont_pm", expr("shared * 1000 div n_small"))
      .filter(col("cont_pm") >= 800)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.containmentPairs(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"bounded-candidate result must equal the naive replay")
  }

  // ---- c29_stream_decontam -----------------------------------------

  test("c29 equals its batch bloom-free replay (stream + bloom change nothing)") {
    import graft.functions.TextHash
    val dir = SparkTestBase.sf
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("bucket",
        pmod(TextHash.poly_hash(concat(col("text"), lit("|split"))), lit(1000)))
    def grams(d: org.apache.spark.sql.DataFrame, idCol: String) = d.select(
      col("doc_id").as(idCol),
      explode(TextHash.word_gram_hashes(col("text"), 5, distinct = true)).as("g"))
    val testG = grams(base.filter(col("bucket") >= 950), "test_id")
    val expected = grams(base.filter(col("bucket") < 900), "train_id")
      .join(testG, "g")
      .groupBy("train_id", "test_id").agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = SparkEntry.queries("c29_stream_decontam")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "sf0.001 must exercise at least one contaminated pair")
  }
}
