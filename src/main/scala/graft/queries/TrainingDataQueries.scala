package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import QueryUtil._

/** Group D — training-data pipeline operators (SURVEY §2.D): dedup,
  * text analysis, similarity search over `documents`/`embeddings`.
  *
  * Hash-based operators share the [[TextHash]] arithmetic with
  * their DuckDB oracles (base-31 polynomial mod 1e9+7 over char
  * codes), so even MinHash/SimHash signatures are hash-checkable,
  * not just row-count-checkable.
  */
object TrainingDataQueries {

  // Spread across cores: every D-query runs CPU-heavy per-row
  // kernels (shingles, signatures, regex) and the single-row-group
  // test files would otherwise pin them to one task.
  private def docs(s: SparkSession, dir: String): DataFrame =
    spread(t(s, dir, "documents"))

  /** DuckDB fragment: base-31 poly hash of a string expression —
    * the oracle twin of [[graft.functions.PolyHash]].
    */
  private def duckHash(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, length($e)+1),
       |    ch_i -> CAST(unicode($e[ch_i]) AS BIGINT))),
       |  (ch_a, ch_x) -> (ch_a*31 + ch_x) % 1000000007)""".stripMargin

  /** DuckDB fragment: k-char shingle hashes of a string expression —
    * the oracle twin of [[graft.functions.ShingleHashes]].
    */
  private def duckShingles(e: String, k: Int): String =
    s"""list_transform(range(1, length($e)-${k}+2),
       |  sh_i -> ${duckHash(s"substr($e, sh_i, $k)")})""".stripMargin

  private val norm: Column = lower(trim(col("text")))
  private val duckNorm = "lower(trim(text))"

  /** D1 — exact dedup: normalized-content hash groups; keep the
    * minimum doc id as canonical, count members. The key is a
    * 128-bit MD5 of the normalized text (not the 30-bit poly hash —
    * birthday collisions on a ~2^30 key would silently merge
    * unrelated documents at corpus scale), so this is one
    * hash-partitioned aggregation with no text-comparison shuffle
    * and a negligible collision probability at any realistic size.
    */
  def d1(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("content_hash", graft.dedup.Dedup.contentHash(col("text")))
      .groupBy("content_hash")
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  val d1Sql: String =
    """SELECT md5(lower(trim(text))) AS content_hash,
      |       min(doc_id) AS keeper_id, count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** D2 — token counting: whitespace tokens, a BPE-ish regex token
    * count (letter runs / digit runs / single punctuation), and
    * char length.
    */
  private val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def d2(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit(bpePattern)).cast("long").as("bpe_tokens"),
      length(col("text")).cast("long").as("n_chars_actual"),
      (length(col("text")) === col("n_chars")).as("len_matches"))

  val d2Sql: String =
    """SELECT doc_id,
      |  len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars_actual,
      |  length(text) = n_chars AS len_matches
      |FROM documents""".stripMargin

  /** D3 — quality scoring: lexical-diversity / stopword / alpha
    * ratios as exact per-mille integers (no float division, so the
    * quality gate decision is engine-stable).
    */
  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  def d3(s: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    docs(s, dir)
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stop",
        size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*))).cast("long"))
      .withColumn("n_alpha", regexp_count(col("text"), lit("[A-Za-z]")).cast("long"))
      .select(
        col("doc_id"), col("n_tokens"),
        expr("n_distinct * 10000 div n_tokens").as("distinct_pm"),
        expr("n_stop * 10000 div n_tokens").as("stop_pm"),
        expr("n_alpha * 10000 div length(text)").as("alpha_pm"),
        (expr("n_distinct * 10000 div n_tokens") > 3000 &&
          expr("n_stop * 10000 div n_tokens") < 4000).as("quality_ok"))
  }

  val d3Sql: String =
    """WITH m AS (
      |  SELECT doc_id, text,
      |    len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens,
      |    len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS n_distinct,
      |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |        t -> list_contains(['the','a','of','and','to','in'], t))) AS n_stop,
      |    len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
      |  FROM documents)
      |SELECT doc_id, n_tokens,
      |  n_distinct * 10000 // n_tokens AS distinct_pm,
      |  n_stop * 10000 // n_tokens AS stop_pm,
      |  n_alpha * 10000 // length(text) AS alpha_pm,
      |  (n_distinct * 10000 // n_tokens) > 3000
      |    AND (n_stop * 10000 // n_tokens) < 4000 AS quality_ok
      |FROM m""".stripMargin

  /** D4 — language-ID heuristic: stopword-lexicon hit counts with a
    * deterministic argmax tie-break order (en > es > de).
    */
  private val lex = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "das", "und"))

  def d4(s: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    def hits(ws: Seq[String]): Column =
      size(filter(toks, t => t.isin(ws.map(lit(_)): _*))).cast("long")
    docs(s, dir)
      .withColumn("h_en", hits(lex("en")))
      .withColumn("h_es", hits(lex("es")))
      .withColumn("h_de", hits(lex("de")))
      .select(col("doc_id"), col("h_en"), col("h_es"), col("h_de"),
        when(col("h_en") >= col("h_es") && col("h_en") >= col("h_de"), "en")
          .when(col("h_es") >= col("h_de"), "es")
          .otherwise("de").as("predicted"),
        (when(col("h_en") >= col("h_es") && col("h_en") >= col("h_de"), "en")
          .when(col("h_es") >= col("h_de"), "es")
          .otherwise("de") === col("lang")).as("agrees_with_label"))
  }

  val d4Sql: String =
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |        t -> list_contains(['the','a','of','and'], t))) AS h_en,
      |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |        t -> list_contains(['el','la','de','y'], t))) AS h_es,
      |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |        t -> list_contains(['der','die','das','und'], t))) AS h_de
      |  FROM documents)
      |SELECT doc_id, h_en, h_es, h_de,
      |  CASE WHEN h_en >= h_es AND h_en >= h_de THEN 'en'
      |       WHEN h_es >= h_de THEN 'es' ELSE 'de' END AS predicted,
      |  (CASE WHEN h_en >= h_es AND h_en >= h_de THEN 'en'
      |        WHEN h_es >= h_de THEN 'es' ELSE 'de' END) = lang
      |    AS agrees_with_label
      |FROM h""".stripMargin

  /** D5 — winnowing fingerprints: 8-char shingle rolling hashes,
    * min over each 4-wide window, distinct. Emitted as per-doc
    * scalars (count/min/max/sum) so the full fingerprint set is
    * verified without array-ordering ambiguity.
    */
  def d5(s: SparkSession, dir: String): DataFrame = {
    val sh = TextHash.shingle_hashes(norm, 8)
    // Guarded for docs with fewer than 4 shingles: an unguarded
    // sequence(0, size-4) would descend through negative indices and
    // crash slice(); the oracle's range() is empty there, so short
    // docs must yield an empty fingerprint set (NULL min/max/sum).
    val fps = when(size(sh) >= 4,
      array_distinct(transform(
        sequence(lit(0), size(sh) - 4),
        i => array_min(slice(sh, i + 1, lit(4))))))
      .otherwise(array().cast("array<bigint>"))
    docs(s, dir)
      .withColumn("fps", fps)
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"),
        when(size(col("fps")) > 0,
          aggregate(col("fps"), lit(0L), (a, x) => a + x)).as("sum_fp"))
  }

  val d5Sql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, ${duckShingles(duckNorm, 8)} AS h FROM documents),
       |fp AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, len(h)-4+2), w_i -> list_min(h[w_i:w_i+3]))) AS fps
       |  FROM sh)
       |SELECT doc_id, len(fps) AS n_fp, list_min(fps) AS min_fp,
       |       list_max(fps) AS max_fp, CAST(list_sum(fps) AS BIGINT) AS sum_fp
       |FROM fp""".stripMargin

  // ---- similarity / near-dup wave (D6-D13) --------------------------

  /** DuckDB fragment: per-doc word-token poly hashes. */
  private[graft] val duckTokenHashes =
    s"""list_transform(string_split_regex(trim(lower(text)), '\\s+'),
       |  tk -> ${duckHash("tk")})""".stripMargin

  /** DuckDB fragment: distinct word-3-gram hashes from token hashes `h`. */
  private val duckGramHashes =
    """list_distinct(list_transform(range(1, len(h)-1),
      |  g_i -> ((h[g_i]*31 + h[g_i+1]) % 1000000007 * 31 + h[g_i+2]) % 1000000007))""".stripMargin

  /** D6 — n-gram Jaccard near-dup pairs: candidates from rare grams
    * (document frequency <= 20 — frequent grams carry no signal and
    * would explode the pair join), verified with exact Jaccard over
    * the full distinct gram sets, as integer per-milles.
    */
  def d6(s: SparkSession, dir: String): DataFrame = {
    val gramH = TextHash.word_gram_hashes(col("text"), 3, distinct = true)
    // Materialized: reused by candidate generation (twice, via the
    // self-join) and by exact verification — and gram hashing must
    // not re-run per joined row.
    // sorted once per doc so pair verification is the native merge
    // walk (SortedIntersectCount), not a per-pair boxed hash set
    val grams = docs(s, dir)
      .select(col("doc_id"), array_sort(gramH).as("gs"))
      .filter(size(col("gs")) >= 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Rare-gram posting lists with the df cap enforced INSIDE the
    // aggregation: the bounded top-k heap keeps at most 21 doc ids
    // per gram on the map side, so a frequent gram ("the quick
    // brown" at corpus scale) ships 21 ids through the shuffle, not
    // its whole posting list — it exceeds the df<=20 cap and is
    // dropped. Pairs are then generated bucket-locally (<= 190 per
    // gram) instead of via an exploded self-join.
    val eg = grams.select(col("doc_id"), explode(col("gs")).as("g"))
    val cand = eg.groupBy("g")
      .agg(graft.functions.TopKAgg.top_k(
        col("doc_id").cast("double"), col("doc_id"), 21).as("top"))
      .filter(size(col("top")).between(2, 20))
      .select(transform(col("top"), t => t("id")).as("ds"))
      .select(explode(graft.dedup.Dedup.bucketPairs(col("ds"))).as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("shared_rare"))
      .filter(col("shared_rare") >= 5)
      .select("d1", "d2")
    cand
      .join(grams.select(col("doc_id").as("d1"), col("gs").as("gs1")), "d1")
      .join(grams.select(col("doc_id").as("d2"), col("gs").as("gs2")), "d2")
      .select(col("d1"), col("d2"),
        TextHash.sorted_intersect_count(col("gs1"), col("gs2")).as("shared"),
        size(col("gs1")).cast("long").as("n1"),
        size(col("gs2")).cast("long").as("n2"))
      .withColumn("jac_pm", expr("shared * 1000 div (n1 + n2 - shared)"))
      .filter(col("jac_pm") >= 100)
      .select("d1", "d2", "shared", "jac_pm")
  }

  val d6Sql: String =
    s"""WITH th AS (
       |  SELECT doc_id, $duckTokenHashes AS h FROM documents
       |  WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 3),
       |grams AS (SELECT doc_id, $duckGramHashes AS gs FROM th),
       |eg AS (SELECT doc_id, unnest(gs) AS g FROM grams),
       |rare AS (SELECT g FROM eg GROUP BY g HAVING count(*) <= 20),
       |egr AS (SELECT doc_id, g FROM eg JOIN rare USING (g)),
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2
       |  FROM egr a JOIN egr b USING (g) WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 5)
       |SELECT d1, d2,
       |  CAST(len(list_intersect(g1.gs, g2.gs)) AS BIGINT) AS shared,
       |  CAST(len(list_intersect(g1.gs, g2.gs)) AS BIGINT) * 1000
       |    // (len(g1.gs) + len(g2.gs) - len(list_intersect(g1.gs, g2.gs)))
       |    AS jac_pm
       |FROM cand
       |JOIN grams g1 ON d1 = g1.doc_id
       |JOIN grams g2 ON d2 = g2.doc_id
       |WHERE CAST(len(list_intersect(g1.gs, g2.gs)) AS BIGINT) * 1000
       |    // (len(g1.gs) + len(g2.gs) - len(list_intersect(g1.gs, g2.gs))) >= 100
       |""".stripMargin

  /** Banding width shared by the BANDING-DEPENDENT catalog entries
    * (d7/d13/d14/d18/d24/d30/d48) and their DuckDB oracles. A static
    * SQL oracle cannot run the sampled auto-tuner, so the two sides
    * meet through one knob, pinned from (highest wins):
    *
    *   1. `GRAFT_BANDING_PERMS` (env) — the explicit manual pin;
    *   2. `graft.banding.perms` (system property) — set by
    *      [[graft.Verify]] BEFORE this object initializes, to the
    *      width [[graft.dedup.Dedup.chooseBanding]] resolves on the
    *      verified corpus (r14: this is what makes the sf1.0 gate a
    *      single command — the gate corpus's narrow-vocab generator
    *      escalates the tuner to 24 where the driver corpora resolve
    *      16, and the oracle now follows automatically instead of
    *      via a manual two-pass env procedure, see GATE_SF1.md r9);
    *   3. unset — the Spark queries run the
    *      [[graft.dedup.Dedup.AutoPerms]] tuner and the oracle is
    *      generated at 16, the width the tuner deterministically
    *      resolves on every driver corpus (pinned by BandingSpec).
    */
  private[graft] val catalogPerms: Int =
    sys.env.get("GRAFT_BANDING_PERMS")
      .orElse(sys.props.get("graft.banding.perms"))
      .map(_.trim) match {
      case None | Some("") => 0
      // Parse failures and widths the 4-band oracle layout cannot
      // express must NOT surface as an ExceptionInInitializerError
      // that kills the whole catalog object — warn and run unpinned.
      case Some(s) => scala.util.Try(s.toInt).toOption
        .filter(p => p > 0 && p % 4 == 0) match {
          case Some(p) => p
          case None =>
            System.err.println(s"banding width '$s' ignored: " +
              "must be a positive multiple of 4 (the oracle band layout)")
            0
        }
    }
  private def queryPerms: Int =
    if (catalogPerms > 0) catalogPerms else graft.dedup.Dedup.AutoPerms
  private def oraclePerms: Int = if (catalogPerms > 0) catalogPerms else 16
  /** Rows per band at the oracle width (4 bands throughout). */
  private def oracleRpb: Int = oraclePerms / 4

  /** DuckDB fragment: MinHash signature (at [[oraclePerms]] width)
    * from shingle hashes `h`. */
  private def duckMinhashSig =
    s"""list_transform(range(0, $oraclePerms), mh_j ->
      |  list_min(list_transform(h, mh_x ->
      |    (((mh_j+1)*2654435761 % 1000000007) * mh_x
      |      + (mh_j+1)*40503 % 1000000007) % 1000000007)))""".stripMargin

  /** DuckDB fragment: LSH band keys from MinHash signatures `sig(sg)`
    * + candidate pairs, with the posting-list cap mirrored from
    * [[graft.dedup.Dedup.minhashVerifiedPairs]] (maxBucket=512: per
    * band bucket only the 512 smallest doc ids pair up). Expects a
    * `sig(doc_id, sg, ...)` CTE in scope; defines `bands`, `bandc`,
    * `cand`.
    */
  private def duckBandCand =
    s"""bands AS (
      |  SELECT doc_id, band,
      |    list_reduce(list_prepend(CAST(band AS BIGINT), sg[band*$oracleRpb+1:band*$oracleRpb+$oracleRpb]),
      |      (bh_a, bh_x) -> (bh_a*31 + bh_x) % 1000000007) AS band_hash
      |  FROM (SELECT doc_id, sg, unnest([0,1,2,3]) AS band FROM sig)),
      |bandc AS (
      |  SELECT * FROM bands
      |  QUALIFY row_number() OVER (PARTITION BY band, band_hash ORDER BY doc_id)
      |    <= 512),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM bandc a JOIN bandc b
      |    ON a.band = b.band AND a.band_hash = b.band_hash
      |      AND a.doc_id < b.doc_id)""".stripMargin

  /** D7 — MinHash-LSH band index: auto-tuned permutation count
    * ([[graft.dedup.Dedup.AutoPerms]]; [[catalogPerms]] pins it for
    * gate runs) over 8-char shingles, 4 bands — each doc emits 4
    * (band, band_hash) keys; equal keys are the near-dup candidate
    * join.
    */
  def d7(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.lshBands(docs(s, dir), "doc_id", "text",
        numPerms = queryPerms)
      .select(col("doc_id"), col("band").cast("long").as("band"), col("band_hash"))

  val d7Sql: String =
    s"""WITH n AS (
       |  SELECT doc_id, lower(trim(text)) AS s FROM documents
       |  WHERE length(lower(trim(text))) >= 8),
       |sh AS (SELECT doc_id, ${duckShingles("s", 8)} AS h FROM n),
       |sig AS (SELECT doc_id, $duckMinhashSig AS sg FROM sh),
       |bands AS (SELECT doc_id, unnest([0,1,2,3]) AS band, sg FROM sig)
       |SELECT doc_id, CAST(band AS BIGINT) AS band,
       |  list_reduce(list_prepend(CAST(band AS BIGINT), sg[band*$oracleRpb+1:band*$oracleRpb+$oracleRpb]),
       |    (bh_a, bh_x) -> (bh_a*31 + bh_x) % 1000000007) AS band_hash
       |FROM bands""".stripMargin

  /** D8 — SimHash near-dup pairs: 30-bit signatures over word
    * 3-gram hashes; pairs at hamming distance <= 3 via
    * generalized-pigeonhole combination banding (8 bands, any
    * 5-of-8 agreement — exact recall, equi-join cost, ~2^19
    * composite-key space so bucket occupancy stays flat as the
    * corpus grows; see [[graft.dedup.Dedup.simhashCombos]]).
    * Candidates are generated among content-hash representatives
    * with capped band buckets
    * (see [[graft.dedup.Dedup.simhashPairs]]).
    */
  def d8(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.simhashPairs(docs(s, dir), "doc_id", "text")

  /** DuckDB fragment: the 56 combination-band keys of [[d8]],
    * generated from the SAME layout ([[graft.dedup.Dedup.simhashCombos]])
    * the Spark side uses — the two candidate generators cannot drift.
    */
  private val duckSimhashComboList: String =
    graft.dedup.Dedup.simhashCombos(30, 3).zipWithIndex.map {
      case (segs, cid) =>
        val key = segs.foldLeft("0::BIGINT") { case (acc, (off, w)) =>
          s"(($acc << $w) | ((sh >> $off) & ${(1L << w) - 1}))"
        }
        s"{'b': $cid, 'k': $key}"
    }.mkString(",\n    ")

  val d8Sql: String =
    s"""WITH u AS (
       |  SELECT doc_id, text,
       |    min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS rep
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, $duckTokenHashes AS h FROM u
       |  WHERE doc_id = rep
       |    AND len(string_split_regex(trim(lower(text)), '\\s+')) >= 3),
       |gh AS (SELECT doc_id, list_transform(range(1, len(h)-1),
       |    g_i -> ((h[g_i]*31 + h[g_i+1]) % 1000000007 * 31 + h[g_i+2]) % 1000000007)
       |  AS g FROM th),
       |sig AS (SELECT doc_id, list_sum(list_transform(range(0, 30), sb ->
       |    CASE WHEN list_sum(list_transform(g, sx ->
       |        CASE WHEN (sx >> sb) & 1 = 1 THEN 1 ELSE -1 END)) > 0
       |    THEN 1::BIGINT << sb ELSE 0::BIGINT END)) AS sh FROM gh),
       |banded AS (
       |  SELECT doc_id, sh, u['b'] AS b, u['k'] AS band_bits FROM (
       |    SELECT doc_id, sh, unnest([$duckSimhashComboList]) AS u
       |    FROM sig)),
       |bandedc AS (
       |  -- mirrors Dedup maxBucket=512
       |  SELECT * FROM banded
       |  QUALIFY row_number() OVER (PARTITION BY b, band_bits ORDER BY doc_id)
       |    <= 512)
       |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS dist
       |FROM bandedc a JOIN bandedc b
       |  ON a.b = b.b AND a.band_bits = b.band_bits AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin

  private def emb(s: SparkSession, dir: String): DataFrame =
    spread(t(s, dir, "embeddings"))

  /** DuckDB fragment: deterministic left-fold dot product of two
    * double lists — the oracle twin of [[graft.similarity.Similarity.dot]].
    */
  /** Dot product in the oracle dialect. `list_dot_product` (r16) is
    * DuckDB's native sequential kernel — bit-identical to the
    * interpreted `list_reduce` fold it replaced (verified exhaustively:
    * 90k real-embedding pairs at dim 64 + 160k adversarial
    * mixed-magnitude pairs at dim 16, zero mismatches — sequential
    * non-FMA summation, the same order the engine's VecDot folds in)
    * and ~100× cheaper per row, which is what makes the composed
    * c26/c28 replays (~10^9 candidate dots at sf10) tractable.
    */
  private def duckDot(a: String, b: String): String =
    s"list_dot_product($a, $b)"

  /** D9 — brute-force cosine top-5 neighbors for query vectors
    * (vec_id < 10): broadcast queries × corpus scan, deterministic
    * fold dot products, rank with id tie-break.
    */
  def d9(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.similarity.Similarity.bruteForceTopK(
      e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 5)
      .withColumn("rk", col("rk").cast("long"))
  }

  val d9Sql: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, ed_x -> CAST(ed_x AS DOUBLE)) AS e
       |  FROM embeddings
       |  WHERE sqrt(${duckDot(
              "list_transform(embedding, zn_x -> CAST(zn_x AS DOUBLE))",
              "list_transform(embedding, zn_x -> CAST(zn_x AS DOUBLE))")}) > 0),
       |pairs AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    ${duckDot("q.e", "c.e")} /
       |      (sqrt(${duckDot("q.e", "q.e")}) * sqrt(${duckDot("c.e", "c.e")})) AS cos
       |  FROM (SELECT * FROM v WHERE vec_id < 10) q
       |  CROSS JOIN v c WHERE c.vec_id <> q.vec_id)
       |SELECT q_id, rk, n_id, cos FROM (
       |  SELECT q_id, n_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id)
       |      AS BIGINT) AS rk
       |  FROM pairs) WHERE rk <= 5""".stripMargin

  /** D10 — embedding near-dup pairs: cosine >= 0.4 within a blocking
    * key (cluster label) so the pair join is an equi-join.
    */
  def d10(s: SparkSession, dir: String): DataFrame =
    graft.similarity.Similarity.nearDupPairs(
      emb(s, dir), "vec_id", "embedding", "label", minCos = 0.4)

  val d10Sql: String =
    s"""WITH v AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, ed_x -> CAST(ed_x AS DOUBLE)) AS e
       |  FROM embeddings
       |  WHERE sqrt(${duckDot(
              "list_transform(embedding, zn_x -> CAST(zn_x AS DOUBLE))",
              "list_transform(embedding, zn_x -> CAST(zn_x AS DOUBLE))")}) > 0)
       |SELECT a.vec_id AS id1, b.vec_id AS id2,
       |  ${duckDot("a.e", "b.e")} /
       |    (sqrt(${duckDot("a.e", "a.e")}) * sqrt(${duckDot("b.e", "b.e")})) AS cos
       |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${duckDot("a.e", "b.e")} /
       |    (sqrt(${duckDot("a.e", "a.e")}) * sqrt(${duckDot("b.e", "b.e")})) >= 0.4""".stripMargin

  /** D11 — scale-routed approximate top-k AS A RECALL AUDIT:
    * multi-probe LSH inside its measured recall envelope, IVF past
    * AnnMaxCorpus ([[graft.similarity.Similarity.annOrIvfTopK]] — at
    * every sandbox SF this resolves to the LSH side; the routing
    * boundary itself is pinned in SimilaritySpec). An approximate
    * result set is not SQL-replayable (the hyperplane probe has no
    * oracle-dialect form), so since r14 the CATALOG entry emits what
    * IS hash-checkable — the exact top-3 reference per query
    * (`n_exact`, `kth_cos`: d9's machinery at k = 3, replayed
    * exactly by the oracle) — and enforces the recall contract
    * IN-ENGINE: the ANN output is joined against the exact set and
    * aggregate recall@3 below the measured 0.6 floor THROWS, turning
    * a recall regression into a driver-visible red (`err`) on this
    * key instead of a spec-only assertion. The ANN run is
    * load-bearing: the audit frame cannot be produced without it.
    * (The audit's exact reference is O(Q·N) by design — Q is the
    * 10-vector query set; the production operator remains
    * `annOrIvfTopK` itself, whose candidate generation is bucketed.)
    */
  def d11(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.Similarity
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding",
      k = 3)
    val ann = Similarity.annOrIvfTopK(q, e, "vec_id", "embedding", k = 3)
      .select(col("q_id"), col("n_id"))
    val total = exact.count()
    val hits = exact.join(ann, Seq("q_id", "n_id"), "left_semi").count()
    if (hits * 1000 < total * 600)
      throw new IllegalStateException(
        s"d11 recall regression: ANN found $hits of $total exact " +
          s"top-3 rows (recall ${hits.toDouble / total} < 0.6 floor)")
    exact.groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"), min(col("cos")).as("kth_cos"))
  }

  /** Oracle of [[d11]]: the exact-reference half of the audit —
    * d9's brute-force chain at k = 3, rolled up per query. The ANN
    * half is enforced by the in-engine recall gate (a sub-floor run
    * throws before any rows are produced).
    */
  val d11Sql: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, ed_x -> CAST(ed_x AS DOUBLE)) AS e
       |  FROM embeddings
       |  WHERE sqrt(${duckDot(
              "list_transform(embedding, zn_x -> CAST(zn_x AS DOUBLE))",
              "list_transform(embedding, zn_x -> CAST(zn_x AS DOUBLE))")}) > 0),
       |pairs AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    ${duckDot("q.e", "c.e")} /
       |      (sqrt(${duckDot("q.e", "q.e")}) * sqrt(${duckDot("c.e", "c.e")})) AS cos
       |  FROM (SELECT * FROM v WHERE vec_id < 10) q
       |  CROSS JOIN v c WHERE c.vec_id <> q.vec_id),
       |topk AS (
       |  SELECT q_id, n_id, cos FROM (
       |    SELECT q_id, n_id, cos,
       |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id)
       |        AS rk
       |    FROM pairs) WHERE rk <= 3)
       |SELECT q_id, CAST(count(*) AS BIGINT) AS n_exact,
       |  min(cos) AS kth_cos
       |FROM topk GROUP BY q_id""".stripMargin

  /** D12 — multimodal payload plumbing: opaque binary payloads +
    * typed metadata, decode stubbed with deterministic byte-stat
    * features (see [[graft.multimodal.Media]]).
    */
  def d12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val sp: SparkSession = s
    // empty payloads excluded on both sides: the stub's empty-input
    // sentinels (Int.MaxValue/MinValue) have no SQL NULL analogue
    val payloads = graft.multimodal.Media.asPayloads(
      docs(s, dir).filter(length(col("text")) >= 1), "doc_id", "text")
    val decoded = graft.multimodal.Media.decodeStub(
      payloads.as[graft.multimodal.Media.MediaRow]).toDF()
    decoded
      .join(docs(s, dir).select(col("doc_id"),
        TextHash.poly_hash(col("text")).as("checksum")), "doc_id")
      .select(col("doc_id"), col("n_bytes"), col("checksum"),
        element_at(col("features"), 2).as("f_mean"),
        element_at(col("features"), 3).as("f_min"),
        element_at(col("features"), 4).as("f_max"))
  }

  val d12Sql: String =
    s"""WITH codes AS (
       |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       |    ${duckHash("text")} AS checksum,
       |    list_transform(range(1, length(text)+1),
       |      bc_i -> CAST(unicode(text[bc_i]) AS BIGINT)) AS cs
       |  FROM documents WHERE length(text) >= 1)
       |SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes, checksum,
       |  CAST(list_sum(cs) AS DOUBLE) / greatest(len(cs), 1) AS f_mean,
       |  CAST(list_min(cs) AS DOUBLE) AS f_min,
       |  CAST(list_max(cs) AS DOUBLE) AS f_max
       |FROM codes""".stripMargin

  /** D13 — LSH candidate verification: for every band-colliding
    * pair among content-hash representatives (exact duplicates are
    * D1's job and would concentrate band buckets), MinHash-estimated
    * agreement (matches out of 16) vs exact shingle-set Jaccard
    * (integer per-mille).
    */
  def d13(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.minhashVerifiedPairs(docs(s, dir), "doc_id", "text",
        numPerms = queryPerms)
      .select("d1", "d2", "est_matches", "shared", "jac_pm")

  val d13Sql: String =
    s"""WITH u AS (
       |  SELECT doc_id, text,
       |    min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS rep
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, lower(trim(text)) AS s FROM u
       |  WHERE doc_id = rep AND length(lower(trim(text))) >= 8),
       |sh AS (SELECT doc_id, ${duckShingles("s", 8)} AS h FROM n),
       |sig AS (SELECT doc_id, $duckMinhashSig AS sg,
       |        list_distinct(h) AS shset FROM sh),
       |$duckBandCand
       |SELECT d1, d2,
       |  CAST(len(list_filter(range(1, ${oraclePerms + 1}), vf_i -> s1.sg[vf_i] = s2.sg[vf_i]))
       |    AS BIGINT) AS est_matches,
       |  CAST(len(list_intersect(s1.shset, s2.shset)) AS BIGINT) AS shared,
       |  CAST(len(list_intersect(s1.shset, s2.shset)) AS BIGINT) * 1000
       |    // (len(s1.shset) + len(s2.shset)
       |        - len(list_intersect(s1.shset, s2.shset))) AS jac_pm
       |FROM cand
       |JOIN sig s1 ON d1 = s1.doc_id
       |JOIN sig s2 ON d2 = s2.doc_id""".stripMargin

  /** D14 — full corpus curation (exact dedup → LSH near-dup drop →
    * quality gate) as one composed pipeline: see
    * [[graft.dedup.Curator]].
    */
  def d14(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Curator.curate(s, docs(s, dir), numPerms = queryPerms)

  val d14Sql: String =
    s"""WITH keepers AS (
       |  SELECT min(doc_id) AS doc_id
       |  FROM (SELECT doc_id, md5(lower(trim(text))) AS ch FROM documents)
       |  GROUP BY ch),
       |uniq AS (SELECT d.* FROM documents d JOIN keepers USING (doc_id)),
       |n AS (
       |  SELECT doc_id, lower(trim(text)) AS s FROM uniq
       |  WHERE length(lower(trim(text))) >= 8),
       |sh AS (SELECT doc_id, ${duckShingles("s", 8)} AS h FROM n),
       |sig AS (SELECT doc_id, $duckMinhashSig AS sg,
       |        list_distinct(h) AS shset FROM sh),
       |$duckBandCand,
       |dropped AS (
       |  SELECT DISTINCT d2 AS doc_id FROM cand
       |  JOIN sig s1 ON d1 = s1.doc_id
       |  JOIN sig s2 ON d2 = s2.doc_id
       |  WHERE CAST(len(list_intersect(s1.shset, s2.shset)) AS BIGINT) * 1000
       |      // (len(s1.shset) + len(s2.shset)
       |          - len(list_intersect(s1.shset, s2.shset))) >= 500),
       |meta AS (
       |  SELECT doc_id, lang,
       |    len(string_split_regex(trim(lower(text)), '\\s+')) AS ws_tokens,
       |    len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS n_distinct,
       |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |        t -> list_contains(['the','a','of','and','to','in'], t))) AS n_stop
       |  FROM uniq)
       |SELECT doc_id, lang, ws_tokens FROM meta
       |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
       |  AND (n_distinct * 10000 // ws_tokens) > 3000
       |  AND (n_stop * 10000 // ws_tokens) < 4000
       |  AND ws_tokens BETWEEN 5 AND 10000""".stripMargin

  /** D15 — reproducible train/val/test split: the split of a
    * document is a pure function of its content hash (not row
    * order, partitioning, or a seed table), so it is stable across
    * runs, engines, and re-shards — the property a training
    * pipeline actually needs.
    */
  def d15(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("bucket",
        pmod(TextHash.poly_hash(concat(col("text"), lit("|split"))), lit(1000)))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 900, "train")
          .when(col("bucket") < 950, "val")
          .otherwise("test").as("split"))

  val d15Sql: String =
    s"""SELECT doc_id, bucket,
       |  CASE WHEN bucket < 900 THEN 'train'
       |       WHEN bucket < 950 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id,
       |        ${duckHash("(text || '|split')")} % 1000 AS bucket
       |      FROM documents)""".stripMargin

  /** D16 — PII/URL scrubbing: redact emails and URLs with typed
    * placeholder tokens, report redaction counts. The corpus has no
    * organic PII, so deterministic synthetic contamination is
    * injected first (doc_id-derived address/URL) — the scrubber
    * must remove exactly what was injected.
    */
  def d16(s: SparkSession, dir: String): DataFrame = {
    val emailPat = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val urlPat = "https?://[^\\s]+"
    val contaminated = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or "),
      lit("https://host"), col("doc_id"), lit(".example/path"))
    docs(s, dir)
      .withColumn("dirty", contaminated)
      .select(
        col("doc_id"),
        regexp_count(col("dirty"), lit(emailPat)).cast("long").as("n_emails"),
        regexp_count(col("dirty"), lit(urlPat)).cast("long").as("n_urls"),
        TextHash.poly_hash(
          regexp_replace(regexp_replace(col("dirty"), urlPat, "<URL>"),
            emailPat, "<EMAIL>")).as("clean_hash"),
        length(regexp_replace(regexp_replace(col("dirty"), urlPat, "<URL>"),
          emailPat, "<EMAIL>")).cast("long").as("clean_len"))
  }

  val d16Sql: String = {
    val dirty = "text || ' contact user' || doc_id || '@example.com or ' " +
      "|| 'https://host' || doc_id || '.example/path'"
    val clean = s"regexp_replace(regexp_replace($dirty, 'https?://[^\\s]+', '<URL>', 'g'), " +
      "'[A-Za-z0-9._]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g')"
    s"""SELECT doc_id,
       |  len(regexp_extract_all($dirty,
       |    '[A-Za-z0-9._]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
       |  len(regexp_extract_all($dirty, 'https?://[^\\s]+')) AS n_urls,
       |  ${duckHash(s"($clean)")} AS clean_hash,
       |  CAST(length($clean) AS BIGINT) AS clean_len
       |FROM documents""".stripMargin
  }

  /** D17 — embedding normalization + int8 quantization: unit-vector
    * scaling and floor-based int8 codes (floor, not round — floor is
    * engine-identical; round tie-breaks are not). The storage-
    * compression step of an embedding pipeline.
    */
  def d17(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.Similarity
    // staged: norm and the quantized array computed once per row,
    // not per-element / per-output-column; zero vectors are
    // excluded (division by a zero norm is undefined — and engines
    // disagree on NaN handling)
    emb(s, dir)
      .withColumn("v", Similarity.toDouble(col("embedding")))
      .withColumn("l2_norm", Similarity.norm2(col("v")))
      .filter(col("l2_norm") > 0)
      .withColumn("q", transform(col("v"),
        x => floor(x / col("l2_norm") * 127)))
      .select(
        col("vec_id"),
        col("l2_norm"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"))
  }

  val d17Sql: String = {
    val v = "list_transform(embedding, qx -> CAST(qx AS DOUBLE))"
    val nrm = s"sqrt(${duckDot(s"($v)", s"($v)")})"
    s"""WITH n AS (
       |  SELECT vec_id, $v AS v, $nrm AS l2_norm FROM embeddings),
       |q AS (
       |  SELECT vec_id, l2_norm,
       |    list_transform(v, qe -> CAST(floor(qe / l2_norm * 127) AS BIGINT)) AS qv
       |  FROM n WHERE l2_norm > 0)
       |SELECT vec_id, l2_norm, CAST(list_sum(qv) AS BIGINT) AS q_sum,
       |       list_min(qv) AS q_min, list_max(qv) AS q_max
       |FROM q""".stripMargin
  }

  /** D18 — duplicate-cluster assignment: connected components over
    * the union of exact-dup and verified MinHash near-dup edges via
    * alternating small-star/large-star rounds
    * ([[graft.dedup.Dedup.dupClusters]] with `algo = "star"` — the
    * O(log diameter)-round variant that survives adversarial
    * deep-chain duplicate graphs; the min-label path stays
    * cross-validated against it in PropertySpec). The oracle
    * computes the same components with a recursive CTE.
    */
  def d18(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.dupClusters(docs(s, dir), "doc_id", "text",
      algo = "star", numPerms = queryPerms)

  val d18Sql: String =
    s"""WITH RECURSIVE u AS (
       |  SELECT doc_id, text,
       |    min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS rep
       |  FROM documents),
       |n AS (
       |  -- near-dup edges among content reps only (mirrors Dedup's
       |  -- prededup); exact edges below connect the copies, so the
       |  -- components are unchanged
       |  SELECT doc_id, lower(trim(text)) AS s FROM u
       |  WHERE doc_id = rep AND length(lower(trim(text))) >= 8),
       |sh AS (SELECT doc_id, ${duckShingles("s", 8)} AS h FROM n),
       |sig AS (SELECT doc_id, $duckMinhashSig AS sg,
       |        list_distinct(h) AS shset FROM sh),
       |$duckBandCand,
       |near AS (
       |  SELECT d1, d2 FROM cand
       |  JOIN sig s1 ON d1 = s1.doc_id
       |  JOIN sig s2 ON d2 = s2.doc_id
       |  WHERE CAST(len(list_intersect(s1.shset, s2.shset)) AS BIGINT) * 1000
       |      // (len(s1.shset) + len(s2.shset)
       |          - len(list_intersect(s1.shset, s2.shset))) >= 500),
       |exacth AS (SELECT doc_id, md5(lower(trim(text))) AS ch FROM documents),
       |exactp AS (
       |  SELECT min(doc_id) OVER (PARTITION BY ch) AS d1, doc_id AS d2
       |  FROM exacth QUALIFY d2 != d1),
       |edges AS (SELECT d1, d2 FROM near UNION SELECT d1, d2 FROM exactp),
       |sym AS (SELECT d1, d2 FROM edges
       |        UNION SELECT d2 AS d1, d1 AS d2 FROM edges),
       |reach AS (
       |  SELECT d1 AS src, d2 AS dst FROM sym
       |  UNION
       |  SELECT r.src, s.d2 AS dst FROM reach r JOIN sym s ON r.dst = s.d1),
       |lab AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src)
       |SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
       |  count(*) OVER (PARTITION BY coalesce(l.cluster_id, d.doc_id)) AS csize
       |FROM documents d LEFT JOIN lab l USING (doc_id)""".stripMargin

  /** D19 — IVF approximate nearest neighbors: deterministic seeded
    * k-means coarse quantizer (16 md5-stable seeds + one exact-BIGINT
    * Lloyd step — the d32 machinery, see
    * [[graft.similarity.Similarity.kmeansCentroids]]), nearest-
    * centroid inverted lists, nprobe=4 probed lists per query, exact
    * cosine within ([[graft.similarity.Similarity.ivfTopK]]).
    * Deterministic by construction — the Lloyd mean is an integer
    * sum with one double division — so unlike the LSH path (d11) it
    * carries a full SQL oracle.
    */
  def d19(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.similarity.Similarity.ivfTopK(
      e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding",
      k = 5, kCentroids = 16, nprobe = 4)
  }

  /** The deterministic IVF oracle (seeded kmeans quantizer, one
    * exact-BIGINT Lloyd step, nprobe=4) shared by d19 (fused
    * build+probe) and d37 (persisted index + probe) — the two
    * operators compute the same function, so the oracle is one
    * builder parameterized by the query-set modulus and k.
    */
  /** Shared oracle CTE chain of every kmeans-quantizer operator
    * (d19/d37 IVF, d42 cluster report, d43 balanced sample): the
    * exact DuckDB twin of [[graft.similarity.Similarity.kmeansCentroids]]
    * + argmax assignment at `kCentroids=16, lloydIters=1` on the
    * 64-dim `embeddings` table — seeds by smallest md5(id), one
    * exact-BIGINT Lloyd step, cosine argmax with ties to the
    * smallest centroid id. Ends with `assign(vec_id, cid)`; callers
    * append their own CTEs.
    */
  private def duckKmeansAssign: String = duckKmeansAssignKc("16")

  private def duckKmeansAssignKc(kcSql: String): String =
    s"""vn AS (
       |  SELECT vec_id,
       |    list_transform(embedding, ed_x -> CAST(ed_x AS DOUBLE)) AS e
       |  FROM embeddings),
       |${duckKmeansChain(dim = 64, kcSql = kcSql)}""".stripMargin

  /** The deployed `clamp(⌈√N⌉, 16, KCentroidsMax)` /
    * `max(4, ⌈√kc⌉)` rules as DuckDB scalar subqueries over a
    * norm-valid vector CTE `over` — the same numbers
    * [[graft.similarity.Similarity.sqrtKc]] /
    * [[graft.similarity.Similarity.adaptiveNprobe]] compute from the
    * frame the engine's quantizer actually trains on (the c26
    * convention, shared by the d37/d51/d57 oracles).
    */
  private[graft] def derivedKcSub(over: String): (String, String) = {
    val kcExpr = "LEAST(" + graft.similarity.Similarity.KCentroidsMax +
      ", GREATEST(16, CAST(ceil(sqrt(count(*))) AS BIGINT)))"
    (s"(SELECT $kcExpr FROM $over)",
      s"(SELECT GREATEST(4, CAST(ceil(sqrt($kcExpr)) AS BIGINT)) FROM $over)")
  }

  /** The generic tail of the kmeans-assignment oracle: everything
    * after a caller-supplied `vn(vec_id, e)` CTE, parameterized on
    * the vector dimension and centroid count (c26 runs it at dim=16
    * over d44-derived vectors with a DATA-DERIVED kc; the embeddings
    * instantiations at dim=64, kc=16). `kcSql` is a SQL expression —
    * a literal (`"16"`) or a scalar subquery (c26's
    * `GREATEST(16, count(*)//256)`) — applied through a row_number
    * bound so a subquery is legal where LIMIT would not accept one.
    *
    * The two corpus-sized argmaxes (a0, assign) are AGGREGATIONS
    * (`max(struct_pack(csim, -cid))` per vec_id — the literal DuckDB
    * twin of the engine's [[graft.similarity.Similarity.argmaxAssign]]
    * struct-max), NOT row_number windows (r16, the sf10 oracle
    * tractability fix): the window form materialized and sorted the
    * full N×kc cross join (300M wide rows ≈ 110 GB at sf10 — the
    * replay the r15 verdict recorded as stopped at 75 min), while
    * the hash aggregate streams it with N-row state. Identical
    * output: same doubles, same (csim DESC, cid ASC) tie rule via
    * lexicographic struct comparison.
    */
  private[graft] def duckKmeansChain(dim: Int, kcSql: String): String =
    s"""v AS (SELECT vec_id, e, sqrt(${duckDot("e", "e")}) AS nrm FROM vn
       |      WHERE sqrt(${duckDot("e", "e")}) > 0),
       |seeds AS (
       |  SELECT cid, ce, cnrm FROM (
       |    SELECT vec_id AS cid, e AS ce, nrm AS cnrm,
       |      row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |        vec_id) AS krk
       |    FROM v) WHERE krk <= $kcSql),
       |a0 AS (
       |  SELECT v.vec_id,
       |    -((max(struct_pack(
       |        acs := ${duckDot("v.e", "c.ce")} / (v.nrm * c.cnrm),
       |        acc := -c.cid))).acc) AS cid
       |  FROM v CROSS JOIN seeds c GROUP BY v.vec_id),
       |vx AS (
       |  SELECT vec_id,
       |    list_transform(e, qx -> CAST(floor(qx * 1000) AS BIGINT)) AS xi
       |  FROM v),
       |comps AS (
       |  SELECT cid, pos,
       |    CAST(sum(comp) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000.0
       |      AS comp
       |  FROM (
       |    SELECT a0.cid, pos, vx.xi[pos] AS comp
       |    FROM a0 JOIN vx USING (vec_id)
       |    CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS pos))
       |  GROUP BY 1, 2),
       |c1 AS (
       |  SELECT cid, list(comp ORDER BY pos) AS ce FROM comps GROUP BY cid),
       |cents AS (SELECT cid, ce, sqrt(${duckDot("ce", "ce")}) AS cnrm FROM c1),
       |assign AS (
       |  SELECT v.vec_id,
       |    -((max(struct_pack(
       |        acs := ${duckDot("v.e", "c.ce")} / (v.nrm * c.cnrm),
       |        acc := -c.cid))).acc) AS cid
       |  FROM v CROSS JOIN cents c GROUP BY v.vec_id)""".stripMargin

  private def ivfOracleSql(qMod: Int, k: Int,
      derivedKcNp: Boolean = false, excludeSql: String = ""): String = {
    // d19 pins (kc=16, nprobe=4) as the fused small-quantizer entry;
    // d37/d68 derive both from the data (the deployed policy — the
    // d37 scaladoc carries the rationale). `v` is the chain's
    // norm-valid CTE, the frame the engine counts. `excludeSql`
    // (d68) is an AND-predicate on the candidate side `a` — the SQL
    // twin of the tombstone anti-join, applied at the probe read the
    // way ivfLists applies it (build ran BEFORE the removal, so the
    // quantizer and kc still derive from the full corpus).
    val (kcSql, npSql) =
      if (derivedKcNp) derivedKcSub("v") else ("16", "4")
    s"""WITH ${duckKmeansAssignKc(kcSql)},
       |probes AS (
       |  SELECT q_id, cid FROM (
       |    SELECT q.vec_id AS q_id, c.cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${duckDot("q.e", "c.ce")} / (q.nrm * c.cnrm) DESC,
       |                 c.cid) AS crk
       |    FROM (SELECT * FROM v WHERE vec_id % $qMod = 0) q
       |    CROSS JOIN cents c) WHERE crk <= $npSql),
       |scored AS (
       |  SELECT p.q_id, a.vec_id AS n_id,
       |    ${duckDot("q.e", "n.e")} / (q.nrm * n.nrm) AS cos
       |  FROM probes p
       |  JOIN assign a USING (cid)
       |  JOIN v q ON p.q_id = q.vec_id
       |  JOIN v n ON a.vec_id = n.vec_id
       |  WHERE a.vec_id <> p.q_id$excludeSql)
       |SELECT q_id, rk, n_id, cos FROM (
       |  SELECT q_id, n_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id)
       |      AS BIGINT) AS rk
       |  FROM scored) WHERE rk <= $k""".stripMargin
  }

  val d19Sql: String = ivfOracleSql(50, 5)

  /** D37 — persisted IVF index, build-once / probe-many
    * ([[graft.similarity.Similarity.buildIvfIndex]] /
    * [[graft.similarity.Similarity.ivfProbe]]): same deterministic
    * construction as d19, with the quantizer build amortized into a
    * parquet index whose inverted lists are cid partitions (probes
    * prune to the probed lists — the sublinear-read path a 100 TB
    * corpus needs). The probe asserts the build parameters against
    * the index meta; a contradiction throws rather than serving
    * wrong-parameter results. The catalog entry exercises the full
    * cycle (build + meta-validated probe) and its oracle is the d19
    * builder at this entry's query set — index round-tripping must
    * not change a single bit.
    *
    * kc and nprobe are the DEPLOYED DATA-DERIVED rules (r16, closing
    * the r15 verdict's kc-pin note): the build sizes
    * `kc = clamp(⌈√N⌉, 16, KCentroidsMax)` over the valid corpus
    * ([[graft.similarity.Similarity.sqrtKc]]) and the probe reads kc
    * from the index meta and probes `max(4, ⌈√kc⌉)` lists
    * ([[graft.similarity.Similarity.adaptiveNprobe]]) — the benched
    * plan IS the production plan at every SF, and the oracle derives
    * the same two numbers in SQL (the c26 kcSql convention).
    */
  def d37(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    // unique per invocation (concurrent runs can't clobber each
    // other's index); the returned frame still lazily reads the
    // index, so cleanup is the Scratch exit sweep, not eager delete
    val idx = graft.engine.Scratch.dir("graft_d37_")
    graft.similarity.Similarity.buildIvfIndex(
      e, "vec_id", "embedding", idx, kCentroids = 0)
    graft.similarity.Similarity.ivfProbe(
      e.filter(col("vec_id") % 40 === 0), idx, "vec_id", "embedding",
      k = 4, nprobe = 0, expectQuantizer = "kmeans")
  }

  val d37Sql: String = ivfOracleSql(40, 4, derivedKcNp = true)

  /** D68 — index DELETION (takedown/opt-out) proven end to end on
    * the persisted IVF index: build (derived kc — the d37 cycle),
    * REMOVE every `vec_id % 7 = 0` vector
    * ([[graft.similarity.Similarity.removeFromIvfIndex]] — tombstone
    * sidecar, logically dead immediately, physically folded out by
    * the next drift rebuild), then probe the d37 query set. Removed
    * vectors must be absent from every result list — nearest
    * neighbors the full index returned are REPLACED by the next-best
    * live candidates, so the oracle cannot pass by accident: it
    * replays the build over the full corpus (quantizer, kc, nprobe
    * all still derive from what was indexed) and applies the
    * tombstone exclusion only at the probe read, exactly where
    * [[graft.similarity.Similarity.ivfLists]] applies the anti-join.
    * Removal idempotency, append refusal on tombstoned vids, and the
    * rebuild folding + re-arming are spec'd (Round16OpsSpec), as are
    * the MinHash ([[graft.dedup.Dedup.removeFromIndex]] /
    * [[graft.dedup.Dedup.compactIndex]]) and span
    * ([[graft.dedup.Dedup.removeFromSpanIndex]]) family twins.
    */
  def d68(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = graft.engine.Scratch.dir("graft_d68_")
    graft.similarity.Similarity.buildIvfIndex(
      e, "vec_id", "embedding", idx, kCentroids = 0)
    graft.similarity.Similarity.removeFromIvfIndex(
      e.filter(col("vec_id") % 7 === 0), "vec_id", idx)
    graft.similarity.Similarity.ivfProbe(
      e.filter(col("vec_id") % 40 === 0), idx, "vec_id", "embedding",
      k = 4, nprobe = 0, expectQuantizer = "kmeans")
  }

  val d68Sql: String = ivfOracleSql(40, 4, derivedKcNp = true,
    excludeSql = " AND a.vec_id % 7 <> 0")

  /** The synthesized URL column shared by the d70 entry and its
    * oracle: the corpus carries no URL (TESTDATA.md), so the entry
    * synthesizes one deterministically from (source, doc_id) — the
    * multimodal-stub convention: the INPUT is a stand-in, the
    * operator ([[graft.functions.Urls.canonicalize]] + first-per-URL
    * keep) is the real machinery. The variants cover every
    * canonicalization rule: scheme case + http/https, www., an
    * explicit default port, a trailing slash, tracking-only /
    * tracking-mixed / unsorted-params / empty queries, a fragment —
    * and page identity recurs (`doc_id % 200` within a source) so
    * genuine url-dups exist at every SF.
    */
  private def urlVariantSpark(d: org.apache.spark.sql.Column,
      source: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      when(d % 2 === 0, lit("HTTPS://")).otherwise(lit("http://")),
      when(d % 3 === 0, lit("WWW.")).otherwise(lit("")),
      source, lit(".example.com"),
      when(d % 11 === 0, lit(":443")).otherwise(lit("")),
      lit("/articles/item-"), (d % 200).cast("string"),
      when(d % 5 === 0, lit("/")).otherwise(lit("")),
      when(d % 4 === 0,
        concat(lit("?utm_source=feed&utm_campaign=c"), (d % 7).cast("string")))
        .otherwise(when(d % 4 === 1, lit("?page=2&utm_medium=email"))
          .otherwise(when(d % 4 === 2, lit("?b=2&a=1")).otherwise(lit("")))),
      when(d % 6 === 0, lit("#section-3")).otherwise(lit("")))

  private def urlVariantSql: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END)
      | || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
      | || source || '.example.com'
      | || (CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END)
      | || '/articles/item-' || CAST(doc_id % 200 AS VARCHAR)
      | || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
      | || (CASE WHEN doc_id % 4 = 0
      |        THEN '?utm_source=feed&utm_campaign=c' || CAST(doc_id % 7 AS VARCHAR)
      |      WHEN doc_id % 4 = 1 THEN '?page=2&utm_medium=email'
      |      WHEN doc_id % 4 = 2 THEN '?b=2&a=1' ELSE '' END)
      | || (CASE WHEN doc_id % 6 = 0 THEN '#section-3' ELSE '' END)"""
      .stripMargin.replace("\n", "")

  /** [[graft.functions.Urls.canonicalize]]'s DuckDB twin as a CTE
    * chain: consumes a CTE `u(doc_id, url)` and ends with
    * `cuc(doc_id, url, canon_url)` — IDENTICAL regex patterns (all
    * RE2-compatible by construction on the Spark side) and the same
    * filter-sort-join of query params, staged per rewrite so no
    * correlated subquery is needed.
    */
  private def duckCanonUrlCtes: String = {
    val tracking = graft.functions.Urls.TrackingParams
      .map(p => s"'$p'").mkString("[", ", ", "]")
    s"""cu0 AS (
       |  SELECT doc_id, url,
       |    regexp_replace(trim(url), '#.*$$', '') AS nofrag
       |  FROM u),
       |cu1 AS (
       |  SELECT doc_id, url, nofrag,
       |    regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')
       |      AS auth
       |  FROM cu0),
       |cu2 AS (
       |  SELECT doc_id, url,
       |    regexp_replace(regexp_replace(regexp_replace(
       |      lower(auth) || substr(nofrag, length(auth) + 1),
       |      '^https?://', ''), '^www\\.', ''),
       |      '^([^/?#]*):(?:80|443)($$|[/?#].*)', '\\1\\2') AS np
       |  FROM cu1),
       |cu3 AS (SELECT doc_id, url, np, strpos(np, '?') AS qp FROM cu2),
       |cu4 AS (
       |  SELECT doc_id, url,
       |    regexp_replace(CASE WHEN qp > 0 THEN substr(np, 1, qp - 1)
       |                   ELSE np END, '/+$$', '') AS path,
       |    list_sort(list_filter(
       |      string_split(CASE WHEN qp > 0 THEN substr(np, qp + 1)
       |                   ELSE '' END, '&'),
       |      cq_p -> len(cq_p) > 0 AND NOT list_contains($tracking,
       |        lower(split_part(cq_p, '=', 1))))) AS kept
       |  FROM cu3),
       |cuc AS (
       |  SELECT doc_id, url,
       |    CASE WHEN len(kept) > 0
       |      THEN path || '?' || array_to_string(kept, '&')
       |      ELSE path END AS canon_url
       |  FROM cu4)""".stripMargin
  }

  /** D70 — URL-level dedup with canonicalization (RefinedWeb §3.1's
    * FIRST dedup stage, upstream of content dedup: recrawls of one
    * page under scheme/www/tracking/order/slash variants must
    * collapse before any text is compared). Canonicalize
    * ([[graft.functions.Urls.canonicalize]] — six documented RFC/
    * pipeline-standard rewrites, pure `functions` compositions, no
    * UDF), keep the smallest doc_id per canonical URL, report every
    * document's fate. The URL column is SYNTHESIZED deterministically
    * (the corpus carries none — see [[urlVariantSpark]]; the
    * multimodal-stub convention: stand-in input, real machinery).
    *
    * Scale shape: canonicalization is map-side string work inside
    * the scan span; the keep rule is ONE hash-partitioned
    * `groupBy(canon).agg(min(doc_id))` (partial agg absorbs hot
    * URLs map-side — a page recrawled a million times collapses
    * per-task) and one equi-join back; no window over the corpus.
    */
  def d70(s: SparkSession, dir: String): DataFrame = {
    val withUrl = docs(s, dir).select(col("doc_id"),
      urlVariantSpark(col("doc_id"), col("source")).as("url"))
      .withColumn("canon_url", graft.functions.Urls.canonicalize(col("url")))
    val keepers = withUrl.groupBy("canon_url")
      .agg(min(col("doc_id")).as("keeper_id"))
    withUrl.join(keepers, "canon_url")
      .select(col("doc_id"), col("url"), col("canon_url"),
        when(col("doc_id") === col("keeper_id"), "kept")
          .otherwise("url_dup").as("fate"),
        col("keeper_id"))
  }

  val d70Sql: String =
    s"""WITH u AS (
       |  SELECT doc_id, $urlVariantSql AS url FROM documents),
       |$duckCanonUrlCtes,
       |k AS (SELECT canon_url, min(doc_id) AS keeper_id FROM cuc GROUP BY 1)
       |SELECT c.doc_id, c.url, c.canon_url,
       |  CASE WHEN c.doc_id = k.keeper_id THEN 'kept'
       |       ELSE 'url_dup' END AS fate,
       |  k.keeper_id
       |FROM cuc c JOIN k USING (canon_url)""".stripMargin

  /** D69 — TOKENIZATION-AWARE decontamination (the r15 verdict's
    * widening note: d21/d49 operate on word grams, and eval suites
    * leak through tokenizer-level overlap — a short word phrase that
    * the tokenizer expands to many subword tokens clears the 5-GRAM
    * bar at token grain while never producing a single word 5-gram).
    * Same contract as d21 — test-split documents sharing >= 2 rare
    * (df <= 50) distinct grams with a train document, d15's
    * content-hash split — but the gram unit is the BPE TOKEN STREAM:
    * documents are tokenized under the d38 merge table
    * ([[graft.functions.Bpe.encodeDelimited]]), per-word token lists
    * are flattened into one in-document token sequence, and 16-TOKEN
    * grams are hashed over it (word boundaries do not reset the
    * window, so subword overlap across short phrases is visible;
    * most tokens are subword fragments of ~4-5 per word under this
    * merge table, so 16 tokens ≈ 3-4 words — token grams must be
    * WIDER than word grams to carry comparable selectivity, and the
    * catch is exactly the 4-word phrase a word 5-gram never sees).
    *
    * Scale shape: identical to d21 — tokenization is map-side (the
    * merge table is a literal, the d38/d56 convention), the gram
    * table is one explode feeding a df-capped rare-gram join (the
    * d6 skew defense bounds per-key fanout), and the train×test
    * pairing is an equi-join on gram hash. The oracle replays the
    * d38 fold + the d21 gram/df/pair chain; the gram hash reuses
    * [[graft.functions.TextHash.word_gram_hashes]] over the
    * space-joined token stream (tokens are [a-z0-9]+ so the join is
    * unambiguous), keeping engine and oracle hash-identical.
    * Token-grain-catches-what-word-grain-misses is spec'd
    * (Round16OpsSpec).
    */
  def d69(s: SparkSession, dir: String): DataFrame = {
    val ms = d38Merges.sortBy(_._1).map(t => (t._2, t._3))
    val toks = flatten(transform(
      graft.functions.Bpe.encodeDelimited(col("text"), ms),
      f => filter(split(f, "\\|"), t => length(t) > 0)))
    val base = docs(s, dir).withColumn("bucket",
      pmod(TextHash.poly_hash(concat(col("text"), lit("|split"))), lit(1000)))
    rareGramContamPairs(
      base.select(col("doc_id"), col("bucket"),
        explode(TextHash.word_gram_hashes(
          array_join(toks, " "), 16, distinct = true)).as("g")),
      dfCap = 50, outName = "shared_tok_grams")
  }

  val d69Sql: String = {
    val folds = d38Merges.sortBy(_._1).flatMap { case (_, l, r) =>
      Seq.fill(graft.functions.Bpe.Passes)(s"'|$l|$r|=|$l$r|'")
    }.mkString(", ")
    s"""WITH b AS (
       |  SELECT doc_id, ${duckHash("(text || '|split')")} % 1000 AS bucket,
       |         regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, bucket,
       |    list_transform(ws, bp_w ->
       |      list_reduce(
       |        list_prepend(
       |          '|' || regexp_replace(bp_w[1:256], '(.)', '\\1|', 'g'),
       |          [$folds]),
       |        (bp_acc, bp_m) -> replace(bp_acc,
       |          split_part(bp_m, '=', 1), split_part(bp_m, '=', 2))))
       |      AS fs
       |  FROM b),
       |tok AS (
       |  SELECT doc_id, bucket,
       |    flatten(list_transform(fs, tb_f ->
       |      list_filter(string_split(tb_f, '|'), tb_t -> len(tb_t) > 0)))
       |      AS toks
       |  FROM f),
       |th AS (
       |  SELECT doc_id, bucket,
       |    list_transform(toks, tb_k -> ${duckHash("tb_k")}) AS h
       |  FROM tok),
       |g AS (
       |  SELECT doc_id, bucket, unnest(list_distinct(
       |    list_transform(range(1, len(h)-14), g_i ->
       |      list_reduce(list_prepend(CAST(0 AS BIGINT), h[g_i:g_i+15]),
       |        (ga, gx) -> (ga*31 + gx) % 1000000007)))) AS g
       |  FROM th),
       |rare AS (SELECT g FROM g GROUP BY g HAVING count(*) <= 50),
       |gr AS (SELECT doc_id, bucket, g FROM g JOIN rare USING (g))
       |SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
       |       count(*) AS shared_tok_grams
       |FROM (SELECT doc_id, g FROM gr WHERE bucket < 900) tr
       |JOIN (SELECT doc_id, g FROM gr WHERE bucket >= 950) te USING (g)
       |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin
  }

  /** [[duckKmeansChain]] with every CTE name prefixed, so several
    * instances (one per PQ subspace) can coexist in one query. Only
    * the eight chain-internal CTE names are rewritten; column
    * aliases pass through untouched.
    */
  private def duckKmeansChainPrefixed(p: String, dim: Int,
      kcSql: String): String =
    duckKmeansChain(dim, kcSql).replaceAll(
      "\\b(vn|vx|v|seeds|a0|comps|c1|cents|assign)\\b", p + "$1")

  /** D50 — product quantization (PQ, [[graft.similarity.Pq]]):
    * m=4 spherical sub-quantizers of 16 dims × 16 codes over the
    * embeddings, every vector encoded to 4 codes (64× compression at
    * dim=64 — the billion-vector memory story), then asymmetric-
    * distance (ADC) top-4 for the fixed `vec_id < 50` query set against the
    * RECONSTRUCTED corpus. [[graft.similarity.Pq.adcTopK]] touches
    * only (vid, codes) of the encoded side plus m·kc broadcast
    * codebook rows; this FUSED entry derives the codes in-query (the
    * c26 convention — build cost priced into the bench number), while
    * production persists the codes table once and probes it many
    * times, reading 4 bytes/vector instead of the raw embeddings.
    * Because the sub-quantizers are the same seeded exact-BIGINT
    * kmeans as IVF's coarse quantizer, codes, reconstructions, and
    * ADC scores are bit-reproducible — the oracle replays the entire
    * train→encode→reconstruct→rank chain in SQL (four prefixed
    * kmeans CTE chains), making this a hash-exact PQ, not a
    * recall-audited one. Recall quality vs exact search is pinned
    * separately in Round15OpsSpec on clustered data.
    *
    * kc = 16 here is NOT an oracle-tractability pin (the r15 verdict
    * asked; adjudicated r16): a PQ sub-quantizer's kc is the CODE
    * WIDTH — log2 kc bits per subspace code, 4 bits here, 8 bits
    * (kc=256) in Jégou §II — a compression-ratio constant chosen per
    * deployment, independent of corpus size. The corpus-derived
    * quantity in this family is the COARSE kc, which plain PQ does
    * not have; d51/d57 (IVFADC) derive it as clamp(⌈√N⌉, 16,
    * KCentroidsMax) with adaptive nprobe, and d37 does the same for
    * the persisted IVF index.
    */
  def d50(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.Pq
    val e = emb(s, dir)
    val cbs = Pq.trainCodebooks(e, "vec_id", "embedding",
      m = 4, subDim = 16, kc = 16)
    val enc = Pq.encode(e, "vec_id", "embedding", cbs, m = 4, subDim = 16)
    // FIXED query set (the d9 brute-force convention, not d19/d37's
    // corpus-scaling % set): plain PQ's probe is a linear ADC scan
    // PER QUERY — with a %-set the entry's cost grows O(N²/40) and
    // the bench aliases query-set growth as corpus scaling. Routing
    // that absorbs a scaling query set is exactly d51's IVFADC.
    Pq.adcTopK(e.filter(col("vec_id") < 50), enc, cbs,
      "vec_id", "embedding", m = 4, subDim = 16, k = 4)
  }

  val d50Sql: String = {
    val sliceOk = (0 until 4).map { mi =>
      val sl = s"fe[${mi * 16 + 1}:${(mi + 1) * 16}]"
      s"sqrt(${duckDot(sl, sl)}) > 0"
    }.mkString("\n    AND ")
    val chains = (0 until 4).map { mi =>
      s"""p${mi}vn AS (
         |  SELECT vec_id, fe[${mi * 16 + 1}:${(mi + 1) * 16}] AS e FROM okv),
         |${duckKmeansChainPrefixed(s"p$mi", dim = 16, kcSql = "16")}""".stripMargin
    }.mkString(",\n")
    s"""WITH okv AS (
       |  SELECT vec_id, fe FROM (
       |    SELECT vec_id,
       |      list_transform(embedding, pq_x -> CAST(pq_x AS DOUBLE)) AS fe
       |    FROM embeddings)
       |  WHERE $sliceOk),
       |$chains,
       |recon AS (
       |  SELECT v0.vec_id, cc0.ce || cc1.ce || cc2.ce || cc3.ce AS re
       |  FROM p0assign v0
       |  JOIN p0cents cc0 ON v0.cid = cc0.cid
       |  JOIN p1assign v1 ON v1.vec_id = v0.vec_id
       |  JOIN p1cents cc1 ON v1.cid = cc1.cid
       |  JOIN p2assign v2 ON v2.vec_id = v0.vec_id
       |  JOIN p2cents cc2 ON v2.cid = cc2.cid
       |  JOIN p3assign v3 ON v3.vec_id = v0.vec_id
       |  JOIN p3cents cc3 ON v3.cid = cc3.cid),
       |scored AS (
       |  SELECT q.vec_id AS q_id, r.vec_id AS n_id,
       |    ${duckDot("q.fe", "r.re")} /
       |      (sqrt(${duckDot("q.fe", "q.fe")}) *
       |       sqrt(${duckDot("r.re", "r.re")})) AS adc_cos
       |  FROM (SELECT * FROM okv WHERE vec_id < 50) q
       |  CROSS JOIN recon r WHERE r.vec_id <> q.vec_id)
       |SELECT q_id, rk, n_id, adc_cos FROM (
       |  SELECT q_id, n_id, adc_cos,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY adc_cos DESC, n_id) AS BIGINT) AS rk
       |  FROM scored) WHERE rk <= 4""".stripMargin
  }

  /** D20 — deterministic stratified sampling: per-language per-mille
    * rates (downsample dominant en, mildly thin zh, keep the rest),
    * keep-decision a pure function of content hash
    * ([[graft.sampling.Sampler.stratified]]).
    */
  def d20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rates = Seq(("en", 400L), ("zh", 800L), ("de", 1000L),
      ("es", 1000L), ("fr", 1000L)).toDF("lang", "rate_pm")
    graft.sampling.Sampler.stratified(docs(s, dir), rates, "lang", "text", "strat")
      .select("doc_id", "lang", "samp_pm")
  }

  val d20Sql: String =
    s"""WITH r AS (
       |  SELECT * FROM (VALUES ('en', 400), ('zh', 800), ('de', 1000),
       |    ('es', 1000), ('fr', 1000)) AS t(lang, rate_pm))
       |SELECT doc_id, lang, samp_pm FROM (
       |  SELECT doc_id, lang,
       |    ${duckHash("(text || '|strat')")} % 1000 AS samp_pm, rate_pm
       |  FROM documents JOIN r USING (lang))
       |WHERE samp_pm < rate_pm""".stripMargin

  /** D21 — eval-set decontamination: test-split documents sharing
    * >= 2 rare (df <= 50) distinct 5-word-grams with a train-split
    * document, using the D15 content-hash split. The df cap drops
    * boilerplate grams that carry no contamination signal AND bounds
    * the join's per-key fanout — the same skew defense as d6.
    * Single-pass shape: see [[rareGramContamPairs]].
    */
  def d21(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).withColumn("bucket",
      pmod(TextHash.poly_hash(concat(col("text"), lit("|split"))), lit(1000)))
    rareGramContamPairs(
      base.select(col("doc_id"), col("bucket"),
        explode(TextHash.word_gram_hashes(col("text"), 5, distinct = true))
          .as("g")),
      dfCap = 50, outName = "shared_grams")
  }

  /** Shared core of d21/d69 (r17 restructure, the d49 scale shape
    * generalized): only grams that occur in the TEST split can ever
    * contribute a (train, test) pair, so the corpus-wide gram stream
    * is pruned MAP-SIDE — inside the scan's codegen span, before any
    * exchange — by a driver-held Bloom filter over the distinct
    * test-split grams ([[graft.functions.Bloom]], 1% fpp). Bloom
    * passes are all-or-nothing per gram VALUE (no false negatives),
    * so a surviving gram's df over the sliver equals its bloom-free
    * corpus df, false-positive grams have no test occurrence and die
    * at the size(te) >= 1 filter, and the result is bit-identical to
    * the unfiltered plan — d49's exactness argument.
    *
    * On the surviving sliver (test-adjacent grams only — key
    * cardinality bounded by the eval suite's gram count, a dim-class
    * contract, NOT the corpus), ONE bounded aggregation computes the
    * total df plus the complete train/test posting lists, capped
    * INSIDE the aggregation at dfCap+1 ids by the d6 bounded-heap
    * machinery: a kept gram's df <= dfCap guarantees both lists are
    * complete, so the exploded train×test pairs are exactly the old
    * three-join formulation's rows.
    *
    * Replaces the r16 shape — persist the corpus-wide exploded gram
    * table MEMORY_AND_DISK (the verdict's leak class: a lazy-return
    * operator can never unpersist it), groupBy the FULL stream for
    * df, join the grams back, then train⋈test on gram — which paid
    * four corpus-gram exchanges plus the session-lifetime cache.
    * Now: one test-split gram pass (bloom build), one bloom-pruned
    * corpus pass, one sliver exchange, one tiny pair exchange,
    * no cache at all.
    */
  private[graft] def rareGramContamPairs(grams: DataFrame, dfCap: Int,
      outName: String): DataFrame = {
    val bloom = graft.functions.Bloom.buildLong(
      grams.filter(col("bucket") >= 950).select("g").distinct(), "g")
    grams.where(graft.functions.Bloom.might_contain(bloom, col("g")))
      .groupBy("g")
      .agg(count(lit(1)).as("df"),
        graft.functions.TopKAgg.top_k(
          when(col("bucket") < 900, -col("doc_id").cast("double")),
          col("doc_id"), dfCap + 1).as("tr"),
        graft.functions.TopKAgg.top_k(
          when(col("bucket") >= 950, -col("doc_id").cast("double")),
          col("doc_id"), dfCap + 1).as("te"))
      .filter(col("df") <= dfCap &&
        size(col("tr")) >= 1 && size(col("te")) >= 1)
      .select(explode(transform(col("tr"), t => t("id"))).as("train_id"),
        transform(col("te"), t => t("id")).as("__te"))
      .select(col("train_id"), explode(col("__te")).as("test_id"))
      .groupBy("train_id", "test_id")
      .agg(count(lit(1)).as(outName))
      .filter(col(outName) >= 2)
  }

  val d21Sql: String =
    s"""WITH b AS (
       |  SELECT doc_id, ${duckHash("(text || '|split')")} % 1000 AS bucket,
       |         text FROM documents),
       |th AS (SELECT doc_id, bucket, $duckTokenHashes AS h FROM b),
       |g AS (
       |  SELECT doc_id, bucket, unnest(list_distinct(
       |    list_transform(range(1, len(h)-3), g_i ->
       |      list_reduce(list_prepend(CAST(0 AS BIGINT), h[g_i:g_i+4]),
       |        (ga, gx) -> (ga*31 + gx) % 1000000007)))) AS g
       |  FROM th),
       |rare AS (SELECT g FROM g GROUP BY g HAVING count(*) <= 50),
       |gr AS (SELECT doc_id, bucket, g FROM g JOIN rare USING (g))
       |SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
       |       count(*) AS shared_grams
       |FROM (SELECT doc_id, g FROM gr WHERE bucket < 900) tr
       |JOIN (SELECT doc_id, g FROM gr WHERE bucket >= 950) te USING (g)
       |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin

  /** D51 — IVFADC ([[graft.similarity.Pq.ivfAdcTopK]]): the d37/d19
    * IVF routing composed with d50's PQ codes — queries probe their
    * 4 nearest coarse lists and score ONLY those lists' members, by
    * ADC over reconstructed codes. The two sublinearities compose:
    * ~nprobe/kcCoarse of the corpus is touched, and what is touched
    * is m bytes of codes per vector, not the raw embedding. Both
    * quantizer levels are the same seeded exact-BIGINT kmeans, so
    * the full composition (coarse route + PQ rank) replays in SQL —
    * five kmeans CTE chains, one oracle, hash-exact.
    */
  def d51(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.Pq
    val e = emb(s, dir)
    // kcCoarse/nprobe = 0: the deployed derived rules (√N clamp +
    // adaptiveNprobe) over the PQ-valid corpus — see the d37
    // scaladoc. The SUB-quantizer kc stays 16: it is the code width
    // (log2 kc = 4 bits per subspace code — Jégou §II's constant,
    // 8 bits in the paper), a compression parameter independent of
    // corpus size, not an oracle-tractability pin.
    Pq.ivfAdcTopK(e.filter(col("vec_id") % 40 === 0), e,
      "vec_id", "embedding", m = 4, subDim = 16, kc = 16,
      kcCoarse = 0, nprobe = 0, k = 4)
  }

  /** The IVFADC oracle's CTE chain through `scored` (coarse kmeans +
    * four sub-quantizer kmeans chains + reconstruction + the nprobe=4
    * probe + ADC scoring of probed-list members) for the
    * `vec_id % 40 = 0` query set — shared by d51 (top-k cut) and d57
    * (shortlist + exact re-rank).
    */
  private def ivfAdcScoredCtes: String = {
    val sliceOk = (0 until 4).map { mi =>
      val sl = s"fe[${mi * 16 + 1}:${(mi + 1) * 16}]"
      s"sqrt(${duckDot(sl, sl)}) > 0"
    }.mkString("\n    AND ")
    // coarse kc + nprobe are data-derived over okv — the PQ-valid
    // frame [[graft.similarity.Pq.ivfAdcTopK]] counts; sub-quantizer
    // kc stays 16 (the 4-bit code width — see the d51 scaladoc)
    val (coarseKcSql, coarseNpSql) = derivedKcSub("okv")
    val chains = (0 until 4).map { mi =>
      s"""p${mi}vn AS (
         |  SELECT vec_id, fe[${mi * 16 + 1}:${(mi + 1) * 16}] AS e FROM okv),
         |${duckKmeansChainPrefixed(s"p$mi", dim = 16, kcSql = "16")}""".stripMargin
    }.mkString(",\n")
    s"""okv AS (
       |  SELECT vec_id, fe FROM (
       |    SELECT vec_id,
       |      list_transform(embedding, pq_x -> CAST(pq_x AS DOUBLE)) AS fe
       |    FROM embeddings)
       |  WHERE $sliceOk),
       |cgvn AS (SELECT vec_id, fe AS e FROM okv),
       |${duckKmeansChainPrefixed("cg", dim = 64, kcSql = coarseKcSql)},
       |$chains,
       |recon AS (
       |  SELECT v0.vec_id, cc0.ce || cc1.ce || cc2.ce || cc3.ce AS re
       |  FROM p0assign v0
       |  JOIN p0cents cc0 ON v0.cid = cc0.cid
       |  JOIN p1assign v1 ON v1.vec_id = v0.vec_id
       |  JOIN p1cents cc1 ON v1.cid = cc1.cid
       |  JOIN p2assign v2 ON v2.vec_id = v0.vec_id
       |  JOIN p2cents cc2 ON v2.cid = cc2.cid
       |  JOIN p3assign v3 ON v3.vec_id = v0.vec_id
       |  JOIN p3cents cc3 ON v3.cid = cc3.cid),
       |probes AS (
       |  SELECT q_id, fe, qnrm, cid FROM (
       |    SELECT q.vec_id AS q_id, q.fe,
       |      sqrt(${duckDot("q.fe", "q.fe")}) AS qnrm, c.cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${duckDot("q.fe", "c.ce")} /
       |          (sqrt(${duckDot("q.fe", "q.fe")}) * c.cnrm) DESC,
       |                 c.cid) AS crk
       |    FROM (SELECT * FROM okv WHERE vec_id % 40 = 0) q
       |    CROSS JOIN cgcents c) WHERE crk <= $coarseNpSql),
       |scored AS (
       |  SELECT p.q_id, a.vec_id AS n_id,
       |    ${duckDot("p.fe", "r.re")} /
       |      (p.qnrm * sqrt(${duckDot("r.re", "r.re")})) AS adc_cos
       |  FROM probes p
       |  JOIN cgassign a USING (cid)
       |  JOIN recon r ON a.vec_id = r.vec_id
       |  WHERE a.vec_id <> p.q_id)""".stripMargin
  }

  val d51Sql: String =
    s"""WITH $ivfAdcScoredCtes
       |SELECT q_id, rk, n_id, adc_cos FROM (
       |  SELECT q_id, n_id, adc_cos,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY adc_cos DESC, n_id) AS BIGINT) AS rk
       |  FROM scored) WHERE rk <= 4""".stripMargin

  /** D57 — IVFADC+R ([[graft.similarity.Pq.ivfAdcRerank]] — Jégou et
    * al. 2011 §V): d51's route-and-ADC produces a 16-candidate
    * SHORTLIST per query, and only shortlist members are re-scored by
    * EXACT cosine over their raw vectors before the final top-4 cut —
    * the standard recall-restoring refinement, paying exact-vector
    * I/O for kShort rows per query instead of a corpus scan. The
    * shortlist is the broadcast side of the refinement join, so the
    * corpus vector table streams through reading (vid, vec) only.
    * Every kernel is d51's bit-reproducible machinery plus the d9
    * exact-cosine fold, so the full composition replays in SQL:
    * the shared IVFADC chain + one shortlist CTE + one refinement
    * join.
    */
  def d57(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.Pq
    val e = emb(s, dir)
    // derived kcCoarse/nprobe, fixed 4-bit sub-quantizer — the d51
    // convention (shared shortlist chain, shared rationale)
    Pq.ivfAdcRerank(e.filter(col("vec_id") % 40 === 0), e,
      "vec_id", "embedding", m = 4, subDim = 16, kc = 16,
      kcCoarse = 0, nprobe = 0, kShort = 16, k = 4)
  }

  val d57Sql: String =
    s"""WITH $ivfAdcScoredCtes,
       |short AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY adc_cos DESC, n_id) AS srk
       |    FROM scored) WHERE srk <= 16),
       |rr AS (
       |  SELECT sh.q_id, sh.n_id,
       |    ${duckDot("qv.fe", "nv.fe")} /
       |      (sqrt(${duckDot("qv.fe", "qv.fe")}) *
       |       sqrt(${duckDot("nv.fe", "nv.fe")})) AS cos
       |  FROM short sh
       |  JOIN okv qv ON qv.vec_id = sh.q_id
       |  JOIN okv nv ON nv.vec_id = sh.n_id)
       |SELECT q_id, rk, n_id, cos FROM (
       |  SELECT q_id, n_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, n_id) AS BIGINT) AS rk
       |  FROM rr) WHERE rk <= 4""".stripMargin

  /** D58 — SPANN-layout ANN ([[graft.similarity.Similarity.spannTopK]]
    * — Chen et al., NeurIPS 2021 §3.2 closure assignment): inverted
    * lists with BOUNDARY DUPLICATION — every vector joins its argmax
    * list plus any list whose centroid cosine is within 0.05 of the
    * best (≤2 replicas), so the vectors a single-assignment probe at
    * nprobe=1 systematically misses are present in every list they
    * border, and the probe still reads ONE inverted list. Assignment
    * is fully map-side (centroids re-enter as one array-of-struct
    * literal — the d52 idiom — per row: kc in-row cosine folds + one
    * in-row sort, no crossJoin expansion, no window, no exchange);
    * replication bounds list growth at ≤2×. Deterministic end to end
    * (shared kmeans quantizer + double compares + the argmax tie
    * rule) → full SQL oracle.
    */
  def d58(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.similarity.Similarity.spannTopK(
      e.filter(col("vec_id") % 40 === 0), e, "vec_id", "embedding",
      k = 4, kCentroids = 16, deltaMilli = 50, maxAssign = 2, nprobe = 1)
  }

  val d58Sql: String = {
    val vc = s"${duckDot("v.e", "c.ce")} / (v.nrm * c.cnrm)"
    s"""WITH $duckKmeansAssign,
       |closure AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT v.vec_id, c.cid,
       |      $vc AS csim,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY $vc DESC, c.cid) AS ark,
       |      max($vc) OVER (PARTITION BY v.vec_id) AS best
       |    FROM v CROSS JOIN cents c)
       |  WHERE ark <= 2 AND csim >= best - 0.05),
       |probes AS (
       |  SELECT q_id, cid FROM (
       |    SELECT q.vec_id AS q_id, c.cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${duckDot("q.e", "c.ce")} / (q.nrm * c.cnrm) DESC,
       |                 c.cid) AS crk
       |    FROM (SELECT * FROM v WHERE vec_id % 40 = 0) q
       |    CROSS JOIN cents c) WHERE crk <= 1),
       |scored AS (
       |  SELECT DISTINCT p.q_id, cl.vec_id AS n_id,
       |    ${duckDot("q.e", "n.e")} / (q.nrm * n.nrm) AS cos
       |  FROM probes p
       |  JOIN closure cl USING (cid)
       |  JOIN v q ON p.q_id = q.vec_id
       |  JOIN v n ON cl.vec_id = n.vec_id
       |  WHERE cl.vec_id <> p.q_id)
       |SELECT q_id, rk, n_id, cos FROM (
       |  SELECT q_id, n_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, n_id) AS BIGINT) AS rk
       |  FROM scored) WHERE rk <= 4""".stripMargin
  }

  /** D49 — bloom-prefiltered decontamination (d21's contract at the
    * 100 TB shape): test-split documents sharing >= 2 distinct
    * 5-token-grams with a train document. Where d21 caps fanout with
    * a corpus-wide rare-gram pass (a full train+test gram shuffle —
    * the one thing a 100 TB train side cannot afford), d49's
    * candidate grams are exactly the grams PRESENT IN THE TEST SPLIT
    * with a train-side per-gram occurrence cap (<= 200) computed
    * over those candidates only.
    *
    * Scale shape: the test-split gram set folds to a driver-held
    * Bloom filter ([[graft.functions.Bloom]], 1% fpp, ~1.2
    * bytes/gram) embedded as a codegen'd [[might_contain]] predicate
    * on the train-side gram stream — the corpus-sized side is pruned
    * MAP-SIDE, inside the scan's whole-stage-codegen span, before
    * anything shuffles; only the surviving sliver (true candidates +
    * ~1% false positives) pays the exchange, and only that sliver is
    * persisted. Bit-exactness despite the approximation: false
    * positives cannot reach the output (the pair join against the
    * test gram stream is the exact confirm), and the df cap counts
    * per-gram train occurrences that the bloom passes IN FULL (no
    * false negatives), so every surviving gram's count equals the
    * bloom-free count — the oracle replays the semantics with no
    * bloom at all.
    */
  def d49(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).withColumn("bucket",
      pmod(TextHash.poly_hash(concat(col("text"), lit("|split"))), lit(1000)))
    def grams(d: DataFrame, idCol: String): DataFrame = d.select(
      col("doc_id").as(idCol),
      explode(TextHash.word_gram_hashes(col("text"), 5, distinct = true)).as("g"))
    // The test split is the operator's dim-class side (a fixed eval
    // suite, not the crawl) — persisting ITS gram stream is bounded
    // by contract, and saves the second full corpus scan its two
    // consumers (bloom build, pair join) would otherwise each pay.
    val testG = grams(base.filter(col("bucket") >= 950), "test_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bloom = graft.functions.Bloom.buildLong(
      testG.select("g").distinct(), "g")
    // Post-bloom sliver only — the full train gram stream is never
    // shuffled or persisted (d21 persists the whole corpus's grams).
    val trainG = grams(base.filter(col("bucket") < 900), "train_id")
      .where(graft.functions.Bloom.might_contain(bloom, col("g")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capped = trainG.groupBy("g").agg(count(lit(1)).as("tdf"))
      .filter(col("tdf") <= 200).select("g")
    trainG.join(capped, "g").join(testG, "g")
      .groupBy("train_id", "test_id")
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= 2)
  }

  /** Oracle of [[d49]] — the bloom-free replay: train grams
    * restricted to the test-split gram set, per-gram train df <= 200
    * over that restriction, pairs sharing >= 2. The bloom changes
    * which rows shuffle, never which rows result.
    */
  val d49Sql: String =
    s"""WITH b AS (
       |  SELECT doc_id, ${duckHash("(text || '|split')")} % 1000 AS bucket,
       |         text FROM documents),
       |th AS (SELECT doc_id, bucket, $duckTokenHashes AS h FROM b),
       |g AS (
       |  SELECT doc_id, bucket, unnest(list_distinct(
       |    list_transform(range(1, len(h)-3), g_i ->
       |      list_reduce(list_prepend(CAST(0 AS BIGINT), h[g_i:g_i+4]),
       |        (ga, gx) -> (ga*31 + gx) % 1000000007)))) AS g
       |  FROM th),
       |tg AS (SELECT doc_id AS test_id, g FROM g WHERE bucket >= 950),
       |tgset AS (SELECT DISTINCT g FROM tg),
       |trk AS (
       |  SELECT doc_id AS train_id, g.g FROM g JOIN tgset USING (g)
       |  WHERE bucket < 900),
       |capped AS (SELECT g FROM trk GROUP BY g HAVING count(*) <= 200)
       |SELECT train_id, test_id, count(*) AS shared_grams
       |FROM trk JOIN capped USING (g) JOIN tg USING (g)
       |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin

  /** Oracle of StreamingQueries c29 — d49's bloom-free replay WITHOUT
    * the train-side df cap (the cap is an offline-corpus statistic;
    * the streaming gate's semantics are pure containment against the
    * fixed test set). Lives here for the shared hash fragments.
    */
  val c29StreamDecontamSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, ${duckHash("(text || '|split')")} % 1000 AS bucket,
       |         text FROM documents),
       |th AS (SELECT doc_id, bucket, $duckTokenHashes AS h FROM b),
       |g AS (
       |  SELECT doc_id, bucket, unnest(list_distinct(
       |    list_transform(range(1, len(h)-3), g_i ->
       |      list_reduce(list_prepend(CAST(0 AS BIGINT), h[g_i:g_i+4]),
       |        (ga, gx) -> (ga*31 + gx) % 1000000007)))) AS g
       |  FROM th),
       |tg AS (SELECT doc_id AS test_id, g FROM g WHERE bucket >= 950),
       |trn AS (SELECT doc_id AS train_id, g FROM g WHERE bucket < 900)
       |SELECT train_id, test_id, count(*) AS shared_grams
       |FROM trn JOIN tg USING (g)
       |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin

  /** D52 — DSIR-shaped data selection
    * ([[graft.sampling.Dsir.importanceWeights]] — Xie et al. 2023):
    * hashed-bigram importance weighting of every document against a
    * trusted target distribution. Target here: the `lang = 'en'`
    * slice; raw: the full corpus; features: word bigrams hashed into
    * 2039 buckets (prime — a power-of-two modulus resonates with the
    * base-31 gram hashes on structured vocabularies and collapses
    * distinct dialects into shared buckets; see
    * [[graft.sampling.Dsir.DefaultBuckets]]); the log is the
    * bit-length log2 (integer-exact —
    * same policy as d3/d29: a float `ln` sum over thousands of terms
    * drifts by ulps and flips threshold decisions across engines).
    * Selection = weight-per-1000-grams >= 0; threshold-based, no
    * global sort.
    *
    * 100 TB shape (measured in the plan pin, DataSelectionSpec): one
    * corpus gram scan aggregated to <= 2039 rows, a dim-class
    * collect re-entering as ONE array-literal data node, then a
    * fully MAP-SIDE scoring pass — no explode, no join, no exchange
    * in the per-doc output.
    */
  def d52(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Dsir.importanceWeights(
      docs(s, dir), "doc_id", "text",
      isTarget = col("lang") === "en")

  /** Oracle of [[d52]] — the join-form replay: per-bucket counts and
    * per-doc weights via explicit joins (the oracle has no literal
    * array, but the arithmetic — bit-length log2, add-one smoothing,
    * truncating division — is term-for-term identical).
    */
  val d52Sql: String =
    s"""WITH th AS (SELECT doc_id, lang, $duckTokenHashes AS h FROM documents),
       |g AS (
       |  SELECT doc_id, lang, unnest(list_transform(range(1, len(h)),
       |    dg_i -> ((h[dg_i]*31 + h[dg_i+1]) % 1000000007) % 2039)) AS b
       |  FROM th),
       |bc AS (
       |  SELECT b, CAST(count(*) AS BIGINT) AS cr,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
       |  FROM g GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(cr) AS BIGINT) AS nr,
       |         CAST(sum(ct) AS BIGINT) AS nt FROM bc),
       |sc AS (
       |  SELECT b, (length(bin(ct+1))-1) - (length(bin(cr+1))-1)
       |    + (length(bin(nr+2039))-1) - (length(bin(nt+2039))-1) AS s
       |  FROM bc, tot),
       |dw AS (
       |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |         CAST(sum(s) AS BIGINT) AS w_ilog
       |  FROM g JOIN sc USING (b) GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(dw.n_grams, 0) AS n_grams,
       |  coalesce(dw.w_ilog, 0) AS w_ilog,
       |  CASE WHEN coalesce(dw.n_grams, 0) > 0
       |       THEN dw.w_ilog * 1000 // dw.n_grams END AS wpt_pm,
       |  CASE WHEN coalesce(dw.n_grams, 0) > 0
       |       THEN (dw.w_ilog * 1000 // dw.n_grams) >= 0 END AS selected
       |FROM documents d LEFT JOIN dw USING (doc_id)""".stripMargin

  /** D64 — corpus LINE-level dedup report (the RefinedWeb/Dolma
    * line-dedup pass — Penedo et al. 2023 §3.4, Soldaini et al.
    * 2024: exact-duplicate LINES across a crawl are navigation
    * chrome, cookie banners, and footers; removing them is the
    * single highest-yield boilerplate cut after page dedup): per
    * document, how many of its non-blank lines occur in >= 5 OTHER
    * documents (dup_lines), and the per-mille of content they
    * represent — the removal statistic a cleaning pass acts on.
    * Complements d34 (frequent word-GRAMS as a corpus report) with
    * the line-granular, per-document attribution the actual cut
    * needs.
    *
    * 100 TB shape: lines hash in-row (md5 of the trimmed line — a
    * 128-bit key, the d1 birthday rule); the line stream aggregates
    * by hash with map-side partial combine (boilerplate lines are
    * exactly the hot keys partial agg absorbs — same defense as
    * d55's seed counts); the frequent-line set (df >= 5, tiny by
    * construction at any scale) broadcasts back into a semi-join
    * flag — ONE corpus-line shuffle total, the d34 discipline at
    * line grain.
    */
  /** The line-dedup kernel over a `(doc_id, lines)` frame — the
    * semantics the specs pin directly; [[d64]] feeds it the
    * web-ified corpus.
    */
  private[graft] def lineDedupReport(docLines: DataFrame,
      minDf: Int): DataFrame = {
    // Deliberately NOT persisted: the line stream appears twice in
    // the plan (df-count build side + probe side), but caching it
    // means materializing a super-corpus-sized explode to disk for
    // the lifetime of a lazy-return frame — at scale two streaming
    // scans with in-row trim/md5 are cheaper than the cache write +
    // read, and nothing leaks in the session cache.
    val lines = docLines
      .select(col("doc_id"),
        explode(filter(transform(col("lines"), l => trim(l)),
          l => length(l) > 0)).as("line"))
      .select(col("doc_id"), md5(col("line")).as("lh"),
        length(col("line")).cast("long").as("lchars"))
    val frequent = lines.groupBy("lh")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select("lh")
    lines
      .join(broadcast(frequent.withColumn("__dup", lit(1L))), Seq("lh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__dup").isNotNull, 1L).otherwise(0L)).as("dup_lines"),
        sum(col("lchars")).as("n_chars_l"),
        sum(when(col("__dup").isNotNull, col("lchars")).otherwise(0L))
          .as("dup_chars"))
      .withColumn("dup_pm", expr("dup_chars * 1000 div n_chars_l"))
      .select("doc_id", "n_lines", "dup_lines", "dup_pm")
  }

  def d64(s: SparkSession, dir: String): DataFrame =
    lineDedupReport(
      docs(s, dir).select(col("doc_id"), webLines.as("lines")), minDf = 5)

  val d64Sql: String =
    s"""WITH $duckWebLines,
       |l0 AS (
       |  SELECT doc_id, trim(dl_l) AS line
       |  FROM (SELECT doc_id, unnest(lines) AS dl_l FROM wl)
       |  WHERE length(trim(dl_l)) > 0),
       |l AS (
       |  SELECT doc_id, md5(line) AS lh,
       |    CAST(length(line) AS BIGINT) AS lchars FROM l0),
       |freq AS (
       |  SELECT lh FROM l GROUP BY lh HAVING count(DISTINCT doc_id) >= 5)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(sum(CASE WHEN f.fh IS NULL THEN 0 ELSE 1 END) AS BIGINT)
       |    AS dup_lines,
       |  CAST(sum(CASE WHEN f.fh IS NULL THEN 0 ELSE lchars END) * 1000
       |    // sum(lchars) AS BIGINT) AS dup_pm
       |FROM l LEFT JOIN (SELECT lh, lh AS fh FROM freq) f USING (lh)
       |GROUP BY doc_id""".stripMargin

  /** D63 — the C4 cleaning battery (Raffel et al., "Exploring the
    * Limits of Transfer Learning with a Unified Text-to-Text
    * Transformer", JMLR 2020 §2.2 — the filter set behind C4, the
    * most-reused pretraining corpus recipe): line-level retention +
    * page-level drops, with per-rule attribution (the d24/d62
    * observability contract):
    *
    *   line kept  — trimmed line ends in terminal punctuation
    *                (. ! ? ") and does not mention 'javascript'
    *   r_sent     — page has >= 3 terminal-punctuation marks
    *   r_lorem    — no 'lorem ipsum' placeholder
    *   r_brace    — no '{' (code leakage)
    *   keep       — all of the above and >= 1 kept line
    *
    * Line split, the per-line filter, and every count are IN-ROW
    * (one corpus scan, zero shuffles, zero UDFs); counts are exact
    * integers in both engines.
    */
  /** The C4/line-grain rule kernel over a `(doc_id, lines)` frame —
    * the semantics the specs pin directly; [[d63]] feeds it the
    * web-ified corpus.
    */
  private[graft] def c4Filters(docLines: DataFrame): DataFrame = {
    val kept = filter(col("lines"), l =>
      trim(l).rlike("[.!?\"]$") && instr(lower(l), "javascript") === 0)
    val joined = array_join(col("lines"), "\n")
    docLines
      .select(col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        (length(joined) - length(regexp_replace(joined, "[.!?]", "")))
          .cast("long").as("n_term"),
        (instr(lower(joined), "lorem ipsum") > 0).as("has_lorem"),
        (instr(joined, "{") > 0).as("has_brace"))
      .withColumn("r_sent", col("n_term") >= 3)
      .withColumn("keep",
        col("r_sent") && !col("has_lorem") && !col("has_brace") &&
          col("n_kept") >= 1)
      .select("doc_id", "n_lines", "n_kept", "n_term", "has_lorem",
        "has_brace", "r_sent", "keep")
  }

  /** Deterministic WEB-IFICATION of the synthetic corpus for the
    * line-grain batteries (the d16 injected-contamination
    * convention): the generator's documents are single-line,
    * punctuation-free token streams, on which every C4/line rule is
    * vacuously false — so the catalog entries derive a web-shaped
    * rendering IN-ROW: body tokens regroup into 12-token
    * sentence-lines (each '.'-terminated), and three boilerplate
    * tails inject by doc_id residue (a 'javascript' line at %4=0, a
    * 'lorem ipsum' line at %4=1, a '{' line at %4=2, a
    * high-df subscription banner at %3=0) so EVERY rule fires both
    * ways at every SF. Pure per-row arithmetic on (doc_id, text);
    * the oracle replays it term for term.
    */
  private def webLines: Column = {
    val toks = split(trim(col("text")), "\\s+")
    val ng = ((size(toks) + lit(11)) / lit(12)).cast("int")
    val body = transform(sequence(lit(1), greatest(ng, lit(1))), g =>
      concat(array_join(slice(toks, (g - 1) * 12 + 1, lit(12)), " "),
        lit(".")))
    val t4 = col("doc_id") % 4
    val tail1 = when(t4 === 0, array(lit("Enable javascript to continue")))
      .when(t4 === 1, array(lit("lorem ipsum dolor")))
      .when(t4 === 2, array(lit("see our { source code.")))
      .otherwise(array().cast("array<string>"))
    val tail2 = when(col("doc_id") % 3 === 0,
        array(lit("Subscribe to our newsletter.")))
      .otherwise(array().cast("array<string>"))
    concat(body, tail1, tail2)
  }

  /** Oracle twin of [[webLines]]: a CTE producing (doc_id, lines).
    * A def, not a val: d64Sql initializes before this point in the
    * object body and a val would still be null there.
    */
  private def duckWebLines: String =
    """wt AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |wl AS (
      |  SELECT doc_id, list_concat(list_concat(
      |    list_transform(range(1, greatest((len(toks)+11)//12, 1)+1),
      |      wg_g -> array_to_string(
      |        toks[(wg_g-1)*12+1 : (wg_g-1)*12+12], ' ') || '.'),
      |    CASE WHEN doc_id % 4 = 0 THEN ['Enable javascript to continue']
      |         WHEN doc_id % 4 = 1 THEN ['lorem ipsum dolor']
      |         WHEN doc_id % 4 = 2 THEN ['see our { source code.']
      |         ELSE [] END),
      |    CASE WHEN doc_id % 3 = 0 THEN ['Subscribe to our newsletter.']
      |         ELSE [] END) AS lines
      |  FROM wt)""".stripMargin

  def d63(s: SparkSession, dir: String): DataFrame =
    c4Filters(docs(s, dir).select(col("doc_id"), webLines.as("lines")))

  val d63Sql: String =
    s"""WITH $duckWebLines,
       |t AS (
       |  SELECT doc_id, lines,
       |    array_to_string(lines, chr(10)) AS jt,
       |    CAST(len(list_filter(lines, c4_l ->
       |      regexp_matches(trim(c4_l), '[.!?"]$$')
       |      AND instr(lower(c4_l), 'javascript') = 0)) AS BIGINT) AS n_kept
       |  FROM wl)
       |SELECT doc_id,
       |  CAST(len(lines) AS BIGINT) AS n_lines,
       |  n_kept,
       |  CAST(length(jt) - length(regexp_replace(jt, '[.!?]', '', 'g'))
       |    AS BIGINT) AS n_term,
       |  instr(lower(jt), 'lorem ipsum') > 0 AS has_lorem,
       |  instr(jt, '{') > 0 AS has_brace,
       |  length(jt) - length(regexp_replace(jt, '[.!?]', '', 'g')) >= 3
       |    AS r_sent,
       |  length(jt) - length(regexp_replace(jt, '[.!?]', '', 'g')) >= 3
       |    AND instr(lower(jt), 'lorem ipsum') = 0
       |    AND instr(jt, '{') = 0
       |    AND n_kept >= 1 AS keep
       |FROM t""".stripMargin

  /** D62 — the Gopher quality-rule battery (Rae et al., "Scaling
    * Language Models: ... Gopher", 2021, §A1.1 — the
    * industry-standard heuristic filter set, adopted by MassiveText/
    * RefinedWeb/Dolma): per document, the five core rules with
    * PER-RULE attribution (a curation pipeline needs to know WHY a
    * doc dropped, not just that it did — the d24 observability
    * contract applied to the standard battery):
    *
    *   r_wc    — word count in [50, 100000]
    *   r_mwl   — mean word length in [3, 10] chars
    *   r_sym   — symbol-to-word ratio ('#' and '...') <= 0.1
    *   r_alpha — >= 80% of words contain an alphabetic character
    *   r_stop  — >= 2 distinct common English stop words present
    *
    * keep = all five. Every ratio is INTEGERIZED (10·symbols <=
    * n_words, 5·alpha_words >= 4·n_words, char bounds as products)
    * so both engines compare exact integers — no float thresholds.
    * Fully map-side: token split, length arithmetic, and the
    * stop-word intersect are all in-row; one corpus scan, zero
    * shuffles, zero UDFs. d3's generic quality score stays the
    * tunable variant; this is the NAMED battery, term for term.
    */
  def d62(s: SparkSession, dir: String): DataFrame = {
    // Gopher's 8-word list extended with the articles 'a'/'in': the
    // synthetic corpus's function-word vocabulary is {the, a}, so the
    // original list would leave r_stop vacuously false at every SF —
    // the c28 thresholds-must-exercise-every-fate rule.
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with",
      "a", "in")
    val toks = split(trim(lower(col("text"))), "\\s+")
    val nWords = size(toks).cast("long")
    // total characters inside words = non-whitespace chars
    val wordChars =
      length(regexp_replace(col("text"), "\\s+", "")).cast("long")
    val hashes = (length(col("text")) -
      length(regexp_replace(col("text"), "#", ""))).cast("long")
    val ellipses = ((length(col("text")) -
      length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3).cast("long")
    val alphaWords = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val stopHits = size(array_intersect(
      array_distinct(toks), array(stops.map(lit): _*))).cast("long")
    docs(s, dir)
      .select(col("doc_id"), nWords.as("n_words"),
        wordChars.as("word_chars"), (hashes + ellipses).as("n_sym"),
        alphaWords.as("alpha_words"), stopHits.as("stop_hits"))
      .withColumn("r_wc", col("n_words").between(50L, 100000L))
      .withColumn("r_mwl",
        col("word_chars") >= col("n_words") * 3 &&
          col("word_chars") <= col("n_words") * 10)
      .withColumn("r_sym", col("n_sym") * 10 <= col("n_words"))
      .withColumn("r_alpha", col("alpha_words") * 5 >= col("n_words") * 4)
      .withColumn("r_stop", col("stop_hits") >= 2)
      .withColumn("keep",
        col("r_wc") && col("r_mwl") && col("r_sym") &&
          col("r_alpha") && col("r_stop"))
      .select("doc_id", "n_words", "word_chars", "n_sym", "alpha_words",
        "stop_hits", "r_wc", "r_mwl", "r_sym", "r_alpha", "r_stop", "keep")
  }

  val d62Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    string_split_regex(trim(lower(text)), '\s+') AS toks,
      |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
      |      AS word_chars,
      |    CAST(length(text) - length(regexp_replace(text, '#', '', 'g'))
      |      AS BIGINT) AS n_hash,
      |    CAST((length(text) -
      |      length(regexp_replace(text, '\.\.\.', '', 'g'))) // 3
      |      AS BIGINT) AS n_ell
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    word_chars,
      |    n_hash + n_ell AS n_sym,
      |    CAST(len(list_filter(toks, gq_t -> regexp_matches(gq_t, '[a-z]')))
      |      AS BIGINT) AS alpha_words,
      |    CAST(len(list_intersect(list_distinct(toks),
      |      ['the','be','to','of','and','that','have','with','a','in']))
      |      AS BIGINT) AS stop_hits
      |  FROM t)
      |SELECT doc_id, n_words, word_chars, n_sym, alpha_words, stop_hits,
      |  n_words BETWEEN 50 AND 100000 AS r_wc,
      |  word_chars >= n_words * 3 AND word_chars <= n_words * 10 AS r_mwl,
      |  n_sym * 10 <= n_words AS r_sym,
      |  alpha_words * 5 >= n_words * 4 AS r_alpha,
      |  stop_hits >= 2 AS r_stop,
      |  (n_words BETWEEN 50 AND 100000)
      |    AND (word_chars >= n_words * 3 AND word_chars <= n_words * 10)
      |    AND (n_sym * 10 <= n_words)
      |    AND (alpha_words * 5 >= n_words * 4)
      |    AND (stop_hits >= 2) AS keep
      |FROM m""".stripMargin

  /** D67 — the composed WEB-CLEANING RECIPE with fate attribution
    * (the RefinedWeb/FineWeb stage order — Penedo et al. 2023 §3,
    * Penedo et al. 2024: structural filters → heuristic quality →
    * LM quality → dedup): every document runs the full battery and
    * gets ONE fate, first-failing-stage-wins (the d24/c28
    * attribution convention):
    *
    *   c4        — d63's line-structure battery rejected it
    *   gopher    — d62's heuristic battery rejected it
    *   ppl_tail  — d59's CCNet tier is tail (or unscorable)
    *   exact_dup — d1's normalized-content group keeps another doc
    *               (keeper = min-id FILTER SURVIVOR of the group,
    *               matching the cited stage order where dedup runs
    *               on filter output; min-id fallback when the whole
    *               group failed upstream)
    *   kept      — survived everything
    *
    * All four stage verdicts are emitted alongside the fate (a
    * curation pipeline tunes stages from the attribution table, and
    * unlike c28's streaming short-circuit, the batch recipe prices
    * every stage for every doc — the report d24 standardized).
    *
    * Scale shape: each stage is its own measured operator's
    * machinery (map-side batteries, the bounded-histogram tier cut,
    * one hash-partitioned dedup agg); the composition is four
    * equi-joins on doc_id — co-partitioned after the first
    * exchange, nothing corpus-sized is re-derived. The oracle is
    * the four stage oracles as nested-CTE subqueries joined on
    * doc_id — stage semantics replayed bit-for-bit.
    */
  def d67(s: SparkSession, dir: String): DataFrame = {
    val c4 = c4Filters(docs(s, dir)
        .select(col("doc_id"), webLines.as("lines")))
      .select(col("doc_id"), col("keep").as("c4_ok"))
    val gop = d62(s, dir).select(col("doc_id"), col("keep").as("gopher_ok"))
    val ppl = d59(s, dir).select(col("doc_id"),
      (col("tier").isNotNull && col("tier") =!= 3).as("ppl_ok"))
    val base = docs(s, dir).select(col("doc_id"),
      graft.dedup.Dedup.contentHash(col("text")).as("__ch"))
    // RefinedWeb order: dedup runs on FILTER SURVIVORS. The keeper
    // for each content group is the min-id doc that passed the
    // earlier stages (falling back to min-id overall so all-failed
    // groups still emit a deterministic dup_ok) — a group whose
    // min-id copy fails c4/gopher/ppl must not drop every copy.
    val staged = c4.join(gop, "doc_id").join(ppl, "doc_id").join(base, "doc_id")
      .withColumn("__surv",
        col("c4_ok") && col("gopher_ok") && col("ppl_ok"))
    val keepers = staged.groupBy("__ch").agg(
      coalesce(min(when(col("__surv"), col("doc_id"))),
        min(col("doc_id"))).as("__keeper"))
    staged.join(keepers, "__ch")
      .withColumn("dup_ok", col("doc_id") === col("__keeper"))
      .withColumn("fate",
        when(!col("c4_ok"), lit("c4"))
          .when(!col("gopher_ok"), lit("gopher"))
          .when(!col("ppl_ok"), lit("ppl_tail"))
          .when(!col("dup_ok"), lit("exact_dup"))
          .otherwise(lit("kept")))
      .select("doc_id", "c4_ok", "gopher_ok", "ppl_ok", "dup_ok", "fate")
  }

  // lazy: interpolates d59Sql, which initializes later in the object
  lazy val d67Sql: String =
    s"""WITH c4s AS (SELECT doc_id, keep AS c4_ok FROM ($d63Sql)),
       |gops AS (SELECT doc_id, keep AS gopher_ok FROM ($d62Sql)),
       |ppls AS (
       |  SELECT doc_id,
       |    tier IS NOT NULL AND tier <> 3 AS ppl_ok FROM ($d59Sql)),
       |ch AS (SELECT doc_id, md5(lower(trim(text))) AS chash FROM documents),
       |staged AS (
       |  SELECT ch.doc_id, chash,
       |    c4_ok AND gopher_ok AND ppl_ok AS surv
       |  FROM ch JOIN c4s USING (doc_id) JOIN gops USING (doc_id)
       |  JOIN ppls USING (doc_id)),
       |kp AS (
       |  SELECT chash,
       |    coalesce(min(CASE WHEN surv THEN doc_id END), min(doc_id))
       |      AS keeper
       |  FROM staged GROUP BY 1),
       |dups AS (
       |  SELECT staged.doc_id, staged.doc_id = kp.keeper AS dup_ok
       |  FROM staged JOIN kp USING (chash))
       |SELECT c4s.doc_id, c4_ok, gopher_ok, ppl_ok, dup_ok,
       |  CASE WHEN NOT c4_ok THEN 'c4'
       |       WHEN NOT gopher_ok THEN 'gopher'
       |       WHEN NOT ppl_ok THEN 'ppl_tail'
       |       WHEN NOT dup_ok THEN 'exact_dup'
       |       ELSE 'kept' END AS fate
       |FROM c4s
       |JOIN gops USING (doc_id)
       |JOIN ppls USING (doc_id)
       |JOIN dups USING (doc_id)""".stripMargin

  /** D66 — hard-negative mining for embedding-model training
    * (the in-batch/mined-negatives recipe of dense retrieval —
    * Karpukhin et al., EMNLP 2020 §3.2; Xiong et al., ICLR 2021
    * ANCE): for each query vector, its top same-label neighbor is
    * the POSITIVE and its top-3 highest-cosine DIFFERENT-label
    * neighbors are the HARD negatives — similar enough to be
    * informative, wrong by label. Output one row per (q_id, kind,
    * rk): kind 'pos' rk 1 + kind 'neg' rk 1..3, with the cosine.
    * Contrastive batches are assembled directly from this frame.
    *
    * Scale shape: the d9 broadcast-query exact pass over a FIXED
    * query set (production swaps in the d19/d37 routed probe — the
    * candidate generator is pluggable, the labeling rule is the
    * operator); ranking is one bounded per-query window over the
    * scored sliver. Deterministic (cosine folds + label equality +
    * id tie-break) → full SQL oracle.
    */
  def d66(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.Similarity.{dot, norm2, toDouble}
    val e = emb(s, dir).select(col("vec_id"),
      toDouble(col("embedding")).as("e"), col("label").cast("long").as("lbl"))
      .withColumn("nrm", norm2(col("e"))).filter(col("nrm") > 0)
    val q = e.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("lbl").as("q_lbl"), col("nrm").as("qnrm"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_lbl"), col("vec_id").as("n_id"),
        col("lbl").as("n_lbl"),
        (dot(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
    val w = Window.partitionBy(col("q_id"), col("q_lbl") === col("n_lbl"))
      .orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("kind",
        when(col("q_lbl") === col("n_lbl"), lit("pos")).otherwise(lit("neg")))
      .filter((col("kind") === "pos" && col("rk") === 1) ||
        (col("kind") === "neg" && col("rk") <= 3))
      .select("q_id", "kind", "rk", "n_id", "cos")
  }

  val d66Sql: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, hn_x -> CAST(hn_x AS DOUBLE)) AS e,
       |    CAST(label AS BIGINT) AS lbl
       |  FROM embeddings),
       |vn AS (
       |  SELECT vec_id, e, lbl, sqrt(${duckDot("e", "e")}) AS nrm FROM v
       |  WHERE sqrt(${duckDot("e", "e")}) > 0),
       |sc AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
       |    q.lbl = n.lbl AS same,
       |    ${duckDot("q.e", "n.e")} / (q.nrm * n.nrm) AS cos
       |  FROM (SELECT * FROM vn WHERE vec_id % 40 = 0) q
       |  CROSS JOIN vn n WHERE n.vec_id <> q.vec_id),
       |rk AS (
       |  SELECT q_id, same, n_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id, same
       |      ORDER BY cos DESC, n_id) AS BIGINT) AS rk
       |  FROM sc)
       |SELECT q_id, CASE WHEN same THEN 'pos' ELSE 'neg' END AS kind,
       |       rk, n_id, cos
       |FROM rk
       |WHERE (same AND rk = 1) OR (NOT same AND rk <= 3)""".stripMargin

  /** D65 — the ANN recall/nprobe TUNING CURVE as an operator: for
    * nprobe ∈ {1, 2, 4} against the same d19/d37 IVF quantizer,
    * recall@4 vs the exact d9 brute force — (nprobe, hits, denom,
    * recall_pm). This is the table a production similarity service
    * actually tunes with: probe cost grows ~linearly in nprobe
    * while recall saturates, and the knee is DATA-DEPENDENT, so the
    * audit must run on the corpus itself (the d11 recall-audit
    * discipline, widened to the whole curve). Deterministic end to
    * end (shared quantizer + tie rules), so the full curve carries
    * a SQL oracle: one kmeans chain + one probe-rank CTE reused by
    * all three nprobe values + the d9 exact chain.
    *
    * Scale shape: everything is the measured d19 probe machinery ×3
    * plus one exact pass over the FIXED query set (nq·corpus scored
    * once, the d9 broadcast shape — the audit's priced-in
    * reference, run on a sampled query set in production).
    */
  def d65(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.Similarity
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") % 40 === 0)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 4)
      .select("q_id", "n_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try { // the curve is 3 rows: materialize eagerly so the exact
      // frame (read by denom + all three nprobe joins) unpersists
      // before this returns — no session-lifetime cache leak.
      val denom = exact.agg(count(lit(1)).as("denom"))
      val curve = Seq(1, 2, 4).map { np =>
        Similarity.ivfTopK(q, e, "vec_id", "embedding", k = 4,
            kCentroids = 16, nprobe = np)
          .select(col("q_id"), col("n_id"))
          .join(exact, Seq("q_id", "n_id"))
          .agg(count(lit(1)).as("hits"))
          .select(lit(np.toLong).as("nprobe"), col("hits"))
      }.reduce(_ unionAll _)
        .crossJoin(broadcast(denom))
        .withColumn("recall_pm", expr("hits * 1000 div denom"))
      val rows = curve.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), curve.schema)
    } finally { exact.unpersist(); () }
  }

  val d65Sql: String = {
    val qd = duckDot("q.e", "n.e")
    s"""WITH $duckKmeansAssign,
       |ex AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q.vec_id AS q_id, n.vec_id AS n_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY $qd / (q.nrm * n.nrm) DESC, n.vec_id) AS rk
       |    FROM (SELECT * FROM v WHERE vec_id % 40 = 0) q
       |    CROSS JOIN v n WHERE n.vec_id <> q.vec_id) WHERE rk <= 4),
       |exn AS (SELECT CAST(count(*) AS BIGINT) AS denom FROM ex),
       |pr AS (
       |  SELECT q_id, cid, crk FROM (
       |    SELECT q.vec_id AS q_id, c.cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${duckDot("q.e", "c.ce")} / (q.nrm * c.cnrm) DESC,
       |                 c.cid) AS crk
       |    FROM (SELECT * FROM v WHERE vec_id % 40 = 0) q
       |    CROSS JOIN cents c)),
       |cand AS (
       |  SELECT np, q_id, n_id FROM (
       |    SELECT g.np, p.q_id, a.vec_id AS n_id,
       |      row_number() OVER (PARTITION BY g.np, p.q_id
       |        ORDER BY $qd / (q.nrm * n.nrm) DESC, a.vec_id) AS rk
       |    FROM (VALUES (1), (2), (4)) g(np)
       |    JOIN pr p ON p.crk <= g.np
       |    JOIN assign a ON a.cid = p.cid
       |    JOIN v q ON q.vec_id = p.q_id
       |    JOIN v n ON n.vec_id = a.vec_id
       |    WHERE a.vec_id <> p.q_id) WHERE rk <= 4),
       |hits AS (
       |  SELECT np, CAST(count(*) AS BIGINT) AS hits
       |  FROM cand JOIN ex USING (q_id, n_id) GROUP BY np)
       |SELECT CAST(g.np AS BIGINT) AS nprobe,
       |  coalesce(h.hits, 0) AS hits, exn.denom,
       |  coalesce(h.hits, 0) * 1000 // exn.denom AS recall_pm
       |FROM (VALUES (1), (2), (4)) g(np)
       |LEFT JOIN hits h ON h.np = g.np CROSS JOIN exn""".stripMargin
  }

  /** D61 — KMV (bottom-k) distinct-count sketch per source
    * (Bar-Yossef et al., "Counting distinct elements in a data
    * stream", RANDOM 2002; the unbiased (k−1)/h_k estimator of
    * Beyer et al., SIGMOD 2007; bottom-k sketches: Cohen & Kaplan,
    * PODC 2007): per source, the k=256 smallest distinct
    * normalized-content hashes estimate the source's distinct
    * document count as (k−1)·P div h_k — the ~1/√k-accurate
    * cardinality a 100 TB corpus audit reads instead of an exact
    * count(distinct) over every shard. The sketch state is BOUNDED
    * (k values per source, merged associatively by the same
    * [[graft.functions.TopKAgg]] heap as d6's df cap), so partial
    * aggregation ships ≤ k·partitions rows per source; the exact
    * n_distinct column here is the in-row audit (est vs exact →
    * err_pm) that a production run at scale would drop. Sources
    * with < k distinct docs return the exact count (the KMV
    * convention) with a NULL kth_hash. Integer-exact → full SQL
    * oracle.
    */
  def d61(s: SparkSession, dir: String): DataFrame = {
    val k = 256
    val kP = 255L * TextHash.P // (k-1)·P, precomputed to stay in BIGINT
    val h = docs(s, dir).select(col("source"),
      TextHash.poly_hash(lower(trim(col("text")))).as("h"))
    h.groupBy("source", "h").agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(
        sum(col("cnt")).as("n_docs"),
        count(lit(1)).as("n_distinct"),
        graft.functions.TopKAgg.top_k(
          -col("h").cast("double"), col("h"), k).as("bk"))
      .withColumn("kth_hash",
        when(size(col("bk")) === k, element_at(col("bk"), k)("id")))
      .withColumn("est_distinct",
        expr(s"CASE WHEN kth_hash IS NOT NULL AND kth_hash > 0 " +
          s"THEN ${kP}L div kth_hash ELSE n_distinct END"))
      .withColumn("err_pm",
        expr("abs(est_distinct - n_distinct) * 1000 div n_distinct"))
      .select("source", "n_docs", "n_distinct", "kth_hash",
        "est_distinct", "err_pm")
  }

  val d61Sql: String = {
    val kP = 255L * TextHash.P
    s"""WITH h AS (
       |  SELECT source, ${duckHash("lower(trim(text))")} AS h FROM documents),
       |d AS (SELECT DISTINCT source, h FROM h),
       |r AS (
       |  SELECT source, h,
       |    row_number() OVER (PARTITION BY source ORDER BY h) AS rk
       |  FROM d),
       |st AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_distinct
       |  FROM d GROUP BY 1),
       |nd AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM h GROUP BY 1),
       |kth AS (SELECT source, h AS kth_hash FROM r WHERE rk = 256),
       |j AS (
       |  SELECT nd.source, nd.n_docs, st.n_distinct, kth.kth_hash,
       |    CASE WHEN kth.kth_hash IS NOT NULL AND kth.kth_hash > 0
       |         THEN $kP // kth.kth_hash
       |         ELSE st.n_distinct END AS est_distinct
       |  FROM nd JOIN st USING (source) LEFT JOIN kth USING (source))
       |SELECT source, n_docs, n_distinct, kth_hash, est_distinct,
       |  abs(est_distinct - n_distinct) * 1000 // n_distinct AS err_pm
       |FROM j""".stripMargin
  }

  /** D60 — winnowing fingerprint near-dup pairs
    * ([[graft.dedup.Dedup.winnowPairs]] — Schleimer et al., SIGMOD
    * 2003, the MOSS algorithm): per doc, 4-token gram hashes →
    * min-of-each-sliding-window-of-4 selected fingerprints; pairs
    * sharing >= 2 selected prints. The winnowing guarantee: any
    * shared run of >= 7 tokens surfaces at least one shared print,
    * at ~2/(w+1) fingerprint density — guaranteed-detection
    * sparsification, vs d7's probabilistic MinHash recall and d55's
    * exhaustive every-gram count. Selection is fully in-row (one
    * scan); candidates ride the d6 df-capped posting-list machinery.
    */
  def d60(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.winnowPairs(docs(s, dir), "doc_id", "text",
      gramK = 4, window = 4, dfCap = 20, minShared = 2)

  val d60Sql: String =
    s"""WITH th AS (SELECT doc_id, $duckTokenHashes AS h FROM documents),
       |g4 AS (
       |  SELECT doc_id, list_transform(range(1, len(h)-2),
       |    wg_i -> list_reduce(list_prepend(CAST(0 AS BIGINT), h[wg_i:wg_i+3]),
       |      (wa, wx) -> (wa*31 + wx) % 1000000007)) AS g
       |  FROM th),
       |pr AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, greatest(len(g)-2, 2)),
       |    wn_i -> list_min(g[wn_i:wn_i+3]))) AS ps
       |  FROM g4 WHERE len(g) >= 1),
       |ep AS (SELECT doc_id, unnest(ps) AS p FROM pr),
       |okp AS (SELECT p FROM ep GROUP BY p HAVING count(*) <= 20)
       |SELECT a.doc_id AS d1, b.doc_id AS d2,
       |  CAST(count(*) AS BIGINT) AS shared_prints
       |FROM (SELECT doc_id, p FROM ep JOIN okp USING (p)) a
       |JOIN (SELECT doc_id, p FROM ep JOIN okp USING (p)) b
       |  ON a.p = b.p AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin

  /** D59 — CCNet perplexity tiers ([[graft.sampling.Perplexity]] —
    * Wenzek et al. 2020 §4.3): every document scored by the
    * smoothed NLL of a hashed-bigram LM trained on the trusted
    * lang='en' slice (the d52 target), corpus split into
    * head/middle/tail thirds of the per-gram milli cost — CCNet's
    * quality buckets. Integer-exact end to end (bit-length log2,
    * truncating division); the tercile cutoffs come from a
    * BOUNDED-domain histogram (cpt_pm ≤ 63000) instead of a
    * single-partition ntile window, so the corpus is never globally
    * sorted — the only window runs over a ≤63k-row dim-class frame
    * and the scoring pass is fully map-side.
    */
  def d59(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Perplexity.tiers(
      docs(s, dir), "doc_id", "text", isRef = col("lang") === "en")

  /** Oracle of [[d59]] — join-form replay (no literal array; the
    * bit-length log2, add-one smoothing, truncating division, and
    * histogram-cumsum cutoffs are term-for-term identical).
    */
  val d59Sql: String =
    s"""WITH th AS (SELECT doc_id, lang, $duckTokenHashes AS h FROM documents),
       |g AS (
       |  SELECT doc_id, lang, unnest(list_transform(range(1, len(h)),
       |    dg_i -> ((h[dg_i]*31 + h[dg_i+1]) % 1000000007) % 2039)) AS b
       |  FROM th),
       |rc AS (
       |  SELECT b, CAST(count(*) AS BIGINT) AS cr
       |  FROM g WHERE lang = 'en' GROUP BY 1),
       |tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS nr FROM g WHERE lang = 'en'),
       |dw AS (
       |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |    CAST(sum((length(bin(nr + 2039)) - 1)
       |           - (length(bin(coalesce(rc.cr, 0) + 1)) - 1)) AS BIGINT)
       |      AS cost_ilog
       |  FROM g LEFT JOIN rc USING (b) CROSS JOIN tot
       |  GROUP BY 1),
       |sc AS (
       |  SELECT d.doc_id, coalesce(dw.n_grams, 0) AS n_grams,
       |         coalesce(dw.cost_ilog, 0) AS cost_ilog,
       |         CASE WHEN coalesce(dw.n_grams, 0) > 0
       |              THEN dw.cost_ilog * 1000 // dw.n_grams END AS cpt_pm
       |  FROM documents d LEFT JOIN dw USING (doc_id)),
       |hist AS (
       |  SELECT cpt_pm, CAST(count(*) AS BIGINT) AS hc
       |  FROM sc WHERE n_grams > 0 GROUP BY 1),
       |cum AS (SELECT cpt_pm, sum(hc) OVER (ORDER BY cpt_pm) AS cum FROM hist),
       |tt AS (SELECT CAST(sum(hc) AS BIGINT) AS n FROM hist),
       |cuts AS (
       |  SELECT min(CASE WHEN cum * 3 >= n THEN cpt_pm END) AS c1,
       |         min(CASE WHEN cum * 3 >= n * 2 THEN cpt_pm END) AS c2
       |  FROM cum CROSS JOIN tt)
       |SELECT doc_id, n_grams, cost_ilog, cpt_pm,
       |  CASE WHEN n_grams > 0 THEN
       |    CAST(CASE WHEN cpt_pm <= c1 THEN 1
       |              WHEN cpt_pm <= c2 THEN 2 ELSE 3 END AS BIGINT)
       |  END AS tier
       |FROM sc CROSS JOIN cuts""".stripMargin

  /** D53 — content-defined chunking dedup
    * ([[graft.dedup.Dedup.cdcChunks]] — the FastCDC/LBFS boundary
    * family: Muthitacharoen et al. 2001; Xia et al. 2016): chunk
    * boundaries are declared by CONTENT — after token i whenever
    * tokenHash(i) % 16 == 0 (i < n; the final chunk absorbs the
    * tail) — so an insertion near the head of a re-crawled document
    * re-chunks only the window it touches and every downstream chunk
    * re-aligns. That shift-robustness is exactly what d39's
    * fixed-stride spans lack (one leading token added shifts every
    * fixed window) and is why storage/transfer dedup systems are
    * CDC-based. Output: every chunk occurring >= 2 times across the
    * corpus, with its copy/doc counts and first owner
    * (min (doc, idx) — the same partial-agg first-owner rule as
    * d39, no window over the corpus).
    *
    * Chunk identity is (h1, h2, len): two independent base-31/37
    * polynomial folds of the token-hash sequence plus the length —
    * ~60 bits plus the length split. For grouping at corpus scale
    * the right key is a 128-bit content digest (d1's rule); the
    * dual-30-bit key keeps the whole pipeline — including the
    * oracle — in exact integer arithmetic, and the collision odds at
    * the tested SFs are negligible. (Swapping in md5 over the
    * chunk's token slice changes no plan shape.)
    *
    * 100 TB shape: chunking is per-document array arithmetic inside
    * the scan's project (boundaries, slices, and both folds — no
    * token explode, no window, no per-doc shuffle); only the chunk
    * SUMMARIES (~n_tokens/16 rows of four integers) leave the map
    * side, aggregated by chunk key with map-side partial combine.
    * Equivalent chunks land on the same reducer regardless of which
    * documents contain them — the aggregation is the dedup.
    */
  def d53(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.cdcChunks(docs(s, dir), "doc_id", "text", divisor = 16)
      .groupBy("h1", "h2", "chunk_len")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(struct(col("doc_id"), col("idx"))).as("k"))
      .filter(col("n_copies") >= 2)
      .select(col("h1").as("chunk_h1"), col("h2").as("chunk_h2"),
        col("chunk_len"), col("n_copies"), col("n_docs"),
        col("k.doc_id").as("keeper_doc"), col("k.idx").as("keeper_idx"))

  /** Oracle of [[d53]] — same boundary rule, same dual folds, same
    * first-owner min-struct, in DuckDB list arithmetic.
    */
  val d53Sql: String =
    s"""WITH th AS (SELECT doc_id, $duckTokenHashes AS h FROM documents),
       |bs AS (
       |  SELECT doc_id, h, list_concat(list_concat(
       |    [CAST(0 AS BIGINT)],
       |    CASE WHEN len(h) >= 2 THEN
       |      list_filter(range(1, len(h)), cb_i -> h[cb_i] % 16 = 0)
       |    ELSE [] END),
       |    [CAST(len(h) AS BIGINT)]) AS b
       |  FROM th),
       |ch AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(b)), cc_i -> {
       |    'idx': cc_i,
       |    'len': b[cc_i+1] - b[cc_i],
       |    'h1': list_reduce(
       |      list_prepend(CAST(0 AS BIGINT), h[b[cc_i]+1 : b[cc_i+1]]),
       |      (cd_a, cd_x) -> (cd_a*31 + cd_x) % 1000000007),
       |    'h2': list_reduce(
       |      list_prepend(CAST(0 AS BIGINT), h[b[cc_i]+1 : b[cc_i+1]]),
       |      (cd_a, cd_x) -> (cd_a*37 + cd_x) % 1000000007)
       |  })) AS c FROM bs),
       |f AS (
       |  SELECT doc_id, (c).idx AS idx, (c).len AS len,
       |         (c).h1 AS h1, (c).h2 AS h2
       |  FROM ch WHERE (c).len > 0)
       |SELECT h1 AS chunk_h1, h2 AS chunk_h2, CAST(len AS BIGINT) AS chunk_len,
       |  count(*) AS n_copies, count(DISTINCT doc_id) AS n_docs,
       |  (min({'d': doc_id, 'i': idx})).d AS keeper_doc,
       |  CAST((min({'d': doc_id, 'i': idx})).i AS BIGINT) AS keeper_idx
       |FROM f GROUP BY 1, 2, 3 HAVING count(*) >= 2""".stripMargin

  /** D54 — asymmetric CONTAINMENT dedup (Broder 1997's containment
    * coefficient, the quote/snippet case): C(A,B) = |A∩B| / |A| over
    * distinct 3-gram sets, flag pairs where the SMALLER document is
    * >= 80% contained in the larger. This is the duplicate class
    * symmetric Jaccard structurally misses: a 30-gram snippet quoted
    * inside a 500-gram article has J ≈ 0.06 (far under any d6/d7
    * threshold) but C = 1.0 — and snippet-inside-article is exactly
    * how licensing text, disclaimers and syndicated quotes replicate
    * through a crawl.
    *
    * Same 100 TB candidate machinery as d6 (rare-gram posting lists,
    * df <= 20, the cap enforced INSIDE the aggregation by the
    * bounded top-k heap so no posting list ever ships more than 21
    * ids; pairs generated bucket-locally, <= 190 per gram) with the
    * evidence floor at >= 2 shared rare grams — a snippet has few
    * grams total, so d6's >= 5 floor would drop the very pairs this
    * operator exists for. Verification is one merge-walk intersect
    * per candidate (native SortedIntersectCount over the pre-sorted
    * distinct sets), orientation small-side-first with the doc id as
    * the deterministic tie-break.
    */
  def d54(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.containmentPairs(docs(s, dir), "doc_id", "text")

  /** Oracle of [[d54]] — d6's replay with the >= 2 evidence floor,
    * small-side orientation and the containment metric.
    */
  val d54Sql: String =
    s"""WITH th AS (
       |  SELECT doc_id, $duckTokenHashes AS h FROM documents
       |  WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 3),
       |grams AS (SELECT doc_id, $duckGramHashes AS gs FROM th),
       |eg AS (SELECT doc_id, unnest(gs) AS g FROM grams),
       |rare AS (SELECT g FROM eg GROUP BY g HAVING count(*) <= 20),
       |egr AS (SELECT doc_id, g FROM eg JOIN rare USING (g)),
       |cand AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2
       |  FROM egr a JOIN egr b USING (g) WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |v AS (
       |  SELECT d1, d2,
       |    CAST(len(list_intersect(g1.gs, g2.gs)) AS BIGINT) AS shared,
       |    CAST(len(g1.gs) AS BIGINT) AS n1, CAST(len(g2.gs) AS BIGINT) AS n2
       |  FROM cand
       |  JOIN grams g1 ON d1 = g1.doc_id
       |  JOIN grams g2 ON d2 = g2.doc_id)
       |SELECT small_id, big_id, n_small, n_big, shared, cont_pm FROM (
       |  SELECT CASE WHEN n1 <= n2 THEN d1 ELSE d2 END AS small_id,
       |         CASE WHEN n1 <= n2 THEN d2 ELSE d1 END AS big_id,
       |         least(n1, n2) AS n_small, greatest(n1, n2) AS n_big,
       |         shared, shared * 1000 // least(n1, n2) AS cont_pm
       |  FROM v) WHERE cont_pm >= 800""".stripMargin

  /** D55 — exact duplicated-substring intervals
    * ([[graft.dedup.Dedup.dupIntervals]] — Lee et al. 2022's
    * ExactSubstr pass, hash-aggregation form): sliding 8-token gram
    * seeds duplicated >= 2x corpus-wide (across docs or within one),
    * coalesced per document into maximal duplicated-token islands.
    * The alignment-free upgrade of d39: fixed-stride spans only see
    * duplication on their 8-token grid; the stride-1 seeds catch a
    * copied run at ANY offset and the island union reports its exact
    * extent — (n_islands, dup_tokens, max_island) per doc is
    * precisely what a removal pass cuts.
    */
  def d55(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.dupIntervals(docs(s, dir), "doc_id", "text")

  /** Oracle of [[d55]] — the same seed/island construction over
    * [[duckTokenHashes]]: slide the 8-wide fold, count grams
    * corpus-wide, gaps-and-islands per doc with the running-max-end
    * break rule.
    */
  val d55Sql: String =
    s"""WITH th AS (
       |  SELECT doc_id, $duckTokenHashes AS h FROM documents),
       |g AS (
       |  SELECT doc_id, CAST(di_i - 1 AS BIGINT) AS pos,
       |    list_reduce(h[CAST(di_i AS INT):CAST(di_i+7 AS INT)],
       |      (di_a, di_x) -> (di_a*31 + di_x) % 1000000007) AS gk
       |  FROM th, unnest(range(1, len(h)-8+2)) AS t(di_i)),
       |dupg AS (SELECT gk FROM g GROUP BY gk HAVING count(*) >= 2),
       |s AS (SELECT doc_id, pos FROM g JOIN dupg USING (gk)),
       |m AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos > coalesce(max(pos + 8) OVER (
       |        PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |      THEN 1 ELSE 0 END AS brk
       |  FROM s),
       |mi AS (
       |  SELECT doc_id, pos,
       |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
       |  FROM m),
       |isl AS (
       |  SELECT doc_id, isl, min(pos) AS st, max(pos) + 8 AS en,
       |    count(*) AS seeds
       |  FROM mi GROUP BY 1, 2),
       |agg AS (
       |  SELECT doc_id, CAST(sum(seeds) AS BIGINT) AS n_seeds,
       |    CAST(count(*) AS BIGINT) AS n_islands,
       |    CAST(sum(en - st) AS BIGINT) AS dup_tokens,
       |    CAST(max(en - st) AS BIGINT) AS max_island
       |  FROM isl GROUP BY 1)
       |SELECT th.doc_id, CAST(len(h) AS BIGINT) AS n_tokens,
       |  coalesce(n_seeds, 0) AS n_seeds,
       |  coalesce(n_islands, 0) AS n_islands,
       |  coalesce(dup_tokens, 0) AS dup_tokens,
       |  coalesce(max_island, 0) AS max_island
       |FROM th LEFT JOIN agg USING (doc_id)""".stripMargin

  /** D56 — BPE tokenizer TRAINING ([[graft.functions.Bpe.train]] —
    * Sennrich et al. 2016 §3.2): learn the top-8 merges from the
    * corpus itself. d38 APPLIES a given merge table; this produces
    * one — per round, count adjacent symbol pairs corpus-wide
    * (weighted by word frequency, distinct-sided only per the
    * library's apply contract), merge the argmax everywhere, repeat.
    * Output = the learned merge table (rank, left, right, pair_n),
    * directly feedable to d38.
    */
  def d56(s: SparkSession, dir: String): DataFrame =
    graft.functions.Bpe.train(docs(s, dir), "text", numMerges = 8)

  /** Oracle of [[d56]] — the full 8-round training loop replayed as
    * static SQL: the data-dependent argmax of round i lives in CTE
    * m_i (count desc, then lexicographic — one row), and the merge
    * application is the same [[graft.functions.Bpe.Passes]]-pass
    * replace fold the engine runs, with m_i's columns spliced in via
    * a one-row cross join.
    */
  val d56Sql: String = {
    val rounds = 8
    val blocks = (1 to rounds).map { i =>
      val prev = s"s${i - 1}"
      val pat = s"'|' || m$i.l || '|' || m$i.r || '|'"
      val rep = s"'|' || m$i.l || m$i.r || '|'"
      val folded = (1 to graft.functions.Bpe.Passes)
        .foldLeft("st")((acc, _) => s"replace($acc, $pat, $rep)")
      s"""p$i AS (
         |  SELECT l, r, CAST(sum(freq) AS BIGINT) AS n FROM (
         |    SELECT sy[bt_i] AS l, sy[bt_i+1] AS r, freq FROM (
         |      SELECT string_split(trim(st, '|'), '|') AS sy, freq
         |      FROM $prev),
         |      unnest(range(1, len(sy))) AS t(bt_i))
         |  WHERE l <> r GROUP BY 1, 2),
         |m$i AS (SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1),
         |s$i AS (SELECT $folded AS st, freq FROM $prev, m$i)""".stripMargin
    }.mkString(",\n")
    val union = (1 to rounds).map(i =>
      s"""SELECT CAST(${i - 1} AS BIGINT) AS "rank", l AS "left",
         |  r AS "right", n AS pair_n FROM m$i""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH w0 AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
       |    FROM documents) GROUP BY 1),
       |s0 AS (
       |  SELECT '|' || regexp_replace(w[1:256], '(.)', '\\1|', 'g') AS st,
       |    freq
       |  FROM w0),
       |$blocks
       |$union""".stripMargin
  }

  /** D22 — per-language term-frequency top-10 (corpus vocabulary
    * stats): explode tokens, two-level aggregation (map-side partial
    * on (lang, token)), deterministic rank tie-break on the token.
    */
  def d22(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(trim(lower(col("text"))), "\\s+")
    docs(s, dir)
      .select(col("lang"), explode(toks).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("cnt").desc, col("token")))
        .cast("long"))
      .filter(col("rk") <= 10)
      .select("lang", "rk", "token", "cnt")
  }

  val d22Sql: String =
    """SELECT lang, rk, token, cnt FROM (
      |  SELECT lang, token, cnt,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token)
      |      AS BIGINT) AS rk
      |  FROM (
      |    SELECT lang, token, count(*) AS cnt FROM (
      |      SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      |      FROM documents) GROUP BY lang, token))
      |WHERE rk <= 10""".stripMargin

  /** D23 — multimodal frame sampling: every 5th 64-char frame of the
    * payload, one row per sampled frame with timestamp and a stub
    * frame feature ([[graft.multimodal.Media.frameSample]] — the
    * decode is stubbed by a frame-window hash, the row-per-frame
    * plumbing is the production shape).
    */
  def d23(s: SparkSession, dir: String): DataFrame =
    graft.multimodal.Media.frameSample(docs(s, dir), "doc_id", "text")

  val d23Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, text, (length(text) + 63) // 64 AS nf
       |  FROM documents WHERE length(text) >= 1),
       |fr AS (SELECT doc_id, text, unnest(range(0, nf, 5)) AS idx FROM f)
       |SELECT doc_id, CAST(idx AS BIGINT) AS frame_idx,
       |  CAST(idx * 100 AS BIGINT) AS t_ms,
       |  ${duckHash("substr(text, CAST(idx*64+1 AS INT), 64)")} AS frame_hash
       |FROM fr""".stripMargin

  /** D24 — curation observability: per-document fate attribution
    * (kept / exact_dup / near_dup / low_quality) with the exact
    * stage semantics of d14, aggregated per fate in one pass
    * ([[graft.dedup.Curator.fates]]). The `kept` count equals d14's
    * row count by construction (asserted in Round2OpsSpec).
    */
  def d24(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Curator.fates(s, docs(s, dir), numPerms = queryPerms)

  val d24Sql: String =
    s"""WITH u AS (
       |  SELECT doc_id, text,
       |    min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keep_id
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, lower(trim(text)) AS s FROM u
       |  WHERE doc_id = keep_id AND length(lower(trim(text))) >= 8),
       |sh AS (SELECT doc_id, ${duckShingles("s", 8)} AS h FROM n),
       |sig AS (SELECT doc_id, $duckMinhashSig AS sg,
       |        list_distinct(h) AS shset FROM sh),
       |$duckBandCand,
       |dropped AS (
       |  SELECT DISTINCT d2 AS doc_id FROM cand
       |  JOIN sig s1 ON d1 = s1.doc_id
       |  JOIN sig s2 ON d2 = s2.doc_id
       |  WHERE CAST(len(list_intersect(s1.shset, s2.shset)) AS BIGINT) * 1000
       |      // (len(s1.shset) + len(s2.shset)
       |          - len(list_intersect(s1.shset, s2.shset))) >= 500),
       |meta AS (
       |  SELECT doc_id,
       |    len(string_split_regex(trim(lower(text)), '\\s+')) AS ws_tokens,
       |    len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS n_distinct,
       |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |        t -> list_contains(['the','a','of','and','to','in'], t))) AS n_stop
       |  FROM documents)
       |SELECT fate, count(*) AS n FROM (
       |  SELECT CASE WHEN u.doc_id <> u.keep_id THEN 'exact_dup'
       |    WHEN u.doc_id IN (SELECT doc_id FROM dropped) THEN 'near_dup'
       |    -- coalesce mirrors Curator: a NULL quality predicate is a
       |    -- curate-drop, so it must be low_quality, not 'kept'
       |    WHEN NOT coalesce(m.n_distinct * 10000 // m.ws_tokens > 3000
       |      AND m.n_stop * 10000 // m.ws_tokens < 4000
       |      AND m.ws_tokens BETWEEN 5 AND 10000, false) THEN 'low_quality'
       |    ELSE 'kept' END AS fate
       |  FROM u JOIN meta m USING (doc_id))
       |GROUP BY fate""".stripMargin

  /** D25 — document chunking: fixed 200-char windows with a 150-char
    * stride (50-char overlap), one output row per chunk with offset,
    * actual length, and an md5 content hash — the doc → context-chunk
    * expansion every RAG/pretraining pipeline runs. Pure per-row
    * sequence/explode: no shuffle at all, linear in output size.
    */
  def d25(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0), col("len") - 1, lit(150))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("chunk_start"),
        substring(col("text"), col("col") + 1, lit(200)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))

  val d25Sql: String =
    """SELECT doc_id,
      |  CAST(s_i - 1 AS BIGINT) AS chunk_idx,
      |  CAST((s_i - 1) * 150 AS BIGINT) AS chunk_start,
      |  CAST(length(substr(text, (s_i - 1) * 150 + 1, 200)) AS BIGINT) AS chunk_len,
      |  md5(substr(text, (s_i - 1) * 150 + 1, 200)) AS chunk_md5
      |FROM documents,
      |  unnest(range(1, (length(text) + 149) // 150 + 1)) AS t(s_i)""".stripMargin

  /** D26 — context-window packing: documents concatenate in a
    * deterministic global order (doc_id) and slice into fixed
    * 2048-token packs; each document reports the pack its first token
    * lands in and its offset there (GPT-style concat-and-chunk
    * pretraining packing). One running-sum window — at corpus scale
    * the order key would be the content hash, which both balances the
    * sort and makes packing shard-stable; doc_id plays that role on
    * the test corpus.
    */
  def d26(s: SparkSession, dir: String): DataFrame = {
    // Two-level prefix sum: a running sum over one global order would
    // plan as a single-partition window (sequential at any scale), so
    // the cumsum is hierarchical — in-block cumsums run parallel
    // (window partitioned by block), and only the per-block TOTALS
    // (one row per 1000 docs) take a tiny single-partition cumsum,
    // broadcast back as block offsets.
    val toks = docs(s, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .withColumn("blk", expr("doc_id div 1000"))
    val wInB = Window.partitionBy("blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBlk = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = toks.groupBy("blk").agg(sum(col("n_tok")).as("blk_tok"))
      .withColumn("blk_off", coalesce(sum(col("blk_tok")).over(wBlk), lit(0L)))
      .select("blk", "blk_off")
    toks.join(broadcast(offsets), "blk")
      .withColumn("cum", sum(col("n_tok")).over(wInB) + col("blk_off"))
      .select(col("doc_id"), col("n_tok"),
        expr("(cum - n_tok) div 2048").as("pack_id"),
        ((col("cum") - col("n_tok")) % 2048).as("pack_off"))
  }

  val d26Sql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
      |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) OVER (
      |      ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM documents)
      |SELECT doc_id, n_tok,
      |  (cum - n_tok) // 2048 AS pack_id,
      |  (cum - n_tok) % 2048 AS pack_off
      |FROM c""".stripMargin

  /** D27 — per-language winsorized length statistics: clip each
    * document's char length to its language's [p05, p95] band and
    * report raw vs clipped means — the outlier-robust corpus-stats
    * pass that precedes length-based curation thresholds. Two-pass:
    * per-lang percentile agg (broadcast back), then one clipped agg;
    * exact decimal sums so the doubles are engine-stable.
    */
  def d27(s: SparkSession, dir: String): DataFrame = {
    val pct = docs(s, dir).groupBy(col("lang").as("__l"))
      .agg(expr("percentile(n_chars, 0.05)").as("p05"),
        expr("percentile(n_chars, 0.95)").as("p95"))
    docs(s, dir).join(broadcast(pct), col("lang") === col("__l"))
      .withColumn("clipped",
        least(greatest(col("n_chars").cast("double"), col("p05")), col("p95")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        round(first(col("p05")), 4).as("p05"),
        round(first(col("p95")), 4).as("p95"),
        round(sum(col("n_chars").cast("decimal(18,2)")).cast("double") /
          count(lit(1)), 4).as("mean_raw"),
        round(sum(col("clipped").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 4).as("mean_winsor"))
      .select("lang", "n", "p05", "p95", "mean_raw", "mean_winsor")

  }

  val d27Sql: String =
    """WITH pct AS (
      |  SELECT lang AS l,
      |    quantile_cont(n_chars, 0.05) AS p05,
      |    quantile_cont(n_chars, 0.95) AS p95
      |  FROM documents GROUP BY 1)
      |SELECT lang, count(*) AS n,
      |  round(any_value(p05), 4) AS p05, round(any_value(p95), 4) AS p95,
      |  round(CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4)
      |    AS mean_raw,
      |  round(CAST(sum(CAST(least(greatest(CAST(n_chars AS DOUBLE), p05), p95)
      |    AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS mean_winsor
      |FROM documents JOIN pct ON lang = l
      |GROUP BY lang""".stripMargin

  /** D28 — TF-IDF keyword extraction: top-3 terms per document.
    * Ranking uses INTEGER keys only (tf desc, df asc, term asc) — a
    * float-score ordering could flip across engines at ulp
    * distance; the tf·ln(N/df) score itself ships as a rounded
    * reporting column. Two aggregations + one broadcast of the
    * corpus doc count; df join shuffles on the term key.
    */
  def d28(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("rnk").cast("long").as("rnk"),
        round(col("tf") * log(col("n_docs") / col("df")), 4).as("tfidf"))
  }

  val d28Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT doc_id, term, tf, df, CAST(rnk AS BIGINT) AS rnk,
      |  round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
      |FROM (
      |  SELECT doc_id, term, tf, df, n_docs,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY tf DESC, df ASC, term ASC) AS rnk
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |WHERE rnk <= 3""".stripMargin

  /** D29 — vocabulary-coverage quality scoring (the integer-exact
    * stand-in for LM-perplexity filtering): per-document rare-token
    * and out-of-vocabulary rates against corpus statistics. The
    * top-1000 vocabulary comes from `orderBy.limit` (
    * TakeOrderedAndProject — partial top-k on every partition, no
    * global sort) and broadcasts. The term-frequency join runs on
    * the PRE-AGGREGATED (doc_id, term, tf) relation, not the raw
    * exploded token stream — hot terms (stopwords) appear once per
    * document instead of once per occurrence, so the shuffled join
    * volume is O(distinct doc-terms), not O(total tokens), and no
    * single term key can concentrate a corpus's worth of rows in
    * one task (same shape as D28's tf pre-agg). All per-milles are
    * integer arithmetic — nothing float-ordering-sensitive anywhere.
    */
  def d29(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val freq = tf.groupBy("term").agg(sum(col("tf")).as("cnt"))
    val vocab = freq.orderBy(col("cnt").desc, col("term").asc).limit(1000)
      .select(col("term"), lit(1).as("in_vocab"))
    tf.join(freq, "term")
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tok"),
        sum(when(col("cnt") <= 2, col("tf")).otherwise(0L)).as("n_rare"),
        sum(when(col("in_vocab").isNull, col("tf")).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tok"),
        expr("n_rare * 1000 div n_tok").as("rare_pm"),
        expr("n_oov * 1000 div n_tok").as("oov_pm"))
      .withColumn("lm_ok",
        col("rare_pm") < 300 && col("oov_pm") < 600)
  }

  val d29Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |freq AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
      |vocab AS (
      |  SELECT term, 1 AS in_vocab FROM freq
      |  ORDER BY cnt DESC, term ASC LIMIT 1000)
      |SELECT doc_id, count(*) AS n_tok,
      |  CAST(sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) * 1000 // count(*)
      |    AS BIGINT) AS rare_pm,
      |  CAST(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) * 1000 // count(*)
      |    AS BIGINT) AS oov_pm,
      |  (sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) * 1000 // count(*)) < 300
      |    AND (sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) * 1000 // count(*)) < 600
      |    AS lm_ok
      |FROM toks JOIN freq USING (term) LEFT JOIN vocab USING (term)
      |GROUP BY doc_id""".stripMargin

  /** D30 — incremental corpus dedup: the production shape where each
    * new crawl snapshot is deduplicated against the already-ingested
    * corpus through its persisted index
    * ([[graft.dedup.Dedup.buildIndex]] → content/bands/sigs parquet)
    * rather than a corpus rescan. Existing corpus = doc_id % 10 < 6;
    * the rest arrive as the new batch. Output: one fate per batch doc
    * (exact_index / exact_batch / near_index / near_batch / kept)
    * with the matched doc id. The index round-trips through parquet
    * on disk (pid-keyed scratch, overwritten per run like a10), so a
    * PASS proves the persisted-probe path, not an in-memory join.
    */
  def d30(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_d30_${java.lang.ProcessHandle.current().pid()}").toString
    graft.dedup.Dedup.buildIndex(
      d.filter(col("doc_id") % 10 < 6), "doc_id", "text", idx,
      numPerms = queryPerms)
    // incremental adopts the index meta, so the banding travels
    graft.dedup.Dedup.incremental(
      d.filter(col("doc_id") % 10 >= 6), "doc_id", "text", idx)
  }

  val d30Sql: String =
    s"""WITH old_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 6),
       |new_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 6),
       |oldc AS (SELECT md5(lower(trim(text))) AS ch, min(doc_id) AS keeper
       |         FROM old_docs GROUP BY 1),
       |oldrep AS (SELECT doc_id, lower(trim(text)) AS s FROM old_docs
       |           QUALIFY row_number() OVER (PARTITION BY md5(lower(trim(text)))
       |             ORDER BY doc_id) = 1),
       |oldsh AS (SELECT doc_id, ${duckShingles("s", 8)} AS h FROM oldrep
       |          WHERE length(s) >= 8),
       |oldsig AS (SELECT doc_id, $duckMinhashSig AS sg FROM oldsh),
       |oldbands AS (
       |  SELECT doc_id, band,
       |    list_reduce(list_prepend(CAST(band AS BIGINT), sg[band*$oracleRpb+1:band*$oracleRpb+$oracleRpb]),
       |      (bh_a, bh_x) -> (bh_a*31 + bh_x) % 1000000007) AS band_hash
       |  FROM (SELECT doc_id, sg, unnest([0,1,2,3]) AS band FROM oldsig)),
       |oldbandc AS (
       |  SELECT * FROM oldbands
       |  QUALIFY row_number() OVER (PARTITION BY band, band_hash
       |    ORDER BY doc_id) <= 512),
       |newch AS (SELECT doc_id, md5(lower(trim(text))) AS ch,
       |                 lower(trim(text)) AS s
       |          FROM new_docs),
       |ei AS (SELECT n.doc_id, o.keeper AS m1 FROM newch n JOIN oldc o USING (ch)),
       |bmin AS (SELECT ch, min(doc_id) AS m FROM newch
       |         WHERE ch NOT IN (SELECT ch FROM oldc) GROUP BY ch),
       |eb AS (SELECT n.doc_id, b.m AS m2 FROM newch n JOIN bmin b USING (ch)
       |       WHERE n.doc_id > b.m),
       |reps AS (SELECT n.doc_id, n.s FROM newch n JOIN bmin b
       |         ON n.ch = b.ch AND n.doc_id = b.m),
       |repsh AS (SELECT doc_id, ${duckShingles("s", 8)} AS h FROM reps
       |          WHERE length(s) >= 8),
       |repsig AS (SELECT doc_id, $duckMinhashSig AS sg FROM repsh),
       |repbands AS (
       |  SELECT doc_id, band,
       |    list_reduce(list_prepend(CAST(band AS BIGINT), sg[band*$oracleRpb+1:band*$oracleRpb+$oracleRpb]),
       |      (bh_a, bh_x) -> (bh_a*31 + bh_x) % 1000000007) AS band_hash
       |  FROM (SELECT doc_id, sg, unnest([0,1,2,3]) AS band FROM repsig)),
       |repbandc AS (
       |  SELECT * FROM repbands
       |  QUALIFY row_number() OVER (PARTITION BY band, band_hash
       |    ORDER BY doc_id) <= 512),
       |ni AS (
       |  SELECT nid AS doc_id, min(oid) AS m3 FROM (
       |    SELECT DISTINCT r.doc_id AS nid, o.doc_id AS oid
       |    FROM repbands r JOIN oldbandc o USING (band, band_hash)) c
       |  JOIN repsig rs ON c.nid = rs.doc_id
       |  JOIN oldsig os ON c.oid = os.doc_id
       |  WHERE len(list_filter(range(1, ${oraclePerms + 1}), z_i -> rs.sg[z_i] = os.sg[z_i])) >= ${oraclePerms / 2}
       |  GROUP BY 1),
       |nb AS (
       |  SELECT d2 AS doc_id, min(d1) AS m4 FROM (
       |    SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |    FROM repbandc a JOIN repbandc b
       |      ON a.band = b.band AND a.band_hash = b.band_hash
       |        AND a.doc_id < b.doc_id) c
       |  JOIN repsig r1 ON c.d1 = r1.doc_id
       |  JOIN repsig r2 ON c.d2 = r2.doc_id
       |  WHERE len(list_filter(range(1, ${oraclePerms + 1}), z_i -> r1.sg[z_i] = r2.sg[z_i])) >= ${oraclePerms / 2}
       |  GROUP BY 1)
       |SELECT n.doc_id,
       |  CASE WHEN ei.m1 IS NOT NULL THEN 'exact_index'
       |       WHEN eb.m2 IS NOT NULL THEN 'exact_batch'
       |       WHEN ni.m3 IS NOT NULL THEN 'near_index'
       |       WHEN nb.m4 IS NOT NULL THEN 'near_batch'
       |       ELSE 'kept' END AS fate,
       |  COALESCE(ei.m1, eb.m2, ni.m3, nb.m4) AS match_id
       |FROM new_docs n
       |LEFT JOIN ei USING (doc_id) LEFT JOIN eb USING (doc_id)
       |LEFT JOIN ni USING (doc_id) LEFT JOIN nb USING (doc_id)""".stripMargin

  /** D48 — the dedup-index INGEST LOOP as one operator
    * ([[graft.dedup.Dedup.buildIndex]] →
    * [[graft.dedup.Dedup.incremental]] →
    * [[graft.dedup.Dedup.appendIndex]] → incremental again): what a
    * crawl pipeline actually runs across snapshots — batch 1 is
    * deduped against the ingested corpus, its KEPT documents are
    * appended to the index, and batch 2 must then dedup against
    * corpus + batch-1 admissions. One row per batch document:
    * `(batch, doc_id, fate, match_id)` — a batch-2 near-dup of a
    * batch-1 ADMITTED doc carries that doc's id as `match_id` with
    * fate `near_index`/`exact_index`, the cross-batch catch that
    * makes the loop real (and that a per-batch-only view would
    * miss). Batch-1 fates are STAGED to scratch parquet before the
    * append mutates the index (the returned plan must not re-probe
    * the post-append state for batch 1).
    *
    * Scale shape: three equi-join probe rounds plus one staged
    * append — nothing corpus-sized is collected, re-scanned, or
    * broadcast; append capping is ingestion-ordered (existing
    * entries keep their slots, new ids fill remaining capacity —
    * [[graft.dedup.Dedup.appendIndex]]). The oracle replays both
    * rounds with the index-2 CTEs built from round-1's kept set.
    */
  def d48(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val idx = graft.engine.Scratch.dir("graft_d48_")
    val old = d.filter(col("doc_id") % 10 < 6)
    val b1 = d.filter(col("doc_id") % 10 >= 6 && col("doc_id") % 10 < 8)
    val b2 = d.filter(col("doc_id") % 10 >= 8)
    graft.dedup.Dedup.buildIndex(old, "doc_id", "text", idx,
      numPerms = queryPerms)
    graft.dedup.Dedup.incremental(b1, "doc_id", "text", idx)
      .write.parquet(s"$idx/f1_report")
    val f1 = s.read.parquet(s"$idx/f1_report")
    graft.dedup.Dedup.appendIndex(
      b1.join(f1.filter(col("fate") === "kept").select("doc_id"),
        Seq("doc_id"), "left_semi"),
      "doc_id", "text", idx)
    val f2 = graft.dedup.Dedup.incremental(b2, "doc_id", "text", idx)
    f1.select(lit(1).as("batch"), col("doc_id"), col("fate"),
        col("match_id"))
      .unionByName(f2.select(lit(2).as("batch"), col("doc_id"),
        col("fate"), col("match_id")))
  }

  /** Oracle of [[d48]]: round 1 replays d30's probe against the
    * build corpus; index 2 is rebuilt in SQL from round-1's kept set
    * (content union, sig union, bands union capped in ingestion
    * order — existing entries first, then new ids ascending, the
    * exact appendIndex rule); round 2 replays the probe against it.
    */
  val d48Sql: String = {
    def bandsFrom(sigCte: String): String =
      s"""SELECT doc_id, band,
         |    list_reduce(list_prepend(CAST(band AS BIGINT), sg[band*$oracleRpb+1:band*$oracleRpb+$oracleRpb]),
         |      (bh_a, bh_x) -> (bh_a*31 + bh_x) % 1000000007) AS band_hash
         |  FROM (SELECT doc_id, sg, unnest([0,1,2,3]) AS band FROM $sigCte)""".stripMargin
    def round(b: String, ic: String, isig: String, ibc: String,
        docsCte: String): String =
      s"""${b}ch AS (SELECT doc_id, md5(lower(trim(text))) AS ch,
         |               lower(trim(text)) AS s FROM $docsCte),
         |${b}ei AS (SELECT n.doc_id, o.keeper AS m1 FROM ${b}ch n JOIN $ic o USING (ch)),
         |${b}bmin AS (SELECT ch, min(doc_id) AS m FROM ${b}ch
         |         WHERE ch NOT IN (SELECT ch FROM $ic) GROUP BY ch),
         |${b}eb AS (SELECT n.doc_id, b.m AS m2 FROM ${b}ch n JOIN ${b}bmin b USING (ch)
         |       WHERE n.doc_id > b.m),
         |${b}reps AS (SELECT n.doc_id, n.s FROM ${b}ch n JOIN ${b}bmin b
         |         ON n.ch = b.ch AND n.doc_id = b.m),
         |${b}sh AS (SELECT doc_id, ${duckShingles("s", 8)} AS h FROM ${b}reps
         |          WHERE length(s) >= 8),
         |${b}sig AS (SELECT doc_id, $duckMinhashSig AS sg FROM ${b}sh),
         |${b}bands AS (
         |  ${bandsFrom(s"${b}sig")}),
         |${b}bandc AS (
         |  SELECT * FROM ${b}bands
         |  QUALIFY row_number() OVER (PARTITION BY band, band_hash
         |    ORDER BY doc_id) <= 512),
         |${b}ni AS (
         |  SELECT nid AS doc_id, min(oid) AS m3 FROM (
         |    SELECT DISTINCT r.doc_id AS nid, o.doc_id AS oid
         |    FROM ${b}bands r JOIN $ibc o USING (band, band_hash)) c
         |  JOIN ${b}sig rs ON c.nid = rs.doc_id
         |  JOIN $isig os ON c.oid = os.doc_id
         |  WHERE len(list_filter(range(1, ${oraclePerms + 1}), z_i -> rs.sg[z_i] = os.sg[z_i])) >= ${oraclePerms / 2}
         |  GROUP BY 1),
         |${b}nb AS (
         |  SELECT d2 AS doc_id, min(d1) AS m4 FROM (
         |    SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |    FROM ${b}bandc a JOIN ${b}bandc b
         |      ON a.band = b.band AND a.band_hash = b.band_hash
         |        AND a.doc_id < b.doc_id) c
         |  JOIN ${b}sig r1 ON c.d1 = r1.doc_id
         |  JOIN ${b}sig r2 ON c.d2 = r2.doc_id
         |  WHERE len(list_filter(range(1, ${oraclePerms + 1}), z_i -> r1.sg[z_i] = r2.sg[z_i])) >= ${oraclePerms / 2}
         |  GROUP BY 1),
         |${b}fates AS (
         |  SELECT n.doc_id,
         |    CASE WHEN ${b}ei.m1 IS NOT NULL THEN 'exact_index'
         |         WHEN ${b}eb.m2 IS NOT NULL THEN 'exact_batch'
         |         WHEN ${b}ni.m3 IS NOT NULL THEN 'near_index'
         |         WHEN ${b}nb.m4 IS NOT NULL THEN 'near_batch'
         |         ELSE 'kept' END AS fate,
         |    COALESCE(${b}ei.m1, ${b}eb.m2, ${b}ni.m3, ${b}nb.m4) AS match_id
         |  FROM $docsCte n
         |  LEFT JOIN ${b}ei USING (doc_id) LEFT JOIN ${b}eb USING (doc_id)
         |  LEFT JOIN ${b}ni USING (doc_id) LEFT JOIN ${b}nb USING (doc_id))""".stripMargin
    s"""WITH old_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 6),
       |b1_docs AS (SELECT doc_id, text FROM documents
       |            WHERE doc_id % 10 >= 6 AND doc_id % 10 < 8),
       |b2_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8),
       |oldc AS (SELECT md5(lower(trim(text))) AS ch, min(doc_id) AS keeper
       |         FROM old_docs GROUP BY 1),
       |oldrep AS (SELECT doc_id, lower(trim(text)) AS s FROM old_docs
       |           QUALIFY row_number() OVER (PARTITION BY md5(lower(trim(text)))
       |             ORDER BY doc_id) = 1),
       |oldsh AS (SELECT doc_id, ${duckShingles("s", 8)} AS h FROM oldrep
       |          WHERE length(s) >= 8),
       |oldsig AS (SELECT doc_id, $duckMinhashSig AS sg FROM oldsh),
       |oldbands AS (
       |  ${bandsFrom("oldsig")}),
       |oldbandc AS (
       |  SELECT * FROM oldbands
       |  QUALIFY row_number() OVER (PARTITION BY band, band_hash
       |    ORDER BY doc_id) <= 512),
       |${round("b1", "oldc", "oldsig", "oldbandc", "b1_docs")},
       |kept1 AS (SELECT doc_id FROM b1fates WHERE fate = 'kept'),
       |c2 AS (SELECT ch, keeper FROM oldc
       |       UNION ALL
       |       SELECT n.ch, n.doc_id AS keeper FROM b1ch n JOIN kept1 USING (doc_id)),
       |sig2 AS (SELECT doc_id, sg FROM oldsig
       |         UNION ALL
       |         SELECT s.doc_id, s.sg FROM b1sig s JOIN kept1 USING (doc_id)),
       |bandc2 AS (
       |  SELECT doc_id, band, band_hash FROM (
       |    SELECT doc_id, band, band_hash, 0 AS src FROM oldbandc
       |    UNION ALL
       |    SELECT b.doc_id, b.band, b.band_hash, 1 AS src
       |    FROM b1bands b JOIN kept1 USING (doc_id))
       |  QUALIFY row_number() OVER (PARTITION BY band, band_hash
       |    ORDER BY src, doc_id) <= 512),
       |${round("b2", "c2", "sig2", "bandc2", "b2_docs")}
       |SELECT 1 AS batch, doc_id, fate, match_id FROM b1fates
       |UNION ALL
       |SELECT 2 AS batch, doc_id, fate, match_id FROM b2fates""".stripMargin
  }

  /** D31 — intra-document repetition filter (the Gopher/MassiveText
    * repetition signals, cf. Rae et al. 2021 §A1.1): fraction of
    * duplicate word 2-grams / 3-grams within each document, plus the
    * fraction of tokens covered by the single most frequent 2-gram.
    * Documents over threshold on either signal are flagged, not
    * dropped, so the fate is auditable. Shapes: the dup fractions
    * are per-row column arithmetic over [[TextHash.word_gram_hashes]]
    * (zero shuffle); the top-gram count is one (doc_id, gram)
    * hash-aggregation followed by a (doc_id) max — both
    * combiner-friendly, keyed on the document, so the shuffle volume
    * is O(distinct grams) and no group exceeds a document's gram
    * count. Nothing here is corpus-global: at 100 TB this is two
    * map-side-combined aggregations, no window over the corpus.
    */
  def d31(s: SparkSession, dir: String): DataFrame = {
    val g2 = TextHash.word_gram_hashes(col("text"), 2, distinct = false)
    val g3 = TextHash.word_gram_hashes(col("text"), 3, distinct = false)
    val base = docs(s, dir)
      .select(col("doc_id"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n_tokens"),
        g2.as("g2"), g3.as("g3"))
      .filter(size(col("g3")) >= 1)
    val top2 = base
      .select(col("doc_id"), explode(col("g2")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max(col("cnt")).as("top2_cnt"))
    base
      .select(col("doc_id"), col("n_tokens"),
        expr("(size(g2) - size(array_distinct(g2))) * 10000 div size(g2)")
          .cast("long").as("dup2_pm"),
        expr("(size(g3) - size(array_distinct(g3))) * 10000 div size(g3)")
          .cast("long").as("dup3_pm"))
      .join(top2, "doc_id")
      .withColumn("top2_pm",
        expr("top2_cnt * 2 * 10000 div n_tokens").cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("dup2_pm"), col("dup3_pm"),
        col("top2_pm"),
        (col("dup3_pm") <= 100 && col("top2_pm") <= 1500).as("rep_ok"))
  }

  val d31Sql: String =
    s"""WITH th AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
       |      AS n_tokens,
       |    $duckTokenHashes AS h
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, n_tokens,
       |    list_transform(range(1, len(h)),
       |      g_i -> (h[g_i]*31 + h[g_i+1]) % 1000000007) AS g2,
       |    list_transform(range(1, len(h)-1),
       |      g_i -> ((h[g_i]*31 + h[g_i+1]) % 1000000007 * 31 + h[g_i+2])
       |        % 1000000007) AS g3
       |  FROM th WHERE len(h) >= 3),
       |tg AS (
       |  SELECT doc_id, max(cnt) AS top2_cnt FROM (
       |    SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt
       |    FROM (SELECT doc_id, unnest(g2) AS g FROM g) GROUP BY 1, 2)
       |  GROUP BY 1)
       |SELECT g.doc_id, g.n_tokens,
       |  (len(g2) - len(list_distinct(g2))) * 10000 // len(g2) AS dup2_pm,
       |  (len(g3) - len(list_distinct(g3))) * 10000 // len(g3) AS dup3_pm,
       |  top2_cnt * 2 * 10000 // n_tokens AS top2_pm,
       |  ((len(g3) - len(list_distinct(g3))) * 10000 // len(g3)) <= 100
       |    AND (top2_cnt * 2 * 10000 // n_tokens) <= 1500 AS rep_ok
       |FROM g JOIN tg USING (doc_id)""".stripMargin

  /** SemDeDup cluster-count default: k ≈ ceil(√N), clamped to
    * [8, 65536]. SemDeDup's contract requires k to grow with the
    * corpus (fixed k means cluster size — and therefore both pair-
    * join cost and the share of dups past the candidate cap — grows
    * linearly); √N keeps expected cluster size at √N too, and the
    * 65536 ceiling bounds the broadcast centroid table (~32 MB at
    * dim 64) — past that, swap the broadcast argmax for the d19 IVF
    * coarse-quantizer join.
    */
  private[graft] def semdedupK(n: Long): Int =
    math.min(65536L, math.max(8L,
      math.ceil(math.sqrt(math.max(n, 0L).toDouble)).toLong)).toInt

  /** SemDeDup candidate-cap default: max(512, 2·⌈√N⌉), clamped to
    * 65536. With the adaptive k ≈ √N, expected cluster size is √N
    * and the measured max cluster runs ~1.2× that (GATE_SF1.md:
    * 531 vs √200000 ≈ 447) — so a FIXED 512 cap starts silently
    * missing within-cluster pairs right at N ≈ 260k, exactly where
    * the r8 gate measured it binding. Scaling the cap at 2·√N keeps
    * a ~1.7× margin over the observed max cluster while preserving
    * the worst-case join bound the cap exists for: a degenerate
    * single-cluster corpus costs O(N · 2√N) = O(N^1.5), never
    * O(N²). The 65536 ceiling matches [[semdedupK]]'s (both bind
    * near N ≈ 4·10⁹, where the coarse quantizer should move to the
    * d19 IVF join anyway).
    */
  private[graft] def semdedupCap(n: Long): Int =
    math.min(65536L, math.max(512L,
      2L * math.ceil(math.sqrt(math.max(n, 0L).toDouble)).toLong)).toInt

  /** D32 — semantic dedup (SemDeDup, Abbas et al. 2023): cluster the
    * embedding space with `iters` deterministic Lloyd iterations of
    * k-means (default 1; SemDeDup proper iterates to convergence —
    * the exact-integer step below is iteration-safe, and ScaleOpsSpec
    * characterizes the iters=2 delta) (k = [[semdedupK]](N) by
    * default; seeds = the k
    * vec_ids with the lowest md5(vec_id) — a content-hash-stable
    * sample with uniform spread over ids, unlike lowest-k which
    * biases seeds toward whatever the low id range happens to
    * contain), then prune near-duplicate pairs *within* each cluster
    * (cosine >= 0.4, min-id keeper) — the cluster is a derived
    * blocking key, so the pair join is an equi-join that never
    * compares across clusters.
    *
    * Determinism at hash-compare precision: embeddings are quantized
    * to integer milli-units (floor(x*1000), exact in both engines —
    * the d17 quantization shape), so the Lloyd mean is an exact
    * BIGINT sum divided once in double; every cosine is the
    * deterministic [[graft.similarity.Similarity.dot]] fold.
    *
    * Scale shape: centroids are k rows — both assignment passes are
    * broadcast joins with a map-side argmax (the d19 IVF idiom); the
    * Lloyd mean is one (cluster, pos) hash-aggregation (k*dim
    * groups). A degenerate corpus (every embedding near-identical)
    * still collapses into ONE cluster and an unbounded pair join
    * goes quadratic — so the keeper-candidate side is capped to the
    * `cap` (512) lowest ids per cluster (the d7/d8 bounded-posting-
    * list defense; WindowGroupLimit makes the rank filter a
    * per-group top-k, not a cluster sort), making the join
    * O(|cluster| × cap), never O(|cluster|²).
    *
    * RECALL BOUND of the cap: duplicates are only *detected* against
    * the cap lowest ids of the cluster — a pair BOTH of whose
    * members rank past `cap` within their cluster is never compared
    * and both survive (characterized in Round7OpsSpec). `cap <= 0`
    * (default) resolves to [[semdedupCap]](N) = max(512, 2·⌈√N⌉):
    * with the adaptive k the expected cluster is √N deep, so the
    * scaled cap keeps detection complete past the fixed-512
    * boundary at N ≈ 260k while still bounding a degenerate
    * single-cluster corpus at O(N^1.5) join cost.
    */
  private[graft] def semanticDedupImpl(embeddings: DataFrame, k: Int = 0,
      cap: Int = 0, iters: Int = 1): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val sim = graft.similarity.Similarity
    val vq = embeddings
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000).cast("long")).as("xi"))
      .select(col("vec_id"), col("xi"),
        transform(col("xi"), x => x.cast("double") / 1000.0).as("e"))
      .withColumn("nrm", sim.norm2(col("e")))
      .filter(col("nrm") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // One count resolves both adaptive knobs (and materializes the
    // persist before the multi-reference pair join below).
    val n = vq.count()
    val kk = if (k >= 1) k else semdedupK(n)
    val cp = if (cap >= 1) cap else semdedupCap(n)
    val seeds = vq
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(kk)
      .select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cnrm"))
    // Map-side argmax over a struct (the ivfTopK idiom): highest
    // cosine wins, ties to the smallest centroid id — no window
    // shuffle/sort over the n×k expanded rows.
    def assign(cents: DataFrame): DataFrame =
      vq.join(broadcast(cents))
        .select(col("vec_id"), struct(
          (sim.dot(col("e"), col("ce")) / (col("nrm") * col("cnrm")))
            .as("cos"),
          (-col("cid")).as("negc")).as("sc"))
        .groupBy("vec_id").agg(max(col("sc")).as("best"))
        .select(col("vec_id"), (-col("best.negc")).as("cid"))
    // One Lloyd step: exact integer component sums per (cluster, pos),
    // one double division, centroids reassembled in pos order.
    // Iteration-safe (every step starts from exact integers, so no
    // float accumulation drifts across steps); SemDeDup proper runs
    // to convergence — `iters` exposes that (default 1, the measured
    // sweet spot at the tested scales; each extra iteration is one
    // more broadcast-argmax + hash-agg pass over the corpus).
    def lloyd(assigned: DataFrame): DataFrame = assigned
      .join(vq.select(col("vec_id"), col("xi")), "vec_id")
      .select(col("cid"), posexplode(col("xi")))
      .groupBy("cid", "pos")
      .agg(sum(col("col")).as("sx"), count(lit(1)).as("cn"))
      .withColumn("comp",
        col("sx").cast("double") / col("cn").cast("double") / 1000.0)
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
        t => t("comp")).as("ce"))
      .withColumn("cnrm", sim.norm2(col("ce")))
    var cents1 = lloyd(assign(seeds))
    for (_ <- 2 to iters) cents1 = lloyd(assign(cents1))
    // Referenced three times (both sides of the pair join + the
    // final verdict) — without the persist each reference re-runs
    // both assignment passes and the Lloyd aggregation.
    val clustered = assign(cents1)
      .join(vq.select(col("vec_id"), col("e"), col("nrm")), "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candSide = clustered
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cid").orderBy("vec_id")))
      .filter(col("__rk") <= cp).drop("__rk")
    val dups = clustered.select(col("cid"),
        col("vec_id").as("id2"), col("e").as("e2"), col("nrm").as("n2"))
      .join(candSide.select(col("cid"), col("vec_id").as("id1"),
        col("e").as("e1"), col("nrm").as("n1")), "cid")
      .filter(col("id1") < col("id2"))
      .filter(sim.dot(col("e1"), col("e2")) / (col("n1") * col("n2")) >= 0.4)
      .groupBy(col("id2").as("vec_id")).agg(min(col("id1")).as("keeper_id"))
    clustered.select(col("vec_id"), col("cid").as("cluster_id"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"),
        coalesce(col("keeper_id"), col("vec_id")).as("keeper_id"),
        col("keeper_id").isNotNull.as("is_dup"))
  }

  def d32(s: SparkSession, dir: String): DataFrame =
    semanticDedupImpl(emb(s, dir))

  val d32Sql: String = {
    val assignSql = (src: String, cents: String) =>
      s"""SELECT vec_id, cid FROM (
         |    SELECT v.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${duckDot("v.e", "c.ce")} / (v.nrm * c.cnrm) DESC,
         |                 c.cid) AS crk
         |    FROM $src v CROSS JOIN $cents c) WHERE crk = 1""".stripMargin
    s"""WITH vx AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      qx -> CAST(floor(CAST(qx AS DOUBLE) * 1000) AS BIGINT)) AS xi
       |  FROM embeddings),
       |vn AS (
       |  SELECT vec_id, xi,
       |    list_transform(xi, qx -> CAST(qx AS DOUBLE) / 1000.0) AS e
       |  FROM vx),
       |v AS (SELECT vec_id, xi, e, sqrt(${duckDot("e", "e")}) AS nrm FROM vn
       |      WHERE sqrt(${duckDot("e", "e")}) > 0),
       |seeds AS (
       |  SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM v
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT (SELECT LEAST(65536, GREATEST(8,
       |    CAST(ceil(sqrt(count(*))) AS BIGINT))) FROM v)),
       |a0 AS (${assignSql("v", "seeds")}),
       |comps AS (
       |  SELECT cid, pos,
       |    CAST(sum(comp) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000.0
       |      AS comp
       |  FROM (
       |    SELECT a0.cid, pos, v.xi[pos] AS comp
       |    FROM a0 JOIN v USING (vec_id)
       |    CROSS JOIN (SELECT unnest(range(1, 65)) AS pos))
       |  GROUP BY 1, 2),
       |c1 AS (
       |  SELECT cid, list(comp ORDER BY pos) AS ce FROM comps GROUP BY cid),
       |cents1 AS (SELECT cid, ce, sqrt(${duckDot("ce", "ce")}) AS cnrm FROM c1),
       |a1 AS (${assignSql("v", "cents1")}),
       |cl AS (SELECT a1.vec_id, a1.cid, v.e, v.nrm FROM a1 JOIN v USING (vec_id)),
       |clc AS (
       |  SELECT * FROM cl
       |  QUALIFY row_number() OVER (PARTITION BY cid ORDER BY vec_id) <= 512),
       |dups AS (
       |  SELECT b.vec_id AS vec_id, min(a.vec_id) AS keeper_id
       |  FROM clc a JOIN cl b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE ${duckDot("a.e", "b.e")} / (a.nrm * b.nrm) >= 0.4
       |  GROUP BY 1)
       |SELECT cl.vec_id, cl.cid AS cluster_id,
       |  coalesce(d.keeper_id, cl.vec_id) AS keeper_id,
       |  d.keeper_id IS NOT NULL AS is_dup
       |FROM cl LEFT JOIN dups d USING (vec_id)""".stripMargin
  }

  /** D33 — deterministic shard assignment for training-data output:
    * shard = md5(doc_id) mod 64, position = rank of the hash within
    * the shard — a content-addressed global shuffle that any worker
    * can recompute (no RNG state), the standard way to both
    * randomize example order and bound output file count. Shape: the
    * only shuffle is the per-shard window sort; shard count is the
    * scale knob (64 here; at 100 TB you raise nshards so a shard
    * stays executor-sized — the sort is per-shard, never global).
    */
  /** The d33 engine with the shard count exposed — the documented
    * scale knob. Because the hash is computed per document and the
    * shard is just `h mod nshards`, re-sharding the same corpus at a
    * different count is a stable permutation: with nshards' = m ·
    * nshards, shard(nshards) = shard(nshards') mod nshards for every
    * document (proven in ScaleOpsSpec), so raising the knob splits
    * shards without reshuffling content across unrelated shards.
    */
  private[graft] def shardPack(documents: DataFrame, nshards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))
    documents
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(nshards)).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos")
  }

  def d33(s: SparkSession, dir: String): DataFrame =
    shardPack(docs(s, dir), 64)

  val d33Sql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
      |  FROM documents)
      |SELECT doc_id, h % 64 AS shard,
      |  CAST(row_number() OVER (PARTITION BY h % 64 ORDER BY h, doc_id)
      |    AS BIGINT) AS pos
      |FROM h""".stripMargin

  /** D34 — boilerplate n-gram report (C4/RefinedWeb-style cleaning
    * signal): corpus-frequent word 3-grams (document frequency >=
    * minDf) and each document's coverage by them, as exact
    * per-milles. Shape for 100 TB: the df aggregation is a
    * combiner-friendly count on the gram key (distinct grams per
    * doc, so partial aggregation collapses each partition's
    * postings before the shuffle); the surviving frequent-gram set
    * is tiny by construction — boilerplate is heavy-tailed — so the
    * coverage pass is a broadcast semi-join, never a second
    * shuffle of the corpus.
    */
  def d34(s: SparkSession, dir: String): DataFrame =
    boilerplateNgrams(docs(s, dir), Left(5L))

  /** The d34 engine with the frequency threshold exposed. `minDf` is
    * either an absolute document frequency (`Left(5)` — the sandbox
    * default, right for fixed small corpora) or a corpus FRACTION
    * (`Right(0.001)` = grams in ≥ 0.1% of gram-bearing docs): at
    * 100 TB an absolute df is meaningless — 5 docs out of 10¹⁰ is
    * noise, not boilerplate — so production corpora scale the bar
    * with corpus size. The fraction form resolves against one count
    * of the (persisted) gram table — the same count that
    * materializes the persist the two downstream passes share; the
    * plan shape is identical for both forms.
    */
  private[graft] def boilerplateNgrams(documents: DataFrame,
      minDf: Either[Long, Double]): DataFrame = {
    val grams = documents
      .select(col("doc_id"),
        TextHash.word_gram_hashes(col("text"), 3, distinct = true).as("gs"))
      .filter(size(col("gs")) >= 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thresh: Long = minDf match {
      case Left(abs) =>
        require(abs >= 1, s"absolute minDf must be >= 1, got $abs"); abs
      case Right(frac) =>
        require(frac > 0.0 && frac <= 1.0,
          s"fractional minDf must be in (0, 1], got $frac")
        math.max(1L, math.ceil(frac * grams.count()).toLong)
    }
    val eg = grams.select(col("doc_id"), explode(col("gs")).as("g"))
    val freq = eg.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= thresh)
    val perDoc = eg.join(broadcast(freq.select("g")), Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_frequent"))
    grams.select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_frequent", coalesce(col("n_frequent"), lit(0L)))
      .withColumn("bp_pm", expr("n_frequent * 1000 div n_grams"))
  }

  val d34Sql: String =
    s"""WITH th AS (
       |  SELECT doc_id, $duckTokenHashes AS h FROM documents
       |  WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 3),
       |grams AS (SELECT doc_id, $duckGramHashes AS gs FROM th),
       |eg AS (SELECT doc_id, unnest(gs) AS g FROM grams),
       |freq AS (SELECT g FROM eg GROUP BY g HAVING count(*) >= 5),
       |nf AS (
       |  SELECT doc_id, count(*) AS n_frequent
       |  FROM eg JOIN freq USING (g) GROUP BY 1)
       |SELECT gr.doc_id, CAST(len(gr.gs) AS BIGINT) AS n_grams,
       |  coalesce(nf.n_frequent, CAST(0 AS BIGINT)) AS n_frequent,
       |  coalesce(nf.n_frequent, CAST(0 AS BIGINT)) * 1000
       |    // CAST(len(gr.gs) AS BIGINT) AS bp_pm
       |FROM grams gr LEFT JOIN nf USING (doc_id)""".stripMargin

  /** D35 — normalization dedup (Dolma-style "fuzzy-exact"): dedup
    * after aggressive text canonicalization — lowercase, strip
    * non-alphanumerics to spaces, collapse whitespace runs — so
    * near-copies differing only in punctuation/casing/spacing
    * collapse to one 128-bit key. Sits between D1 (byte-exact) and
    * D7 (MinHash): still a single hash-partitioned shuffle (the
    * window over norm_hash), no candidate generation at all, which
    * is why production pipelines run it before the expensive
    * similarity passes.
    */
  def d35(s: SparkSession, dir: String): DataFrame = {
    val normed = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9\\s]", " "), "\\s+", " "))
    val w = Window.partitionBy("norm_hash")
    docs(s, dir)
      .select(col("doc_id"), md5(normed.cast("binary")).as("norm_hash"))
      .withColumn("keeper_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("keeper_id"))
  }

  val d35Sql: String =
    """WITH n AS (
      |  SELECT doc_id,
      |    md5(trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS norm_hash
      |  FROM documents)
      |SELECT doc_id, norm_hash,
      |  min(doc_id) OVER (PARTITION BY norm_hash) AS keeper_id,
      |  doc_id <> min(doc_id) OVER (PARTITION BY norm_hash) AS is_dup
      |FROM n""".stripMargin

  /** D36 — media thumbnail pass: metadata prune → batched
    * per-partition "resize" ([[graft.multimodal.Media.thumbStub]],
    * a deterministic stand-in for a pixel-block downsample — see
    * Media.scala for the stub contract). The 100 TB-relevant part
    * is real: the n_chars predicate prunes on typed METADATA before
    * any payload byte is touched (parquet row-group stats skip whole
    * groups of binary payloads), and the kernel runs per-partition
    * so codec/GPU init amortizes. The length(text) guard keeps every
    * segment span provably non-empty even where metadata disagrees
    * with the payload: Spark's length() counts CODE POINTS
    * (UTF8String.numChars), the same unit [[graft.multimodal.Media
    * .thumbBytes]] segments by and DuckDB's length() divides by —
    * astral characters cannot open a gap between the guard and the
    * span widths (pinned by Round8OpsSpec's astral-char test).
    */
  def d36(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val sp: SparkSession = s
    val pruned = docs(s, dir)
      .filter(col("n_chars") >= 4 && length(col("text")) >= 4)
    val payloads = graft.multimodal.Media.asPayloads(pruned, "doc_id", "text")
    graft.multimodal.Media
      .thumbStub(payloads.as[graft.multimodal.Media.MediaRow], segments = 4)
      .toDF()
      .select(col("doc_id"), col("n_bytes"),
        element_at(col("thumb"), 1).as("t1"),
        element_at(col("thumb"), 2).as("t2"),
        element_at(col("thumb"), 3).as("t3"),
        element_at(col("thumb"), 4).as("t4"))
  }

  val d36Sql: String =
    """WITH codes AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |    list_transform(range(1, length(text)+1),
      |      tb_i -> CAST(unicode(text[tb_i]) AS BIGINT)) AS cs,
      |    CAST(length(text) AS BIGINT) AS n
      |  FROM documents WHERE n_chars >= 4 AND length(text) >= 4)
      |SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
      |  CAST(list_sum(cs[1 : CAST(n//4 AS INTEGER)]) AS DOUBLE)
      |    / (n//4) AS t1,
      |  CAST(list_sum(cs[CAST(n//4+1 AS INTEGER) : CAST(n*2//4 AS INTEGER)]) AS DOUBLE)
      |    / (n*2//4 - n//4) AS t2,
      |  CAST(list_sum(cs[CAST(n*2//4+1 AS INTEGER) : CAST(n*3//4 AS INTEGER)]) AS DOUBLE)
      |    / (n*3//4 - n*2//4) AS t3,
      |  CAST(list_sum(cs[CAST(n*3//4+1 AS INTEGER) : CAST(n AS INTEGER)]) AS DOUBLE)
      |    / (n - n*3//4) AS t4
      |FROM codes""".stripMargin

  /** The d38 test vocabulary: a rank-ordered merge table over the
    * corpus vocab exercising multi-level merges ("table" assembles
    * through t+a, ta+b, tab+l, tabl+e) and partial hits inside other
    * words ((t,a) fires inside "data", (r,o) inside "group"). The
    * operator itself ships NO vocabulary — semantics come entirely
    * from this caller-supplied table
    * ([[graft.functions.Bpe.tokenCount]]).
    */
  // lazy: referenced by d69Sql, a strict val initialized BEFORE this
  // declaration in object-init order (r16's one-line NPE lesson)
  private lazy val d38Merges: Seq[(Long, String, String)] = Seq(
    (0L, "t", "a"), (1L, "ta", "b"), (2L, "tab", "l"), (3L, "tabl", "e"),
    (4L, "s", "c"), (5L, "sc", "a"), (6L, "sca", "n"),
    (7L, "r", "o"), (8L, "ro", "w"),
    (9L, "a", "g"), (10L, "ag", "g"),
    (11L, "v", "a"), (12L, "va", "l"),
    (13L, "t", "h"), (14L, "th", "e"))

  /** D38 — merge-table-driven BPE token accounting
    * ([[graft.functions.Bpe]]): per document, whitespace-independent
    * word count and the BPE token count under the d38 merge table.
    * The tokenizer-faithful upgrade of d2's whitespace proxy — what
    * sequence packing (d26) and token budgeting actually need. Pure
    * codegen'd column arithmetic (delimited-string replace fold);
    * the merge table is driver-collected by contract (vocab-sized,
    * like a broadcast dim).
    */
  def d38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merges = d38Merges.toDF("rank", "left", "right")
    graft.functions.Bpe.tokenCount(docs(s, dir), merges, "doc_id", "text")
  }

  val d38Sql: String = {
    val folds = d38Merges.sortBy(_._1).flatMap { case (_, l, r) =>
      Seq.fill(graft.functions.Bpe.Passes)(s"'|$l|$r|=|$l$r|'")
    }.mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id,
       |    regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, ws,
       |    list_transform(ws, bp_w ->
       |      list_reduce(
       |        list_prepend(
       |          '|' || regexp_replace(bp_w[1:256], '(.)', '\\1|', 'g'),
       |          [$folds]),
       |        (bp_acc, bp_m) -> replace(bp_acc,
       |          split_part(bp_m, '=', 1), split_part(bp_m, '=', 2))))
       |      AS fs
       |  FROM w)
       |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
       |  CAST(coalesce(list_sum(list_transform(fs, bp_f ->
       |    length(bp_f) - length(replace(bp_f, '|', '')) - 1)), 0) AS BIGINT)
       |    AS n_tokens
       |FROM f""".stripMargin
  }

  /** D39 — corpus-level duplicated-span removal
    * ([[graft.dedup.Dedup.spanDedup]]): the C4/RefinedWeb "line
    * dedup" cleaning pass re-grained to 8-token spans (the synthetic
    * corpus has no line structure). Of every span's occurrences
    * across the whole corpus only the first (min doc, then offset)
    * survives; documents are reassembled from surviving spans and
    * reported as (span counts, md5 of the rebuilt text).
    */
  def d39(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.spanDedup(docs(s, dir), "doc_id", "text", width = 8)

  val d39Sql: String =
    """WITH w AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
      |  FROM documents),
      |seg AS (
      |  SELECT doc_id, CAST(sd_i AS BIGINT) AS seg_idx,
      |    array_to_string(
      |      ws[CAST(sd_i*8+1 AS INT):CAST(sd_i*8+8 AS INT)], ' ') AS span
      |  FROM w, unnest(range(0, (len(ws)+7)//8)) AS t(sd_i)),
      |m AS (
      |  SELECT doc_id, seg_idx, span,
      |    row_number() OVER (PARTITION BY md5(span)
      |      ORDER BY doc_id, seg_idx) AS rn
      |  FROM seg)
      |SELECT doc_id, count(*) AS n_spans,
      |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS kept_spans,
      |  md5(coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' '
      |    ORDER BY seg_idx), '')) AS new_text_md5
      |FROM m GROUP BY doc_id""".stripMargin

  /** D40 — source-mixture balancing
    * ([[graft.sampling.Sampler.mixReport]]): derive the per-source
    * per-mille rates that downsample each source toward an equal
    * share of a half-the-corpus token budget (Pile/Dolma-style
    * mixing), and report before/after doc+token counts. Selection is
    * the d20 content-hash rule, so the mix is reproducible across
    * runs and shards; all budget arithmetic is integer.
    */
  def d40(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampler.mixReport(docs(s, dir), "source", "text", "mix")

  val d40Sql: String =
    s"""WITH d AS (
       |  SELECT source,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok,
       |    ${duckHash("(text || '|mix')")} % 1000 AS samp_pm
       |  FROM documents),
       |s AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS docs_in,
       |    CAST(sum(tok) AS BIGINT) AS toks_in
       |  FROM d GROUP BY source),
       |t AS (SELECT CAST(sum(toks_in) AS BIGINT) AS tot,
       |    CAST(count(*) AS BIGINT) AS ns FROM s),
       |r AS (
       |  SELECT source, docs_in, toks_in,
       |    LEAST(1000, tot * 1 // (2 * ns) * 1000
       |      // GREATEST(toks_in, 1)) AS rate_pm
       |  FROM s, t)
       |SELECT source, docs_in, toks_in, CAST(rate_pm AS BIGINT) AS rate_pm,
       |  CAST(coalesce(sum(CASE WHEN d.samp_pm < rate_pm
       |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS docs_out,
       |  CAST(coalesce(sum(CASE WHEN d.samp_pm < rate_pm
       |    THEN d.tok ELSE 0 END), 0) AS BIGINT) AS toks_out
       |FROM r JOIN d USING (source)
       |GROUP BY 1, 2, 3, 4""".stripMargin

  /** The d41 test model: feature f weighs `(f*37 mod 21) - 10` —
    * integers in [-10, 10] hitting every residue, exercising
    * negative scores and the truncating division. The operator
    * itself ships NO weights; semantics come entirely from the
    * caller-supplied table ([[graft.functions.HashedLinear]]).
    */
  private[graft] val d41Dim = 1024

  /** D41 — model-based quality gate
    * ([[graft.functions.HashedLinear.scorePm]]): fastText-style
    * hashed-unigram linear scorer (the CCNet / LLaMA quality-filter
    * recipe) with caller-supplied integer weights over a 1024-bucket
    * hashed feature space. Zero-shuffle: the model rides the plan as
    * one array literal; the score is a codegen'd fold per row.
    */
  /** The d41/c25 test model as a weight frame: feature f weighs
    * `(f*37 mod 21) - 10` over the [[d41Dim]] hashed space.
    */
  private[graft] def d41Weights(s: SparkSession): DataFrame =
    s.range(0, d41Dim.toLong).select(
      col("id").as("feature"), (col("id") * 37 % 21 - 10).as("weight"))

  def d41(s: SparkSession, dir: String): DataFrame =
    graft.functions.HashedLinear.scorePm(
      docs(s, dir), d41Weights(s), d41Dim, "doc_id", "text", thresholdPm = 0L)

  val d41Sql: String =
    s"""WITH th AS (SELECT doc_id, $duckTokenHashes AS h FROM documents),
       |sc AS (
       |  SELECT doc_id, CAST(len(h) AS BIGINT) AS n_tokens,
       |    CAST(list_sum(list_transform(h,
       |      hq_h -> hq_h % $d41Dim * 37 % 21 - 10)) * 1000
       |      // len(h) AS BIGINT) AS score_pm
       |  FROM th)
       |SELECT doc_id, n_tokens, score_pm, score_pm >= 0 AS keep
       |FROM sc""".stripMargin

  /** D42 — topic-clustering report
    * ([[graft.similarity.Similarity.clusterReport]]): deterministic
    * seeded k-means over the embedding corpus (the d19/d37 coarse
    * quantizer as a first-class clustering operator), summarized per
    * cluster against the `label` column — size, distinct labels,
    * majority label, integer purity per-mille. The corpus-composition
    * view run before mixture decisions, and the cluster-quality
    * diagnostic behind the IVF index.
    */
  def d42(s: SparkSession, dir: String): DataFrame =
    // clusterReport keeps the label's native type (string topics are
    // legal since r12); the catalog entry pins BIGINT to match its
    // oracle's CAST
    graft.similarity.Similarity.clusterReport(
      emb(s, dir).withColumn("label", col("label").cast("long")),
      "vec_id", "embedding", "label", kCentroids = 16)

  val d42Sql: String =
    s"""WITH $duckKmeansAssign,
       |g AS (
       |  SELECT a.cid, CAST(e.label AS BIGINT) AS lbl,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM assign a JOIN embeddings e USING (vec_id)
       |  GROUP BY 1, 2),
       |tot AS (
       |  SELECT cid, CAST(sum(n) AS BIGINT) AS n_vecs,
       |    CAST(count(*) AS BIGINT) AS n_labels
       |  FROM g GROUP BY cid),
       |top AS (
       |  SELECT cid, lbl, n FROM (
       |    SELECT cid, lbl, n,
       |      row_number() OVER (PARTITION BY cid ORDER BY n DESC, lbl)
       |        AS rk
       |    FROM g) WHERE rk = 1)
       |SELECT t.cid, t.n_vecs, t.n_labels, p.lbl AS top_label,
       |  p.n AS top_n, p.n * 1000 // t.n_vecs AS purity_pm
       |FROM tot t JOIN top p USING (cid)""".stripMargin

  /** D43 — cluster-balanced sampling
    * ([[graft.similarity.Similarity.clusterBalancedSample]]):
    * downsample every k-means cluster toward an equal share of a
    * half-corpus budget — content-space mixture balancing (the d40
    * rule applied to embedding clusters instead of a metadata
    * column), selection by the d20 content-hash per-mille on the
    * vector id.
    */
  def d43(s: SparkSession, dir: String): DataFrame =
    graft.similarity.Similarity.clusterBalancedSample(
      emb(s, dir), "vec_id", "embedding", kCentroids = 16)

  val d43Sql: String =
    s"""WITH $duckKmeansAssign,
       |sz AS (
       |  SELECT cid, CAST(count(*) AS BIGINT) AS nc
       |  FROM assign GROUP BY cid),
       |tt AS (SELECT CAST(sum(nc) AS BIGINT) AS tot,
       |    CAST(count(*) AS BIGINT) AS ncl FROM sz),
       |r AS (
       |  SELECT cid, LEAST(1000, tot * 1 // (2 * ncl) * 1000
       |    // GREATEST(nc, 1)) AS rate_pm
       |  FROM sz, tt),
       |p AS (
       |  SELECT vec_id, cid,
       |    ${duckHash("(CAST(vec_id AS VARCHAR) || '|cbal')")} % 1000
       |      AS samp_pm
       |  FROM assign)
       |SELECT p.vec_id, p.cid, CAST(p.samp_pm AS BIGINT) AS samp_pm,
       |  CAST(r.rate_pm AS BIGINT) AS rate_pm
       |FROM p JOIN r USING (cid) WHERE p.samp_pm < r.rate_pm""".stripMargin

  /** D44 — embedding generation, deterministic stand-in
    * ([[graft.functions.HashEmbed]]): feature-hashing signed
    * projection of each document into a 16-component exact-integer
    * milli-vector — the Spark-side plumbing of the neural-encoder
    * embedding stage (swap the arithmetic for a batched model UDF in
    * production; schema, scan shape, and determinism stay). Bridges
    * the `documents` table to every embedding-consuming operator.
    *
    * The CATALOG entry flattens the vector to a canonical
    * comma-joined string (`emb_csv`): the driver's comparator
    * row-sorts results in pandas, which cannot order ndarray cells —
    * r11's `emb array<bigint>` shape error'd the gate without a
    * wrong value anywhere. `HashEmbed.embed`'s array API is
    * unchanged for c26 and every internal consumer; the CSV is an
    * exact BIGINT rendering, so the oracle remains hash-exact.
    */
  def d44(s: SparkSession, dir: String): DataFrame =
    graft.functions.HashEmbed.embed(docs(s, dir), "doc_id", "text", dim = 16)
      .select(col("doc_id"), col("n_tokens"),
        array_join(col("emb"), ",").as("emb_csv"))

  /** DuckDB fragment: the [[graft.functions.HashEmbed]] milli-vector
    * of the token-hash list `h` — shared by d44 and c26.
    */
  private[graft] def duckEmbExpr(dim: Int): String =
    s"""list_transform(range(0, $dim), ej_j ->
       |    CAST(list_sum(list_transform(h,
       |      ej_h -> (ej_h * (2*ej_j+1)) % ${graft.functions.HashEmbed.ProjMod}
       |        - 1000)) * 1000 // len(h) AS BIGINT))""".stripMargin

  val d44Sql: String =
    s"""WITH th AS (SELECT doc_id, $duckTokenHashes AS h FROM documents)
       |SELECT doc_id, CAST(len(h) AS BIGINT) AS n_tokens,
       |  array_to_string(${duckEmbExpr(16)}, ',') AS emb_csv
       |FROM th""".stripMargin

  /** Oracle of the c26 streaming near-dup admission gate
    * (StreamingQueries) — lives here because it composes this file's
    * fragments: d44 hash-embeddings → 16-dim kmeans assignment
    * ([[duckKmeansChain]]) → adaptive-nprobe candidate scoring
    * restricted to earlier doc ids → per-doc max-cosine admission
    * report. kc and nprobe are DERIVED FROM THE DATA exactly as the
    * engine derives them: kc = clamp(⌈√N⌉, 16, KCentroidsMax) over
    * the ingested slice, nprobe = max(4, ⌈√kc⌉) (the deployed
    * adaptiveNprobe rule). Both of the engine's ranking paths —
    * expression-literal below LitCentroidMax, boxed-literal above —
    * select the EXACT same top-nprobe (pinned in SimilaritySpec), so
    * this SQL mirrors the plan at every scale; the oracle-tested SFs
    * happen to run the expression-literal form.
    */
  private[graft] def c26NearDupSql: String = {
    val kcExpr = "LEAST(" + graft.similarity.Similarity.KCentroidsMax +
      ", GREATEST(16, CAST(ceil(sqrt(count(*))) AS BIGINT)))"
    val kcSub = s"(SELECT $kcExpr FROM documents WHERE doc_id % 10 <> 0)"
    val npSub = s"(SELECT GREATEST(4, CAST(ceil(sqrt($kcExpr)) AS BIGINT)) " +
      "FROM documents WHERE doc_id % 10 <> 0)"
    s"""WITH th AS (SELECT doc_id, $duckTokenHashes AS h FROM documents),
       |emb0 AS (SELECT doc_id, ${duckEmbExpr(16)} AS emb FROM th),
       |vn AS (
       |  SELECT doc_id AS vec_id,
       |    list_transform(emb, ce_x -> CAST(ce_x AS DOUBLE)) AS e
       |  FROM emb0 WHERE doc_id % 10 <> 0),
       |${duckKmeansChain(dim = 16, kcSql = kcSub)},
       |qn AS (
       |  SELECT doc_id AS q_id,
       |    list_transform(emb, cq_x -> CAST(cq_x AS DOUBLE)) AS e
       |  FROM emb0 WHERE doc_id % 10 = 0),
       |q AS (SELECT q_id, e, sqrt(${duckDot("e", "e")}) AS nrm FROM qn
       |      WHERE sqrt(${duckDot("e", "e")}) > 0),
       |probes AS (
       |  SELECT q_id, cid FROM (
       |    SELECT q.q_id, c.cid,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${duckDot("q.e", "c.ce")} / (q.nrm * c.cnrm) DESC,
       |                 c.cid) AS crk
       |    FROM q CROSS JOIN cents c) WHERE crk <= $npSub),
       |cand AS (
       |  SELECT p.q_id, a.vec_id AS n_id,
       |    ${duckDot("q.e", "n.e")} / (q.nrm * n.nrm) AS cos
       |  FROM probes p
       |  JOIN assign a USING (cid)
       |  JOIN q ON p.q_id = q.q_id
       |  JOIN v n ON a.vec_id = n.vec_id)
       |SELECT q_id AS doc_id, CAST(count(*) AS BIGINT) AS n_cands,
       |  max(cos) AS max_cos, max(cos) < 0.95 AS admit
       |FROM cand GROUP BY 1""".stripMargin
  }

  /** Oracle of the c28 COMPOSED streaming ingest gate
    * (StreamingQueries) — quality (the d41/c25 scorer) → embedding
    * near-dup (the c26 IVF probe) → span novelty (the c27 index)
    * with first-failing-gate fate attribution. Lives here because it
    * composes this file's fragments verbatim: the scoring CTE is
    * d41's, the embed/kmeans/probe chain is [[c26NearDupSql]]'s, the
    * span CTEs are c27's. Signals are computed for every arrival and
    * GATED on emission (`max_cos` NULL unless the doc passed
    * quality, `novel_pm` NULL unless it also passed the near-dup
    * bar) — exactly the engine's short-circuit, where a doc never
    * reaches the probes its fate precedes.
    */
  private[graft] def c28IngestGateSql: String = {
    val kcExpr = "LEAST(" + graft.similarity.Similarity.KCentroidsMax +
      ", GREATEST(16, CAST(ceil(sqrt(count(*))) AS BIGINT)))"
    val kcSub = s"(SELECT $kcExpr FROM documents WHERE doc_id % 10 <> 0)"
    val npSub = s"(SELECT GREATEST(4, CAST(ceil(sqrt($kcExpr)) AS BIGINT)) " +
      "FROM documents WHERE doc_id % 10 <> 0)"
    s"""WITH th AS (SELECT doc_id, $duckTokenHashes AS h FROM documents),
       |sc AS (
       |  SELECT doc_id, CAST(len(h) AS BIGINT) AS n_tokens,
       |    CAST(list_sum(list_transform(h,
       |      hq_h -> hq_h % $d41Dim * 37 % 21 - 10)) * 1000
       |      // len(h) AS BIGINT) AS score_pm
       |  FROM th WHERE doc_id % 10 = 0),
       |emb0 AS (SELECT doc_id, ${duckEmbExpr(16)} AS emb FROM th),
       |vn AS (
       |  SELECT doc_id AS vec_id,
       |    list_transform(emb, ce_x -> CAST(ce_x AS DOUBLE)) AS e
       |  FROM emb0 WHERE doc_id % 10 <> 0),
       |${duckKmeansChain(dim = 16, kcSql = kcSub)},
       |qn AS (
       |  SELECT doc_id AS q_id,
       |    list_transform(emb, cq_x -> CAST(cq_x AS DOUBLE)) AS e
       |  FROM emb0 WHERE doc_id % 10 = 0),
       |q AS (SELECT q_id, e, sqrt(${duckDot("e", "e")}) AS nrm FROM qn
       |      WHERE sqrt(${duckDot("e", "e")}) > 0),
       |probes AS (
       |  SELECT q_id, cid FROM (
       |    SELECT q.q_id, c.cid,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${duckDot("q.e", "c.ce")} / (q.nrm * c.cnrm) DESC,
       |                 c.cid) AS crk
       |    FROM q CROSS JOIN cents c) WHERE crk <= $npSub),
       |cand AS (
       |  SELECT p.q_id, ${duckDot("q.e", "n.e")} / (q.nrm * n.nrm) AS cos
       |  FROM probes p
       |  JOIN assign a USING (cid)
       |  JOIN q ON p.q_id = q.q_id
       |  JOIN v n ON a.vec_id = n.vec_id),
       |mc AS (SELECT q_id AS doc_id, max(cos) AS max_cos
       |       FROM cand GROUP BY 1),
       |w AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
       |  FROM documents),
       |seg AS (
       |  SELECT doc_id,
       |    array_to_string(
       |      ws[CAST(sd_i*8+1 AS INT):CAST(sd_i*8+8 AS INT)], ' ') AS span
       |  FROM w, unnest(range(0, (len(ws)+7)//8)) AS t(sd_i)),
       |idx AS (
       |  SELECT DISTINCT md5(span) AS k FROM seg WHERE doc_id % 10 <> 0),
       |nv AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN md5(span) IN (SELECT k FROM idx)
       |      THEN 0 ELSE 1 END) * 1000 // count(*) AS BIGINT) AS novel_pm
       |  FROM seg WHERE doc_id % 10 = 0 GROUP BY doc_id)
       |SELECT sc.doc_id,
       |  CASE WHEN sc.score_pm < -1800 THEN 'low_quality'
       |       WHEN mc.max_cos >= 0.95 THEN 'near_dup'
       |       WHEN nv.novel_pm < 900 THEN 'span_dup'
       |       ELSE 'admitted' END AS fate,
       |  sc.n_tokens, sc.score_pm,
       |  CASE WHEN sc.score_pm >= -1800 THEN mc.max_cos END AS max_cos,
       |  CASE WHEN sc.score_pm >= -1800
       |        AND (mc.max_cos IS NULL OR mc.max_cos < 0.95)
       |       THEN nv.novel_pm END AS novel_pm
       |FROM sc LEFT JOIN mc USING (doc_id) LEFT JOIN nv USING (doc_id)""".stripMargin
  }

  /** D46 — INCREMENTAL span dedup
    * ([[graft.dedup.Dedup.buildSpanIndex]] /
    * [[graft.dedup.Dedup.spanDedupIncremental]]): d39's
    * duplicated-span removal in the shape a crawl pipeline actually
    * runs it — the already-ingested corpus (here the
    * `doc_id % 5 != 0` slice) persists only its DISTINCT span keys
    * as a parquet index; each NEW batch (the `% 5 == 0` slice)
    * probes that index and keeps a span iff it is absent from the
    * index and first within the batch. Same d30 build-once/
    * probe-many amortization, applied to the span grain; the index
    * meta carries the span width and a contradicting probe throws.
    */
  def d46(s: SparkSession, dir: String): DataFrame = {
    val idx = graft.engine.Scratch.dir("graft_d46_")
    val d = docs(s, dir)
    graft.dedup.Dedup.buildSpanIndex(
      d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", idx, width = 8)
    // lazy over the index — cleanup is the Scratch exit sweep (d37
    // pattern)
    graft.dedup.Dedup.spanDedupIncremental(
      d.filter(col("doc_id") % 5 === 0), "doc_id", "text", idx)
  }

  val d46Sql: String =
    """WITH w AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
      |  FROM documents),
      |seg AS (
      |  SELECT doc_id, CAST(sd_i AS BIGINT) AS seg_idx,
      |    array_to_string(
      |      ws[CAST(sd_i*8+1 AS INT):CAST(sd_i*8+8 AS INT)], ' ') AS span
      |  FROM w, unnest(range(0, (len(ws)+7)//8)) AS t(sd_i)),
      |idx AS (
      |  SELECT DISTINCT md5(span) AS k FROM seg WHERE doc_id % 5 <> 0),
      |b AS (
      |  SELECT doc_id, seg_idx, span,
      |    row_number() OVER (PARTITION BY md5(span)
      |      ORDER BY doc_id, seg_idx) AS rn,
      |    md5(span) IN (SELECT k FROM idx) AS ingested
      |  FROM seg WHERE doc_id % 5 = 0)
      |SELECT doc_id, count(*) AS n_spans,
      |  CAST(sum(CASE WHEN rn = 1 AND NOT ingested THEN 1 ELSE 0 END)
      |    AS BIGINT) AS kept_spans,
      |  md5(coalesce(string_agg(
      |    CASE WHEN rn = 1 AND NOT ingested THEN span END, ' '
      |    ORDER BY seg_idx), '')) AS new_text_md5
      |FROM b GROUP BY doc_id""".stripMargin

  /** D47 — the FULL curation DAG as one operator
    * ([[graft.dedup.Curator.fullCurate]]): norm dedup (d35) → span
    * dedup coverage (d39) → hashed-linear quality gate (d41) →
    * equal-share source mixing (d40) → curriculum staging (d45),
    * with per-document fate attribution — the production ordering
    * (cheap passes first) proving the stages compose without the
    * raw corpus being read more than twice (pass-1 projection +
    * span segmentation of norm survivors; plan pinned in
    * PlanAuditSpec). Runs the d41 test model at threshold 0 and a
    * half-token-budget mix.
    */
  def d47(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Curator.fullCurate(
      docs(s, dir), d41Weights(s), d41Dim)

  val d47Sql: String =
    s"""WITH th AS (
       |  SELECT doc_id, source, text, $duckTokenHashes AS h
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, source, CAST(len(h) AS BIGINT) AS n_tokens,
       |    CAST(list_sum(list_transform(h,
       |      hq_h -> hq_h % $d41Dim * 37 % 21 - 10)) * 1000
       |      // len(h) AS BIGINT) AS score_pm,
       |    ${duckHash("(text || '|curate')")} % 1000 AS samp_pm,
       |    md5(trim(regexp_replace(regexp_replace(lower(text),
       |      '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS norm_hash
       |  FROM th),
       |normk AS (
       |  SELECT *, doc_id <> min(doc_id) OVER (PARTITION BY norm_hash)
       |    AS norm_dup
       |  FROM base),
       |w AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
       |  FROM documents
       |  WHERE doc_id IN (SELECT doc_id FROM normk WHERE NOT norm_dup)),
       |seg AS (
       |  SELECT doc_id,
       |    array_to_string(
       |      ws[CAST(sd_i*8+1 AS INT):CAST(sd_i*8+8 AS INT)], ' ') AS span,
       |    CAST(sd_i AS BIGINT) AS seg_idx
       |  FROM w, unnest(range(0, (len(ws)+7)//8)) AS t(sd_i)),
       |m AS (
       |  SELECT doc_id,
       |    row_number() OVER (PARTITION BY md5(span)
       |      ORDER BY doc_id, seg_idx) AS rn
       |  FROM seg),
       |spk AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) * 1000
       |      // count(*) AS BIGINT) AS span_keep_pm
       |  FROM m GROUP BY doc_id),
       |f AS (
       |  SELECT n.*, s.span_keep_pm
       |  FROM normk n LEFT JOIN spk s USING (doc_id)),
       |s3 AS (
       |  SELECT * FROM f
       |  WHERE NOT norm_dup AND span_keep_pm >= 500 AND score_pm >= 0),
       |agg AS (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS toks
       |  FROM s3 GROUP BY source),
       |tt AS (SELECT CAST(sum(toks) AS BIGINT) AS tot,
       |    CAST(count(*) AS BIGINT) AS ns FROM agg),
       |r AS (
       |  SELECT source, LEAST(1000, tot * 1 // (2 * ns) * 1000
       |    // GREATEST(toks, 1)) AS rate_pm
       |  FROM agg, tt),
       |kept AS (
       |  SELECT s3.doc_id, s3.score_pm
       |  FROM s3 JOIN r USING (source) WHERE s3.samp_pm < r.rate_pm),
       |hist AS (
       |  SELECT score_pm, CAST(count(*) AS BIGINT) AS cnt
       |  FROM kept GROUP BY 1),
       |c AS (
       |  SELECT score_pm,
       |    CAST(sum(cnt) OVER (ORDER BY score_pm) AS BIGINT) AS cum,
       |    CAST(sum(cnt) OVER () AS BIGINT) AS n
       |  FROM hist),
       |b AS (
       |  SELECT min(CASE WHEN cum >= (1*n+3)//4 THEN score_pm END) AS q1,
       |         min(CASE WHEN cum >= (2*n+3)//4 THEN score_pm END) AS q2,
       |         min(CASE WHEN cum >= (3*n+3)//4 THEN score_pm END) AS q3
       |  FROM c),
       |staged AS (
       |  SELECT k.doc_id,
       |    CAST((k.score_pm > b.q1)::BIGINT + (k.score_pm > b.q2)::BIGINT
       |      + (k.score_pm > b.q3)::BIGINT AS BIGINT) AS stage
       |  FROM kept k, b)
       |SELECT f.doc_id,
       |  CASE WHEN f.norm_dup THEN 'norm_dup'
       |       WHEN f.span_keep_pm < 500 THEN 'span_dup'
       |       WHEN NOT coalesce(f.score_pm >= 0, false) THEN 'low_quality'
       |       WHEN NOT (f.samp_pm < r.rate_pm) THEN 'mix_out'
       |       ELSE 'kept' END AS fate,
       |  f.score_pm, st.stage
       |FROM f
       |LEFT JOIN r USING (source)
       |LEFT JOIN staged st USING (doc_id)""".stripMargin

  /** D45 — curriculum staging by exact quality quartiles
    * ([[graft.sampling.Sampler.quartileStages]] over the d41
    * hashed-linear score): each document lands in stage 0-3 by the
    * quartile of its integer quality score, computed from a bounded
    * score histogram instead of the `ntile` global sort that would
    * serialize the corpus through one task.
    */
  def d45(s: SparkSession, dir: String): DataFrame =
    graft.sampling.Sampler.quartileStages(
      graft.functions.HashedLinear.scorePm(
        docs(s, dir), d41Weights(s), d41Dim, "doc_id", "text"),
      "doc_id", "score_pm")

  val d45Sql: String =
    s"""WITH th AS (SELECT doc_id, $duckTokenHashes AS h FROM documents),
       |sc AS (
       |  SELECT doc_id,
       |    CAST(list_sum(list_transform(h,
       |      hq_h -> hq_h % $d41Dim * 37 % 21 - 10)) * 1000
       |      // len(h) AS BIGINT) AS score_pm
       |  FROM th),
       |hist AS (
       |  SELECT score_pm, CAST(count(*) AS BIGINT) AS cnt
       |  FROM sc GROUP BY 1),
       |c AS (
       |  SELECT score_pm,
       |    CAST(sum(cnt) OVER (ORDER BY score_pm) AS BIGINT) AS cum,
       |    CAST(sum(cnt) OVER () AS BIGINT) AS n
       |  FROM hist),
       |b AS (
       |  SELECT min(CASE WHEN cum >= (1*n+3)//4 THEN score_pm END) AS q1,
       |         min(CASE WHEN cum >= (2*n+3)//4 THEN score_pm END) AS q2,
       |         min(CASE WHEN cum >= (3*n+3)//4 THEN score_pm END) AS q3
       |  FROM c)
       |SELECT sc.doc_id, sc.score_pm,
       |  CAST((sc.score_pm > b.q1)::BIGINT + (sc.score_pm > b.q2)::BIGINT
       |    + (sc.score_pm > b.q3)::BIGINT AS BIGINT) AS stage
       |FROM sc, b""".stripMargin

  val queries: Map[String, QFn] = Map(
    "d67_web_recipe" -> (d67 _),
    "d68_index_delete" -> (d68 _),
    "d69_tok_decontam" -> (d69 _),
    "d70_url_dedup" -> (d70 _),
    "d66_hard_negatives" -> (d66 _),
    "d65_recall_curve" -> (d65 _),
    "d64_line_dedup" -> (d64 _),
    "d63_c4_filters" -> (d63 _),
    "d62_gopher_rules" -> (d62 _),
    "d61_kmv_sketch" -> (d61 _),
    "d60_winnow_pairs" -> (d60 _),
    "d59_ppl_tiers" -> (d59 _),
    "d58_spann_ann" -> (d58 _),
    "d57_adc_rerank" -> (d57 _),
    "d56_bpe_train" -> (d56 _),
    "d55_dup_intervals" -> (d55 _),
    "d54_containment" -> (d54 _),
    "d53_cdc_chunks" -> (d53 _),
    "d52_dsir_select" -> (d52 _),
    "d51_ivfadc" -> (d51 _),
    "d50_pq_ann" -> (d50 _),
    "d49_bloom_decontam" -> (d49 _),
    "d48_index_loop" -> (d48 _),
    "d47_full_curate" -> (d47 _),
    "d46_span_index" -> (d46 _),
    "d45_curriculum" -> (d45 _),
    "d44_embed_text" -> (d44 _),
    "d43_cluster_sample" -> (d43 _),
    "d42_topic_cluster" -> (d42 _),
    "d41_hash_quality" -> (d41 _),
    "d40_source_mix" -> (d40 _),
    "d39_span_dedup" -> (d39 _),
    "d38_bpe_tokens" -> (d38 _),
    "d37_ivf_index" -> (d37 _),
    "d36_media_thumb" -> (d36 _),
    "d35_norm_dedup" -> (d35 _),
    "d34_boilerplate_ngrams" -> (d34 _),
    "d33_shard_pack" -> (d33 _),
    "d32_semantic_dedup" -> (d32 _),
    "d31_repetition_filter" -> (d31 _),
    "d30_incremental_dedup" -> (d30 _),
    "d29_lm_quality" -> (d29 _),
    "d28_tfidf_terms" -> (d28 _),
    "d27_winsorize" -> (d27 _),
    "d26_pack_sequences" -> (d26 _),
    "d25_doc_chunk" -> (d25 _),
    "d24_curation_report" -> (d24 _),
    "d23_frame_sample" -> (d23 _),
    "d22_term_topk" -> (d22 _),
    "d21_decontaminate" -> (d21 _),
    "d20_stratified_sample" -> (d20 _),
    "d19_ivf_ann" -> (d19 _),
    "d18_dup_clusters" -> (d18 _),
    "d17_embed_quantize" -> (d17 _),
    "d16_pii_scrub" -> (d16 _),
    "d15_train_split" -> (d15 _),
    "d14_corpus_curate" -> (d14 _),
    "d1_dedup_exact" -> (d1 _),
    "d2_token_count" -> (d2 _),
    "d3_quality_score" -> (d3 _),
    "d4_lang_id" -> (d4 _),
    "d5_fingerprint" -> (d5 _),
    "d6_ngram_jaccard" -> (d6 _),
    "d7_dedup_minhash" -> (d7 _),
    "d8_dedup_simhash" -> (d8 _),
    "d9_cosine_topk" -> (d9 _),
    "d10_embed_dedup" -> (d10 _),
    "d11_ann_lsh" -> (d11 _),
    "d12_multimodal_meta" -> (d12 _),
    "d13_minhash_jaccard_verify" -> (d13 _))

  val oracles: Map[String, String] = Map(
    "d67_web_recipe" -> d67Sql,
    "d68_index_delete" -> d68Sql,
    "d69_tok_decontam" -> d69Sql,
    "d70_url_dedup" -> d70Sql,
    "d66_hard_negatives" -> d66Sql,
    "d65_recall_curve" -> d65Sql,
    "d64_line_dedup" -> d64Sql,
    "d63_c4_filters" -> d63Sql,
    "d62_gopher_rules" -> d62Sql,
    "d61_kmv_sketch" -> d61Sql,
    "d60_winnow_pairs" -> d60Sql,
    "d59_ppl_tiers" -> d59Sql,
    "d58_spann_ann" -> d58Sql,
    "d57_adc_rerank" -> d57Sql,
    "d56_bpe_train" -> d56Sql,
    "d55_dup_intervals" -> d55Sql,
    "d54_containment" -> d54Sql,
    "d53_cdc_chunks" -> d53Sql,
    "d52_dsir_select" -> d52Sql,
    "d51_ivfadc" -> d51Sql,
    "d50_pq_ann" -> d50Sql,
    "d49_bloom_decontam" -> d49Sql,
    "d48_index_loop" -> d48Sql,
    "d47_full_curate" -> d47Sql,
    "d46_span_index" -> d46Sql,
    "d45_curriculum" -> d45Sql,
    "d44_embed_text" -> d44Sql,
    "d43_cluster_sample" -> d43Sql,
    "d42_topic_cluster" -> d42Sql,
    "d41_hash_quality" -> d41Sql,
    "d40_source_mix" -> d40Sql,
    "d39_span_dedup" -> d39Sql,
    "d38_bpe_tokens" -> d38Sql,
    "d37_ivf_index" -> d37Sql,
    "d36_media_thumb" -> d36Sql,
    "d35_norm_dedup" -> d35Sql,
    "d34_boilerplate_ngrams" -> d34Sql,
    "d33_shard_pack" -> d33Sql,
    "d32_semantic_dedup" -> d32Sql,
    "d31_repetition_filter" -> d31Sql,
    "d30_incremental_dedup" -> d30Sql,
    "d29_lm_quality" -> d29Sql,
    "d28_tfidf_terms" -> d28Sql,
    "d27_winsorize" -> d27Sql,
    "d26_pack_sequences" -> d26Sql,
    "d25_doc_chunk" -> d25Sql,
    "d24_curation_report" -> d24Sql,
    "d23_frame_sample" -> d23Sql,
    "d22_term_topk" -> d22Sql,
    "d21_decontaminate" -> d21Sql,
    "d20_stratified_sample" -> d20Sql,
    "d19_ivf_ann" -> d19Sql,
    "d18_dup_clusters" -> d18Sql,
    "d17_embed_quantize" -> d17Sql,
    "d16_pii_scrub" -> d16Sql,
    "d15_train_split" -> d15Sql,
    "d14_corpus_curate" -> d14Sql,
    "d1_dedup_exact" -> d1Sql,
    "d2_token_count" -> d2Sql,
    "d3_quality_score" -> d3Sql,
    "d4_lang_id" -> d4Sql,
    "d5_fingerprint" -> d5Sql,
    "d6_ngram_jaccard" -> d6Sql,
    "d7_dedup_minhash" -> d7Sql,
    "d8_dedup_simhash" -> d8Sql,
    "d9_cosine_topk" -> d9Sql,
    "d10_embed_dedup" -> d10Sql,
    "d11_ann_lsh" -> d11Sql,
    "d12_multimodal_meta" -> d12Sql,
    "d13_minhash_jaccard_verify" -> d13Sql)
}
