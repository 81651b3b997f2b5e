package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  private def docs(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")

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
    * minimum doc id as canonical, count members. At scale this is
    * one hash-partitioned aggregation on a 64-bit key (no text
    * comparison shuffle; collisions resolved inside the group by
    * grouping on the normalized text too).
    */
  def d1(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("content_hash", TextHash.poly_hash(norm))
      .groupBy("content_hash")
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  val d1Sql: String =
    s"""SELECT ${duckHash(duckNorm)} AS content_hash,
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
    val fps = array_distinct(transform(
      sequence(lit(0), size(sh) - 4),
      i => array_min(slice(sh, i + 1, lit(4)))))
    docs(s, dir)
      .withColumn("fps", fps)
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"),
        aggregate(col("fps"), lit(0L), (a, x) => a + x).as("sum_fp"))
  }

  val d5Sql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, ${duckShingles(duckNorm, 8)} AS h FROM documents),
       |fp AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, len(h)-4+2), w_i -> list_min(h[w_i:w_i+3]))) AS fps
       |  FROM sh)
       |SELECT doc_id, len(fps) AS n_fp, list_min(fps) AS min_fp,
       |       list_max(fps) AS max_fp, list_sum(fps) AS sum_fp
       |FROM fp""".stripMargin

  val queries: Map[String, QFn] = Map(
    "d1_dedup_exact" -> (d1 _),
    "d2_token_count" -> (d2 _),
    "d3_quality_score" -> (d3 _),
    "d4_lang_id" -> (d4 _),
    "d5_fingerprint" -> (d5 _))

  val oracles: Map[String, String] = Map(
    "d1_dedup_exact" -> d1Sql,
    "d2_token_count" -> d2Sql,
    "d3_quality_score" -> d3Sql,
    "d4_lang_id" -> d4Sql,
    "d5_fingerprint" -> d5Sql)
}
