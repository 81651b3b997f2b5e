package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merge-table-driven byte-pair encoding (SURVEY §2.D — the
  * tokenizer-faithful upgrade of d2's whitespace/regex proxy).
  *
  * Real training pipelines budget documents by TOKENIZER tokens, not
  * whitespace words — sequence packing (d26), context-length
  * filtering, and cost estimates all shift when "token" means what
  * the model's tokenizer would produce. This operator implements the
  * public BPE algorithm (Sennrich et al. 2016) parameterized by a
  * caller-supplied merge table — no vocabulary ships with the
  * library; the semantics are defined entirely by the input table,
  * and a tiny test vocab exercises them in the catalog.
  *
  * Semantics (pinned, deterministic):
  *   - pre-tokenize: lowercase, words = maximal `[a-z0-9]+` runs,
  *     each word truncated to `wordCap` chars (real tokenizers also
  *     cap pathological words); everything else is a boundary and
  *     contributes no tokens
  *   - initial symbols: single characters
  *   - merges apply in rank order; each merge replaces EVERY
  *     adjacent (left, right) symbol pair before the next rank
  *     proceeds, and a merge never reaches across a word boundary.
  *     `left != right` is required (validated): with distinct sides
  *     occurrences are provably disjoint and merging them is
  *     order-independent, so "replace every occurrence" is a unique
  *     normal form — the canonical Sennrich semantics. A same-symbol
  *     merge (e.g. (a,a) over a run "aaaa") has order-SENSITIVE
  *     pairing that a declarative fold cannot pin down, so it is
  *     rejected rather than silently mis-paired.
  *
  * Execution shape — the whole computation is codegen'd Column
  * arithmetic, no UDFs and no custom expressions: a word travels as
  * a `|`-delimited symbol string (`"|t|a|b|"`; safe because the
  * alphabet is `[a-z0-9]`), one merge pass is a single
  * non-overlapping left-to-right `replace("|l|r|" -> "|lr|")`, and
  * the rank-ordered fixpoint loop is `aggregate` over a constant
  * merge array with each merge repeated [[Passes]] times. One
  * replace pass cannot merge back-to-back occurrences (the shared
  * delimiter is consumed), but it removes >= 1/3 of remaining
  * occurrences, so [[Passes]] >= log_1.5(wordCap) passes reach the
  * per-merge fixpoint — BpeSpec property-checks this bound against a
  * naive Scala reference. Per row the cost is
  * O(words x merges x Passes) string scans with zero shuffle; the
  * merge table is collected once on the driver (a tokenizer vocab is
  * dim-table sized — 10k-100k rows — the same class of collect as a
  * broadcast dim) and baked into the plan as a literal.
  */
object Bpe {

  /** Per-merge replace passes baked into the fold: reaches the
    * all-merged normal form for any word up to [[WordCapDefault]]
    * symbols (class doc; 20 > log2(256) with margin).
    */
  val Passes = 20

  val WordCapDefault = 256

  /** `|`-delimited single-character symbol string of a word:
    * "tab" -> "|t|a|b|". */
  def delimit(word: Column): Column =
    concat(lit("|"), regexp_replace(word, "(.)", "$1|"))

  /** The constant (search, replace) fold array for a rank-ordered
    * merge list: each merge expanded to [[Passes]] consecutive
    * passes, merge-major (all passes of rank 0, then rank 1, ...).
    */
  private def mergeLit(merges: Seq[(String, String)]): Column = {
    require(merges.forall { case (l, r) =>
      l.nonEmpty && r.nonEmpty && l != r && (l + r).matches("[a-z0-9]+")
    }, "merge sides must be non-empty, distinct [a-z0-9]+ strings " +
      "(same-symbol merges have order-sensitive pairing — see scaladoc)")
    typedLit(merges.flatMap { case (l, r) =>
      Seq.fill(Passes)((s"|$l|$r|", s"|$l$r|"))
    })
  }

  /** Array of per-word BPE token counts for a lowercased text
    * column: words pre-tokenized, delimited, folded through the
    * merge passes; the count is delimiters minus one.
    */
  private def wordTokenCounts(text: Column, merges: Seq[(String, String)],
      wordCap: Int): Column = {
    val ml = mergeLit(merges)
    val words = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    transform(words, w => {
      val folded = aggregate(ml, delimit(substring(w, 1, wordCap)),
        (acc, m) => replace(acc, m("_1"), m("_2")))
      (length(folded) - length(replace(folded, lit("|"))) - lit(1))
        .cast("long")
    })
  }

  /** Per-document token accounting under a caller-supplied merge
    * table (`rank`, `left`, `right` columns; rank defines merge
    * order): (id, n_words, n_tokens). The merge table is collected
    * to the driver (vocab-sized by contract) and becomes plan
    * constants — executors never shuffle or join it.
    */
  def tokenCount(docs: DataFrame, merges: DataFrame, id: String,
      text: String, wordCap: Int = WordCapDefault): DataFrame = {
    val ms = collectMerges(merges)
    val counts = wordTokenCounts(col(text), ms, wordCap)
    docs.select(col(id),
      size(regexp_extract_all(lower(col(text)), lit("[a-z0-9]+"), lit(0)))
        .cast("long").as("n_words"),
      coalesce(aggregate(counts, lit(0L), (a, x) => a + x), lit(0L))
        .as("n_tokens"))
  }

  /** The rank-ordered (left, right) merge list of a merge table. */
  def collectMerges(merges: DataFrame): Seq[(String, String)] =
    merges.select("rank", "left", "right").collect()
      .sortBy(_.getAs[Number]("rank").longValue())
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
      .toSeq

  /** The BPE symbol sequence per word (test/debug surface — the
    * catalog path only needs counts): array over words of the
    * folded delimited string.
    */
  def encodeDelimited(text: Column, merges: Seq[(String, String)],
      wordCap: Int = WordCapDefault): Column = {
    val ml = mergeLit(merges)
    val words = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    transform(words, w => aggregate(ml, delimit(substring(w, 1, wordCap)),
      (acc, m) => replace(acc, m("_1"), m("_2"))))
  }
}
