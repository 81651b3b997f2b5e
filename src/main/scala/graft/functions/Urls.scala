package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass web-curation
  * pipelines run BEFORE url-level dedup (RefinedWeb §3.1 runs url
  * dedup as the first dedup stage; Dolma and CCNet canonicalize
  * before matching): two crawls of one page differ in scheme, a
  * `www.` prefix, tracking query parameters, parameter order, or a
  * trailing slash, and a dedup keyed on the raw string misses all of
  * them.
  *
  * Rules (each a documented, deterministic string rewrite):
  *   1. strip the fragment (`#...` — client-side only, never
  *      changes the fetched document);
  *   2. lowercase the scheme and authority (RFC 3986 §6.2.2.1 case
  *      normalization — path and query stay case-sensitive);
  *   3. drop the scheme (http/https serve the same page in the
  *      post-HTTPS-everywhere web) and a leading `www.`;
  *   4. drop explicit default ports (`:80`, `:443`);
  *   5. drop tracking parameters ([[TrackingParams]] — utm_*,
  *      click ids, referrer tags), SORT the survivors (parameter
  *      order is transport-irrelevant), and drop an emptied query;
  *   6. strip trailing slashes from the path.
  *
  * Every rewrite is an `org.apache.spark.sql.functions` composition
  * (regexp/split/filter/array_sort/array_join) — map-side,
  * codegen-friendly, no UDF — and each regex is RE2-compatible (no
  * lookahead), so the DuckDB oracle runs the IDENTICAL patterns.
  */
object Urls {

  /** Query parameters that identify a campaign/click, not a
    * document — the standard strip list (Google Analytics utm_*,
    * Facebook/Google/Microsoft click ids, common referrer tags).
    */
  val TrackingParams: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "fbclid", "gclid", "msclkid", "ref", "ref_src")

  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    // case-normalize ONLY scheme://authority; the path/query keep
    // their bytes (RFC 3986: host is case-insensitive, path is not)
    val auth = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val lowered = concat(lower(auth), substr(noFrag, length(auth) + 1))
    val noScheme = regexp_replace(lowered, "^https?://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    val noPort =
      regexp_replace(noWww, "^([^/?#]*):(?:80|443)($|[/?#].*)", "$1$2")
    val qpos = instr(noPort, "?")
    val path0 = when(qpos > 0, substr(noPort, lit(1), qpos - 1))
      .otherwise(noPort)
    val query0 = when(qpos > 0, substr(noPort, qpos + 1)).otherwise(lit(""))
    val kept = array_sort(filter(split(query0, "&"), p =>
      length(p) > 0 &&
        !lower(substring_index(p, "=", 1)).isin(TrackingParams: _*)))
    val path = regexp_replace(path0, "/+$", "")
    when(size(kept) > 0, concat(path, lit("?"), array_join(kept, "&")))
      .otherwise(path)
  }
}
