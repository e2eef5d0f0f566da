package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the curation step every
  * web-crawl pipeline runs before content dedup: the same page
  * arrives as `HTTP://Example.COM:80/path/?utm_source=x#frag` and
  * `http://example.com/path` and must collapse to one crawl record.
  *
  * The canonicalizer is a fixed pipeline of NATIVE column expressions
  * (regexp_replace / regexp_extract / lower / concat — all
  * whole-stage-codegen'd; no UDF), applied in an order where each
  * step's pattern cannot create matches for an earlier step:
  *
  *   1. strip the fragment (`#...`);
  *   2. strip `utm_*` tracking parameters wherever they sit in the
  *      query string (leading, middle, trailing, only);
  *   3. strip an explicit default port (`:80` on the authority);
  *   4. lowercase scheme + authority ONLY (paths and queries are
  *      case-sensitive by RFC 3986 and keep their case);
  *   5. strip a trailing path slash (also before `?`), keeping the
  *      lone root slash.
  *
  * d42 gates the END-TO-END semantics against ground truth: the
  * oracle computes the canonical form of every fixture URL from its
  * closed form directly — not by re-running regexes — so a wrong
  * rewrite in ANY step diverges. At 100 TB the op is a narrow
  * projection + one hash aggregate on the canonical key; raw URLs
  * never shuffle (only the canonical key and counters do). */
object UrlOps {

  /** Canonical form of `u` per the five steps above. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // utm params: non-leading, leading-followed, leading-only
    val utm1 = regexp_replace(noFrag, "&utm_[A-Za-z0-9_]+=[^&#]*", "")
    val utm2 = regexp_replace(utm1, "\\?utm_[A-Za-z0-9_]+=[^&#]*&", "?")
    val utm3 = regexp_replace(utm2, "\\?utm_[A-Za-z0-9_]+=[^&#]*$", "")
    // default port on the authority only. The authority ends at the
    // first `/` OR `?` — a path-less URL (`http://ex.com?a=b`) carries
    // its query right after the host, so both the port lookahead and
    // the authority character classes must stop at `?` too (the
    // fragment is already stripped above, so `#` can't appear here)
    val noPort = regexp_replace(utm3, "^([^/?]*//[^/:?]*):80(?=[/?]|$)", "$1")
    // lowercase scheme://authority, keep the rest as-is (paths AND
    // queries are case-sensitive by RFC 3986 — a path-less URL's query
    // must not ride into the lowered prefix)
    val schemeHost = lower(regexp_extract(noPort, "^[^/?]*//[^/?]*", 0))
    val rest = substring(noPort,
      length(regexp_extract(noPort, "^[^/?]*//[^/?]*", 0)) + 1, lit(1 << 24))
    val lowered = concat(schemeHost, rest)
    // trailing path slash: before a query, and at end. The pattern
    // requires a path SEGMENT before the slash, so the lone root
    // slash (…com/ or …com/?q) is kept
    // the segment's own leading slash must not be the authority's
    // ("//host/"), hence the [^:/] anchor before it
    val noSlashQ = regexp_replace(lowered, "([^:/]/[^/?]+)/\\?", "$1?")
    regexp_replace(noSlashQ, "([^:/]/[^/?]+)/$", "$1")
  }

  /** URL-level dedup: group rows by the canonical URL, keep the
    * smallest id as the canonical crawl record, count the variants.
    * `n_raw_variants` counts DISTINCT raw spellings (re-crawls of the
    * byte-identical URL don't inflate it). */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(col(idCol), col(urlCol),
        canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col(urlCol)).as("n_raw_variants"),
        min(col(idCol)).as("keeper_id"))
}
