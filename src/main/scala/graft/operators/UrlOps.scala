package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level curation (the C4/RefinedWeb family): canonicalization
  * for dedup, host extraction, and per-domain frequency capping —
  * crawls are dominated by a few hosts, and capping docs-per-domain
  * is a standard diversity control.
  *
  * Canonicalization is the aggressive DEDUP canon, not a semantic
  * rewrite: lowercase, scheme and leading www. stripped, query string
  * and fragment dropped. Regexes live in the Java∩RE2 dialect subset
  * (the PII-scrub discipline) so a DuckDB/RE2 oracle evaluates them
  * identically. All map-only; the capping pass reuses
  * [[Sampling.sampleExactPerStratum]] (deterministic md5 rank per
  * domain — one window exchange, the price of an exact cap).
  */
object UrlOps {

  /** Dedup-canonical form: lowercase; strip scheme + leading www.;
    * drop query and fragment. The strip pattern is `(?s)[?#].*`, not
    * `[?#].*$`: with control characters in the URL (undecoded %0d/%0a
    * junk on a real frontier) Java's `.`/`$` and RE2's disagree about
    * \r and trailing \n — DOTALL-from-the-marker is the one spelling
    * both dialects evaluate identically (and it always strips).
    */
  def normalizeUrl(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(url), "^[a-z][a-z0-9+.-]*://(www\\.)?", ""),
      "(?s)[?#].*", "")

  /** Host part of the canonical form (everything before the first
    * slash). Registrable-domain grouping needs the public-suffix
    * list; host-level grouping is the deterministic engine-side canon
    * (documented).
    */
  def host(url: Column): Column =
    regexp_extract(normalizeUrl(url), "^([^/]+)", 1)

  /** Keep at most `maxPerDomain` rows per host — deterministic,
    * partitioning-independent (md5 rank, key tiebreak).
    */
  def capPerDomain(df: DataFrame, keyCol: String, urlCol: String,
                   maxPerDomain: Int, salt: String = "graft",
                   domainCol: String = "domain"): DataFrame = {
    require(!df.columns.contains(domainCol),
      s"input already has a '$domainCol' column")
    Sampling.sampleExactPerStratum(
      df.withColumn(domainCol, host(col(urlCol))),
      keyCol, domainCol, maxPerDomain, salt)
  }
}
