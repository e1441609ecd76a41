package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation (the RefinedWeb/CCNet
  * preprocessing step): re-posts of one page arrive under dozens of
  * surface forms — mixed-case hosts, `www.` prefixes, default ports,
  * tracking query parameters, fragments, shuffled parameter order — and
  * every URL-keyed dedup, per-domain quota, or blocklist join needs ONE
  * canonical key per page first.
  *
  * Canonical form: lowercased scheme and host, `www.` and default ports
  * (:80/:443) stripped, fragment dropped, tracking parameters
  * (`utm_*`, `ref`, `fbclid`, `gclid`) removed, surviving query
  * parameters SORTED, empty path normalized to `/`.
  *
  * Everything is built from codegen'd builtins (regexp_extract + the
  * filter/array_sort higher-order functions) — a pure scan-stage map, no
  * UDF, no shuffle, replayable in ANSI SQL. Inputs that are not absolute
  * http(s)-style URLs (no `scheme://`) canonicalize to null rather than
  * garbage, so malformed rows are filterable instead of silently forming
  * a junk domain. */
object Urls {

  private val TrackingPrefixes = Seq("utm_", "ref=", "fbclid=", "gclid=")
  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  private def hostOf(nofrag: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(nofrag, SchemeRe + "([^/?#]+)", 2)),
        ":(80|443)$", ""),
      "^www\\.", "")

  /** The registrable-host key (lowercased, www/port stripped) — the
    * per-domain quota and blocklist join key. Null for non-URLs. */
  def domain(url: Column): Column = {
    val nofrag = regexp_replace(url, "#.*", "")
    val h = hostOf(nofrag)
    when(h === "", lit(null)).otherwise(h)
  }

  /** Full canonical URL (see object doc). Null for non-URLs. */
  def canonicalize(url: Column): Column = {
    val nofrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(nofrag, SchemeRe, 1))
    val host = hostOf(nofrag)
    val path0 = regexp_extract(nofrag, SchemeRe + "[^/?#]+([^?#]*)", 2)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qs = regexp_extract(nofrag, "\\?([^#]*)", 1)
    val kept = array_join(array_sort(filter(split(qs, "&"), p =>
      p =!= lit("") && !TrackingPrefixes.map(t => p.startsWith(t)).reduce(_ || _))), "&")
    when(scheme === "" || host === "", lit(null)).otherwise(
      concat(scheme, lit("://"), host, path,
        when(kept === "", lit("")).otherwise(concat(lit("?"), kept))))
  }
}
