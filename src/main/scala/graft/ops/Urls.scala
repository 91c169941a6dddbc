package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-crawl corpora — the first dedup a crawl
  * pipeline runs is BY URL, and raw URLs disagree on case, default ports,
  * fragments, tracking params, and parameter order long before content
  * enters the picture.
  *
  * The normal form (deterministic, documented, SQL-replayable — the
  * DuckDB oracle replays every step):
  *
  *  1. fragment dropped (`#...` never reaches the server);
  *  2. scheme and host lowercased (RFC 3986 §6.2.2.1 case normalization);
  *  3. default ports dropped (`:80` for http, `:443` for https);
  *  4. empty path → `/`;
  *  5. query parameters: tracking params removed (`utm_*`, `gclid`,
  *     `fbclid`, `msclkid`, `mc_eid` — the cross-site noise that makes
  *     one page a thousand "distinct" URLs), the rest SORTED (param order
  *     is server-irrelevant in practice and the #1 cause of URL-dedup
  *     misses), empty query dropped entirely.
  *
  * Everything is built from codegen'd column functions (regexp + array
  * HOFs) — no UDFs, embarrassingly parallel, no shuffle. URL-level exact
  * dedup is then [[Dedup.exactDuplicates]] on the canonical column.
  */
object Urls {

  // case-insensitive (param names arrive in the wild in any case) and
  // valueless-tolerant ("?fbclid" with no '=' is still tracking noise)
  private val TrackingParam = "(?i)^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_eid)(=|$)"

  /** `scheme://[userinfo@]host[:port]` of a URL with scheme+host
    * lowercased and the scheme's default port removed; userinfo (through
    * the LAST '@' of the authority, RFC 3986 §3.2) is case-SENSITIVE
    * credentials and passes through verbatim — §6.2.2.1's case
    * normalization covers scheme and host only. NULL-safe (null → null). */
  private def schemeHostPort(u: Column): (Column, Column) = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val auth = regexp_extract(rest, "^([^/?#]*)", 1)
    val userinfo = regexp_extract(auth, "^(.*@)", 1) // greedy → last '@'
    val hostport = lower(regexp_replace(auth, "^.*@", ""))
    val cleaned = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    (concat(scheme, lit("://"), userinfo, cleaned), rest)
  }

  /** Lowercased host (no port, no userinfo) — the crawl-politeness /
    * per-site aggregation key. Userinfo is STRIPPED, not lowercased: a
    * "user:pass@host" key would fragment one site into many AND leak
    * credentials into host-level aggregates. */
  def urlHost(u: Column): Column = {
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val auth = regexp_extract(rest, "^([^/?#]*)", 1)
    lower(regexp_replace(regexp_replace(auth, "^.*@", ""), ":\\d+$", ""))
  }

  /** The canonical form (see object doc). Non-URL strings (no `://`) pass
    * through trimmed — garbage in a crawl is data, not an exception.
    *
    * Implemented by the single-pass compiled kernel
    * ([[graft.functions.UrlCanonicalizeExpr]]): the column-chain twin
    * below runs ~12 regexp/array passes with an intermediate string per
    * stage — measurable at crawl scale. The two faces are
    * differential-tested byte-for-byte over a combinatorial URL
    * population (UrlsSpec). */
  def canonicalizeUrl(u0: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.UrlCanonicalizeExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(u0)))

  /** The declarative reference face of [[canonicalizeUrl]] — pure column
    * functions, kept as the differential-test twin of the kernel (and the
    * shape a SQL oracle replays). Fragment and query split on the FIRST
    * '#'/'?' by index, exactly like the kernel. */
  private[graft] def canonicalizeUrlColumns(u0: Column): Column = {
    val u = substring_index(trim(u0), "#", 1)    // 1. fragment (first '#')
    val (prefix, rest) = schemeHostPort(u)       // 2-3. scheme/host/port
    val pathQs = regexp_replace(rest, "^[^/?#]*", "")
    val qPos = instr(pathQs, "?")
    val path = when(qPos > 0, substring_index(pathQs, "?", 1)).otherwise(pathQs)
    val normPath = when(path === "", lit("/")).otherwise(path) // 4. path
    val query = when(qPos > 0, pathQs.substr(qPos + 1, length(pathQs))).otherwise(lit(""))
    val params = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !p.rlike(TrackingParam)))      // 5. params
    val normQuery = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(u0.isNull, lit(null))
      .when(!u.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), trim(u0))
      .otherwise(concat(prefix, normPath, normQuery))
  }
}
