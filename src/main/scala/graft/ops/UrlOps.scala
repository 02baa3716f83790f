package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the FIRST dedup key of every web-crawl curation
  * pipeline (URL-level dedup runs before any content hashing because it
  * needs no document bytes at all). Pure codegen'd string/array
  * expressions; every step has a DuckDB twin (the `*Sql` builders) so the
  * oracle re-derives canonical forms independently.
  *
  * Canonical form: lowercase scheme and host, userinfo stripped, `www.`
  * stripped, default ports dropped (http:80 / https:443), fragment
  * dropped, trailing path slashes dropped (root path becomes empty),
  * tracking params removed (utm_*, fbclid, gclid, msclkid, igshid,
  * mc_cid, mc_eid, ref, ref_src), remaining params sorted bytewise.
  * Inputs without a `scheme://` stay as-is (fragment still stripped) —
  * canonicalize-don't-guess.
  *
  * Scale shape: zero-shuffle scan-stage expressions; URL dedup is then a
  * groupBy on the canonical string (or its xxhash64 for a narrower
  * exchange). */
object UrlOps {

  private val SchemeRx = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val TrackingRx =
    "^(utm_[^=]*|fbclid|gclid|msclkid|igshid|mc_cid|mc_eid|ref|ref_src)(=.*)?$"

  /** Canonicalize a URL column (see object doc for the exact form).
    * ONE codegen'd single-pass kernel expression
    * ([[graft.functions.UrlCanonicalize]]) — the original ~18-regex
    * Column formulation paid a full regex stack per row; at 100 TB the
    * canonicalizer IS the first-pass dedup's scan cost. The DuckDB twin
    * ([[normalizeUrlSql]]) still derives canonical forms independently,
    * so the kernel's semantics stay gate-pinned step for step. */
  def normalizeUrl(url: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.wrap(graft.functions.UrlCanonicalize(ColumnBridge.toExpr(url)))
  }

  /** The canonical URL's host (post-normalization). */
  def urlHost(url: Column): Column = {
    val nofrag = regexp_replace(trim(url), "#.*", "")
    val rest = regexp_replace(nofrag, SchemeRx, "")
    val hostport = regexp_replace(regexp_extract(rest, "^([^/?]*)", 1), "^.*@", "")
    regexp_replace(lower(regexp_replace(hostport, ":[0-9]+$", "")), "^www\\.", "")
  }

  /** Registered-domain heuristic (public-suffix-lite): the last two
    * labels, or three when the second-to-last is a classic second-level
    * registry label (co/com/org/net/ac/gov/edu under a 2-letter ccTLD) —
    * good enough for per-site budget/dedup grouping without shipping the
    * PSL. */
  def registeredDomain(host: Column): Column =
    regexp_extract(host,
      "([^.]+\\.(?:co|com|org|net|ac|gov|edu)\\.[a-z]{2}|[^.]+\\.[^.]+)$", 1)

  // ---- DuckDB oracle twins -------------------------------------------

  /** DuckDB SQL computing [[normalizeUrl]] of `e` (an expression string).
    * Mirrors the Spark expression step for step; emitted as a giant
    * single expression so it composes into any oracle query. */
  def normalizeUrlSql(e: String): String = {
    val nofrag = s"regexp_replace(trim($e), '#.*', '')"
    val scheme = s"lower(regexp_extract($nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val rest = s"regexp_replace($nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    val hostportRaw = s"regexp_extract($rest, '^([^/?]*)', 1)"
    val hostport = s"regexp_replace($hostportRaw, '^.*@', '')"
    val host = s"lower(regexp_replace($hostport, ':[0-9]+$$', ''))"
    val hostClean = s"regexp_replace($host, '^www\\.', '')"
    val port = s"regexp_extract($hostport, ':([0-9]+)$$', 1)"
    val keepPort = s"($port <> '' AND NOT (($scheme = 'http' AND $port = '80') " +
      s"OR ($scheme = 'https' AND $port = '443')))"
    val pathq = s"substring($rest, length($hostportRaw) + 1)"
    val path = s"regexp_extract($pathq, '^([^?]*)', 1)"
    val query = s"CASE WHEN contains($pathq, '?') " +
      s"THEN regexp_replace($pathq, '^[^?]*\\?', '') ELSE '' END"
    val cleanPath = s"CASE WHEN $path IN ('', '/') THEN '' " +
      s"ELSE regexp_replace($path, '/+$$', '') END"
    val params = s"list_filter(string_split($query, '&'), x -> x <> '' AND NOT " +
      s"regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|msclkid|igshid|mc_cid|mc_eid|ref|ref_src)(=.*)?$$'))"
    val sortedQ = s"coalesce(array_to_string(list_sort($params), '&'), '')"
    val canonical = s"$scheme || '://' || $hostClean || " +
      s"(CASE WHEN $keepPort THEN ':' || $port ELSE '' END) || $cleanPath || " +
      s"(CASE WHEN $sortedQ <> '' THEN '?' || $sortedQ ELSE '' END)"
    s"(CASE WHEN $scheme = '' THEN $nofrag ELSE $canonical END)"
  }

  /** DuckDB SQL computing [[urlHost]] of `e`. */
  def urlHostSql(e: String): String = {
    val nofrag = s"regexp_replace(trim($e), '#.*', '')"
    val rest = s"regexp_replace($nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    val hostport =
      s"regexp_replace(regexp_extract($rest, '^([^/?]*)', 1), '^.*@', '')"
    s"regexp_replace(lower(regexp_replace($hostport, ':[0-9]+$$', '')), '^www\\.', '')"
  }

  /** DuckDB SQL computing [[registeredDomain]] of host expression `e`. */
  def registeredDomainSql(e: String): String =
    s"regexp_extract($e, '([^.]+\\.(?:co|com|org|net|ac|gov|edu)\\.[a-z]{2}|[^.]+\\.[^.]+)$$', 1)"
}
