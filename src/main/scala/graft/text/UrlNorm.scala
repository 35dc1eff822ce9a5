package graft.text

/** URL canonicalization for URL-keyed deduplication — the datatrove
  * `url_dedup` idea: crawls see the same page under trivially different
  * URLs (scheme, case, www, default port, tracking params, trailing
  * slash, fragment), so dedup keys on a CANONICAL form, not the raw
  * string. Hand-rolled single-scan normalization (no java.net.URI — it
  * throws on the malformed URLs a web crawl actually contains, and
  * per-row exception control flow is an executor-thread trap).
  *
  * Steps, in order:
  *  1. trim; cut at the first `#` (fragment)
  *  2. strip a leading `http://` / `https://` (ASCII case-insensitive)
  *  3. authority (up to the first `/` or `?`): lowercase, strip one
  *     leading `www.`, strip the scheme's OWN default-port suffix
  *     (`:80` for http/schemeless, `:443` for https — a cross-scheme
  *     explicit port like `http://host:443` is a distinct origin and
  *     survives)
  *  4. query: drop tracking params (`utm_*`, `fbclid`, `gclid`,
  *     `msclkid`), keep the rest in original order; empty query → no `?`
  *  5. path: strip ALL trailing `/`
  *
  * The path and kept query are otherwise preserved byte-for-byte —
  * over-normalizing (e.g. sorting params) merges genuinely different
  * pages, which silently DROPS unique documents; this errs conservative.
  */
object UrlNorm {

  private val TrackingPrefixes =
    Array("utm_", "fbclid=", "gclid=", "msclkid=")
  private def isTracking(param: String): Boolean = {
    var i = 0
    while (i < TrackingPrefixes.length) {
      if (param.startsWith(TrackingPrefixes(i))) return true
      // bare flag form (no '='): "fbclid" etc.
      val p = TrackingPrefixes(i)
      if (p.endsWith("=") && param == p.dropRight(1)) return true
      i += 1
    }
    false
  }

  /** (rest-of-url, was-https, had-scheme). The scheme is RETURNED, not
    * just dropped: default-port stripping below must be gated on it —
    * `:443` is only the default port under https, so blindly stripping
    * it would merge `http://host:443/x` (a real, distinct origin) with
    * `https://host/x`. Schemeless input strips NO port: the scheme is
    * unknown (conservative), and canonical outputs are themselves
    * schemeless — any port they carry was deliberately kept, so
    * re-canonicalizing must not strip it (idempotence, property-pinned).
    */
  private def stripScheme(s: String): (String, Boolean, Boolean) = {
    def eat(prefix: String): Int =
      if (s.regionMatches(true, 0, prefix, 0, prefix.length)) prefix.length
      else -1
    val https = eat("https://")
    if (https > 0) return (s.substring(https), true, true)
    val http = eat("http://")
    if (http > 0) (s.substring(http), false, true) else (s, false, false)
  }

  def canonical(url: String): String = {
    if (url == null) return ""
    var s = url.trim
    val frag = s.indexOf('#')
    if (frag >= 0) s = s.substring(0, frag)
    val (stripped, wasHttps, hadScheme) = stripScheme(s)
    s = stripped
    // authority ends at the first '/' or '?'
    var authEnd = s.length
    var i = 0
    while (i < authEnd) {
      val c = s.charAt(i)
      if (c == '/' || c == '?') authEnd = i
      i += 1
    }
    var auth = s.substring(0, authEnd).toLowerCase(java.util.Locale.ROOT)
    if (auth.startsWith("www.")) auth = auth.substring(4)
    // default-port strip gated on the seen scheme: :80 is the default
    // only under http, :443 only under https; `https://host:80/x` and
    // `http://host:443/x` keep their explicit non-default ports, and a
    // schemeless URL keeps any port (conservative preservation + the
    // idempotence requirement documented on stripScheme)
    if (hadScheme) {
      if (auth.endsWith(":80") && !wasHttps) auth = auth.dropRight(3)
      else if (auth.endsWith(":443") && wasHttps) auth = auth.dropRight(4)
    }
    val rest = s.substring(authEnd)
    val q = rest.indexOf('?')
    var path = if (q >= 0) rest.substring(0, q) else rest
    while (path.endsWith("/")) path = path.dropRight(1)
    val query =
      if (q < 0) ""
      else {
        // drop empties too: a bare trailing '?' (or '?&utm_…') must
        // canonicalize identically to no query at all
        val kept = rest.substring(q + 1).split('&')
          .filter(p => p.nonEmpty && !isTracking(p))
        if (kept.isEmpty) "" else "?" + kept.mkString("&")
      }
    auth + path + query
  }

  /** Lexical URL features — the DCLM/spam-classifier signal block
    * computed from the URL STRING alone (no fetch): path depth/length,
    * query length and parameter count, host length and digit fraction
    * (dotted-quad and DGA-style hosts score high), explicit port, and
    * https. Pure Column string arithmetic with engine-portable pieces
    * (split_part / regexp_replace / length), so a DuckDB oracle replays it
    * exactly; one narrow codegen'd projection, no UDF. Fragments are cut
    * before query parsing (they are client-side). Expects scheme-ful
    * URLs (crawl records have them); a schemeless string is treated as
    * host-first.
    */
  def urlFeatures(urlCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val afterScheme = split_part(urlCol, lit("://"), lit(2))
    val rest0 = when(length(afterScheme) > 0, afterScheme).otherwise(urlCol)
    val rest = split_part(rest0, lit("#"), lit(1))
    // authority ends at the FIRST of '/' or '?' — a path-less URL like
    // https://example.com?sid=1 is a real crawl shape, and splitting on
    // '/' alone would absorb its query into the host (inflating
    // host_len/host_digit_frac and zeroing query_len/n_params)
    val hostPort = split_part(split_part(rest, lit("?"), lit(1)),
      lit("/"), lit(1))
    val pathQ = rest.substr(length(hostPort) + 1, length(rest))
    val path = split_part(pathQ, lit("?"), lit(1))
    val query = split_part(pathQ, lit("?"), lit(2))
    // userinfo (user:pw@host) is cut before the host/port reads: it is
    // not part of the host, and its ':' must not read as a port.
    // hostPort can no longer contain '/?#', so greedy ^.*@ strips to the
    // last '@' exactly
    val hostNoUser = regexp_replace(hostPort, "^.*@", "")
    val host = split_part(hostNoUser, lit(":"), lit(1))
    val hostDigits = length(host) - length(regexp_replace(host, "[0-9]", ""))
    struct(
      length(path).as("path_len"),
      (length(path) - length(regexp_replace(path, "/", ""))).as("path_depth"),
      length(query).as("query_len"),
      when(length(query) === 0, 0)
        .otherwise(length(query) - length(regexp_replace(query, "&", "")) + 1)
        .as("n_params"),
      length(host).as("host_len"),
      when(length(host) > 0,
        round(hostDigits.cast("double") / length(host).cast("double"), 4))
        .otherwise(0.0).as("host_digit_frac"),
      (instr(hostNoUser, ":") > 0).as("has_port"),
      lower(urlCol).startsWith("https://").as("is_https"))
  }
}
