package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt parsing and corpus application — the `/robots.txt`
  * companion of the meta-robots gate ([[HtmlExtract.robotsNoindex]]):
  * a crawl archive carries each host's robots file, and a compliant
  * corpus drops pages the publisher disallowed for its agent.
  *
  * Semantics follow RFC 9309 plus the de-facto extensions every major
  * crawler honors: groups of `User-agent` lines followed by
  * `Allow`/`Disallow` path rules; the most specific matching group wins
  * (exact agent token beats `*`), multiple groups naming the same agent
  * merge; rule patterns are path prefixes with `*` wildcards and a `$`
  * end anchor; among matching rules the LONGEST pattern (octet length)
  * decides, with `Allow` winning length ties; an empty `Disallow:` value
  * is "allow all" (skipped); no matching rule → allowed. Comments (`#`)
  * and unknown directives (`Sitemap`, `Crawl-delay`) are ignored.
  *
  * Spark shape: parsing runs once per HOST (the robots table is
  * O(hosts), not O(corpus)), producing an array-of-rules column; the
  * corpus joins host→rules (AQE picks broadcast while the host table
  * fits, shuffle-hash beyond) and the per-page decision is one rule-list
  * scan in a UDF — the glob matcher is an allocation-free two-pointer
  * loop, no regex compilation anywhere on the per-page path.
  */
object RobotsTxt {

  /** One parsed rule: allow/disallow + raw pattern (with `$` marker). */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parse a robots.txt body and select the rule list for `agent`
    * (case-insensitive product token; groups naming it exactly beat `*`
    * groups). Null/blank content → no rules (allow all).
    */
  def parse(content: String, agent: String = "*"): Seq[Rule] = {
    if (content == null) return Nil
    final case class Group(agents: List[String], rules: List[Rule])
    var groups = List.empty[Group]
    var curAgents = List.empty[String]
    var curRules = List.empty[Rule]
    var inAgentHeader = false
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups ::= Group(curAgents, curRules.reverse)
      curAgents = Nil; curRules = Nil
    }
    content.split("\n").foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentHeader) { flush(); inAgentHeader = true }
            curAgents ::= value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            inAgentHeader = false
            // empty Disallow = allow-all no-op; empty Allow is meaningless
            if (value.nonEmpty)
              curRules ::= Rule(allow = key == "allow", pattern = value)
          case _ => inAgentHeader = false // Sitemap, Crawl-delay, unknown
        }
      }
    }
    flush()
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val exact = groups.filter(_.agents.contains(a))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    // groups were prepended; reverse to restore file order before merging
    chosen.reverse.flatMap(_.rules)
  }

  /** Glob match of a robots pattern against a url path: `*` matches any
    * run of characters; a trailing `$` anchors the match to the path
    * end; otherwise the pattern must match a PREFIX of the path.
    * Two-pointer loop with star backtracking — no regex, no allocation.
    */
  def globMatch(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var pi = 0; var si = 0; var star = -1; var mark = 0
    if (pi == pat.length) return !anchored || path.isEmpty
    while (si < path.length) {
      if (pi < pat.length && pat.charAt(pi) == '*') {
        star = pi; mark = si; pi += 1
      } else if (pi < pat.length && pat.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (star >= 0) {
        pi = star + 1; mark += 1; si = mark
      } else return false
      if (pi == pat.length && !anchored) return true
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  /** RFC 9309 §2.2.2 decision: longest matching pattern wins, Allow wins
    * length ties, no match → allowed.
    */
  def isAllowed(path: String, rules: Seq[Rule]): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (globMatch(r.pattern, path)) {
        // specificity = octets of the PATH pattern; the '$' anchor is a
        // metacharacter, not an octet — counting it would let
        // "Disallow: /page$" outrank an equally-specific "Allow: /page",
        // stealing the tie the RFC awards to Allow
        val len =
          if (r.pattern.endsWith("$")) r.pattern.length - 1
          else r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow
        }
      }
    }
    bestLen < 0 || bestAllow
  }

  /** Path+query of a url (the part robots rules match against). */
  private def pathOf(url: String): String = {
    if (url == null) return "/"
    val schemeEnd = url.indexOf("://")
    val rest = if (schemeEnd >= 0) url.substring(schemeEnd + 3) else url
    val frag = rest.indexOf('#')
    val noFrag = if (frag >= 0) rest.substring(0, frag) else rest
    val slash = noFrag.indexOf('/')
    if (slash < 0) "/" else noFrag.substring(slash)
  }

  /** Per-host rule table: `(hostCol, robots_rules array<string>)`, each
    * rule encoded `"A<pattern>"`/`"D<pattern>"` in file order (a flat
    * string array round-trips through UDF boundaries without struct
    * conversion overhead) — parse runs once per host row, NOT per page.
    */
  def rulesTable(robots: DataFrame, hostCol: String, contentCol: String,
                 agent: String = "*"): DataFrame = {
    val parseUdf = udf((c: String) =>
      parse(c, agent).map(r => (if (r.allow) "A" else "D") + r.pattern))
    robots.select(col(hostCol),
      parseUdf(col(contentCol)).as("robots_rules"))
  }

  private def decodeRules(rs: Seq[String]): Seq[Rule] =
    rs.map(s => Rule(s.charAt(0) == 'A', s.substring(1)))

  /** Stamp `allowed` onto a corpus: join pages to their host's rules
    * (pages of hosts with no robots file are allowed). One AQE-planned
    * join on the host key + a narrow per-row rule scan.
    */
  def markAllowed(corpus: DataFrame, urlCol: String, hostCol: Column,
                  rules: DataFrame, rulesHostCol: String): DataFrame = {
    val decideUdf = udf((url: String, rs: Seq[String]) =>
      rs == null || isAllowed(pathOf(url), decodeRules(rs)))
    corpus
      .withColumn("_rb_host", hostCol)
      .join(rules.withColumnRenamed(rulesHostCol, "_rb_host"),
        Seq("_rb_host"), "left")
      .withColumn("allowed", decideUdf(col(urlCol), col("robots_rules")))
      .drop("_rb_host", "robots_rules")
  }

  /** [[markAllowed]] for a rules table with DUPLICATE host rows (crawl
    * snapshots, case variants collapsing under a normalization): one
    * groupBy keeps each file's rule set intact, and a page is allowed
    * only if EVERY file allows it. Most-restrictive is the only sound
    * merge: RFC 9309's Allow-wins-ties rule is defined WITHIN one
    * robots.txt — flattening two snapshots into one rule set would turn
    * a cross-snapshot Allow/Disallow disagreement into a tie that fails
    * the compliance gate OPEN. Hosts with no rules row pass, as in
    * [[markAllowed]].
    */
  def markAllowedMerged(corpus: DataFrame, urlCol: String, hostCol: Column,
                        rules: DataFrame, rulesHostCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{collect_list, sort_array}
    val grouped = rules
      .groupBy(col(rulesHostCol).as("_rb_host"))
      .agg(sort_array(collect_list(col("robots_rules")))
        .as("_rb_rule_sets"))
    val decideUdf = udf((url: String, sets: Seq[Seq[String]]) =>
      sets == null ||
        sets.forall(rs => isAllowed(pathOf(url), decodeRules(rs))))
    corpus
      .withColumn("_rb_host", hostCol)
      .join(grouped, Seq("_rb_host"), "left")
      .withColumn("allowed", decideUdf(col(urlCol), col("_rb_rule_sets")))
      .drop("_rb_host", "_rb_rule_sets")
  }
}
