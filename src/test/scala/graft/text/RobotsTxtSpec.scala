package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RobotsTxtSpec extends SparkSpec {
  import spark.implicits._
  import RobotsTxt.Rule

  test("parse: groups, comments, empty disallow, unknown directives") {
    val txt =
      """# corpus crawler policy
        |User-agent: *
        |Disallow: /private/   # trailing comment
        |Allow: /private/ok/
        |Disallow:
        |Sitemap: https://example.com/map.xml
        |Crawl-delay: 10
        |""".stripMargin
    assert(RobotsTxt.parse(txt) ==
      Seq(Rule(false, "/private/"), Rule(true, "/private/ok/")))
    assert(RobotsTxt.parse(null) == Nil)
    assert(RobotsTxt.parse("Disallow: /orphan-rule-no-group/") == Nil)
  }

  test("parse: exact agent group beats *, same-agent groups merge") {
    val txt =
      """User-agent: graftbot
        |Disallow: /
        |
        |User-agent: *
        |Disallow: /all/
        |
        |User-agent: GraftBot
        |User-agent: otherbot
        |Allow: /except/
        |""".stripMargin
    // '*' view sees only its own group
    assert(RobotsTxt.parse(txt, "*") == Seq(Rule(false, "/all/")))
    // exact agent (case-insensitive) merges both of its groups, file order
    assert(RobotsTxt.parse(txt, "graftbot") ==
      Seq(Rule(false, "/"), Rule(true, "/except/")))
    assert(RobotsTxt.parse(txt, "otherbot") == Seq(Rule(true, "/except/")))
  }

  test("glob match: prefixes, wildcards, end anchors") {
    val cases = Seq(
      ("/private/", "/private/x", true),
      ("/private/", "/priv", false),
      ("/", "/anything", true),
      ("/*.pdf$", "/docs/file.pdf", true),
      ("/*.pdf$", "/docs/file.pdfx", false),
      ("/*.pdf$", "/a.pdf/b", false),
      ("/tmp*", "/tmp123", true),
      ("/tmp*", "/tm", false),
      ("/a*b*c", "/aXbYc-and-more", true),
      ("/a*b*c", "/acb", false),
      ("/exact$", "/exact", true),
      ("/exact$", "/exactly", false),
      ("", "/whatever", true))
    cases.foreach { case (p, s, want) =>
      assert(RobotsTxt.globMatch(p, s) == want, s"globMatch($p, $s)")
    }
  }

  test("decision: longest pattern wins, allow wins ties, default allow") {
    val rules = Seq(Rule(false, "/private/"), Rule(true, "/private/ok/"))
    assert(!RobotsTxt.isAllowed("/private/x", rules))
    assert(RobotsTxt.isAllowed("/private/ok/y", rules))
    assert(RobotsTxt.isAllowed("/public/z", rules))
    // exact tie: allow wins
    val tie = Seq(Rule(false, "/p/"), Rule(true, "/p/"))
    assert(RobotsTxt.isAllowed("/p/x", tie))
    // the '$' anchor is a metacharacter, not an octet: Disallow "/page$"
    // and Allow "/page" are EQUALLY specific on path "/page" → Allow wins
    assert(RobotsTxt.isAllowed("/page",
      Seq(Rule(false, "/page$"), Rule(true, "/page"))))
    // ...while one more real octet still outranks
    assert(!RobotsTxt.isAllowed("/pages",
      Seq(Rule(false, "/pages"), Rule(true, "/page"))))
  }

  test("markAllowedMerged: duplicate host rows don't fan out, and a " +
       "cross-snapshot Allow/Disallow conflict resolves MOST RESTRICTIVE") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      "https://h.example.com/private/x",
      "https://h.example.com/open/y",
      "https://norules.example.com/z").toDF("url")
    // snapshot A disallows /private/, snapshot B allows it (plus a
    // straight duplicate of A): within one merged rule SET the tie
    // would fail open — across files it must stay closed
    val rules = RobotsTxt.rulesTable(Seq(
      ("h.example.com", "User-agent: *\nDisallow: /private/\n"),
      ("h.example.com", "User-agent: *\nDisallow: /private/\n"),
      ("h.example.com", "User-agent: *\nAllow: /private/\n"))
      .toDF("host", "content"), "host", "content")
    val got = RobotsTxt.markAllowedMerged(corpus, "url",
      org.apache.spark.sql.functions.split_part(col("url"),
        org.apache.spark.sql.functions.lit("/"),
        org.apache.spark.sql.functions.lit(3)),
      rules, "host")
    assert(got.count() == 3, "no join fan-out across duplicate host rows")
    val m = got.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!m("https://h.example.com/private/x"),
      "cross-snapshot disagreement must not fail open")
    assert(m("https://h.example.com/open/y"))
    assert(m("https://norules.example.com/z"))
    assert(RobotsTxt.isAllowed("/anything", Nil))
  }

  test("markAllowed joins per-host rules; ruleless hosts pass") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /secret/"),
      ("b.com", "User-agent: *\nDisallow: /*.zip$")
    ).toDF("host", "content")
    val rules = RobotsTxt.rulesTable(robots, "host", "content")
    val corpus = Seq(
      "https://a.com/secret/doc", "https://a.com/open/doc",
      "https://b.com/f.zip", "https://b.com/f.txt",
      "https://norobots.com/x").toDF("url")
    val got = RobotsTxt.markAllowed(corpus, "url",
        split_part(col("url"), lit("/"), lit(3)), rules, "host")
      .as[(String, Boolean)].collect().toMap
    assert(got == Map(
      "https://a.com/secret/doc" -> false,
      "https://a.com/open/doc" -> true,
      "https://b.com/f.zip" -> false,
      "https://b.com/f.txt" -> true,
      "https://norobots.com/x" -> true))
  }
}
