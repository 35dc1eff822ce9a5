package graft.text

import org.scalatest.funsuite.AnyFunSuite

class HtmlExtractSpec extends AnyFunSuite {

  test("extracts paragraph text, skipping script/style/head/comments") {
    val html =
      """<html><head><title>Site</title><script>var x = "<p>not text</p>";</script>
        |<style>p { color: red; }</style></head>
        |<body><!-- navigation comment -->
        |<p>The first real paragraph of the page content.</p>
        |<p>A second paragraph with more actual words here.</p>
        |</body></html>""".stripMargin
    val out = HtmlExtract.extract(html)
    assert(out ==
      "The first real paragraph of the page content.\n" +
        "A second paragraph with more actual words here.")
  }

  test("block tags become line boundaries; inline tags do not") {
    val html = "<div>alpha beta gamma</div><div>delta epsilon zeta</div>" +
      "<p>one <b>bold</b> and <i>italic</i> run stays together</p>"
    val out = HtmlExtract.extract(html)
    assert(out.split("\n").toSeq == Seq(
      "alpha beta gamma", "delta epsilon zeta",
      "one bold and italic run stays together"))
  }

  test("entities decode; unknown entities pass through literally") {
    val html = "<p>fish &amp; chips &lt;cheap&gt; &quot;daily&quot; " +
      "caf&#233; &#x2764; &bogus; end</p>"
    val out = HtmlExtract.extract(html)
    assert(out == "fish & chips <cheap> \"daily\" café ❤ &bogus; end")
  }

  test("link-dense navigation blocks are pruned, content kept") {
    val html =
      """<ul><li><a href="/">Home page link</a></li>
        |<li><a href="/about">About the site</a></li></ul>
        |<p>Genuine article content with <a href="x">one inline link</a> and
        |plenty of ordinary prose around it to keep density low.</p>""".stripMargin
    val out = HtmlExtract.extract(html)
    assert(!out.contains("Home page link"), s"nav survived: $out")
    assert(out.contains("Genuine article content"))
  }

  test("nav and aside elements are dropped wholesale") {
    val html = "<nav><p>site menu items listed right here</p></nav>" +
      "<aside><p>related links sidebar text block</p></aside>" +
      "<p>main content paragraph stands alone</p>"
    assert(HtmlExtract.extract(html) == "main content paragraph stands alone")
  }

  test("short boilerplate blocks fall below minWords") {
    val html = "<p>ok</p><p>the real content sentence is long enough</p>"
    assert(HtmlExtract.extract(html) ==
      "the real content sentence is long enough")
  }

  test("byte surface decodes UTF-8 and survives null/truncated input") {
    val s = "<p>bytes café content row here</p>"
    assert(HtmlExtract.extractFromBytes(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      == "bytes café content row here")
    assert(HtmlExtract.extract(null) == "")
    assert(HtmlExtract.extractFromBytes(null) == "")
    // truncated tag at EOF must not loop or throw
    assert(HtmlExtract.extract("<p>kept words before truncation <a href=") ==
      "kept words before truncation")
  }

  test("unquoted attribute ending in '/' does not read as self-closing") {
    // <a href=/about/> is an OPEN anchor: its text must count as link
    // chars so a nav of such links is pruned exactly like quoted ones
    val html =
      """<ul><li><a href=/about/>About this whole site</a></li>
        |<li><a href=/contact/>Contact page over here</a></li></ul>
        |<p>Genuine article content paragraph with plenty of ordinary
        |prose around it to keep the density low.</p>""".stripMargin
    val out = HtmlExtract.extract(html)
    assert(!out.contains("About this whole site"),
      s"unquoted-slash anchor escaped link accounting: $out")
    assert(out.contains("Genuine article content"))
    // genuinely self-closing forms still close: <br/> and <br /> do not
    // unbalance anything, and a quoted attr before '/>' stays self-closing
    val sc = "<p>alpha beta gamma<br/>delta epsilon zeta<br />eta theta" +
      " iota</p><p>after an image <img src=\"x\"/> prose continues fine</p>"
    assert(HtmlExtract.extract(sc).contains("after an image"))
  }

  test("whitespace collapses within blocks") {
    val html = "<p>  spaced    out\n\n words   across lines  </p>"
    assert(HtmlExtract.extract(html) == "spaced out words across lines")
  }

  test("extractFromBytes honors declared charset, BOM, and utf-8 default") {
    val latinPage = "<html><head><meta charset=\"iso-8859-1\"></head>" +
      "<body><p>un café très agréable aujourd'hui</p></body></html>"
    assert(HtmlExtract.extractFromBytes(latinPage.getBytes("ISO-8859-1"))
      == "un café très agréable aujourd'hui")
    val utf16 = "<p>unicode déclarée page body here</p>"
    assert(HtmlExtract.extractFromBytes(
      Array(0xFF.toByte, 0xFE.toByte) ++ utf16.getBytes("UTF-16LE"))
      == "unicode déclarée page body here")
    // plain valid utf-8 decodes exactly as before
    val utf8 = "<p>ordinary page with é accents kept intact</p>"
    assert(HtmlExtract.extractFromBytes(utf8.getBytes("UTF-8"))
      == "ordinary page with é accents kept intact")
    // undeclared latin-1 bytes: utf-8 fails -> cp1252 fallback, not U+FFFD
    val bare = "<p>bare café latin page body</p>".getBytes("ISO-8859-1")
    assert(HtmlExtract.extractFromBytes(bare) == "bare café latin page body")
  }
}

class RobotsMetaSpec extends graft.SparkSpec {
  import spark.implicits._

  private def flags(html: String): (Boolean, Boolean) =
    Seq(html).toDF("h")
      .select(HtmlExtract.robotsNoindex($"h"), HtmlExtract.robotsNofollow($"h"))
      .as[(Boolean, Boolean)].head()

  test("robots meta: quote styles, attribute order, case, none, decoys") {
    assert(flags("""<meta name="robots" content="noindex, follow">""") ==
      ((true, false)))
    assert(flags("<META NAME='ROBOTS' CONTENT='NOFOLLOW'>") ==
      ((false, true)))
    // content attribute BEFORE name; 'none' implies both
    assert(flags("""<meta content="none" name="robots">""") == ((true, true)))
    // unquoted attribute values
    assert(flags("<meta name=robots content=noindex,nofollow>") ==
      ((true, true)))
    // a robots token inside another meta's content is not a directive
    assert(flags("""<meta name="description" content="noindex talk">""") ==
      ((false, false)))
    // substring tokens don't count: 'nofollowup' is not 'nofollow'
    assert(flags("""<meta name="robots" content="nofollowup">""") ==
      ((false, false)))
    assert(flags("<html><body>no head at all</body></html>") ==
      ((false, false)))
    assert(flags(null.asInstanceOf[String]) == ((false, false)))
  }

  test("head harvest: title trim, description attribute order, charset forms") {
    def harvest(html: String): (String, String, String) =
      Seq(html).toDF("h").select(HtmlExtract.title($"h"),
        HtmlExtract.metaDescription($"h"), HtmlExtract.declaredCharset($"h"))
        .as[(String, String, String)].head()
    assert(harvest("<head><title>  Spaced Title  </title>" +
      "<meta name=\"description\" content=\"a desc here\">" +
      "<meta charset=\"UTF-8\"></head>") ==
      (("Spaced Title", "a desc here", "utf-8")))
    // attribute order flipped; http-equiv charset form; single quotes
    assert(harvest("<head><meta content='flipped' name='description'>" +
      "<META http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=ISO-8859-1\"></head>") ==
      (("", "flipped", "iso-8859-1")))
    // absent everything → empty strings, not nulls
    assert(harvest("<body>nothing in the head</body>") == (("", "", "")))
    // charset= mentioned in an unrelated meta's content TEXT is NOT a
    // declaration (a false iso-8859-1 label would strict-decode anything
    // and mojibake the whole page)
    assert(harvest("<head><meta name=\"keywords\" " +
      "content=\"set charset=iso-8859-1 here\"></head>") == (("", "", "")))
    // ...but it must not shadow a real declaration elsewhere in the head
    assert(harvest("<head><meta name=\"keywords\" " +
      "content=\"charset=iso-8859-1 talk\"><meta charset=utf-8></head>") ==
      (("", "", "utf-8")))
    // bare attributes may precede charset (valued ones may not — free
    // text only lives inside valued content attrs)
    assert(harvest("<head><meta itemscope charset=big5></head>") ==
      (("", "", "big5")))
    // String form mirrors the Column form on all three shapes
    assert(HtmlExtract.declaredCharsetOf(
      "<meta name='d' content='charset=big5 notes'>") == "")
    assert(HtmlExtract.declaredCharsetOf("<meta charset='KOI8-R'>") == "koi8-r")
    assert(HtmlExtract.declaredCharsetOf("<META http-equiv=content-type " +
      "content='text/html; charset=windows-1251'>") == "windows-1251")
  }
}
