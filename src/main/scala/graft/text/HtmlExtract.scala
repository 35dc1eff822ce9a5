package graft.text

import scala.collection.mutable.ArrayBuffer

/** Simplified main-content HTML extraction — SURVEY §2 P20, the
  * reference's `Trafilatura` stage (datatrove/findweb.py:5,
  * `datatrove.pipeline.extractors.Trafilatura`): WARC html → the page's
  * main text, boilerplate (navigation, link farms, chrome) removed.
  *
  * This is a readability-style HEURISTIC reimplementation, not a port of
  * trafilatura's full precision/recall machinery (documented divergence;
  * trafilatura carries per-site rules, XML tree scoring and fallbacks).
  * The pipeline semantics match: script/style/comment content never
  * reaches the text, block structure is preserved as newlines, entities
  * are decoded, and boilerplate blocks are pruned by the standard
  * link-density + minimum-length test (a block whose characters are
  * mostly anchor text is navigation, not content).
  *
  * Implementation is ONE hand-rolled char scan — no regex anywhere: on
  * this box per-char regex matching inside executor threads measured
  * ~35× slower than char loops (see BENCH.md round-1 findings), and this
  * runs per document on the hot ingest path.
  */
object HtmlExtract {

  /** Robots meta directives — the crawl-compliance gate a responsible
    * web corpus runs before keeping a page: `<meta name="robots">`
    * carrying `noindex`/`none` means the publisher opted the page out of
    * indexing (C4 and CCNet-style corpora honor it; see also RFC 9309's
    * html meta companion). Pure Column expressions — two RE2-compatible
    * regexp passes (find the first robots meta tag, then its `content`
    * attribute), so the oracle replays the identical patterns in DuckDB
    * and the scan stays inside whole-stage codegen: no UDF, no parse
    * tree, no shuffle. Handles attribute-order variance (content before
    * name), quote style (double/single/none) and case. First robots tag
    * wins when a page carries several (browser behavior is union; the
    * conservative caller can OR over [[robotsNoindex]] of a pre-split
    * head if that matters — one tag is the overwhelmingly common case).
    */
  private val MetaRobotsPat =
    "(?i)<meta\\b[^>]*\\bname\\s*=\\s*[\"']?robots\\b[^>]*>"
  private val ContentAttrPat = "(?i)\\bcontent\\s*=\\s*[\"']?([^\"'>]*)"

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{coalesce, lit, regexp_extract}

  /** The `content` value of the first robots meta tag ('' when absent). */
  def robotsContent(htmlCol: Column): Column =
    regexp_extract(regexp_extract(htmlCol, MetaRobotsPat, 0),
      ContentAttrPat, 1)

  private def directive(htmlCol: Column, token: String): Column =
    coalesce(robotsContent(htmlCol)
      .rlike(s"(?i)(^|[\\s,])($token|none)([\\s,]|$$)"), lit(false))

  /** True when the page opted out of indexing (noindex or none). */
  def robotsNoindex(htmlCol: Column): Column = directive(htmlCol, "noindex")

  /** True when the page opted out of link following (nofollow or none). */
  def robotsNofollow(htmlCol: Column): Column = directive(htmlCol, "nofollow")

  // ---- head harvest: title / meta description / declared charset ------
  // The metadata columns a corpus keeps alongside extracted text (search
  // indexing, dedup keys, snippet display). Same design as the robots
  // pair: RE2-compatible regexps, codegen'd Columns, oracle-replayable.

  private val TitlePat = "(?i)<title[^>]*>([^<]*)</title>"
  private val MetaDescPat =
    "(?i)<meta\\b[^>]*\\bname\\s*=\\s*[\"']?description[\"']?[^>]*>"
  /** The two LEGITIMATE charset declaration forms, matched separately:
    * the `<meta charset=utf-8>` attribute form and the http-equiv
    * content-type form's `content="text/html; charset=iso-8859-1"`.
    * A single any-`charset=`-inside-a-meta pattern is a trap: a
    * description/keywords meta whose content TEXT mentions "charset="
    * would be sniffed as the page's declared charset, and since e.g.
    * ISO-8859-1 strict-decodes anything, the false label would mojibake
    * the whole page. The equiv form is therefore anchored on the
    * http-equiv=content-type tag (two-step extract, RE2-compatible —
    * no lookahead, same design as MetaDescPat). The attribute form
    * tolerates BARE attributes before charset (`<meta itemscope
    * charset=..>`) but not valued ones: `[^>=]*` cannot cross an '=',
    * and since free text only lives inside a VALUED content attribute,
    * a charset mention in text can never be reached — the exact false
    * positive this split exists to kill. (`<meta class="c" charset=..>`
    * is the one legitimate-but-vanishing form this trades away.)
    */
  private val MetaCharsetAttrPat =
    "(?i)<meta\\s[^>=]*\\bcharset\\s*=\\s*[\"']?([A-Za-z0-9_\\-]+)"
  private val MetaEquivTagPat =
    "(?i)<meta\\b[^>]*\\bhttp-equiv\\s*=\\s*[\"']?content-type[\"']?[^>]*>"
  private val CharsetTokenPat =
    "(?i)\\bcharset\\s*=\\s*[\"']?([A-Za-z0-9_\\-]+)"

  /** First `<title>` text, whitespace-trimmed, '' when absent. Raw
    * (entity decoding is the body extractor's job; titles keyed for
    * dedup/search want stable bytes).
    */
  def title(htmlCol: Column): Column = {
    import org.apache.spark.sql.functions.trim
    trim(regexp_extract(htmlCol, TitlePat, 1))
  }

  /** `content` of the first `<meta name=description>`, '' when absent. */
  def metaDescription(htmlCol: Column): Column =
    regexp_extract(regexp_extract(htmlCol, MetaDescPat, 0),
      ContentAttrPat, 1)

  /** The page's declared charset label, lowercased, '' when undeclared.
    * The attribute form wins when both are present (they rarely coexist
    * and must agree when they do).
    */
  def declaredCharset(htmlCol: Column): Column = {
    import org.apache.spark.sql.functions.{lower, when}
    val direct = regexp_extract(htmlCol, MetaCharsetAttrPat, 1)
    val equiv = regexp_extract(
      regexp_extract(htmlCol, MetaEquivTagPat, 0), CharsetTokenPat, 1)
    lower(when(direct =!= "", direct).otherwise(equiv))
  }

  /** Content of these elements is skipped entirely. `nav`/`aside` are
    * structural boilerplate by definition (readability heuristic).
    */
  private val DropTags = Set(
    "script", "style", "noscript", "template", "svg", "head", "iframe",
    "nav", "aside")

  /** Tags that terminate a text block (block-level boundary → '\n'). */
  private val BlockTags = Set(
    "p", "div", "br", "li", "ul", "ol", "dl", "dt", "dd", "h1", "h2",
    "h3", "h4", "h5", "h6", "tr", "td", "th", "table", "thead", "tbody",
    "section", "article", "header", "footer", "blockquote", "pre", "hr",
    "main", "figure", "figcaption", "form", "fieldset", "address")

  private val NamedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "hellip" -> "...", "mdash" -> "-",
    "ndash" -> "-", "rsquo" -> "'", "lsquo" -> "'", "rdquo" -> "\"",
    "ldquo" -> "\"", "copy" -> "(c)", "reg" -> "(r)", "trade" -> "(tm)")

  /** Extract main text from an html string. Blocks (paragraphs, list
    * items, headings …) become lines; a block is kept when it has at
    * least `minWords` words AND at most `maxLinkDensity` of its
    * non-whitespace characters inside `<a>` elements.
    */
  def extract(html: String, minWords: Int = 3,
              maxLinkDensity: Double = 0.5): String = {
    if (html == null || html.isEmpty) return ""
    val n = html.length
    val blocks = ArrayBuffer.empty[(String, Int, Int)] // text, chars, linkChars
    val cur = new StringBuilder
    var curChars = 0
    var curLink = 0
    var aDepth = 0
    var skipTag: String = null
    var i = 0

    def flush(): Unit = {
      val t = collapseWs(cur)
      if (t.nonEmpty) blocks += ((t, curChars, curLink))
      cur.setLength(0); curChars = 0; curLink = 0
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val close = html.indexOf('>', i + 1)
          if (close < 0) i = n // truncated tag: done
          else {
            // tag name: letters/digits after optional '/'
            var j = i + 1
            val isEnd = j < close && html.charAt(j) == '/'
            if (isEnd) j += 1
            val nameStart = j
            while (j < close && (Character.isLetterOrDigit(html.charAt(j))))
              j += 1
            val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
            // a trailing '/' only marks self-closing when it is XML
            // syntax, not the tail of an unquoted attribute value
            // (<a href=/about/> is an OPEN anchor): accept it right
            // after the tag name (<br/>) or after whitespace/a closing
            // quote (<br />, <img src="x"/>), never mid-token
            val slashPos = close - 1
            val selfClosing = slashPos > i && html.charAt(slashPos) == '/' && {
              slashPos == j || {
                val p = html.charAt(slashPos - 1)
                p == '"' || p == '\'' || Character.isWhitespace(p)
              }
            }
            if (skipTag != null) {
              if (isEnd && name == skipTag) skipTag = null
            } else if (name.nonEmpty) {
              if (isEnd) {
                if (BlockTags(name)) flush()
                else if (name == "a" && aDepth > 0) aDepth -= 1
              } else {
                if (DropTags(name) && !selfClosing) { flush(); skipTag = name }
                else if (BlockTags(name)) flush()
                else if (name == "a" && !selfClosing) aDepth += 1
              }
            }
            i = close + 1
          }
        }
      } else if (skipTag != null) {
        i += 1
      } else if (c == '&') {
        val (decoded, next) = entityAt(html, i)
        decoded.foreach { d =>
          cur.append(d)
          if (!Character.isWhitespace(d)) {
            curChars += 1
            if (aDepth > 0) curLink += 1
          }
        }
        i = next
      } else {
        cur.append(c)
        if (!Character.isWhitespace(c)) {
          curChars += 1
          if (aDepth > 0) curLink += 1
        }
        i += 1
      }
    }
    flush()

    val kept = blocks.filter { case (t, chars, link) =>
      wordCount(t) >= minWords &&
        (chars == 0 || link.toDouble / chars <= maxLinkDensity)
    }
    kept.map(_._1).mkString("\n")
  }

  /** UTF-8 decode (malformed bytes replaced) then [[extract]] — the WARC
    * payload surface (`html` binary column).
    */
  /** Raw-bytes form, charset-aware (late r5): previously a lenient UTF-8
    * decode that silently replaced every latin-1/cp1252 byte with U+FFFD;
    * now the WHATWG-style chain ([[CharsetDecode.decode]]) — BOM >
    * declared meta label (sniffed from an ISO-8859-1 probe of the head,
    * which is byte-transparent so the ASCII meta tag is always readable)
    * > strict UTF-8 > windows-1252. Valid-UTF-8 pages decode exactly as
    * before.
    */
  def extractFromBytes(html: Array[Byte], minWords: Int = 3,
                       maxLinkDensity: Double = 0.5): String = {
    if (html == null) return ""
    val probe = new String(html, 0, math.min(html.length, 4096),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    extract(CharsetDecode.decode(html, declaredCharsetOf(probe)),
      minWords, maxLinkDensity)
  }

  private lazy val MetaCharsetAttrRe = MetaCharsetAttrPat.r
  private lazy val MetaEquivTagRe = MetaEquivTagPat.r
  private lazy val CharsetTokenRe = CharsetTokenPat.r

  /** Plain-String form of [[declaredCharset]] (for executor-side code
    * that already holds the document; same patterns, same semantics).
    */
  def declaredCharsetOf(html: String): String =
    if (html == null) ""
    else MetaCharsetAttrRe.findFirstMatchIn(html).map(_.group(1))
      .orElse(MetaEquivTagRe.findFirstIn(html).flatMap(tag =>
        CharsetTokenRe.findFirstMatchIn(tag).map(_.group(1))))
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("")

  /** Decode the entity starting at `i` (html(i) == '&'). Returns the
    * decoded string and the next scan index; an unrecognized or
    * unterminated entity passes '&' through literally.
    */
  private def entityAt(html: String, i: Int): (String, Int) = {
    val n = html.length
    var j = i + 1
    val maxScan = math.min(n, i + 12) // longest supported entity + '#x' form
    while (j < maxScan && html.charAt(j) != ';' && html.charAt(j) != '&' &&
           !Character.isWhitespace(html.charAt(j))) j += 1
    if (j >= n || html.charAt(j) != ';') return ("&", i + 1)
    val body = html.substring(i + 1, j)
    if (body.startsWith("#")) {
      val num = body.drop(1)
      val cp =
        try {
          if (num.startsWith("x") || num.startsWith("X"))
            Integer.parseInt(num.drop(1), 16)
          else Integer.parseInt(num)
        } catch { case _: NumberFormatException => -1 }
      if (cp >= 0 && cp <= 0x10FFFF && Character.isValidCodePoint(cp))
        (new String(Character.toChars(cp)), j + 1)
      else ("&", i + 1)
    } else NamedEntities.get(body) match {
      case Some(s) => (s, j + 1)
      case None    => ("&", i + 1)
    }
  }

  /** Trim + collapse whitespace runs to single spaces (char loop). */
  private def collapseWs(sb: StringBuilder): String = {
    val out = new StringBuilder(sb.length)
    var pendingSpace = false
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (Character.isWhitespace(c)) { if (out.nonEmpty) pendingSpace = true }
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  private def wordCount(s: String): Int = {
    var count = 0
    var inWord = false
    var i = 0
    while (i < s.length) {
      if (Character.isWhitespace(s.charAt(i))) inWord = false
      else if (!inWord) { count += 1; inWord = true }
      i += 1
    }
    count
  }
}
