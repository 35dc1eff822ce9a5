package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.filters.KneserNeyLM
import graft.text.{CleanText, Segmenter, TextStats}

/** Property-based invariants (SURVEY.md §5.2.3). The generator mixes
  * realistic word streams with adversarial whitespace/punctuation/unicode
  * so the hand-rolled hot-path tokenizers are pinned against their regex
  * reference specifications on arbitrary input, not just fixtures.
  */
object TextProperties extends Properties("text") {

  private val wordGen: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("the", "of", "and", "data", "spark", "Corpus", "Quick",
      "don't", "42", "x9", "word"),
    2 -> Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
    1 -> Gen.oneOf("...", "#", "•", "été", "中文", "A.B.", "3.5",
      // expanding / locale-sensitive case mappings: İ lowers to i +
      // combining dot (expansion), Σ is context-sensitive, ẞ → ß
      "İstanbul", "İİ", "ΣΑΣ", "STRAẞE", "ǅungla")
  )
  private val sepGen: Gen[String] = Gen.frequency(
    8 -> Gen.const(" "),
    2 -> Gen.oneOf("\n", "\t", "  ", "\n\n", "\r\n", "", "\f")
  )
  val textGen: Gen[String] = for {
    n <- Gen.choose(0, 120)
    ws <- Gen.listOfN(n, wordGen)
    seps <- Gen.listOfN(n, sepGen)
    lead <- Gen.oneOf("", " ", "\n")
  } yield lead + ws.zip(seps).map { case (w, s) => w + s }.mkString

  property("words == regex \\s+ split spec") = forAll(textGen) { t =>
    val spec = t.split("\\s+").filter(_.nonEmpty).toSeq
    TextStats.words(t).toSeq == spec
  }

  property("countWords == words().length (allocation-free counter)") =
    forAll(textGen) { t => TextStats.countWords(t) == TextStats.words(t).length }

  property("KN tokenize == lowercase [^a-z0-9']+ split spec") =
    forAll(textGen) { t =>
      val lm = KneserNeyLM.train(Seq("a b"))
      val spec = t.toLowerCase(java.util.Locale.ROOT)
        .split("[^a-z0-9']+").filter(_.nonEmpty).toSeq
      lm.tokenize(t).toSeq == spec
    }

  property("clean_text is idempotent") = forAll(textGen) { t =>
    val once = CleanText(t)
    CleanText(once) == once
  }

  // textGen plus URL-shaped and "http"-prefix-adversarial tokens, so the
  // fused scrub's hand-rolled `http\S+` branch is exercised on partial
  // matches, mid-word matches, and bare-"http"-before-whitespace edges
  private val urlWordGen: Gen[String] = Gen.frequency(
    5 -> wordGen,
    2 -> Gen.oneOf("http://x.com/a?b=1", "https://site.example/p%20q",
      "xhttp://tail", "httphttp://twice", "http", "htt", "httpx",
      "ahttp", "httpv", "HTTP://UPPER.example"),
    1 -> Gen.const("see http://a.b, then!"))
  private val urlTextGen: Gen[String] = for {
    n <- Gen.choose(0, 80)
    ws <- Gen.listOfN(n, urlWordGen)
    seps <- Gen.listOfN(n, sepGen)
  } yield ws.zip(seps).map { case (w, s) => w + s }.mkString

  property("fused scrub == three-regex reference chain") =
    forAll(urlTextGen) { t =>
      // the fused scan replaces the regex chain AFTER lowercase+fold;
      // pin equivalence on exactly that intermediate
      val folded = graft.text.AsciiFold(t.toLowerCase(java.util.Locale.ROOT))
      CleanText.scrub(folded) == CleanText.scrubReference(folded)
    }

  property("fused scrub == reference on raw unfolded adversarial input") =
    forAll(urlTextGen) { t =>
      CleanText.scrub(t) == CleanText.scrubReference(t)
    }

  property("computeFineWeb fields == compute's (line-level fast pass)") =
    forAll(textGen) { t =>
      val full = TextStats.compute(t)
      val fw = TextStats.computeFineWeb(t)
      fw.nWords == full.nWords &&
        fw.linePunctRatio == full.linePunctRatio &&
        fw.shortLineFrac == full.shortLineFrac &&
        fw.dupLineCharFrac == full.dupLineCharFrac &&
        fw.newLineRatio == full.newLineRatio
    }

  property("doc-stats fractions stay in [0,1]") = forAll(textGen) { t =>
    val st = TextStats.compute(t)
    val fracs = Seq(st.bulletLineFrac, st.ellipsisLineFrac,
      st.nonAlphaWordFrac, st.dupLineFrac, st.dupLineCharFrac,
      st.dupParaFrac, st.dupParaCharFrac, st.topNgramCharFrac2,
      st.topNgramCharFrac3, st.topNgramCharFrac4, st.dupNgramCharFrac5,
      st.dupNgramCharFrac10, st.linePunctRatio, st.shortLineFrac)
    fracs.forall(f => f >= 0.0 && f <= 1.0)
  }

  property("segmentation preserves every word in order") =
    forAll(textGen) { t =>
      val segs = Segmenter.segment(t, minWords = 5, maxWords = 12)
      segs.flatMap(TextStats.words).toSeq == TextStats.words(t).toSeq
    }

  property("truncateSentences never exceeds max unless one sentence") =
    forAll(textGen, Gen.choose(5, 200)) { (t, max) =>
      val out = Segmenter.truncateSentences(t, max)
      out.length <= max || Segmenter.sentences(t).length <= 1 ||
        // a kept single over-long first sentence is hard-cut, so the only
        // >max case is the unchanged-under-limit identity
        out == t
    }

  property("perplexity is positive and finite for non-empty token streams") =
    forAll(textGen) { t =>
      val lm = KneserNeyLM.train(Seq("the data of spark and corpus",
        "the quick word of data"))
      val p = lm.perplexity(t)
      p > 0.0 && !p.isNaN
    }
}

object DedupProperties extends Properties("dedup") {

  import graft.dedup.MinHash

  private val docGen: Gen[String] = for {
    n <- Gen.choose(1, 60)
    ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta"))
  } yield ws.mkString(" ")

  property("identical docs get identical band hashes") = forAll(docGen) { d =>
    val cfg = MinHash.Config()
    MinHash.bandHashesOf(d, cfg).toSeq == MinHash.bandHashesOf(d, cfg).toSeq
  }

  property("band count and determinism across configs") =
    forAll(docGen, Gen.choose(2, 20), Gen.choose(1, 8)) { (d, bands, rows) =>
      val cfg = MinHash.Config(bands = bands, rowsPerBand = rows)
      val h = MinHash.bandHashesOf(d, cfg)
      h.length == bands
    }

  property("whitespace-only edits never change band hashes") =
    forAll(docGen) { d =>
      val cfg = MinHash.Config()
      // only holds for docs of >= shingleSize words: shorter docs hash
      // their raw text as the single shingle (whitespace included)
      val padded = d + " omega kappa lambda sigma tau"
      val noisy = "  " + padded.replace(" ", "  ") + "\n"
      MinHash.bandHashesOf(noisy, cfg).toSeq ==
        MinHash.bandHashesOf(padded, cfg).toSeq
    }
}

/** Robustness properties for the hand-rolled single-pass HTML scanner —
  * hand-rolled parsers fail on pathological input, so the invariants are
  * pinned against arbitrary tag soup, not just well-formed fixtures.
  */
object HtmlProperties extends Properties("html") {
  import graft.text.HtmlExtract

  private val fragGen: Gen[String] = Gen.frequency(
    4 -> Gen.oneOf("plain words here", "more body text", "x", ""),
    3 -> Gen.oneOf("<p>", "</p>", "<div>", "</div>", "<br/>", "<a href='x'>",
      "</a>", "<b>", "</b>", "<script>", "</script>", "<style>", "</style>",
      "<nav>", "</nav>"),
    2 -> Gen.oneOf("<!--", "-->", "<", ">", "&", "&amp;", "&#65;", "&#xZZ;",
      "&bogus;", "&unterminated"),
    1 -> Gen.oneOf("<p", "</", "<>", "<!", "<ScRiPt>", "</sCrIpT>",
      "< p >", "<a href=\"unclosed")
  )
  private val soupGen: Gen[String] = for {
    n <- Gen.choose(0, 40)
    fs <- Gen.listOfN(n, fragGen)
  } yield fs.mkString(" ")

  property("never throws on arbitrary tag soup, output is tag-free") =
    forAll(soupGen) { html =>
      val out = HtmlExtract.extract(html, minWords = 1)
      // no structural markup survives: every '<tag>' span was consumed.
      // (bare '<'/'>' in TEXT position pass through by design, matching
      // browser error recovery for non-tag-like input; the generator's
      // "<p"-style truncated tags at EOF also legitimately vanish.)
      !out.contains("<p>") && !out.contains("</p>") && !out.contains("<div>")
    }

  property("extraction is deterministic") = forAll(soupGen) { html =>
    HtmlExtract.extract(html) == HtmlExtract.extract(html)
  }

  property("script/style/nav content never leaks") =
    forAll(Gen.oneOf("script", "style", "nav"),
      Gen.const("SECRETTOKEN leaked content words")) { (tag, payload) =>
      val html = s"<p>visible words stay here</p><$tag><p>$payload</p></$tag>"
      val out = HtmlExtract.extract(html, minWords = 1)
      out.contains("visible") && !out.contains("SECRETTOKEN")
    }

  property("plain text with no markup passes through (ws-collapsed)") =
    forAll(Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "words"))) { ws =>
      val text = ws.mkString(" ")
      val out = HtmlExtract.extract(text, minWords = 0)
      out == text.split("\\s+").filter(_.nonEmpty).mkString(" ")
    }
}

object UrlNormProperties extends Properties("urlnorm") {
  import graft.text.UrlNorm.canonical

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("https://", "HTTP://", "http://", "")
    www <- Gen.oneOf("www.", "WWW.", "")
    host <- Gen.oneOf("example.com", "Sub.Example.COM", "xn--bcher-kva.ch")
    port <- Gen.oneOf(":443", ":80", ":8080", "")
    path <- Gen.listOf(Gen.oneOf("a", "B", "p%20q", "1")).map(s =>
      s.map("/" + _).mkString)
    slash <- Gen.oneOf("/", "//", "")
    query <- Gen.oneOf("", "?utm_source=x", "?id=3&utm_medium=y",
      "?b=2&a=1", "?fbclid")
    frag <- Gen.oneOf("", "#top", "#a/b?c")
  } yield scheme + www + host + port + path + slash + query + frag

  property("canonical is idempotent") = forAll(urlGen) { u =>
    canonical(canonical(u)) == canonical(u)
  }

  property("canonical is variant-invariant") = forAll(urlGen) { u =>
    // the same logical URL under scheme/www-case/default-port/fragment
    // variation maps to one canonical form. Explicit DEFAULT ports are
    // the one scheme-sensitive case (":80" strips only under http-ish,
    // ":443" only under https — UrlNorm's conservative gating), so the
    // cross-scheme comparison holds only for scheme-neutral ports.
    val schemeless = u.stripPrefix("https://").stripPrefix("HTTP://")
      .stripPrefix("http://")
    val base = canonical(u)
    val portNeutral = !(schemeless.contains(":443") ||
      schemeless.replace(":8080", "").contains(":80"))
    !portNeutral || canonical("https://" + schemeless) == base
  }

  property("never returns null; trims to empty") =
    forAll(Gen.oneOf(null: String, "", "   ", "\t")) { u =>
      canonical(u) == ""
    }
}

object PiiExtendedProperties extends Properties("pii-extended") {
  import graft.filters.Pii

  private val digitRun: Gen[String] =
    Gen.choose(1, 22).flatMap(n => Gen.listOfN(n, Gen.numChar).map(_.mkString))
  private val cardish: Gen[String] = for {
    groups <- Gen.choose(3, 4)
    gs <- Gen.listOfN(groups, Gen.listOfN(4, Gen.numChar).map(_.mkString))
    sep <- Gen.oneOf(" ", "-", "")
  } yield gs.mkString(sep)
  private val phoneish: Gen[String] = Gen.oneOf(
    Gen.listOfN(10, Gen.numChar).map(_.mkString.grouped(3).mkString("-")),
    Gen.choose(8, 12).flatMap(n =>
      Gen.listOfN(n, Gen.numChar).map("+1 " + _.mkString(" "))),
    digitRun)
  private val chunk: Gen[String] = Gen.frequency(
    4 -> Gen.oneOf("call", "pay", "order", "ref", "v2.10.3", "now.", "(x)"),
    2 -> cardish, 2 -> phoneish, 1 -> digitRun)
  private val piiTextGen: Gen[String] = for {
    n <- Gen.choose(0, 30)
    cs <- Gen.listOfN(n, chunk)
  } yield cs.mkString(" ")

  property("scrubExtended is idempotent") = forAll(piiTextGen) { t =>
    val once = Pii.scrubExtended(t)
    Pii.scrubExtended(once) == once
  }

  property("no Luhn-valid card shape survives except the replacement") =
    forAll(piiTextGen) { t =>
      val out = Pii.scrubCards(t)
      // the scrubber's own shape definition: one CONSISTENT separator
      // (mixed-separator runs are not how humans write a PAN)
      val m = java.util.regex.Pattern
        .compile("""(?<![\d\w])\d{4}(?:([ -]?)\d{4})(?:\1\d{4}){1,2}(?:\1\d{1,3})?(?![\d\w])""")
        .matcher(out)
      var ok = true
      while (m.find()) {
        val digits = m.group().filter(_.isDigit)
        if (digits.length >= 13 && digits.length <= 19 &&
            Pii.luhn(digits) && m.group() != Pii.CardReplacement)
          ok = false
      }
      ok
    }

  property("text without digits is untouched by the extended passes") =
    forAll(Gen.listOf(Gen.oneOf("call", "me", "at", "home.", "(soon)"))
      .map(_.mkString(" "))) { t =>
      Pii.scrubPhones(t) == t && Pii.scrubCards(t) == t
    }
}

/** Charset-decode invariants: the decode chain must be total (never
  * throw, null only for null), exact on well-formed input, and its
  * shape-based fallback must never mojibake a mostly-valid-UTF-8 page.
  */
object CharsetProperties extends Properties("charset") {
  import graft.text.CharsetDecode

  private val anyBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
  private val textGen = TextProperties.textGen

  property("decode is total and non-null on non-null bytes") =
    forAll(anyBytes, Gen.oneOf("", "utf-8", "iso-8859-1", "bogus-charset")) {
      (b, d) => CharsetDecode.decode(b, d) != null
    }

  property("well-formed UTF-8 round-trips exactly (strict path)") =
    forAll(textGen) { s =>
      CharsetDecode.decode(s.getBytes("UTF-8"), "") == s
    }

  property("one corrupting byte never mojibakes the rest of a UTF-8 page " +
    "that carries real multibyte content") =
    forAll(textGen, Gen.chooseNum(0, 255)) { (s0, corrupt) =>
      val s = s0 + " 多语言内容测试页面结构"  // ensure multibyte mass
      val bytes = s.getBytes("UTF-8")
      val damaged = bytes ++ Array(0x85.toByte) // stray continuation byte
      val got = CharsetDecode.decode(damaged, "")
      got.startsWith(s) // every valid char survives; damage lands at the end
    }
}
