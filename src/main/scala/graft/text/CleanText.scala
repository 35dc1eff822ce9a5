package graft.text

/** clean_text normalizer — reimplements the reference's normalization chain
  * (/root/reference/utils/data_util.py:118-129, duplicated at
  * /root/reference/utils.py:9-20): lowercase → ASCII transliteration →
  * strip `http\S+` URLs → whitelist `[a-z0-9\s,.!?']` → collapse whitespace
  * → empty if ≤4 words. Idempotent (property-tested).
  */
object CleanText {
  private val UrlRe = "http\\S+".r
  private val NonWhitelistRe = "[^a-z0-9\\s,.!?']".r
  private val WsRe = "\\s+".r

  def apply(text: String): String = {
    if (text == null) return ""
    val lowered = text.toLowerCase
    val folded = AsciiFold(lowered)
    val noUrl = UrlRe.replaceAllIn(folded, "")
    val whitelisted = NonWhitelistRe.replaceAllIn(noUrl, "")
    val collapsed = WsRe.replaceAllIn(whitelisted, " ").trim
    if (collapsed.split(" ").count(_.nonEmpty) <= 4) "" else collapsed
  }
}

/** Deterministic ASCII transliteration (reference uses the public
  * `unidecode` library, /root/reference/utils/data_util.py:122). We fold
  * via Unicode NFD decomposition + combining-mark strip, plus a small
  * Latin supplement table for characters NFD alone doesn't reduce.
  */
object AsciiFold {
  private val Extra: Map[Char, String] = Map(
    'ß' -> "ss", 'æ' -> "ae", 'Æ' -> "AE", 'ø' -> "o", 'Ø' -> "O",
    'đ' -> "d", 'Đ' -> "D", 'þ' -> "th", 'Þ' -> "Th", 'ð' -> "d",
    'Ð' -> "D", 'ł' -> "l", 'Ł' -> "L", 'œ' -> "oe", 'Œ' -> "OE",
    '€' -> "EUR", '£' -> "GBP", '«' -> "\"", '»' -> "\"",
    '‘' -> "'", '’' -> "'", '“' -> "\"", '”' -> "\"",
    '–' -> "-", '—' -> "-", ' ' -> " "
  )

  def apply(s: String): String = {
    val pre = {
      val sb = new StringBuilder(s.length)
      s.foreach(c => sb.append(Extra.getOrElse(c, c.toString)))
      sb.toString
    }
    val nfd = java.text.Normalizer.normalize(pre, java.text.Normalizer.Form.NFD)
    val sb = new StringBuilder(nfd.length)
    nfd.foreach { c =>
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK && c < 128) sb.append(c)
      else if (t != Character.NON_SPACING_MARK && c >= 128) () // drop non-ASCII
    }
    sb.toString
  }
}

/** Registrable host/domain extraction — reimplements the fqdn membership
  * semantics of the reference's tldextract use
  * (/root/reference/utils/data_util.py:34-38) with a bundled snapshot of
  * common public-suffix rules (full PSL not shippable offline; the rule
  * set is pinned by tests). Returns (fqdn, registrableDomain).
  */
object DomainOf {
  /** Multi-label public suffixes we recognize beyond single-label TLDs. */
  private val MultiSuffix: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.cn", "net.cn", "org.cn", "com.br",
    "com.mx", "co.in", "co.kr", "com.tw", "com.sg", "co.za", "com.ar"
  )

  def fqdn(url: String): String = {
    if (url == null) return ""
    var s = url
    val scheme = s.indexOf("://")
    if (scheme >= 0) s = s.substring(scheme + 3)
    val at = s.indexOf('@')
    if (at >= 0 && at < math.max(s.indexOf('/'), s.length)) {
      val slash = s.indexOf('/')
      if (slash < 0 || at < slash) s = s.substring(at + 1)
    }
    var end = s.length
    for (c <- Seq('/', '?', '#', ':')) {
      val i = s.indexOf(c)
      if (i >= 0 && i < end) end = i
    }
    s.substring(0, end).toLowerCase.stripSuffix(".")
  }

  /** eTLD+1 under the bundled suffix snapshot. */
  def registrable(url: String): String = {
    val host = fqdn(url)
    if (host.isEmpty) return ""
    val parts = host.split('.')
    if (parts.length <= 2) return host
    val last2 = parts.takeRight(2).mkString(".")
    if (MultiSuffix.contains(last2)) parts.takeRight(3).mkString(".")
    else last2
  }
}
