package graft.filters

/** Regex-based PII + toxicity scrubbing — reimplements the semantics of
  * datatrove's PIIFormatter as imported by the reference
  * (/root/reference/datatrove/findweb.py:14): emails and globally-routable
  * IPv4 addresses are replaced with fixed anonymized values. Toxicity
  * scrubbing (north-rule requirement) masks wordlist hits. All
  * replacements are deterministic so scrubbed bytes are reproducible.
  */
object Pii {
  val EmailReplacement = "email@example.com"
  val IpReplacement = "22.214.171.124"
  val ToxicReplacement = "[removed]"

  val EmailRe =
    "[A-Za-z0-9][A-Za-z0-9._%+-]*@[A-Za-z0-9][A-Za-z0-9.-]*\\.[A-Za-z]{2,}".r
  val Ipv4Re =
    "(?<![0-9.])((?:[0-9]{1,3}\\.){3}[0-9]{1,3})(?![0-9.])".r

  /** Default toxicity wordlist (masking targets, not an endorsement);
    * callers can extend via [[scrub]]'s `toxicWords`.
    */
  val DefaultToxicWords: Seq[String] =
    Seq("fuck", "fucking", "shit", "bitch", "asshole", "bastard", "cunt")

  private def toxicRe(words: Seq[String]) =
    ("(?i)\\b(" + words.map(java.util.regex.Pattern.quote).mkString("|") + ")\\b").r

  private val defaultToxicRe = toxicRe(DefaultToxicWords)

  /** Per-group PII exposure audit — the release-audit ledger a corpus
    * publishes alongside the scrub (how much PII did each source carry
    * BEFORE scrubbing; which domains need policy review): per group,
    * total docs and, per named pattern, the affected-doc count and total
    * mention count. One partial+final aggregation to an O(groups ×
    * patterns) ledger; the rlike/regexp_count pair stays codegen'd, no
    * UDF. Pass engine-portable (RE2) patterns when an external replay
    * must reproduce the numbers — the scrub's own lookbehind-based
    * [[Ipv4Re]] is deliberately NOT the default here.
    */
  def auditReport(df: org.apache.spark.sql.DataFrame, textCol: String,
                  groupCol: String,
                  patterns: Seq[(String, String)])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(patterns.nonEmpty, "auditReport: no patterns")
    val aggs = patterns.flatMap { case (name, pat) =>
      Seq(
        count(when(col(textCol).rlike(pat), 1)).as(s"${name}_docs"),
        sum(regexp_count(col(textCol), lit(pat)).cast("long"))
          .as(s"${name}_mentions"))
    }
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("docs"), aggs: _*)
  }

  /** True if the dotted-quad is a valid, globally routable IPv4 address
    * (mirrors Python `ipaddress.is_global` for the common ranges).
    */
  def isGlobalIpv4(ip: String): Boolean = {
    val parts = ip.split('.')
    if (parts.length != 4) return false
    val o = new Array[Int](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3) return false
      val v = p.toInt
      if (v > 255) return false
      o(i) = v; i += 1
    }
    val (a, b) = (o(0), o(1))
    if (a == 0 || a == 10 || a == 127) return false
    if (a == 100 && b >= 64 && b <= 127) return false
    if (a == 169 && b == 254) return false
    if (a == 172 && b >= 16 && b <= 31) return false
    if (a == 192 && b == 168) return false
    if (a == 192 && b == 0 && (o(2) == 0 || o(2) == 2)) return false
    if (a == 198 && (b == 18 || b == 19)) return false
    if (a == 198 && b == 51 && o(2) == 100) return false
    if (a == 203 && b == 0 && o(2) == 113) return false
    if (a >= 224) return false
    true
  }

  // Each regex pass is gated on a cheap char probe that is a strict
  // SUPERSET of "the regex can match" — clean documents (the common
  // case) skip the regex engine entirely. Even precompiled
  // java.util.regex matching measures ~35x slower than char loops
  // inside the 32-thread executor pool on this class of host (BENCH.md
  // round-1 findings; round-3 jstack showed Pii inside ~1/3 of analyze
  // samples), so the probes are hand-rolled scans, not patterns.

  /** True iff text contains digit '.' digit somewhere — necessary for
    * any IPv4 match.
    */
  private def hasDottedDigit(text: String): Boolean = {
    var i = 1
    val n = text.length
    while (i < n - 1) {
      if (text.charAt(i) == '.' &&
          text.charAt(i - 1) >= '0' && text.charAt(i - 1) <= '9' &&
          text.charAt(i + 1) >= '0' && text.charAt(i + 1) <= '9') return true
      i += 1
    }
    false
  }

  def scrubEmails(text: String): String =
    if (text.indexOf('@') < 0) text // no '@' → no email
    else EmailRe.replaceAllIn(text, EmailReplacement)

  def scrubIps(text: String): String =
    if (!hasDottedDigit(text)) text
    else Ipv4Re.replaceAllIn(text, m =>
      if (isGlobalIpv4(m.group(1))) IpReplacement else m.group(1))

  def scrubToxic(text: String, words: Seq[String] = DefaultToxicWords): String = {
    // ASCII-case-insensitive regex hits imply the ROOT-lowercased text
    // contains the LOWERCASED word — intrinsified contains scans are a
    // superset probe. Locale.ROOT: under tr/az default locales "SHIT"
    // lowercases to "shıt" and the probe would miss what the regex
    // matches. The probe words themselves must be lowercased too: a
    // caller list entry like "Fuck" can never appear verbatim in the
    // lowercased text even though the (?i) regex matches it.
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val probes =
      if (words eq DefaultToxicWords) DefaultToxicWords // already lowercase
      else words.map(_.toLowerCase(java.util.Locale.ROOT))
    if (!probes.exists(lower.contains)) return text
    val re = if (words eq DefaultToxicWords) defaultToxicRe else toxicRe(words)
    re.replaceAllIn(text, java.util.regex.Matcher.quoteReplacement(ToxicReplacement))
  }

  /** Full scrub chain, fixed order: emails → IPs → toxicity. */
  def scrub(text: String, toxicWords: Seq[String] = DefaultToxicWords): String =
    scrubToxic(scrubIps(scrubEmails(text)), toxicWords)

  // ---- extended scrubbers (OPT-IN) ----------------------------------
  // The default chain above stays byte-identical to the reference's
  // PIIFormatter semantics — the E2E byte-identity gate depends on it.
  // The extended set below is the wider Dolma-style PII surface
  // (phones, payment cards); callers opt in via scrubExtended or Run's
  // --pii-extended.

  val PhoneReplacement = "+1-555-0100"

  /** Digit-FREE by design (r5). Any digit-bearing replacement can fuse
    * with neighboring real digit tokens into a fresh Luhn-valid card
    * shape on a second pass — e.g. "7029 2281 5213 <13-digit PAN>"
    * scrubbed to "7029 2281 5213 0000-…" re-matched as the 16-digit
    * space-separated "7029 2281 5213 0000" (Luhn passes 1 in 10), and
    * scrubExtended lost idempotence (found by the PiiExtendedProperties
    * idempotence property, seed pinned in FiltersSpec). The phone
    * replacement keeps its digits because it is a full-match fixed point
    * of PhoneRe and '+' cannot appear mid-number; no such safe digit
    * form exists for cards. */
  val CardReplacement = "XXXX-XXXX-XXXX-XXXX"

  /** Phone numbers, conservatively: either an international form
    * (+CC then 8-13 digits with optional space/dash/dot/paren
    * separators) or a NANP-ish form with explicit grouping
    * ((XXX) XXX-XXXX / XXX-XXX-XXXX). Bare digit runs are NOT matched —
    * ids, timestamps, and quantities would false-positive; a digit run
    * only reads as a phone number when it carries phone punctuation.
    */
  private val PhoneRe = java.util.regex.Pattern.compile(
    // the trailing (?![ .-]\d) forbids ENDING a match where a
    // separator-digit continuation follows: without it the
    // international alternative bites a 12-digit prefix out of a longer
    // grouped digit run (including the card REPLACEMENT, breaking scrub
    // idempotence — caught by PiiExtendedProperties) and re-matches
    // differently on every pass. A real number directly followed by
    // more separated digits is ambiguous anyway; the module's stance is
    // the conservative miss.
    """(?<![\d\w])(?:\+\d{1,3}[ .-]?(?:\(\d{1,4}\)[ .-]?)?\d(?:[ .-]?\d){7,12}|\(\d{3}\)[ .-]?\d{3}[ .-]\d{4}|\d{3}[ .-]\d{3}[ .-]\d{4})(?![\d\w]|[ .-]\d)""")

  def scrubPhones(text: String): String = {
    // probe: a phone match needs ≥8 digits total and either '+' or an
    // in-number separator; cheapest sufficient probe is "has 3+ digits"
    var digits = 0
    var i = 0
    while (i < text.length && digits < 3) {
      val c = text.charAt(i)
      if (c >= '0' && c <= '9') digits += 1
      i += 1
    }
    if (digits < 3) text
    else PhoneRe.matcher(text).replaceAll(
      java.util.regex.Matcher.quoteReplacement(PhoneReplacement))
  }

  /** Luhn checksum over the digits of a candidate card number. */
  private[graft] def luhn(digits: String): Boolean = {
    var sum = 0
    var alt = false
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (alt) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      alt = !alt
      i -= 1
    }
    sum % 10 == 0
  }

  // the separator is CAPTURED once and backreferenced: humans write a
  // PAN with one consistent separator ("4111 1111 1111 1111", never
  // "4111-1111 1111"), and without the consistency requirement the
  // replacement value fuses with a neighboring digit token across a
  // space into a fresh 19-digit Luhn-valid "card" on the next pass
  // (caught by PiiExtendedProperties). The backreference alone is NOT
  // sufficient: a SAME-separator fusion of leftover digit groups with a
  // digit-bearing replacement survived it (r5, same property) — closed
  // by making CardReplacement digit-free rather than by narrowing the
  // pattern, which would also have cost recall on digit-adjacent PANs.
  private val CardRe = java.util.regex.Pattern.compile(
    """(?<![\d\w])\d{4}(?:([ -]?)\d{4})(?:\1\d{4}){1,2}(?:\1\d{1,3})?(?![\d\w])""")

  /** Payment-card-shaped digit groups (13-19 digits in 4-digit-ish
    * grouping) that pass the Luhn checksum. The checksum is what keeps
    * order ids and EAN barcodes in the text: a random digit string
    * passes Luhn 1 in 10 times, a real PAN always does.
    */
  def scrubCards(text: String): String = {
    var digits = 0
    var i = 0
    while (i < text.length && digits < 13) {
      val c = text.charAt(i)
      if (c >= '0' && c <= '9') digits += 1
      i += 1
    }
    if (digits < 13) text
    else {
      val m = CardRe.matcher(text)
      val sb = new java.lang.StringBuilder
      var last = 0
      while (m.find()) {
        val raw = m.group()
        val only = raw.filter(_.isDigit)
        if (only.length >= 13 && only.length <= 19 && luhn(only)) {
          sb.append(text, last, m.start()).append(CardReplacement)
          last = m.end()
        }
      }
      if (last == 0) text
      else { sb.append(text, last, text.length); sb.toString }
    }
  }

  /** Extended chain: the reference-parity scrub, then cards, then
    * phones. Cards run BEFORE phones so a separator-grouped PAN reaches
    * the Luhn check intact — a 13-digit card also parses as an
    * international phone number, and the phone pass would eat it.
    */
  def scrubExtended(text: String,
                    toxicWords: Seq[String] = DefaultToxicWords): String =
    scrubPhones(scrubCards(scrub(text, toxicWords)))
}
