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
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    val folded = AsciiFold(lowered)
    val noUrl = UrlRe.replaceAllIn(folded, "")
    val whitelisted = NonWhitelistRe.replaceAllIn(noUrl, "")
    val collapsed = WsRe.replaceAllIn(whitelisted, " ").trim
    if (collapsed.split(" ").count(_.nonEmpty) <= 4) "" else collapsed
  }
}

/** Deterministic ASCII transliteration (reference uses the public
  * `unidecode` library, /root/reference/utils/data_util.py:122). We fold
  * via Unicode NFD decomposition + combining-mark strip, plus a table for
  * characters NFD alone doesn't reduce: Latin-1 Supplement, Latin
  * Extended-A/B, and (since r3) the Cyrillic and Greek alphabets with
  * standard romanization, so European + Slavic + Greek text
  * transliterates instead of dropping. The table applies AFTER NFD, so
  * accented Cyrillic/Greek (й ё ά ύ …) decompose to their base letters
  * first and then romanize (й → и-breve → i — the unidecode behavior).
  * Transliteration is unidecode-STYLE (standard romanization tables),
  * not a byte-for-byte unidecode clone. Japanese kana (a closed set)
  * romanizes per character like unidecode (since r4, [[AsciiFold.Kana]]);
  * hanzi/CJK ideographs — the open-ended part of unidecode's table —
  * still DROP, the one remaining documented divergence (golden pairs in
  * CleanTextSpec pin the behavior either way).
  */
object AsciiFold {
  private val Extra: Map[Char, String] = Map(
    // Latin-1 Supplement without NFD decompositions
    'ß' -> "ss", 'æ' -> "ae", 'Æ' -> "AE", 'ø' -> "o", 'Ø' -> "O",
    'þ' -> "th", 'Þ' -> "Th", 'ð' -> "d", 'Ð' -> "D",
    // Latin Extended-A without NFD decompositions
    'đ' -> "d", 'Đ' -> "D", 'ł' -> "l", 'Ł' -> "L", 'œ' -> "oe",
    'Œ' -> "OE", 'ħ' -> "h", 'Ħ' -> "H", 'ı' -> "i", 'ĸ' -> "k",
    'ŀ' -> "l", 'Ŀ' -> "L", 'ŉ' -> "n", 'ŋ' -> "n", 'Ŋ' -> "N",
    'ŧ' -> "t", 'Ŧ' -> "T", 'ſ' -> "s",
    // Latin Extended-B (common European/African orthography letters;
    // pinned golden pairs in CleanTextSpec — unidecode-style
    // transliteration, not a byte-for-byte unidecode table)
    'ƀ' -> "b", 'Ɓ' -> "B", 'ƃ' -> "b", 'Ƃ' -> "B", 'Ɔ' -> "O",
    'ƈ' -> "c", 'Ƈ' -> "C", 'ɖ' -> "d", 'Ɖ' -> "D", 'ƌ' -> "d",
    'Ƌ' -> "D", 'Ǝ' -> "E", 'Ɛ' -> "E", 'ƒ' -> "f", 'Ƒ' -> "F",
    'ǥ' -> "g", 'Ǥ' -> "G", 'Ɣ' -> "G", 'Ɩ' -> "I", 'Ɨ' -> "I",
    'ƙ' -> "k", 'Ƙ' -> "K", 'ƚ' -> "l", 'Ɵ' -> "O", 'ƞ' -> "n",
    'ƫ' -> "t", 'Ƭ' -> "T", 'ƭ' -> "t", 'Ʈ' -> "T", 'ƴ' -> "y",
    'Ƴ' -> "Y", 'ƶ' -> "z", 'Ƶ' -> "Z",
    'Ǆ' -> "DZ", 'ǅ' -> "Dz", 'ǆ' -> "dz", 'Ǉ' -> "LJ", 'ǈ' -> "Lj",
    'ǉ' -> "lj", 'Ǌ' -> "NJ", 'ǋ' -> "Nj", 'ǌ' -> "nj", 'Ǳ' -> "DZ",
    'ǲ' -> "Dz", 'ǳ' -> "dz",
    // Cyrillic (Russian core + Ukrainian/Belarusian/Serbian letters;
    // NFD-decomposable forms like й ё ї ў reach their base letters и е і у
    // before this table applies). Standard scientific/GOST-style
    // romanization.
    'а' -> "a", 'б' -> "b", 'в' -> "v", 'г' -> "g", 'д' -> "d",
    'е' -> "e", 'ж' -> "zh", 'з' -> "z", 'и' -> "i", 'к' -> "k",
    'л' -> "l", 'м' -> "m", 'н' -> "n", 'о' -> "o", 'п' -> "p",
    'р' -> "r", 'с' -> "s", 'т' -> "t", 'у' -> "u", 'ф' -> "f",
    'х' -> "kh", 'ц' -> "ts", 'ч' -> "ch", 'ш' -> "sh", 'щ' -> "shch",
    'ъ' -> "", 'ы' -> "y", 'ь' -> "", 'э' -> "e", 'ю' -> "yu",
    'я' -> "ya", 'і' -> "i", 'є' -> "ye", 'ґ' -> "g", 'ј' -> "j",
    'љ' -> "lj", 'њ' -> "nj", 'ђ' -> "dj", 'ћ' -> "c", 'џ' -> "dz",
    'ѓ' -> "g", 'ќ' -> "k", 'ѕ' -> "dz",
    'А' -> "A", 'Б' -> "B", 'В' -> "V", 'Г' -> "G", 'Д' -> "D",
    'Е' -> "E", 'Ж' -> "Zh", 'З' -> "Z", 'И' -> "I", 'К' -> "K",
    'Л' -> "L", 'М' -> "M", 'Н' -> "N", 'О' -> "O", 'П' -> "P",
    'Р' -> "R", 'С' -> "S", 'Т' -> "T", 'У' -> "U", 'Ф' -> "F",
    'Х' -> "Kh", 'Ц' -> "Ts", 'Ч' -> "Ch", 'Ш' -> "Sh", 'Щ' -> "Shch",
    'Ъ' -> "", 'Ы' -> "Y", 'Ь' -> "", 'Э' -> "E", 'Ю' -> "Yu",
    'Я' -> "Ya", 'І' -> "I", 'Є' -> "Ye", 'Ґ' -> "G", 'Ј' -> "J",
    'Љ' -> "Lj", 'Њ' -> "Nj", 'Ђ' -> "Dj", 'Ћ' -> "C", 'Џ' -> "Dz",
    'Ѓ' -> "G", 'Ќ' -> "K", 'Ѕ' -> "Dz",
    // Greek (modern monotonic; accented forms decompose to these bases)
    'α' -> "a", 'β' -> "b", 'γ' -> "g", 'δ' -> "d", 'ε' -> "e",
    'ζ' -> "z", 'η' -> "e", 'θ' -> "th", 'ι' -> "i", 'κ' -> "k",
    'λ' -> "l", 'μ' -> "m", 'ν' -> "n", 'ξ' -> "x", 'ο' -> "o",
    'π' -> "p", 'ρ' -> "r", 'σ' -> "s", 'ς' -> "s", 'τ' -> "t",
    'υ' -> "u", 'φ' -> "ph", 'χ' -> "ch", 'ψ' -> "ps", 'ω' -> "o",
    'Α' -> "A", 'Β' -> "B", 'Γ' -> "G", 'Δ' -> "D", 'Ε' -> "E",
    'Ζ' -> "Z", 'Η' -> "E", 'Θ' -> "Th", 'Ι' -> "I", 'Κ' -> "K",
    'Λ' -> "L", 'Μ' -> "M", 'Ν' -> "N", 'Ξ' -> "X", 'Ο' -> "O",
    'Π' -> "P", 'Ρ' -> "R", 'Σ' -> "S", 'Τ' -> "T", 'Υ' -> "U",
    'Φ' -> "Ph", 'Χ' -> "Ch", 'Ψ' -> "Ps", 'Ω' -> "O",
    // symbols / punctuation
    '€' -> "EUR", '£' -> "GBP", '«' -> "\"", '»' -> "\"",
    '‘' -> "'", '’' -> "'", '“' -> "\"", '”' -> "\"",
    '–' -> "-", '—' -> "-", ' ' -> " "
  ) ++ Kana

  /** Japanese kana — a CLOSED public set, romanized per character the
    * way unidecode does it (small kana fold to their large form's
    * romaji; no digraph contraction, so きゃ → "kiya" like unidecode,
    * not Hepburn "kya"). Katakana is generated from the hiragana table
    * at the fixed +0x60 block offset. Voiced forms (が, ぱ …) are
    * NFD-decomposable into base + U+3099/309A; [[AsciiFold.apply]]
    * recomposes those pairs before lookup so they reach this table.
    * Hanzi/CJK ideographs remain out of scope (dropped) — the
    * open-ended part of unidecode's table; divergence documented and
    * pinned in CleanTextSpec.
    */
  // lazy: Extra's initializer above runs first and references this —
  // a plain val would still be null at that point (object init order)
  private lazy val Kana: Map[Char, String] = {
    val hira = Map(
      'ぁ' -> "a", 'あ' -> "a", 'ぃ' -> "i", 'い' -> "i", 'ぅ' -> "u",
      'う' -> "u", 'ぇ' -> "e", 'え' -> "e", 'ぉ' -> "o", 'お' -> "o",
      'か' -> "ka", 'が' -> "ga", 'き' -> "ki", 'ぎ' -> "gi",
      'く' -> "ku", 'ぐ' -> "gu", 'け' -> "ke", 'げ' -> "ge",
      'こ' -> "ko", 'ご' -> "go",
      'さ' -> "sa", 'ざ' -> "za", 'し' -> "shi", 'じ' -> "ji",
      'す' -> "su", 'ず' -> "zu", 'せ' -> "se", 'ぜ' -> "ze",
      'そ' -> "so", 'ぞ' -> "zo",
      'た' -> "ta", 'だ' -> "da", 'ち' -> "chi", 'ぢ' -> "ji",
      'っ' -> "tsu", 'つ' -> "tsu", 'づ' -> "zu", 'て' -> "te",
      'で' -> "de", 'と' -> "to", 'ど' -> "do",
      'な' -> "na", 'に' -> "ni", 'ぬ' -> "nu", 'ね' -> "ne",
      'の' -> "no",
      'は' -> "ha", 'ば' -> "ba", 'ぱ' -> "pa", 'ひ' -> "hi",
      'び' -> "bi", 'ぴ' -> "pi", 'ふ' -> "fu", 'ぶ' -> "bu",
      'ぷ' -> "pu", 'へ' -> "he", 'べ' -> "be", 'ぺ' -> "pe",
      'ほ' -> "ho", 'ぼ' -> "bo", 'ぽ' -> "po",
      'ま' -> "ma", 'み' -> "mi", 'む' -> "mu", 'め' -> "me",
      'も' -> "mo",
      'ゃ' -> "ya", 'や' -> "ya", 'ゅ' -> "yu", 'ゆ' -> "yu",
      'ょ' -> "yo", 'よ' -> "yo",
      'ら' -> "ra", 'り' -> "ri", 'る' -> "ru", 'れ' -> "re",
      'ろ' -> "ro",
      'ゎ' -> "wa", 'わ' -> "wa", 'ゐ' -> "wi", 'ゑ' -> "we",
      'を' -> "wo", 'ん' -> "n", 'ゔ' -> "vu")
    // katakana mirrors hiragana at a fixed block offset (ア = あ + 0x60)
    val kata = hira.map { case (c, r) => ((c + 0x60).toChar, r) }
    hira ++ kata ++ Map(
      'ー' -> "-", // long-vowel mark
      '、' -> ",", '。' -> ".", '「' -> "\"", '」' -> "\"",
      '『' -> "\"", '』' -> "\"", '・' -> " ")
  }

  def apply(s: String): String = {
    // NFD FIRST: decomposable letters (é, й, ё, ά …) split into base +
    // combining marks, the marks are stripped, and the base letter (which
    // may itself be non-ASCII — Cyrillic и, Greek α) then transliterates
    // through the table. No table entry has an NFD decomposition, so
    // table outputs never need re-normalizing. (Pre-r3 the table ran
    // before NFD, so accented Cyrillic/Greek never reached it.)
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      var c = nfd.charAt(i)
      var step = 1
      // kana voiced/semi-voiced marks (U+3099/309A) DECOMPOSE under NFD
      // (が → か + ◌゙); stripping them like accents would fold が to "ka".
      // Recompose the pair so the voiced form reaches the Kana table.
      if (i + 1 < nfd.length) {
        val m = nfd.charAt(i + 1)
        if (m == '゙' || m == '゚') {
          val comp = java.text.Normalizer.normalize(
            new String(Array(c, m)), java.text.Normalizer.Form.NFC)
          if (comp.length == 1) { c = comp.charAt(0); step = 2 }
        }
      }
      if (Character.getType(c) != Character.NON_SPACING_MARK) {
        if (c < 128) sb.append(c)
        else Extra.get(c) match {
          case Some(t) => sb.append(t)
          case None    => () // drop untransliterated non-ASCII (hanzi etc.)
        }
      }
      i += step
    }
    sb.toString
  }
}

/** Public-suffix rules, parsed once per JVM from the committed snapshot
  * resource (`graft/public_suffix_snapshot.dat` — the COMPLETE public
  * Mozilla PSL, ICANN + PRIVATE sections, ~9.5k rules; tldextract, the
  * reference's dependency, uses both sections by default).
  * Implements the full PSL matching algorithm: the
  * prevailing rule is the longest match among exact, wildcard (`*.` =
  * exactly one extra label) and exception (`!` beats everything and drops
  * its leftmost label); with no match the default rule `*` applies (the
  * last label is the public suffix).
  */
object PublicSuffixes {
  private lazy val (exact: Set[String], wildcard: Set[String],
      exception: Set[String]) = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.dat")
    require(in != null, "public_suffix_snapshot.dat missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val rules = src.getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toVector
      (rules.filter(r => !r.startsWith("*.") && !r.startsWith("!")).toSet,
        rules.filter(_.startsWith("*.")).map(_.drop(2)).toSet,
        rules.filter(_.startsWith("!")).map(_.drop(1)).toSet)
    } finally src.close()
  }

  /** Number of labels in `host`'s public suffix (host assumed lowercase,
    * no trailing dot). Exception rules win; otherwise the longest of the
    * exact/wildcard matches; otherwise 1 (the default `*` rule).
    */
  def suffixLabels(host: String): Int = {
    val labels = host.split('.')
    val n = labels.length
    var best = 1
    var i = n - 1
    while (i >= 0) {
      val candidate = labels.slice(i, n).mkString(".")
      if (exception.contains(candidate)) return n - i - 1
      if (exact.contains(candidate)) best = math.max(best, n - i)
      // wildcard "*.tail" matches candidate = <one label>.tail
      if (i + 1 < n && wildcard.contains(labels.slice(i + 1, n).mkString(".")))
        best = math.max(best, n - i)
      i -= 1
    }
    best
  }
}

/** Registrable host/domain extraction — reimplements the fqdn membership
  * semantics of the reference's tldextract use
  * (/root/reference/utils/data_util.py:34-38) over the full PSL
  * algorithm with a committed rule snapshot (see [[PublicSuffixes]];
  * behavior pinned against tldextract by tests). Returns fqdn and
  * registrableDomain (eTLD+1).
  */
object DomainOf {

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
    s.substring(0, end).toLowerCase(java.util.Locale.ROOT).stripSuffix(".")
  }

  /** eTLD+1 under the PSL snapshot. Hosts that ARE a public suffix (or
    * shorter) and IPv4 literals return themselves — grouping keys must be
    * total, so "no registrable domain" degrades to the host (tldextract
    * returns an empty domain part there; for corpus domain-statistics a
    * total key is the useful contract).
    */
  def registrable(url: String): String = {
    val host = fqdn(url)
    if (host.isEmpty) return ""
    val parts = host.split('.')
    if (parts.length >= 4 && parts.forall(p =>
        p.nonEmpty && p.length <= 3 && p.forall(_.isDigit)))
      return host // IPv4 literal
    val ps = PublicSuffixes.suffixLabels(host)
    if (parts.length <= ps) host
    else parts.takeRight(ps + 1).mkString(".")
  }
}
