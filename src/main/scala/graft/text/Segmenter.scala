package graft.text

import scala.collection.mutable.ArrayBuffer

/** Abbreviation-aware sentence splitting + long-text segmentation.
  *
  * Reimplements the semantics of the reference's long-text segmenter
  * (/root/reference/utils/split_long_text.py:14-127): split text into
  * sentences (not breaking on known abbreviations / decimals), then greedily
  * pack sentences into segments of [minWords, maxWords] (default 500–1000),
  * merging short tails and splitting over-long sentences at logical
  * connectives. The Spark surface is a `text -> Array[String]` function
  * used with `posexplode` — the engine's only UDTF-shaped operator.
  */
object Segmenter {

  private val Abbrev: Set[String] = Set(
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "vs", "etc", "e.g",
    "i.e", "inc", "ltd", "co", "corp", "fig", "al", "no", "vol", "pp"
  )

  private val Connectives: Seq[String] = Seq(
    " and ", " but ", " or ", " because ", " however ", " therefore ",
    " while ", " although ", ", "
  )

  /** Sentence split on [.!?] followed by whitespace, protecting known
    * abbreviations and decimal numbers (split_long_text.py:14-47).
    */
  def sentences(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      sb.append(c)
      if ((c == '.' || c == '!' || c == '?') &&
          (i + 1 >= n || Character.isWhitespace(text.charAt(i + 1)))) {
        // scan the buffer backwards for the last token — re-splitting the
        // whole accumulated sentence here was O(n²) per document and
        // compiled a regex per boundary candidate
        val lastTok = lastToken(sb)
        val bare = lastTok.stripSuffix(".").toLowerCase(java.util.Locale.ROOT)
        val isAbbrev = c == '.' &&
          (Abbrev.contains(bare) || isSingleLetter(bare) || isDecimal(bare))
        if (!isAbbrev) {
          val t = sb.toString.trim
          if (t.nonEmpty) out += t
          sb.clear()
        }
      }
      i += 1
    }
    val tail = sb.toString.trim
    if (tail.nonEmpty) out += tail
    out.toArray
  }

  /** Last whitespace-delimited token of the buffer, without materializing
    * or re-splitting the whole sentence.
    */
  private def lastToken(sb: StringBuilder): String = {
    var end = sb.length
    while (end > 0 && Character.isWhitespace(sb.charAt(end - 1))) end -= 1
    var start = end
    while (start > 0 && !Character.isWhitespace(sb.charAt(start - 1))) start -= 1
    sb.substring(start, end)
  }

  private def isSingleLetter(s: String): Boolean =
    s.length == 1 && s.charAt(0) >= 'a' && s.charAt(0) <= 'z'

  /** Matches "\\d+\\.\\d*" without a per-call Pattern.compile. */
  private def isDecimal(s: String): Boolean = {
    val dot = s.indexOf('.')
    if (dot <= 0 || s.indexOf('.', dot + 1) >= 0) return false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (i != dot && (c < '0' || c > '9')) return false
      i += 1
    }
    true
  }

  private def wordCount(s: String): Int = TextStats.countWords(s)

  /** Split an over-long sentence at the latest connective that keeps the
    * head under maxWords; fall back to a hard word split.
    */
  private def splitLong(sentence: String, maxWords: Int): Seq[String] = {
    if (wordCount(sentence) <= maxWords) return Seq(sentence)
    val ws = TextStats.words(sentence)
    val headLimitChars = {
      // approximate char position of word maxWords
      var chars = 0; var i = 0
      while (i < maxWords && i < ws.length) { chars += ws(i).length + 1; i += 1 }
      chars
    }
    val cut = Connectives
      .map(c => sentence.lastIndexOf(c, math.min(headLimitChars, sentence.length - 1)))
      .filter(_ > 0)
      .sorted(Ordering.Int.reverse)
      .headOption
    cut match {
      case Some(pos) =>
        val head = sentence.substring(0, pos).trim
        val tail = sentence.substring(pos).trim
        if (head.isEmpty || tail.isEmpty) hardSplit(sentence, maxWords)
        else head +: splitLong(tail, maxWords)
      case None => hardSplit(sentence, maxWords)
    }
  }

  private def hardSplit(sentence: String, maxWords: Int): Seq[String] =
    TextStats.words(sentence).grouped(maxWords).map(_.mkString(" ")).toSeq

  /** Sentence-aware truncation (F11, /root/reference/utils.py:39-50): keep
    * whole sentences while the running length stays ≤ maxLength; if even
    * the first sentence exceeds it, hard-cut at maxLength.
    */
  def truncateSentences(text: String, maxLength: Int): String = {
    if (text == null || text.length <= maxLength) return if (text == null) "" else text
    val sents = sentences(text)
    val sb = new java.lang.StringBuilder
    var i = 0
    var done = false
    while (i < sents.length && !done) {
      val add = if (sb.length == 0) sents(i).length else sents(i).length + 1
      if (sb.length + add <= maxLength) {
        if (sb.length > 0) sb.append(' ')
        sb.append(sents(i))
        i += 1
      } else done = true
    }
    if (sb.length == 0) text.substring(0, maxLength) else sb.toString
  }

  /** Greedy segmentation into [minWords, maxWords]-word segments. Tails
    * shorter than minWords merge into the previous segment (which may then
    * exceed maxWords — documented reference behavior for final tails).
    */
  def segment(text: String, minWords: Int = 500, maxWords: Int = 1000): Array[String] = {
    val sents = sentences(text).flatMap(splitLong(_, maxWords))
    if (sents.isEmpty) return Array.empty
    val segs = ArrayBuffer.empty[String]
    val cur = ArrayBuffer.empty[String]
    var curWords = 0
    sents.foreach { s =>
      val w = wordCount(s)
      if (curWords + w > maxWords && curWords >= minWords) {
        segs += cur.mkString(" ")
        cur.clear(); curWords = 0
      }
      cur += s; curWords += w
    }
    if (cur.nonEmpty) {
      val tail = cur.mkString(" ")
      if (curWords < minWords && segs.nonEmpty) {
        val last = segs.remove(segs.length - 1)
        segs += (last + " " + tail)
      } else segs += tail
    }
    segs.toArray
  }
}
