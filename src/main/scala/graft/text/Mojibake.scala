package graft.text

import java.nio.CharBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction,
  StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{length, lit, regexp_replace, udf}

/** Encoding-damage (mojibake) detection and repair.
  *
  * The classic web-corpus defect: a page's UTF-8 bytes were at some point
  * decoded as windows-1252/latin-1 and re-saved, so every multibyte
  * sequence surfaces as 2-4 spurious chars ("é" → "Ã©", "'" → "â€™").
  * Common-Crawl carries this at measurable rates (the public `ftfy`
  * library exists for exactly this); a quality pipeline detects it (high
  * [[signatureChars]] → quarantine/score signal) and repairs the
  * recoverable cases before dedup — otherwise clean and damaged copies of
  * the same page never collapse.
  *
  * Detection is a pure Column regexp (codegen'd, zero UDF): a mojibake
  * pair is a cp1252-decoded UTF-8 LEAD byte (0xC2-0xF4 decode to the
  * contiguous  Â..ô block) followed by a cp1252-decoded CONTINUATION byte
  * (0x80-0xBF decode to the € ‚ ƒ … " " • – — ™ block, five C1 controls
  * for cp1252's undefined bytes, and U+00A0-00BF) — sequences essentially
  * absent from intentional text. Repair is a per-row UDF (byte
  * transcoding has no Column form): re-encode the whole string as
  * cp1252 and strictly re-decode as UTF-8, accepting only when BOTH
  * conversions are exact — any char outside cp1252 (CJK, emoji) or any
  * byte sequence that is not valid UTF-8 leaves the input byte-identical,
  * so clean text and false positives cannot be harmed. Doubly-damaged
  * text ("ÃƒÂ©") repairs over two rounds.
  */
object Mojibake {

  /** cp1252 images of UTF-8 lead bytes 0xC2-0xF4 (identity to U+00C2-F4). */
  private val Leads = "[Â-ô]"

  /** cp1252 images of UTF-8 continuation bytes 0x80-0xBF: the Windows
    * punctuation block, the five C1 controls cp1252 leaves undefined
    * (0x81 8D 8F 90 9D), and the Latin-1 supplement punctuation range.
    */
  private val Continuations =
    "[€‚ƒ„…†‡ˆ‰Š" +
      "‹ŒŽ‘’“”•" +
      "–—˜™š›œžŸ" +
      " -¿]"

  /** The two-char mojibake signature (non-overlapping, leftmost-first in
    * both Java and RE2 — the DuckDB oracle replays the same shape).
    */
  val SignaturePattern: String = Leads + Continuations

  /** Count of characters inside mojibake signature pairs — the per-doc
    * damage signal (0 on clean text; ~2 per corrupted non-ASCII char).
    */
  def signatureChars(textCol: Column): Column =
    length(textCol) - length(regexp_replace(textCol, SignaturePattern, ""))

  /** "Sloppy cp1252" char→byte map (the ftfy convention): standard
    * windows-1252, with the five bytes cp1252 leaves undefined (0x81 8D
    * 8F 90 9D) mapped to their C1 control chars — because real-world
    * sloppy decoders emit exactly those controls, and Java's strict
    * charset turns them into U+FFFD (unrecoverable). Bytes 0x00-7F and
    * 0xA0-FF are identity.
    */
  private val Cp1252Specials: Map[Char, Int] = Map(
    '€' -> 0x80, '' -> 0x81, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88, '‰' -> 0x89,
    'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C, '' -> 0x8D, 'Ž' -> 0x8E,
    '' -> 0x8F, '' -> 0x90, '‘' -> 0x91, '’' -> 0x92,
    '“' -> 0x93, '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B, 'œ' -> 0x9C,
    '' -> 0x9D, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  /** Sloppy-cp1252 encode: null when any char has no byte image. */
  private def sloppyEncode(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val b =
        if (c < 0x80 || (c >= 0xA0 && c <= 0xFF)) c.toInt
        else Cp1252Specials.getOrElse(c, -1)
      if (b < 0) return null
      out(i) = b.toByte
      i += 1
    }
    out
  }

  /** One repair round: sloppy-cp1252 encode + strict UTF-8 decode, or the
    * input unchanged if either conversion is inexact.
    */
  private def fixOnce(s: String): String = {
    val bytes = sloppyEncode(s)
    if (bytes == null) return s
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: CharacterCodingException => s }
  }

  /** Repair up to `maxRounds` layers of encoding damage (2 covers the
    * doubly-mangled pages real crawls produce; each extra layer needs the
    * previous decode to itself be valid UTF-8, so over-application
    * converges — a clean string round-trips to itself and stops).
    */
  def fix(s: String, maxRounds: Int = 2): String = {
    if (s == null) return null
    var cur = s
    var i = 0
    var changed = true
    while (i < maxRounds && changed) {
      val next = fixOnce(cur)
      changed = next != cur
      cur = next
      i += 1
    }
    cur
  }

  /** Column form of [[fix]] (the one per-row UDF in this module). */
  val fixUdf = udf((s: String) => fix(s))
}
