package graft.text

import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction,
  StandardCharsets}

import org.apache.spark.sql.functions.udf

/** Charset-aware decoding of raw page bytes — the step BEFORE text ever
  * becomes a String. Crawl payloads arrive as bytes in whatever encoding
  * the server sent; decoding everything as UTF-8 silently mangles the
  * latin-1/cp1252 long tail (and produces exactly the damage
  * [[Mojibake]] then has to repair). Resolution order follows the WHATWG
  * encoding sniff: byte-order mark > declared charset
  * ([[HtmlExtract.declaredCharset]] from the meta tags) > strict UTF-8 >
  * windows-1252 (the WHATWG fallback that never fails on 8-bit input).
  *
  * Driver/executor-safe plain functions + one UDF ([[decodeUdf]]) —
  * byte transcoding has no Column form. The BOM itself is stripped from
  * the decoded text (it is transport framing, not content).
  */
object CharsetDecode {

  /** BOM-indicated charset label: "utf-8" | "utf-16le" | "utf-16be" | "".
    * (UTF-32 BOMs are vanishingly rare on the web and the utf-32le BOM
    * is a utf-16le BOM prefix — web sniffing checks 16 first, as here.)
    */
  def bomCharset(bytes: Array[Byte]): String = {
    if (bytes == null) return ""
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
      bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte) "utf-8"
    else if (bytes.length >= 2 && bytes(0) == 0xFF.toByte &&
      bytes(1) == 0xFE.toByte) "utf-16le"
    else if (bytes.length >= 2 && bytes(0) == 0xFE.toByte &&
      bytes(1) == 0xFF.toByte) "utf-16be"
    else ""
  }

  private def strict(cs: Charset, bytes: Array[Byte], from: Int): Option[String] =
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(bytes, from, bytes.length - from))
        .toString)
    } catch { case _: CharacterCodingException => None }

  /** Decode page bytes with the WHATWG-style resolution chain. `declared`
    * is the label from the page's own meta tags ('' / null = undeclared);
    * unknown or lying labels fall through to the UTF-8 → cp1252 chain
    * rather than failing. Never throws; null bytes → null.
    */
  def decode(bytes: Array[Byte], declared: String): String = {
    if (bytes == null) return null
    val bom = bomCharset(bytes)
    val bomSkip = bom match {
      case "utf-8" => 3
      case "utf-16le" | "utf-16be" => 2
      case _ => 0
    }
    val candidates: Seq[String] =
      (if (bom.nonEmpty) Seq(bom) else Nil) ++
        Option(declared).filter(_.nonEmpty).toSeq ++ Seq("utf-8")
    candidates.foldLeft(Option.empty[String]) { (acc, label) =>
      acc.orElse {
        try {
          val cs = Charset.forName(label)
          strict(cs, bytes, bomSkip)
        } catch { case _: Exception => None } // unknown/unsupported label
      }
    }.getOrElse {
      // Every strict candidate failed. Deciding the fallback on byte
      // SHAPE matters: a UTF-8 page with one truncated/stray byte (a
      // routine crawl artifact) must NOT mojibake wholesale through
      // cp1252 — browsers pick one encoding and decode with
      // replacement, never strict-else-switch. Pages whose multibyte
      // sequences are mostly VALID UTF-8 decode as UTF-8 with U+FFFD
      // for the damage; pages whose non-ASCII bytes are mostly
      // standalone (the latin-1/cp1252 shape: 'é' = lone 0xE9) take
      // the WHATWG windows-1252 fallback, which decodes any byte
      // sequence (Java maps the five undefined bytes to U+FFFD —
      // acceptable for a last resort; Mojibake.fix handles the
      // recoverable cases upstream).
      val (validSeqs, invalidBytes) = utf8Shape(bytes, bomSkip)
      if (validSeqs > invalidBytes) {
        val dec = StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(CodingErrorAction.REPLACE)
          .onUnmappableCharacter(CodingErrorAction.REPLACE)
        dec.decode(java.nio.ByteBuffer.wrap(bytes, bomSkip,
          bytes.length - bomSkip)).toString
      } else
        new String(bytes.drop(bomSkip), Charset.forName("windows-1252"))
    }
  }

  /** One pass over the payload counting (valid multibyte UTF-8
    * sequences, non-ASCII bytes that are NOT part of one). ASCII bytes
    * vote for neither side — both encodings agree on them.
    */
  private def utf8Shape(bytes: Array[Byte], from: Int): (Int, Int) = {
    var valid = 0; var invalid = 0
    var i = from
    val n = bytes.length
    @inline def cont(j: Int): Boolean =
      j < n && (bytes(j) & 0xC0) == 0x80
    while (i < n) {
      val b = bytes(i) & 0xFF
      if (b < 0x80) i += 1
      else if (b >= 0xC2 && b <= 0xDF && cont(i + 1)) { valid += 1; i += 2 }
      else if (b >= 0xE0 && b <= 0xEF && cont(i + 1) && cont(i + 2)) {
        valid += 1; i += 3
      } else if (b >= 0xF0 && b <= 0xF4 && cont(i + 1) && cont(i + 2) &&
        cont(i + 3)) { valid += 1; i += 4 }
      else { invalid += 1; i += 1 }
    }
    (valid, invalid)
  }

  /** Column form: `decodeUdf(html, declaredCharsetCol)`. */
  val decodeUdf = udf((b: Array[Byte], d: String) => decode(b, d))
}
