package graft.text

import org.scalatest.funsuite.AnyFunSuite

class CharsetDecodeSpec extends AnyFunSuite {

  test("BOM detection: utf-8, utf-16le, utf-16be, none, short, null") {
    assert(CharsetDecode.bomCharset(
      Array(0xEF, 0xBB, 0xBF, 'a').map(_.toByte)) == "utf-8")
    assert(CharsetDecode.bomCharset(
      Array(0xFF, 0xFE, 'a', 0).map(_.toByte)) == "utf-16le")
    assert(CharsetDecode.bomCharset(
      Array(0xFE, 0xFF, 0, 'a').map(_.toByte)) == "utf-16be")
    assert(CharsetDecode.bomCharset("plain".getBytes("UTF-8")) == "")
    assert(CharsetDecode.bomCharset(Array(0xFF.toByte)) == "")
    assert(CharsetDecode.bomCharset(null) == "")
  }

  test("decode resolution: BOM beats declared beats utf-8 beats cp1252") {
    val s = "crème brûlée — ok"
    // BOM'd utf-16le decodes regardless of a lying declared label
    val utf16 = Array(0xFF.toByte, 0xFE.toByte) ++ s.getBytes("UTF-16LE")
    assert(CharsetDecode.decode(utf16, "utf-8") == s)
    // BOM'd utf-16be, BOM stripped from output
    val utf16be = Array(0xFE.toByte, 0xFF.toByte) ++ s.getBytes("UTF-16BE")
    assert(CharsetDecode.decode(utf16be, "") == s)
    // BOM'd utf-8: BOM stripped
    val utf8bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ s.getBytes("UTF-8")
    assert(CharsetDecode.decode(utf8bom, "") == s)
    // declared latin-1 honored (these bytes are NOT valid utf-8)
    val latin = "café déjà".getBytes("ISO-8859-1")
    assert(CharsetDecode.decode(latin, "iso-8859-1") == "café déjà")
    // undeclared: strict utf-8 first
    assert(CharsetDecode.decode(s.getBytes("UTF-8"), "") == s)
    assert(CharsetDecode.decode(s.getBytes("UTF-8"), null) == s)
  }

  test("lying or unknown labels fall through; cp1252 is the last resort") {
    val latin = "café".getBytes("ISO-8859-1") // E9 is invalid utf-8
    // declared utf-8 but bytes aren't: strict utf-8 fails → cp1252
    assert(CharsetDecode.decode(latin, "utf-8") == "café")
    // unknown label: skipped, utf-8 fails, cp1252 lands
    assert(CharsetDecode.decode(latin, "klingon-1") == "café")
    // cp1252-specific punctuation decodes via the fallback
    assert(CharsetDecode.decode(Array(0x93, 'h', 'i', 0x94).map(_.toByte), "")
      == "“hi”")
    assert(CharsetDecode.decode(null, "utf-8") == null)
    assert(CharsetDecode.decode(Array.empty[Byte], "") == "")
  }

  test("mostly-valid UTF-8 with one damaged byte decodes as UTF-8 with " +
       "replacement, not whole-page cp1252 mojibake") {
    val good = "多语言网页内容测试 with mixed ascii 结尾"
    val full = good.getBytes("UTF-8")
    val truncated = full.dropRight(1) // cuts the last char mid-sequence
    val got = CharsetDecode.decode(truncated, "")
    assert(got.startsWith(good.dropRight(1)),
      s"undamaged prefix must survive intact: $got")
    assert(got.contains('�'), "the damage must be visible, not hidden")
    assert(!got.contains("ã"), "no cp1252 mojibake of the valid sequences")
    // a stray continuation byte mid-page: same decision
    val stray = full.take(6) ++ Array(0x85.toByte) ++ full.drop(6)
    assert(CharsetDecode.decode(stray, "").count(_ == '�') == 1)
  }
}
