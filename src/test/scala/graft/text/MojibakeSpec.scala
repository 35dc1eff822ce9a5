package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  /** UTF-8 bytes mis-decoded as cp1252 — the damage fix() must invert. */
  private def corrupt(s: String): String =
    new String(s.getBytes("UTF-8"), "windows-1252")

  test("fix inverts single-round cp1252 damage on golden pairs") {
    val cleans = Seq("été naïve café", "‘it’s… €100", "straße — ök",
      "“smart quote", "mixed ascii and é end")
    cleans.foreach { c =>
      val bad = corrupt(c)
      assert(bad != c, s"fixture not actually corrupted: $c")
      assert(Mojibake.fix(bad) == c, s"failed to repair: $bad")
    }
  }

  test("fix repairs sloppy-decoded damage through cp1252's undefined bytes") {
    // '”' is U+201D → UTF-8 e2 80 9d; 0x9d is undefined in cp1252, so a
    // strict decoder destroys it (U+FFFD) but real-world sloppy decoders
    // emit the C1 control U+009D — which fix() must map back to 0x9d
    val sloppy = "â€œsmart quotesâ€"
    assert(Mojibake.fix(sloppy) == "“smart quotes”")
    // strict-decoder damage (replacement char) is unrecoverable by
    // construction and must pass through untouched
    val destroyed = "â€œsmart quotesâ€�"
    assert(Mojibake.fix(destroyed) == destroyed)
  }

  test("fix inverts double damage in two rounds, no further") {
    val c = "éé"
    val twice = corrupt(corrupt(c))
    assert(twice == "ÃƒÂ©ÃƒÂ©")
    assert(Mojibake.fix(twice) == c)
    assert(Mojibake.fix(corrupt(c)) == c)
  }

  test("fix leaves clean, genuinely-accented, CJK and null text untouched") {
    assert(Mojibake.fix("plain ascii text.") == "plain ascii text.")
    assert(Mojibake.fix("déjà vu, naïveté") == "déjà vu, naïveté")
    assert(Mojibake.fix("中文网页 and ascii") == "中文网页 and ascii")
    assert(Mojibake.fix("emoji 😀 stays") == "emoji 😀 stays")
    assert(Mojibake.fix(null) == null)
  }

  test("round-trip property: fix(corrupt(s)) == s over a mixed alphabet") {
    val alphabet = "abc XYZ.éüñç天’…€😀"
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val s = (0 until rnd.nextInt(40)).map { _ =>
        alphabet.charAt(rnd.nextInt(alphabet.length))
      }.mkString
      // surrogate-safe: skip strings where random char picking split the
      // emoji into a lone surrogate (not a valid string to begin with)
      def wellFormed: Boolean = {
        var i = 0
        var ok = true
        while (ok && i < s.length) {
          val c = s.charAt(i)
          if (Character.isHighSurrogate(c)) {
            ok = i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1))
            i += 2
          } else { ok = !Character.isLowSurrogate(c); i += 1 }
        }
        ok
      }
      if (wellFormed) {
        assert(Mojibake.fix(corrupt(s)) == s, s"round-trip broke on: $s")
      }
    }
  }

  test("signature detector: zero on clean text, positive on damage, codegen column") {
    val df = Seq(
      ("clean english text, nothing odd.", 0),
      ("naÃ¯ve cafÃ© visit", 4),          // two pairs of 2 chars
      ("â€˜quoteâ€™", 4),                 // â€ pairs; ˜ and ™ unconsumed
      ("genuine déjà vu", 0)
    ).toDF("t", "expected")
    df.select(Mojibake.signatureChars($"t").as("got"), $"expected")
      .as[(Int, Int)].collect()
      .foreach { case (g, e) => assert(g == e, s"got $g expected $e") }
  }
}
