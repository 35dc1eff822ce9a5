package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r6 allocation-reduced Synth generator against the original
  * construction forms: the streamed sentence/cleanDoc builder, the
  * hand-rolled url zero-pad, and the direct html byte assembly must be
  * byte-identical to the Array.fill + mkString / f-interpolation /
  * s-interpolation forms they replaced — the synthetic corpus is the
  * E2E ground truth, so generator drift would silently move every
  * downstream expectation.
  */
class SynthSpec extends AnyFunSuite {

  private def sentenceRef(rng: scala.util.Random,
                          vocab: IndexedSeq[String],
                          english: Boolean): String = {
    val n = 8 + rng.nextInt(7)
    val ws = Array.fill(n)(vocab(rng.nextInt(vocab.length)))
    if (english) { ws(1 % n) = "the"; ws(3 % n) = "of"; ws(5 % n) = "and" }
    ws(0) = ws(0).capitalize
    ws.mkString(" ") + "."
  }

  test("streamed sentence matches the Array.fill + mkString reference") {
    for (seed <- 0 until 200; english <- Seq(true, false)) {
      val vocab = if (seed % 3 == 0) Synth.FrVocab else Synth.EnVocab
      val a = Synth.sentence(Synth.rngFor(1L, seed.toLong), vocab, english)
      val b = sentenceRef(Synth.rngFor(1L, seed.toLong), vocab, english)
      assert(a == b, s"seed=$seed english=$english")
    }
  }

  test("streamed cleanDoc matches per-sentence join") {
    for (seed <- 0 until 50) {
      val a = Synth.cleanDoc(Synth.rngFor(2L, seed.toLong), Synth.EnVocab, 9)
      // one shared rng across the fills, exactly like cleanDoc
      val rng = Synth.rngFor(2L, seed.toLong)
      val c = Array.fill(9)(sentenceRef(rng, Synth.EnVocab, english = true))
        .mkString("\n")
      assert(a == c, s"seed=$seed")
    }
  }

  test("row is stable across the generator rewrite (spot fixture)") {
    // full-row spot pins across every population class: url format,
    // html byte wrapping, text bytes
    for (idx <- 0L until 200L) {
      val r = Synth.row(idx, 1000L, Synth.DefaultSeed)
      assert(r.url == f"https://${if (idx % 10 < 3) "big-portal.example.com"
        else s"site${idx % 97}.example.com"}/p/$idx%08d")
      assert(new String(r.html, "UTF-8") ==
        s"<html><body>${r.text}</body></html>")
    }
    // >8-digit id: pad must not truncate
    val big = Synth.row(123456789L, 123456790L, Synth.DefaultSeed)
    assert(big.url.endsWith("/p/123456789"))
  }
}
