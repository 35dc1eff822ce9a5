package graft.dedup

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

object DedupKernelProperties extends Properties("dedupkernels") {
  
  private val wordsGen: Gen[Array[String]] =
    Gen.listOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
      .map(_.toArray)
  private val nGen: Gen[Int] = Gen.choose(1, 7)

  property("wordSpans concatenation reproduces the original text") =
    forAll(wordsGen, nGen) { (ws, n) =>
      val text = ws.mkString(" ")
      SpanDedup.wordSpans(text, n).mkString(" ") == text
    }

  property("wordSpans: every span but the last has exactly n words") =
    forAll(wordsGen, nGen) { (ws, n) =>
      val spans = SpanDedup.wordSpans(ws.mkString(" "), n)
      spans.dropRight(1).forall(s => s.count(_ == ' ') == n - 1)
    }

  property("slidingWindowHashes: rolling equals direct, right length") =
    forAll(wordsGen, nGen) { (ws, n) =>
      val rolled = SpanDedup.slidingWindowHashes(ws, n)
      val expectLen = math.max(0, ws.length - n + 1)
      rolled.length == expectLen &&
        ws.sliding(n).filter(_.length == n).zipWithIndex.forall {
          case (w, i) =>
            SpanDedup.slidingWindowHashes(w.toArray, n)(0) == rolled(i)
        }
    }

  property("gramHashes: k-gram count and equal-text stability") =
    forAll(wordsGen, nGen) { (ws, n) =>
      val text = ws.mkString(" ")
      val hs = Decontaminate.gramHashes(text, n)
      val wc = graft.text.TextStats.words(text).length
      hs.length == math.max(0, wc - n + 1) &&
        hs.sameElements(Decontaminate.gramHashes(text, n))
    }
}
