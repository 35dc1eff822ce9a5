package graft.text

import org.scalatest.funsuite.AnyFunSuite

class TextStatsSpec extends AnyFunSuite {

  test("word/line/char counts") {
    val st = TextStats.compute("The cat sat.\nThe dog ran far away.")
    assert(st.nWords == 8)
    assert(st.nLines == 2)
    assert(st.nChars == 34)
    assert(st.nSentences == 2)
  }

  test("empty text is all zeros") {
    val st = TextStats.compute("")
    assert(st.nWords == 0 && st.nLines == 0 && st.meanWordLen == 0.0)
  }

  test("mean word length") {
    val st = TextStats.compute("ab cd ef")  // 3 words of 2 chars
    assert(math.abs(st.meanWordLen - 2.0) < 1e-9)
  }

  test("hash and ellipsis symbol ratios") {
    val st = TextStats.compute("a # b # c ... d")  // 7 words, 2 '#', 1 '...'
    assert(math.abs(st.hashRatio - 2.0 / 7) < 1e-9)
    assert(math.abs(st.ellipsisRatio - 1.0 / 7) < 1e-9)
  }

  test("bullet and ellipsis line fractions") {
    val st = TextStats.compute("- item one\n- item two\nplain line ends...\nnormal.")
    assert(math.abs(st.bulletLineFrac - 0.5) < 1e-9)
    assert(math.abs(st.ellipsisLineFrac - 0.25) < 1e-9)
  }

  test("stop word count is distinct") {
    val st = TextStats.compute("the the the of of")
    assert(st.stopWordCount == 2)
  }

  test("non-alpha word fraction") {
    val st = TextStats.compute("abc 123 $$$ d5f")
    assert(math.abs(st.nonAlphaWordFrac - 0.5) < 1e-9)
  }

  test("duplicate line fraction counts non-first occurrences") {
    val st = TextStats.compute("same line\nother line\nsame line\nsame line")
    assert(math.abs(st.dupLineFrac - 0.5) < 1e-9) // 2 dups of 4 lines
    assert(st.dupLineCharFrac > 0.4)
  }

  test("duplicate paragraph fraction") {
    val st = TextStats.compute("para one\n\npara two\n\npara one")
    assert(math.abs(st.dupParaFrac - 1.0 / 3) < 1e-9)
  }

  test("top n-gram char fraction flags a dominating bigram") {
    val st = TextStats.compute("red fox red fox red fox jumps high")
    // "red fox" x3: 18 chars of 31 word chars
    assert(st.topNgramCharFrac2 > 0.5)
  }

  test("top n-gram is zero when no n-gram repeats") {
    val st = TextStats.compute("one two three four five six")
    assert(st.topNgramCharFrac2 == 0.0)
    assert(st.topNgramCharFrac3 == 0.0)
  }

  test("dup 5-gram char fraction marks repeated phrase occurrences") {
    val phrase = "alpha beta gamma delta epsilon"
    val st = TextStats.compute((phrase + " ") * 4 + "tail words here")
    assert(st.dupNgramCharFrac5 > 0.5)
  }

  test("line punct ratio and short line fraction") {
    val st = TextStats.compute(
      "This line is long enough and ends well.\nshort\nno punct here at all")
    assert(math.abs(st.linePunctRatio - 1.0 / 3) < 1e-9)
    assert(math.abs(st.shortLineFrac - 2.0 / 3) < 1e-9) // "short" + "no punct here at all"
  }

  test("newline ratio") {
    val st = TextStats.compute("a b c\nd e f\ng h i") // 2 newlines / 9 words
    assert(math.abs(st.newLineRatio - 2.0 / 9) < 1e-9)
  }

  // --- n-gram early-skip equivalence (r6): compute() skips higher n-gram
  // passes when a lower level has no duplicates; this pins every n-gram
  // field against a brute-force string-keyed counter on docs chosen to
  // exercise each branch of the skip chain (no repeats at all, repeats
  // stopping at each level 2..10, and a long-run repeat hitting all).

  private def bruteTop(words: Array[String], n: Int): Double = {
    val tot = words.map(_.length).sum
    if (words.length < n || tot == 0) return 0.0
    val counts = scala.collection.mutable.HashMap.empty[String, (Int, Int)]
    for (i <- 0 to words.length - n) {
      val key = words.slice(i, i + n).mkString(" ")
      val chars = words.slice(i, i + n).map(_.length).sum
      val (c, _) = counts.getOrElse(key, (0, chars))
      counts.update(key, (c + 1, chars))
    }
    val best = counts.values.collect {
      case (c, chars) if c > 1 => c.toDouble * chars / tot
    }
    math.min(if (best.isEmpty) 0.0 else best.max, 1.0)
  }

  private def bruteDup(words: Array[String], n: Int): Double = {
    val tot = words.map(_.length).sum
    if (words.length < n || tot == 0) return 0.0
    val seen = scala.collection.mutable.HashSet.empty[String]
    val marked = new Array[Boolean](words.length)
    for (i <- 0 to words.length - n) {
      val key = words.slice(i, i + n).mkString(" ")
      if (!seen.add(key)) (i until i + n).foreach(marked(_) = true)
    }
    words.indices.collect { case i if marked(i) => words(i).length }
      .sum.toDouble / tot
  }

  test("n-gram early-skip matches brute force at every chain depth") {
    val rng = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omic")
    def fresh(n: Int): Array[String] =
      Array.tabulate(n)(i => vocab(i % vocab.length) + "x" + i)
    val docs = Seq(
      // no repeats anywhere: the maximal-skip path
      fresh(40).mkString(" "),
      // repeated 2-gram but nothing longer
      (fresh(20) ++ Array("red", "fox") ++ fresh(20).map(_ + "q") ++
        Array("red", "fox")).mkString(" "),
      // repeated 4-gram (tops all on, dup5 off)
      (fresh(15) ++ Array("a1", "b2", "c3", "d4") ++ fresh(15).map(_ + "z")
        ++ Array("a1", "b2", "c3", "d4")).mkString(" "),
      // repeated 7-gram (dup chain runs to 7, stops at 8)
      {
        val seven = Array("p1", "p2", "p3", "p4", "p5", "p6", "p7")
        (fresh(10) ++ seven ++ fresh(10).map(_ + "w") ++ seven).mkString(" ")
      },
      // long run: every level 2..10 duplicated
      (Array.fill(6)(Array("r1", "r2", "r3", "r4", "r5")).flatten
        ++ fresh(8)).mkString(" "),
      // random soup with incidental repeats
      Array.fill(120)(vocab(rng.nextInt(vocab.length))).mkString(" ")
    )
    docs.foreach { d =>
      val ws = TextStats.words(d)
      val st = TextStats.compute(d)
      assert(math.abs(st.topNgramCharFrac2 - bruteTop(ws, 2)) < 1e-12, d)
      assert(math.abs(st.topNgramCharFrac3 - bruteTop(ws, 3)) < 1e-12, d)
      assert(math.abs(st.topNgramCharFrac4 - bruteTop(ws, 4)) < 1e-12, d)
      for (n <- 5 to 10)
        assert(math.abs(st.dupNgramCharFrac(n) - bruteDup(ws, n)) < 1e-12,
          s"n=$n doc=$d")
    }
  }
}
