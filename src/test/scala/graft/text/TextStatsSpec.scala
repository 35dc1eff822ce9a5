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
}
