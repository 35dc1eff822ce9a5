package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RedPajama-v2-style per-document quality-signal vector (Together 2023;
  * the same family Dolma and CCNet export): instead of deciding keep/drop
  * inside the pipeline, EMIT the raw signals as columns so downstream
  * consumers can re-threshold without re-reading the corpus — the
  * publish-signals-not-decisions pattern web-scale corpora ship with.
  *
  * Every signal is a pure Catalyst `Column` over the text — split /
  * filter / transform / aggregate higher-order functions, zero UDFs — so
  * the whole vector is one narrow projection (no shuffle, nothing leaves
  * Tungsten) and each signal is independently replayable in ANSI SQL
  * (the DuckDB oracle recomputes all of them bit-for-bit).
  *
  * Null text yields null signals; ratio signals are null when their
  * denominator is zero (empty text, no lines). Ratios round to 4 places
  * so cross-engine double formatting cannot drift.
  */
object QualitySignals {

  /** The Gopher stop-word probe set (Rae et al. 2021 use the same
    * small-closed-class trick; kept tiny and ordered for SQL parity).
    */
  val StopWords: Seq[String] =
    Seq("the", "and", "of", "to", "is", "in", "a", "that")

  private def ratio(num: Column, den: Column): Column =
    when(den > 0, round(num.cast("double") / den, 4))

  private val TermDecimal = org.apache.spark.sql.types.DecimalType(28, 6)
  private def decimalZero: Column =
    lit(java.math.BigDecimal.ZERO).cast(TermDecimal)
  /** One word-run's entropy term round(c·log2 c, 6) as exact decimal —
    * run = 0 guards log2(0) (null in Spark) to a zero term.
    */
  private def runTerm(run: Column): Column =
    when(run > 0L,
      round(run.cast("double") * log2(run.cast("double")), 6)
        .cast(TermDecimal))
      .otherwise(decimalZero)

  /** Per-doc unigram Shannon entropy in bits (the RefinedWeb/Dolma
    * low-entropy template/spam signal) as a PURE Column, shuffle-free:
    * sort the lowercased words, then ONE sequential `aggregate` fold
    * closes each equal-word run and accumulates round(c·log2 c, 6) as
    * exact DECIMAL(28,6) — the same per-term-rounded decimal terms as
    * [[TextAnalysis.wordEntropy]]'s distributed groupBy form, so the
    * two paths (and the DuckDB oracle) agree bit-for-bit. O(n log n)
    * per doc, stays inside the narrow projection; null when no words.
    */
  def wordEntropyCol(lowerWords: Column): Column = {
    val n = size(lowerWords)
    val folded = aggregate(
      array_sort(lowerWords),
      struct(lit("").as("prev"), lit(0L).as("run"),
        decimalZero.as("s")),
      (acc, w) => struct(
        w.as("prev"),
        when(w === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
          .as("run"),
        when(w === acc("prev"), acc("s"))
          .otherwise((acc("s") + runTerm(acc("run"))).cast(TermDecimal))
          .as("s")),
      acc => (acc("s") + runTerm(acc("run"))).cast(TermDecimal))
    // greatest(0, ·) inside the round: see TextAnalysis.wordEntropy —
    // rounding residue at -1e-7 must not surface as a -0.0 that
    // hash-compares differently across engines
    when(n > 0,
      round(greatest(lit(0.0),
        log2(n.cast("double")) - folded.cast("double") / n), 4))
  }

  /** All signals for a text column, in emission order. */
  def signals(text: Column): Seq[(String, Column)] = {
    // non-empty whitespace tokens / non-empty lines, shared subtrees —
    // codegen subexpression elimination evaluates each split once
    val words = filter(split(text, "\\s+"), w => w =!= "")
    val lower = transform(words, w => org.apache.spark.sql.functions.lower(w))
    val lines = filter(split(text, "\n"), l => l =!= "")
    val nWords = size(words)
    val nLines = size(lines)
    val nChars = length(text)
    val sumWordLen = aggregate(words, lit(0), (acc, w) => acc + length(w))

    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "n_lines" -> nLines,
      "mean_word_len" -> ratio(sumWordLen, nWords),
      "frac_unique_words" -> ratio(size(array_distinct(lower)), nWords),
      "frac_alpha_words" ->
        ratio(size(filter(words, w => w.rlike("[a-zA-Z]"))), nWords),
      "stopword_frac" ->
        ratio(size(filter(lower, w => w.isInCollection(StopWords))), nWords),
      "frac_digit_chars" ->
        ratio(length(regexp_replace(text, "[^0-9]", "")), nChars),
      "frac_upper_chars" ->
        ratio(length(regexp_replace(text, "[^A-Z]", "")), nChars),
      "frac_lines_end_punct" ->
        ratio(size(filter(lines, l => l.rlike("[.!?]$"))), nLines),
      "frac_short_lines" ->
        ratio(size(filter(lines, l => length(l) < 30)), nLines),
      "frac_bullet_lines" ->
        ratio(size(filter(lines, l => l.rlike("^\\s*[-*•]"))), nLines),
      "frac_ellipsis_lines" ->
        ratio(size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))), nLines),
      "word_entropy" -> wordEntropyCol(lower)
    )
  }

  /** Append the full signal vector to `df`. One narrow projection. */
  def withSignals(df: DataFrame, textCol: String): DataFrame =
    signals(col(textCol)).foldLeft(df) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }
}
