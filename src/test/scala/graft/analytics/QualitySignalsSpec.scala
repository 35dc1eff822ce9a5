package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-pinned values for every signal on crafted strings — the fixture
  * corpus is single-line lowercase prose, so the char-class and line
  * signals only get exercised here (the DuckDB oracle then re-validates
  * expression parity over the full table).
  */
class QualitySignalsSpec extends SparkSpec {
  import spark.implicits._

  private def sig(text: String): Map[String, Any] = {
    val df = Seq(Option(text)).toDF("text")
    val row = QualitySignals.withSignals(df, "text").head()
    row.schema.fieldNames.drop(1).map(n =>
      n -> (if (row.isNullAt(row.fieldIndex(n))) null
            else row.get(row.fieldIndex(n)))).toMap
  }

  test("word signals") {
    val m = sig("The cat.")
    assert(m("n_chars") == 8 && m("n_words") == 2)
    assert(m("mean_word_len") == 3.5)           // (3 + 4) / 2
    assert(m("stopword_frac") == 0.5)           // "the"
    assert(m("frac_alpha_words") == 1.0)
    assert(m("frac_upper_chars") == 0.125)      // 'T' of 8 chars
    assert(m("frac_lines_end_punct") == 1.0)
    val dup = sig("Aa aa AA")
    assert(dup("frac_unique_words") == 0.3333)  // one distinct of three
    val num = sig("abc 123")
    assert(num("frac_digit_chars") == 0.4286)   // 3 of 7
    assert(num("frac_alpha_words") == 0.5)
  }

  test("line signals") {
    val m = sig("- first\n* second\nplain line that is over thirty chars.")
    assert(m("n_lines") == 3)
    assert(m("frac_bullet_lines") == 0.6667)
    assert(m("frac_short_lines") == 0.6667)
    assert(m("frac_lines_end_punct") == 0.3333)
    val e = sig("wait...\nand then…\nno")
    assert(e("frac_ellipsis_lines") == 0.6667)
    // empty lines don't count; whitespace-only lines do (raw-line
    // semantics, matched by the oracle SQL)
    assert(sig("a\n\n\nb")("n_lines") == 2)
  }

  test("word entropy: hand-pinned bits; fold equals the groupBy form") {
    assert(sig("a a b b")("word_entropy") == 1.0)   // uniform over 2
    assert(sig("a b c d")("word_entropy") == 2.0)   // uniform over 4
    assert(sig("A a")("word_entropy") == 0.0)       // case-folds to one
    assert(sig("a a a b")("word_entropy") == 0.8113)
    // the sorted-run decimal fold must agree bit-for-bit with
    // TextAnalysis.wordEntropy's distributed explode/groupBy form
    // (same rounded decimal terms, exact sums) on real prose
    val docs = (1 to 50).map(i => (i.toLong, graft.pipeline.Synth
      .cleanDoc(graft.pipeline.Synth.rngFor(9, i),
        graft.pipeline.Synth.EnVocab, 6))).toDF("doc_id", "text")
    val fold = QualitySignals.withSignals(docs, "text")
      .select(col("doc_id"), col("word_entropy"))
      .as[(Long, Double)].collect().toMap
    val grouped = TextAnalysis.wordEntropy(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(fold == grouped,
      s"fold/groupBy entropy divergence: ${
        fold.keySet.filter(k => !grouped.get(k).contains(fold(k)))}")
  }

  test("null and empty text never divide by zero") {
    val n = sig(null)
    assert(n.values.forall(_ == null), s"null text must be all-null: $n")
    val e = sig("")
    assert(e("n_chars") == 0 && e("n_words") == 0 && e("n_lines") == 0)
    assert(e("mean_word_len") == null && e("stopword_frac") == null &&
      e("frac_lines_end_punct") == null)
  }

  test("one narrow projection: no exchange, no UDF in the plan") {
    val df = QualitySignals.withSignals(
      spark.range(10).select(col("id"), lit("some text here").as("text")),
      "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signals must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"signals must be native expressions:\n$plan")
  }
}
