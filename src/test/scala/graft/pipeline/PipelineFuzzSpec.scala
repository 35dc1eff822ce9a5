package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Page

/** Hostile-input totality: one batch of adversarial crawl shapes — the
  * byte- and string-level damage a real 100-TB crawl slice actually
  * contains — through the FULL pipeline (`CorpusPipeline.run`, every
  * dedup stage on), asserting the engine's unconditional contracts:
  *
  *   1. totality — no row makes any stage throw;
  *   2. conservation — one verdict row per input row, `keep` ⇔
  *      `drop_stage IS NULL`, kept rows carry non-null scrubbed text;
  *   3. partitioning-determinism — the verdict map is bit-identical
  *      under a different input partitioning.
  *
  * The kernel-level property suite (PropertySpec) fuzzes the pieces;
  * this pins the COMPOSITION, where a piece's "can't happen" input
  * (null text reaching the scrubber, a lone surrogate reaching a regex,
  * a 100k-char single word reaching the tokenizer) is exactly what a
  * neighbor stage can produce.
  */
class PipelineFuzzSpec extends graft.SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)

  /** Adversarial page classes + seeded random filler. Urls are unique
    * except a deliberate duplicate-url block (the windowed-dedup path
    * must own it, not crash on it).
    */
  private def hostilePages: Seq[Page] = {
    val rnd = new scala.util.Random(20260821)
    val cases = Seq[(String, Array[Byte], String, String)](
      // (url-suffix, html, text, lang)
      ("empty-text", "<p>x</p>".getBytes("UTF-8"), "", "en"),
      ("null-text", "<p>y</p>".getBytes("UTF-8"), null, "en"),
      ("null-html", null, "plain text with no payload at all here", "en"),
      ("null-both", null, null, null),
      ("binary-garbage", Array.fill(4096)(rnd.nextInt().toByte),
        "text beside undecodable bytes", "en"),
      ("utf16-bom", Array[Byte](0xFF.toByte, 0xFE.toByte) ++
        "<html>\u0000a\u0000</html>".getBytes("ISO-8859-1"),
        "utf sixteen page body", "en"),
      ("zip-bomb-ish", Array.fill(65536)(0x41.toByte),
        "A" * 100000, "en"),                       // 100k-char single word
      ("newline-flood", "<br>".getBytes("UTF-8"), "\n" * 50000, "en"),
      ("control-chars", null,
        "a\u0000 b\u0001c\u0008d\u000be\u001ff\u007fg\u00adh words after controls",
        "en"),
      ("lone-surrogate", null, "broken \ud800 surrogate pair text", "en"),
      ("emoji-zwj", null,
        "family 👨‍👩‍👦 emoji " +
          "and flags 🇺🇸 in running text", "en"),
      ("rtl-mixed", null,
        "english then שלום and مرح" +
          "با mixed direction", "en"),
      ("regex-hazard", null,
        "a" * 5000 + "@" + "b" * 5000 + "." + "c" * 100, "en"), // email-ish
      ("pii-soup", null,
        "mail x@y.zz ip 999.999.999.999 255.255.255.255 card " +
          "4111 1111 1111 1111 phone +1 (555) 000-0000 end", "en"),
      ("whitespace-only", null, " \t     \r\n ", "en"),
      ("long-url-" + ("q" * 500), null, "long url page body text", "en")
    )
    val crafted = cases.zipWithIndex.map { case ((suffix, html, text, lang), i) =>
      Page(s"https://fuzz.example.org/$suffix", ts(i), html, text, lang)
    }
    // duplicate-url block: same url, three revisions
    val dups = (0 until 3).map(i =>
      Page("https://fuzz.example.org/dup", ts(100 + i), null,
        s"revision $i of the duplicated url body text", "en"))
    // seeded random filler: printable noise of random length/charset
    val filler = (0 until 200).map { i =>
      val len = rnd.nextInt(2000)
      val body = new String(Array.fill(len)(
        (rnd.nextInt(0xD7FF - 32) + 32).toChar)) // BMP, no surrogates
      Page(s"https://fuzz.example.org/r$i", ts(200 + i),
        if (rnd.nextBoolean()) body.getBytes("UTF-8") else null,
        if (rnd.nextInt(10) == 0) null else body,
        if (rnd.nextInt(10) == 0) null else "en")
    }
    crafted ++ dups ++ filler
  }

  private def runFull(df: DataFrame): DataFrame =
    CorpusPipeline.run(df)

  test("hostile batch: total, conserving, verdict-consistent") {
    val in = hostilePages
    val out = runFull(in.toDF()).persist()
    try {
      assert(out.count() == in.size, "one verdict row per input row")
      assert(out.filter(col("keep") =!= col("drop_stage").isNull).count() == 0,
        "keep must equal drop_stage IS NULL")
      assert(out.filter(col("keep") && col("scrubbed_text").isNull).count() == 0,
        "kept rows must carry scrubbed text")
      assert(out.filter(col("keep") && col("n_tokens") < 0).count() == 0,
        "token counts are non-negative")
      // the duplicate-url block resolves to at most one kept survivor
      assert(out.filter(col("url") === "https://fuzz.example.org/dup" &&
        col("keep")).count() <= 1)
    } finally out.unpersist()
  }

  test("hostile batch: verdicts invariant under repartitioning") {
    val df = hostilePages.toDF()
    def verdictMap(d: DataFrame): Map[String, (Boolean, String, String)] =
      runFull(d)
        .select(col("url"), col("warc_ts").cast("string"), col("keep"),
          col("drop_stage"), md5(coalesce(col("scrubbed_text"), lit(""))))
        .as[(String, String, Boolean, String, String)]
        .collect()
        .map(r => s"${r._1}|${r._2}" -> ((r._3, r._4, r._5))).toMap
    val a = verdictMap(df.repartition(3))
    val b = verdictMap(df.repartition(17))
    assert(a == b, "pipeline verdicts changed with input partitioning")
  }
}
