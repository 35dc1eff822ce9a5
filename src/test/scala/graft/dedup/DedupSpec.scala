package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ExactDedupSpec extends SparkSpec {
  import spark.implicits._

  test("keep-first is deterministic by order columns") {
    val df = Seq(
      ("u3", 3L, "same text"), ("u1", 1L, "same text"), ("u2", 2L, "same text"),
      ("u9", 9L, "other text")
    ).toDF("url", "ts", "text")
    val out = ExactDedup.dedup(df, Seq("text"), Seq("ts", "url"))
      .select("url").as[String].collect().sorted
    assert(out.toSeq == Seq("u1", "u9"))
  }

  test("mark flags all but the first") {
    val df = Seq(("a", 1L, "x"), ("b", 2L, "x"), ("c", 3L, "y")).toDF("url", "ts", "text")
    val marked = ExactDedup.mark(df, Seq("text"), Seq("ts", "url"))
    assert(marked.filter($"is_exact_dup").select("url").as[String].collect().toSeq == Seq("b"))
  }

  test("markById matches the windowed mark exactly") {
    val rows = (0 until 200).map { i =>
      (s"u$i", (200 - i).toLong, s"text ${i % 37}")
    }
    val df = rows.toDF("url", "ts", "text")
    def flagged(m: org.apache.spark.sql.DataFrame) =
      m.filter($"is_exact_dup").select("url").as[String].collect().toSet
    val wide = flagged(ExactDedup.mark(df, Seq("text"), Seq("ts", "url")))
    val narrow = flagged(ExactDedup.markById(df, Seq("text"), Seq("ts", "url"), "url"))
    assert(wide == narrow)
    assert(narrow.nonEmpty)
  }

  test("markById with non-unique ids falls back to windowed keep-first") {
    // Common-Crawl shape: the same url recurs across snapshots. A naive
    // id-keyed join-back would mark EVERY row of a recrawled url —
    // including the keep-first row (drop-all data loss). The fallback must
    // keep exactly one row per duplicate text group.
    val df = Seq(
      // url u1 recrawled: same text twice → keep the ts=1 row
      ("u1", 1L, "same text"), ("u1", 2L, "same text"),
      // url u2 recrawled with DIFFERENT texts → both kept
      ("u2", 3L, "alpha text"), ("u2", 4L, "beta text"),
      // cross-url duplicate of alpha → dropped (u2@3 is first)
      ("u3", 5L, "alpha text")
    ).toDF("url", "ts", "text")
    val marked = ExactDedup.markById(df, Seq("text"), Seq("ts", "url"), "url")
    val kept = marked.filter(!$"is_exact_dup")
      .select("url", "ts").as[(String, Long)].collect().toSet
    assert(kept == Set(("u1", 1L), ("u2", 3L), ("u2", 4L)),
      s"wrong survivors: $kept")
    // exactly one survivor per duplicate text group — no drop-all
    assert(marked.filter(!$"is_exact_dup").count() == 3L)
  }

  test("bloom decontaminate is exact despite probabilistic prefilter") {
    val docs = (0 until 500).map(i => (i.toLong, s"document number $i body"))
      .toDF("id", "text")
    val seen = docs.filter($"id" % 5 === 0).select("text")
    val out = ExactDedup.bloomDecontaminate(docs, seen, "text",
      expectedItems = 1000L)
    val ids = out.select("id").as[Long].collect().toSet
    val expected = (0 until 500).filter(_ % 5 != 0).map(_.toLong).toSet
    assert(ids == expected)
  }

  test("ngram decontamination drops partial inclusion, keeps clean docs") {
    // the case exact-text decontamination cannot catch: a benchmark
    // question QUOTED inside a larger page
    val benchQ = "what is the capital of france in europe"
    val bench = Seq(benchQ).toDF("text")
    val corpus = Seq(
      ("quoted", s"some page intro $benchQ and trailing commentary here"),
      ("clean", "a completely unrelated page about cooking pasta dishes tonight"),
      ("short-overlap", "the capital of france appears but only four words align")
    ).toDF("id", "text")
    val marked = Decontaminate.mark(corpus, "text", bench, "text", n = 8)
      .select("id", "is_contaminated").as[(String, Boolean)].collect().toMap
    assert(marked("quoted"), "8-gram inclusion must mark contaminated")
    assert(!marked("clean"))
    assert(!marked("short-overlap"), "sub-n overlap must not mark")
  }

  test("ngram decontamination broadcast and join paths agree") {
    val pages = graft.pipeline.Synth.pages(spark, 200L)
      .select(col("url"), col("text"), col("warc_ts"))
    val cut = graft.pipeline.Synth.tsOf(20)
    val bench = pages.filter(col("warc_ts") < cut).select("text")
    val benchFirst = bench.as[String].head()
    val corpus = pages.filter(col("warc_ts") >= cut).select("url", "text")
      .unionByName(Seq(
        ("planted-contaminated", s"intro words then $benchFirst trailing text"),
        ("planted-clean", "entirely fresh words never seen in any benchmark row"))
        .toDF("url", "text"))
    def survivors(broadcastPath: Boolean) =
      Decontaminate.filter(corpus, "text", bench, "text", n = 13,
        broadcast = broadcastPath)
        .select("url").as[String].collect().toSet
    val b = survivors(true)
    val j = survivors(false)
    assert(b == j, s"paths disagree: ${(b diff j) ++ (j diff b)}")
    assert(!b.contains("planted-contaminated"))
    assert(b.contains("planted-clean"))
  }

  test("overlap report fractions are exact; broadcast and join paths agree") {
    val bench = Seq(
      (1L, "alpha beta gamma delta"),   // 2 distinct 3-grams
      (2L, "zeta eta theta iota kappa") // 3 distinct 3-grams
    ).toDF("bid", "text")
    val corpus = Seq(
      "intro alpha beta gamma outro",   // covers bench 1's first 3-gram
      "totally unrelated words here now"
    ).toDF("text")
    def report(b: Boolean) = Decontaminate
      .overlapReport(corpus, "text", bench, "bid", "text", n = 3,
        broadcast = b)
      .select("bid", "grams_total", "grams_matched", "overlap_frac")
      .as[(Long, Long, Long, Double)].collect().toSet
    val bc = report(true)
    assert(bc == report(false), "overlapReport paths disagree")
    assert(bc == Set((1L, 2L, 1L, 0.5), (2L, 3L, 0L, 0.0)), s"got $bc")
  }

  test("strong key is sha256 of '|'-joined columns (reference parity)") {
    val df = Seq(("a", "b")).toDF("c1", "c2")
    val h = df.select(ExactDedup.strongKey(Seq($"c1", $"c2")).as("h"))
      .as[String].head()
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expected = md.digest("a|b".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(h == expected)
  }

  test("keepLatest keeps the newest revision per url with revision counts") {
    val df = Seq(
      ("u1", 10L, "old"), ("u1", 30L, "newest"), ("u1", 20L, "mid"),
      ("u2", 5L, "only"),
      ("u3", 7L, "a"), ("u3", 7L, "b") // ts tie → content hash breaks it
    ).toDF("url", "ts", "text")
    val out = ExactDedup.keepLatest(df, Seq("url"), "ts")
      .select("url", "text", "n_revisions")
      .as[(String, String, Long)].collect()
      .map { case (u, t, n) => u -> (t, n) }.toMap
    assert(out("u1") == ("newest", 3L))
    assert(out("u2") == ("only", 1L))
    assert(out("u3")._2 == 2L)
    assert(out.size == 3)
  }

  test("keepLatest explicit tie columns decide before the content hash") {
    val df = Seq(
      ("u", 1L, 2L, "keep: higher fetch_id"), ("u", 1L, 1L, "drop")
    ).toDF("url", "ts", "fetch_id", "text")
    val kept = ExactDedup.keepLatest(df, Seq("url"), "ts", Seq("fetch_id"))
      .select("text").as[String].head()
    assert(kept == "keep: higher fetch_id")
  }

  test("keepLatest is invariant under repartitioning and preserves column order") {
    val df = (0 until 500).map { i =>
      (s"u${i % 40}", (i * 131 % 97).toLong, s"rev $i", i)
    }.toDF("url", "ts", "text", "extra")
    def run(d: org.apache.spark.sql.DataFrame) =
      ExactDedup.keepLatest(d, Seq("url"), "ts")
        .collect().map(_.toString).sorted.toSeq
    val a = run(df.repartition(1))
    val b = run(df.repartition(13, $"extra"))
    assert(a == b)
    assert(ExactDedup.keepLatest(df, Seq("url"), "ts").columns.toSeq ==
      Seq("url", "ts", "text", "extra", "n_revisions"))
  }

  test("keepLatestById matches keepLatest; non-unique id falls back windowed") {
    val df = (0 until 500).map { i =>
      (s"u${i % 40}", (i * 131 % 97).toLong, s"rev $i", i)
    }.toDF("url", "ts", "text", "extra")
    // same total order on both paths: (ts, extra) — extra is unique, so
    // the content-hash tail of keepLatest's order is never consulted
    val wide = ExactDedup.keepLatest(df, Seq("url"), "ts", Seq("extra"))
      .collect().map(_.toString).sorted.toSeq
    val narrow = ExactDedup.keepLatestById(df, Seq("url"), "ts", "extra")
      .select("url", "ts", "text", "extra", "n_revisions")
      .collect().map(_.toString).sorted.toSeq
    assert(narrow == wide)
    // id column with duplicates → falls back to the wide form, still right
    val dupId = df.withColumn("badid", col("extra") % 7)
    val fb = ExactDedup.keepLatestById(dupId, Seq("url"), "ts", "badid",
      tieCols = Seq("extra"))
    assert(fb.columns.contains("n_revisions") && fb.count() == 40)
  }

  test("keepLatest: null timestamp never shadows a dated revision; map payload ok") {
    val df = Seq(
      ("u1", Some(5L), "dated"), ("u1", None, "undated")
    ).toDF("url", "ts", "text")
      .withColumn("meta", map(lit("k"), col("text")))
    val kept = ExactDedup.keepLatest(df, Seq("url"), "ts")
    assert(kept.select("text").as[String].head() == "dated")
    assert(kept.select(col("meta")("k")).as[String].head() == "dated")
  }
}

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // 4-word spans; doc texts built from single-spaced words
  private val footer = "subscribe to our newsletter" // one full span
  private def doc(id: Long, body: String) = (id, s"$body $footer")

  test("shared boilerplate span is removed from all but the first doc") {
    val df = Seq(
      doc(1L, "alpha beta gamma delta"),
      doc(2L, "epsilon zeta eta theta"),
      doc(3L, "iota kappa lambda mu")
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateWordSpans(df, "doc_id", "text", 4)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == s"alpha beta gamma delta $footer") // first keeps it
    assert(out(2L) == "epsilon zeta eta theta")
    assert(out(3L) == "iota kappa lambda mu")
  }

  test("exact duplicate doc is stripped to empty; partial tail never dedups") {
    val df = Seq(
      (1L, "one two three four five"), // trailing partial span "five"
      (2L, "one two three four five"),
      (3L, "five") // same text as both docs' partial span — kept (partial)
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateWordSpans(df, "doc_id", "text", 4)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "one two three four five")
    assert(out(2L) == "five") // full span deduped, partial tail kept
    assert(out(3L) == "five")
  }

  test("within-doc repeated span dedups against its own first occurrence") {
    val df = Seq(
      (1L, "a b c d a b c d tail")
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateWordSpans(df, "doc_id", "text", 4)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "a b c d tail")
  }

  test("word-span dedup is idempotent and partitioning-independent") {
    val df = graft.pipeline.Synth.pages(spark, 120L)
      .select(xxhash64(col("url")).as("doc_id"), col("text"))
    val once = SpanDedup.removeDuplicateWordSpans(df, "doc_id", "text", 5)
    val onceMap = once.as[(Long, String)].collect().toMap
    val twice = SpanDedup.removeDuplicateWordSpans(once, "doc_id", "text", 5)
      .as[(Long, String)].collect().toMap
    assert(twice == onceMap, "second pass changed text — not idempotent")
    val repart = SpanDedup.removeDuplicateWordSpans(
      df.repartition(7), "doc_id", "text", 5).as[(Long, String)].collect().toMap
    assert(repart == onceMap, "result depends on partitioning")
  }

  test("span dedup preserves caller columns named like its internals") {
    val df = Seq(
      (1L, "a b c d e f", "keepme1"),
      (2L, "a b c d e f", "keepme2")
    ).toDF("doc_id", "text", "_sd_id")
    val out = SpanDedup.removeDuplicateWordSpans(df, "doc_id", "text", 3)
    assert(out.columns.toSet == df.columns.toSet)
    assert(out.select("_sd_id").as[String].collect().toSet ==
      Set("keepme1", "keepme2"))
  }

  test("line dedup removes repeated boilerplate lines, keeps short ones") {
    val footer = "subscribe to our weekly newsletter today"
    val df = Seq(
      (1L, s"unique article one\nhome\n$footer"),
      (2L, s"unique article two\nhome\n$footer"),
      (3L, s"unique article three\n$footer\ntrailing line here\n")
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateLines(df, "doc_id", "text", minWords = 3)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == s"unique article one\nhome\n$footer") // first keeps it
    assert(out(2L) == "unique article two\nhome") // short "home" survives
    assert(out(3L) == "unique article three\ntrailing line here\n") // trailing \n faithful
  }

  test("frequent-line removal strips over-threshold lines from EVERY doc, " +
      "unlike keep-first") {
    val banner = "accept all cookies to continue browsing"
    val rows = (1L to 10L).map { i =>
      (i, s"article body number $i is here\n$banner\nmenu\nunique tail $i words here")
    } :+ (11L, s"rare footer appears twice only\n$banner") :+
      (12L, "rare footer appears twice only\nlast doc body text")
    val df = rows.toDF("doc_id", "text")
    val out = SpanDedup.removeFrequentLines(df, "doc_id", "text",
      maxDocs = 5, minWords = 3).as[(Long, String)].collect().toMap
    // the banner (11 docs > 5) vanishes everywhere, FIRST doc included
    assert(!out.values.exists(_.contains(banner)))
    assert(out(1L) == "article body number 1 is here\nmenu\nunique tail 1 words here")
    // a 2-doc line stays under the threshold; "menu" (< minWords) is immune
    assert(out(11L) == "rare footer appears twice only")
    assert(out(12L) == "rare footer appears twice only\nlast doc body text")
    assert(out(2L).contains("menu"))
    // partitioning invariance + idempotence (removing frequents cannot
    // create new over-threshold lines of the same content, so a second
    // pass is a no-op)
    val repart = SpanDedup.removeFrequentLines(df.repartition(7), "doc_id",
      "text", maxDocs = 5, minWords = 3).as[(Long, String)].collect().toMap
    assert(repart == out)
    val again = SpanDedup.removeFrequentLines(
      out.toSeq.toDF("doc_id", "text"), "doc_id", "text",
      maxDocs = 5, minWords = 3).as[(Long, String)].collect().toMap
    assert(again == out)
  }

  test("frequent-line removal round-trips trailing newlines and null text") {
    val df = Seq(
      (1L, "shared boilerplate line here\nbody one\n"),
      (2L, "shared boilerplate line here\nbody two"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeFrequentLines(df, "doc_id", "text",
      maxDocs = 1, minWords = 3).as[(Long, String)].collect().toMap
    assert(out(1L) == "body one\n") // trailing newline byte-faithful
    assert(out(2L) == "body two")
    assert(out(3L) == null) // null text passes through untouched
  }

  test("substring dedup: rolling hash equals direct window hashing") {
    val words = "the quick brown fox jumps over the lazy dog again and again"
      .split(' ')
    for (n <- Seq(2, 3, 5)) {
      val rolled = SpanDedup.slidingWindowHashes(words, n)
      assert(rolled.length == words.length - n + 1)
      // direct recomputation per window must agree (no rolling drift)
      val direct = words.sliding(n).map(w =>
        SpanDedup.slidingWindowHashes(w.toArray, n)(0)).toArray
      assert(rolled.sameElements(direct), s"n=$n rolling drifted")
    }
    assert(SpanDedup.slidingWindowHashes(Array("a"), 5).isEmpty)
  }

  test("substring dedup removes a shared quote from the later doc only") {
    val quote = "to be or not to be that is the question"
    val df = Seq(
      (1L, s"first essay says $quote and moves on"),
      (2L, s"second essay also quotes $quote differently after")
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateSubstrings(df, "doc_id", "text", 10)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == s"first essay says $quote and moves on")
    assert(out(2L) == "second essay also quotes differently after")
  }

  test("substring dedup: consecutive duplicated windows merge; no window -> untouched") {
    // identical docs: doc 2 loses every window's words = everything
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),
      (3L, "short text") // fewer words than the window: untouched
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateSubstrings(df, "doc_id", "text", 3)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "a b c d e f")
    assert(out(2L) == "")
    assert(out(3L) == "short text")
  }

  test("sentence-span variant removes a repeated sentence block surgically") {
    val block = "Legal notice applies. All rights reserved." // 2 sentences
    val df = Seq(
      (1L, s"Unique opening here. $block"),
      (2L, s"Another fresh start. $block")
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateSentenceSpans(df, "doc_id", "text", 2)
      .as[(Long, String)].collect().toMap
    // spans at pos 0 differ (opening + first legal sentence), so only an
    // identical FULL 2-sentence span dedups; with 3 sentences per doc the
    // tumbling spans are [s1 s2][s3] — s3 partial, kept. Nothing equal →
    // unchanged. Now plant alignment: 4 sentences, shared back half.
    assert(out(1L) == s"Unique opening here. $block")
    assert(out(2L) == s"Another fresh start. $block")
    val aligned = Seq(
      (1L, s"First doc one. First doc two. $block"),
      (2L, s"Second doc one. Second doc two. $block")
    ).toDF("doc_id", "text")
    val out2 = SpanDedup.removeDuplicateSentenceSpans(aligned, "doc_id", "text", 2)
      .as[(Long, String)].collect().toMap
    assert(out2(1L) == s"First doc one. First doc two. $block")
    assert(out2(2L) == "Second doc one. Second doc two.")
  }

  test("within-doc line dedup keeps first occurrences in order; idempotent") {
    val df = Seq(
      (1L, "nav bar\nbody text\nnav bar\nfooter\nbody text"),
      (2L, "only line"),
      // EMPTY lines are exempt (dolma dedupe-paragraphs): they are
      // paragraph separators, not content — review-caught: a blanket
      // distinct merged every paragraph after the second
      (3L, "a\n\nb\n\na"),
      (4L, "para1\n\npara2\n\npara3"),
      (5L, null.asInstanceOf[String]) // null text stays null
    ).toDF("doc_id", "text")
    val once = df.select($"doc_id",
      SpanDedup.dedupLinesWithinDoc($"text").as("t"))
    val got = once.as[(Long, String)].collect().toMap
    assert(got(1L) == "nav bar\nbody text\nfooter")
    assert(got(2L) == "only line")
    assert(got(3L) == "a\n\nb\n")
    assert(got(4L) == "para1\n\npara2\n\npara3",
      "paragraph separators must survive")
    assert(got(5L) == null)
    // idempotence: a deduped doc passes through unchanged
    val twice = once.select($"doc_id",
      SpanDedup.dedupLinesWithinDoc($"t").as("t"))
      .as[(Long, String)].collect().toMap
    assert(twice == got)
  }

  test("cross-doc line dedup and distillation tolerate null text") {
    val df = Seq((1L, "one two three\nfour five six"),
      (2L, null.asInstanceOf[String]),
      (3L, "one two three\nseven eight nine"))
      .toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateLines(df, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out(2L) == null, "null text must pass through untouched")
    assert(out(3L) == "seven eight nine", "dup line removed")
  }
}

class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private def doc(seed: Long, lines: Int = 10): String =
    graft.pipeline.Synth.cleanDoc(graft.pipeline.Synth.rngFor(seed, 0),
      graft.pipeline.Synth.EnVocab, lines)

  test("fast per-doc signatures are bit-identical to the Catalyst path") {
    val rows = (0 until 30).map(i => (s"id$i", doc(100L + i, 3 + i % 8))) ++
      Seq(("short", "tiny doc"), ("ws", "  leading and trailing  "),
        ("empty", ""),
        // null text: NO rows on either path — unfiltered, the SQL
        // path's shingle fallback gave every null-text doc an identical
        // signature (review-caught divergence)
        ("nulldoc", null.asInstanceOf[String]),
        ("nulldoc2", null.asInstanceOf[String]))
    val df = rows.toDF("id", "text")
    def collect(sigs: org.apache.spark.sql.DataFrame) =
      sigs.select("id", "band_id", "band_hash")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val fast = collect(MinHash.signatures(df, "id", "text"))
    val sql = collect(MinHash.signaturesSql(df, "id", "text"))
    assert(fast == sql)
    assert(!fast.exists(_._1.startsWith("nulldoc")),
      "null-text docs must emit no signature rows")
  }

  test("identical docs always share every band") {
    val d = doc(1)
    val df = Seq(("a", d), ("b", d)).toDF("id", "text")
    val sigs = MinHash.signatures(df, "id", "text")
    val shared = sigs.groupBy("band_id", "band_hash").count().filter($"count" === 2).count()
    assert(shared == 14)
  }

  test("near-duplicates cluster, distinct docs do not") {
    val base = doc(2)
    val rows = Seq(
      ("a", base),
      ("b", base + "\nExtra note number one was appended to the record here."),
      ("c", base + "\nExtra note number two was appended to the record here."),
      ("d", doc(3)),
      ("e", doc(4))
    )
    implicit val s = spark
    val marked = MinHash.mark(rows.toDF("id", "text"), "id", "text")
    val clustered = marked.filter($"minhash_cluster".isNotNull)
      .select("id", "minhash_cluster").as[(String, String)].collect().toMap
    assert(clustered.keySet == Set("a", "b", "c"))
    assert(clustered.values.toSet == Set("a"))
    val dropped = marked.filter($"is_near_dup").select("id").as[String].collect().toSet
    assert(dropped == Set("b", "c"))
  }

  test("verification: estimator tracks true similarity; threshold 1.0 " +
      "keeps only identical-signature pairs; low threshold reproduces mark") {
    import org.apache.spark.sql.functions.col
    implicit val s = spark
    val base = doc(70)
    val near = base + "\nExtra sentence appended to make a near duplicate."
    val df = Seq(("a", base), ("b", base), ("c", near), ("d", doc(71)))
      .toDF("id", "text")
    // estimator sanity from the raw vectors: identical docs estimate
    // 1.0, a near-dup lands strictly between, unrelated docs near 0
    val v = MinHash.sigVectors(df, "id", "text").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1))).toMap
    def estLocal(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    assert(estLocal(v("a"), v("b")) == 1.0)
    val eNear = estLocal(v("a"), v("c"))
    assert(eNear > 0.3 && eNear < 1.0, s"near-dup estimate $eNear")
    assert(estLocal(v("a"), v("d")) < 0.2)
    // the Column estimator agrees with the hand fold exactly
    val got = Seq((v("a"), v("c"))).toDF("x", "y")
      .select(MinHash.estJaccard(col("x"), col("y"))).as[Double].head()
    assert(math.abs(got - eNear) < 1e-12)
    // threshold 1.0: only the exact twin clusters; the near-dup survives
    val strict = MinHash.mark(df, "id", "text",
      MinHash.Config(verifyThreshold = 1.0))
    assert(strict.filter($"is_near_dup").select("id").as[String]
      .collect().toSet == Set("b"))
    // reference semantics cluster the near-dup too
    val loose = MinHash.mark(df, "id", "text")
    def state(m: org.apache.spark.sql.DataFrame) =
      m.select("id", "minhash_cluster", "is_near_dup")
        .as[(String, Option[String], Boolean)].collect().toSet
    assert(loose.filter($"is_near_dup").select("id").as[String]
      .collect().toSet == Set("b", "c"))
    // a threshold below every true similarity reproduces mark exactly
    assert(state(MinHash.mark(df, "id", "text",
      MinHash.Config(verifyThreshold = 0.05))) == state(loose))
    // verified mode commits the VECTOR table under the stage dir
    val dir = java.nio.file.Files.createTempDirectory("mh_verify").toString
    val viaStage = MinHash.mark(df, "id", "text",
      MinHash.Config(verifyThreshold = 1.0), stageDir = Some(dir))
    assert(state(viaStage) == state(strict))
    assert(spark.read.parquet(s"$dir/sig_vectors").count() == 4)
    // out-of-range thresholds die loudly
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    val vecsDf = MinHash.sigVectors(df, "id", "text")
    intercept[IllegalArgumentException] {
      MinHash.verifiedEdges(empty, vecsDf, 1.5)
    }
    intercept[IllegalArgumentException] {
      MinHash.verifiedEdges(empty, vecsDf, 0.0)
    }
  }

  test("verification composes with salting: kept/removed state is " +
      "salt-invariant (full, selective, and unsalted agree)") {
    implicit val s = spark
    // one hot band group (a 24-member template cluster with small
    // per-doc variations) plus unrelated docs: exactly the shape where
    // the old connector-edge form let the salt bucketing decide which
    // pairs verification Jaccard-tested
    val base = doc(80)
    val rows = (0 until 40).map { i =>
      if (i < 24)
        (f"h$i%03d", base + s"\nTrailing marker ${i % 5} closes the record.")
      else (f"h$i%03d", doc(300 + i))
    }
    val df = rows.toDF("id", "text")
    def state(m: org.apache.spark.sql.DataFrame) =
      m.select("id", "minhash_cluster", "is_near_dup")
        .as[(String, Option[String], Boolean)].collect().toSet
    val unsalted = state(MinHash.mark(df, "id", "text",
      MinHash.Config(verifyThreshold = 0.6)))
    val salted = state(MinHash.mark(df, "id", "text",
      MinHash.Config(verifyThreshold = 0.6, saltBuckets = 8)))
    val selective = state(MinHash.mark(df, "id", "text",
      MinHash.Config(verifyThreshold = 0.6, saltBuckets = 8,
        hotBandThreshold = 4)))
    assert(salted == unsalted,
      "full salting changed the verified dedup state")
    assert(selective == unsalted,
      "selective salting changed the verified dedup state")
    // and the verified pass did bite (some near pair fell below 0.6)
    // or at minimum the template cluster was found at all
    assert(unsalted.exists(_._3), "no near-dups found in planted cluster")
  }

  test("stageDir commits signatures + clusters; a resumed run reuses them") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("mh_stage").toString
    val base = doc(50)
    val df1 = Seq(("a", base), ("b", base), ("c", doc(51)))
      .toDF("id", "text")
    val fresh = MinHash.mark(df1, "id", "text")
      .select("id", "is_near_dup").as[(String, Boolean)].collect().toMap
    val viaStage = MinHash.mark(df1, "id", "text", stageDir = Some(dir))
      .select("id", "is_near_dup").as[(String, Boolean)].collect().toMap
    // identical results, and both intermediates committed durably
    assert(viaStage == fresh)
    assert(spark.read.parquet(s"$dir/signatures").count() > 0)
    assert(spark.read.parquet(s"$dir/clusters").count() == 2) // a, b
    // resume proof: run mark over DIFFERENT text (no duplicates at all)
    // against the same stageDir — the committed signatures/clusters are
    // reused, so 'b' is still marked, which can only happen if the
    // signature pass was NOT recomputed from the new text
    val df2 = Seq(("a", doc(60)), ("b", doc(61)), ("c", doc(62)))
      .toDF("id", "text")
    val resumed = MinHash.mark(df2, "id", "text", stageDir = Some(dir))
      .select("id", "is_near_dup").as[(String, Boolean)].collect().toMap
    assert(resumed == fresh,
      "stageDir resume recomputed instead of reusing committed tables")
    // a killed write (no _SUCCESS) is NOT treated as committed
    val clDir = java.nio.file.Paths.get(dir, "clusters")
    java.nio.file.Files.delete(clDir.resolve("_SUCCESS"))
    val recomputed = MinHash.mark(df2, "id", "text", stageDir = Some(dir))
      .select("id", "is_near_dup").as[(String, Boolean)].collect().toMap
    // clusters recompute from the COMMITTED signatures (still df1's),
    // so the result is unchanged — but the _SUCCESS marker is restored
    assert(recomputed == fresh)
    assert(java.nio.file.Files.exists(clDir.resolve("_SUCCESS")))
    // flipping --minhash-verify ON against the same stageDir must NOT
    // reuse the any-shared-band cluster map: the verified mode commits
    // under its own leaf (clusters_v<threshold>), so clusters recompute
    // under the new semantics. df2 has no duplicates, so the verified
    // run finds none — reusing df1's committed clusters would have
    // marked 'b' again.
    val verified = MinHash.mark(df2, "id", "text",
      cfg = MinHash.Config(verifyThreshold = 0.5), stageDir = Some(dir))
      .select("id", "is_near_dup").as[(String, Boolean)].collect().toMap
    assert(verified.values.forall(_ == false),
      "verified resume reused the unverified cluster map")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "clusters_v0.5", "_SUCCESS")))
  }

  test("markKeepBest keeps the highest-scoring cluster member") {
    val base = doc(30)
    val rows = Seq(
      ("a", base, 1.0), // min-id member — mark() would keep THIS one
      ("b", base + "\nExtra note one appended to the record here.", 5.0),
      ("c", base + "\nExtra note two appended to the record here.", 3.0),
      ("d", doc(31), 0.1) // not a duplicate: never dropped
    )
    implicit val s = spark
    val marked = MinHash.markKeepBest(
      rows.toDF("id", "text", "quality"), "id", "text", "quality")
    val dropped = marked.filter($"is_near_dup").select("id")
      .as[String].collect().toSet
    assert(dropped == Set("a", "c"), s"got $dropped") // best member b kept
    // same clusters as mark(); only the representative choice differs
    val firstKept = MinHash.mark(rows.toDF("id", "text", "quality"),
      "id", "text").filter($"is_near_dup").select("id")
      .as[String].collect().toSet
    assert(firstKept == Set("b", "c"))
  }

  test("markAgainst flags near-dups of the reference corpus only") {
    val refBase = doc(20)
    val ref = Seq(("r1", refBase), ("r2", doc(21))).toDF("id", "text")
    val refSigs = MinHash.signatures(ref, "id", "text")
    val batch = Seq(
      ("n1", refBase), // exact copy of a reference doc
      ("n2", refBase + "\nExtra note appended to the incoming record."),
      ("n3", doc(22)), // fresh content
      ("n4", doc(23))
    ).toDF("id", "text")
    implicit val s = spark
    val marked = MinHash.markAgainst(batch, "id", "text", refSigs)
    val dup = marked.filter($"is_minhash_dup").select("id")
      .as[String].collect().toSet
    assert(dup == Set("n1", "n2"), s"got $dup")
    // survivors keep their full row; new-vs-new dups are out of scope
    val kept = MinHash.dedupAgainst(batch, "id", "text", refSigs)
      .select("id").as[String].collect().toSet
    assert(kept == Set("n3", "n4"))
    // incremental property: appending the batch's survivors to the
    // reference and re-probing marks a re-sent survivor as dup
    val grown = refSigs.unionByName(
      MinHash.signatures(batch.filter($"id" === "n3"), "id", "text"))
    val resent = MinHash.markAgainst(
      batch.filter($"id" === "n3"), "id", "text", grown)
    assert(resent.filter($"is_minhash_dup").count() == 1L)
  }

  test("verified markAgainst Jaccard-tests against a vector snapshot") {
    implicit val s = spark
    val refBase = doc(25)
    val ref = Seq(("r1", refBase), ("r2", doc(26))).toDF("id", "text")
    val refVecs = MinHash.sigVectors(ref, "id", "text")
    val batch = Seq(
      ("n1", refBase), // exact copy: estJaccard 1.0
      ("n2", refBase + "\nOne extra appended note."), // near-dup
      ("n3", doc(27)) // fresh
    ).toDF("id", "text")
    // a vector snapshot serves the UNVERIFIED path identically to a
    // band snapshot (bands derive on read)
    val unverified = MinHash.markAgainst(batch, "id", "text", refVecs)
      .filter($"is_minhash_dup").select("id").as[String].collect().toSet
    assert(unverified == Set("n1", "n2"), s"got $unverified")
    // verified at a moderate threshold: same near-dups survive the
    // Jaccard test, fresh content stays unmarked
    val verified = MinHash.markAgainst(batch, "id", "text", refVecs,
        MinHash.Config(verifyThreshold = 0.5))
      .filter($"is_minhash_dup").select("id").as[String].collect().toSet
    assert(verified == Set("n1", "n2"), s"got $verified")
    // at an impossible threshold only the EXACT copy verifies — the
    // gate now distinguishes what any-shared-band semantics cannot
    val strict = MinHash.markAgainst(batch, "id", "text", refVecs,
        MinHash.Config(verifyThreshold = 1.0))
      .filter($"is_minhash_dup").select("id").as[String].collect().toSet
    assert(strict == Set("n1"), s"got $strict")
    // verification against a band-format snapshot is a loud error
    val e = intercept[IllegalArgumentException] {
      MinHash.markAgainst(batch, "id", "text",
        MinHash.signatures(ref, "id", "text"),
        MinHash.Config(verifyThreshold = 0.5))
    }
    assert(e.getMessage.contains("vector snapshot"))
    // snapshot-static stored reps (bandReps) give identical marks to
    // the derived-in-run path
    val withReps = MinHash.markAgainst(batch, "id", "text", refVecs,
        MinHash.Config(verifyThreshold = 0.5),
        precomputedReps = Some(MinHash.bandReps(refVecs)))
      .filter($"is_minhash_dup").select("id").as[String].collect().toSet
    assert(withReps == verified, s"got $withReps")
  }

  test("connected components merge chained clusters to one representative") {
    // star edges as candidateEdges would emit: chain a<-b<-c via two bands
    val edges = Seq(("b", "a"), ("c", "b"), ("e", "d"), ("f", "d"))
      .toDF("src", "dst")
    val cl = MinHash.clusters(edges).as[(String, String)].collect().toMap
    assert(cl("a") == "a" && cl("b") == "a" && cl("c") == "a")
    assert(cl("d") == "d" && cl("e") == "d" && cl("f") == "d")
  }

  test("cc matches a driver-side union-find oracle on random graphs") {
    val rng = new scala.util.Random(7)
    val n = 60
    val edges = (1 to 80).map { _ =>
      val a = rng.nextInt(n); val b = rng.nextInt(n)
      (f"n${math.max(a, b)}%03d", f"n${math.min(a, b)}%03d")
    }.filter(e => e._1 != e._2).distinct
    // oracle
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (s1, s2) =>
      val (a, b) = (s1.drop(1).toInt, s2.drop(1).toInt)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0 until n).map(i => f"n$i%03d" -> f"n${find(i)}%03d")
      .filter { case (id, _) => edges.exists(e => e._1 == id || e._2 == id) }
      .toMap
    // both execution paths must agree with the oracle bit-for-bit
    val gotDriver = MinHash.clusters(edges.toDF("src", "dst"))
      .as[(String, String)].collect().toMap
    val gotDistributed = MinHash.clusters(edges.toDF("src", "dst"),
        driverMaxEdges = 0L)
      .as[(String, String)].collect().toMap
    assert(gotDriver == expected)
    assert(gotDistributed == expected)
  }

  test("long-id cc: driver fast path matches the distributed loop bit-for-bit") {
    // r6 extends the driver union-find to LONG ids (numeric component
    // min, exactly the distributed loop's min(lbl) over LongType); the
    // two paths must agree on random long graphs just as they do for
    // strings
    val rng = new scala.util.Random(11)
    val edges = (1 to 120).map { _ =>
      val a = rng.nextInt(80).toLong; val b = rng.nextInt(80).toLong
      (math.max(a, b), math.min(a, b))
    }.filter(e => e._1 != e._2).distinct
    val gotDriver = MinHash.clusters(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    val gotDistributed = MinHash.clusters(edges.toDF("src", "dst"),
        driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(gotDriver == gotDistributed)
    assert(gotDriver.nonEmpty)
  }

  test("distributed cc resolves a 200-link drift chain in O(log n) rounds") {
    // A near-dup CHAIN (templated pages with incremental drift: A~B, B~C,
    // … — adjacent pairs share a band, ends don't) is the adversarial
    // shape for label propagation: component diameter = chain length.
    // Pointer doubling must merge it to ONE cluster in ~log2(200) rounds;
    // the old 1-hop loop needed 200 and silently under-merged at 30.
    val edges = (1 to 200).map(i => (f"v$i%03d", f"v${i - 1}%03d"))
      .toDF("src", "dst")
    val res = MinHash.clustersWithStats(edges, driverMaxEdges = 0L)
    val cl = res.labels.as[(String, String)].collect().toMap
    assert(cl.size == 201)
    assert(cl.values.toSet == Set("v000"), s"under-merged: ${cl.values.toSet}")
    assert(res.rounds <= 10, s"took ${res.rounds} rounds for a 200-chain")
  }

  test("distributed cc fails loudly when maxIter is too small") {
    val edges = (1 to 40).map(i => (f"v$i%03d", f"v${i - 1}%03d"))
      .toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      MinHash.clustersWithStats(edges, driverMaxEdges = 0L, maxIter = 2)
    }
    assert(ex.getMessage.contains("did not reach a fixpoint"))
  }

  test("shingles of short docs fall back to whole text") {
    val df = Seq(("a", "tiny doc")).toDF("id", "text")
    val sh = df.select(explode(MinHash.shingles($"text", 5)).as("s"))
      .as[String].collect()
    assert(sh.toSeq == Seq("tiny doc"))
  }

  test("S-curve planner recovers the reference's 14x8 banding and " +
       "orders thresholds correctly") {
    // the reference's 112-hash signature at its implied ~0.72 threshold
    val ref = MinHash.planParams(0.72, 112)
    assert(ref.bands == 14 && ref.rowsPerBand == 8)
    // detection probability is monotone in s and crosses ~0.5 near the
    // planned midpoint
    val mid = math.pow(1.0 / ref.bands, 1.0 / ref.rowsPerBand)
    val pAt = MinHash.detectionProbability(mid, ref.bands, ref.rowsPerBand)
    assert(pAt > 0.4 && pAt < 0.75, s"midpoint detection $pAt")
    assert(MinHash.detectionProbability(mid - 0.2, 14, 8) < pAt)
    assert(MinHash.detectionProbability(mid + 0.2, 14, 8) > pAt)
    // a stricter threshold plans more rows per band (sharper, higher)
    val strict = MinHash.planParams(0.9, 112)
    val loose = MinHash.planParams(0.4, 112)
    assert(math.pow(1.0 / strict.bands, 1.0 / strict.rowsPerBand) >
      math.pow(1.0 / loose.bands, 1.0 / loose.rowsPerBand))
    assert(strict.rowsPerBand > loose.rowsPerBand)
    // budget respected
    assert(strict.numHashes <= 112 && loose.numHashes <= 112)
  }
}
