package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text analysis for training-data pipelines: heuristic
  * language ID, quality scoring, token counting, fingerprinting. All pure
  * Column expressions (codegen'd, pushdown-friendly) — the model-based
  * variants live in graft.filters; these are the cheap screening passes
  * you run before spending model inference on a document.
  */
object TextAnalysis {

  /** Per-language marker words for the n-gram-free heuristic language ID
    * (stopword voting). Covers the corpus languages; extend per deployment.
    */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "is", "in", "that", "with"),
    "fr" -> Seq("le", "la", "les", "des", "une", "est", "dans", "pour"),
    "es" -> Seq("el", "los", "las", "para", "con", "esta", "pero", "como"),
    "de" -> Seq("der", "die", "das", "und", "ein", "mit", "ist", "für")
  )

  private def markerHits(textCol: Column, words: Seq[String]): Column = {
    val ws = split(lower(textCol), "[^a-zA-Zà-üÀ-Ü']+")
    size(filter(ws, w => w.isInCollection(words)))
  }

  /** Heuristic language ID: the language whose marker words appear most;
    * 'und' (undetermined) when nothing matches.
    */
  def langHeuristic(textCol: Column): Column = {
    val scored = Markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(markerHits(textCol, words).as("hits"), lit(lang).as("lang"))
    }
    // single evaluation of the marker-hit structs: a (0,'und') sentinel
    // rides the same greatest() — struct comparison is (hits, lang), and
    // 'und' sorts after every marker code, so an all-zero row resolves to
    // it while any positive hit count beats it. Semantically identical to
    // the old when(hits>0, lang).otherwise('und') double-greatest shape,
    // but the expensive scan provably runs once regardless of codegen
    // subexpression elimination.
    require(Markers.keys.forall(_ < "und"),
      "sentinel tie-break requires every marker code to sort before 'und'")
    val sentinel = struct(lit(0).as("hits"), lit("und").as("lang"))
    greatest(scored :+ sentinel: _*).getField("lang")
  }

  /** Composite quality score in [0,1]: length saturation × terminal-punct
    * line ratio × stopword presence. Mirrors the shape of the reference's
    * fastText-score screening (prob ∈ [0,1], keep ≥ threshold —
    * /root/reference/fasttext/mult_infer.py:105) without a model.
    */
  def qualityScore(textCol: Column): Column = {
    val words = wsTokens(textCol)
    val lenScore = least(lit(1.0), words.cast("double") / 100.0)
    val stopScore = least(lit(1.0),
      markerHits(textCol, Markers("en")).cast("double") / 5.0)
    round(lenScore * (lit(0.5) + stopScore * 0.5), 4)
  }

  /** Whitespace token count (the TokensCounter surface, SURVEY §2.2 P21).
    * The empty leading element `split` produces for empty or
    * leading-whitespace text is filtered: `wsTokens("")` is 0, not 1 —
    * the QualitySignals convention.
    */
  def wsTokens(textCol: Column): Column =
    size(filter(split(textCol, "\\s+"), w => length(w) > 0))

  /** BPE-ish subword-budget estimate: word-char count / 4 + punct count —
    * the standard chars/4 budget heuristic, as a codegen'd expression.
    */
  def bpeTokenEstimate(textCol: Column): Column =
    ceil(length(regexp_replace(textCol, "\\s+", "")).cast("double") / 4.0)
      .cast("long")

  /** 64-bit rolling (polynomial) hash over words — an order-sensitive
    * document fingerprint (same words reordered → different print),
    * complementing md5 content prints.
    */
  def rollingFingerprint(text: String): Long = {
    if (text == null) return 0L
    var h = 1125899906842597L
    val ws = graft.text.TextStats.words(text)
    var i = 0
    while (i < ws.length) {
      var j = 0
      val w = ws(i)
      while (j < w.length) { h = h * 31 + w.charAt(j); j += 1 }
      h = h * 131 + 7
      i += 1
    }
    h
  }

  val rollingFingerprintUdf = udf((t: String) => rollingFingerprint(t))

  /** Per-language stopword tables for [[stopwordFrac]] — the CCNet-style
    * own-language generalization of Gopher's English-only stop-word
    * check (Wenzek et al. 2020 use per-language resources throughout;
    * Rae et al. 2021 §A1.1 defines the English rule). Ten highest-
    * frequency function words per language; extend per deployment.
    */
  val StopwordTables: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it",
      "was", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "mit", "ein",
      "nicht", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "des", "est", "dans", "pour",
      "que", "une", "sur"),
    "es" -> Seq("el", "la", "los", "las", "es", "para", "con",
      "que", "una", "por"))

  /** Own-language stopword fraction: the quality signal computed against
    * the DOCUMENT'S language's function words, not English's — an
    * English stop-list scores every non-English page as "low quality",
    * which is a language filter in disguise, not a quality filter.
    * Languages without a table yield null (signal unavailable ≠ 0).
    * Pure Column when-chain over the tables (codegen'd, SQL-replayable);
    * at a 100+-language deployment swap the chain for a broadcast-map
    * UDF — the plan-literal form is for table sets this size.
    */
  /** ASCII-only case fold. Used instead of `lower()` wherever the value
    * must replay bit-for-bit in another SQL engine: Java (Spark) and
    * utf8proc (DuckDB) disagree on expanding/special Unicode lowercase
    * mappings (U+0130 et al.), while `translate` over the 26 ASCII
    * letters is defined identically everywhere. Non-ASCII letters pass
    * through unfolded — for the heuristic signals below they act as
    * word-boundary/identity characters consistently in both engines.
    */
  private val AsciiUpper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val AsciiLower = "abcdefghijklmnopqrstuvwxyz"
  private def asciiFoldCol(c: Column): Column =
    translate(c, AsciiUpper, AsciiLower)

  def stopwordFrac(textCol: Column, langCol: Column,
                   tables: Map[String, Seq[String]] = StopwordTables): Column = {
    val ws = split(asciiFoldCol(textCol), "[^a-z']+")
    val words = size(filter(ws, w => length(w) > 0))
    def frac(list: Seq[String]): Column = {
      val hits = size(filter(ws, w => w.isInCollection(list)))
      when(words > 0,
        round(hits.cast("double") / words.cast("double"), 4)).otherwise(0.0)
    }
    tables.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (lang, list)) => when(langCol === lang, frac(list)).otherwise(acc)
    }
  }

  /** Readability signals (Flesch 1948; Kincaid et al. 1975) plus hapax
    * fraction — the classic cheap proxies education-targeted corpus
    * filters screen on before spending classifier inference. Syllables
    * are approximated as vowel-group runs directly on the RAW text with
    * a case-folded character class (no `lower()` call: Java and
    * SQL-engine lowercasing disagree on expanding mappings like U+0130,
    * and the regex class sidesteps the divergence entirely). Sentences
    * are terminator runs `[.!?]+`, floored at 1 so a fragment without
    * punctuation is one sentence, not a division by zero. All pure
    * Column expressions — one narrow codegen projection, no shuffle.
    *
    * `hapax_frac` (words occurring exactly once / total words) is the
    * lexical-diversity complement of quality_signals' type-token ratio:
    * template spam repeats its vocabulary, so its hapax fraction
    * collapses even when raw TTR stays moderate. The nested
    * distinct×occurrence scan is O(distinct × words) per row — bounded
    * by document length, never by corpus size.
    */
  def readabilitySignals(text: Column): Seq[(String, Column)] = {
    val words = filter(split(text, "\\s+"), w => w =!= "")
    val nWords = size(words)
    // isNotNull gate: greatest(null, 1) would resurrect a 1 for null
    // text, and dropped docs must carry null signals across the board
    val nSentences = when(text.isNotNull, greatest(
      size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1)))
    val nSyllables =
      size(regexp_extract_all(text, lit("[aeiouyAEIOUY]+"), lit(0)))
    val wps = nWords.cast("double") / nSentences.cast("double")
    val spw = when(nWords > 0,
      nSyllables.cast("double") / nWords.cast("double"))
    val lw = transform(words, w => asciiFoldCol(w))
    val hapax = size(filter(array_distinct(lw),
      w => size(filter(lw, x => x === w)) === 1))
    Seq(
      "n_sentences" -> nSentences,
      "n_syllables" -> nSyllables,
      "words_per_sentence" -> round(wps, 4),
      "syllables_per_word" -> round(spw, 4),
      "flesch_ease" -> round(lit(206.835) - lit(1.015) * wps
        - lit(84.6) * spw, 4),
      "fk_grade" -> round(lit(0.39) * wps + lit(11.8) * spw
        - lit(15.59), 4),
      "hapax_frac" -> when(nWords > 0,
        round(hapax.cast("double") / nWords.cast("double"), 4)))
  }

  /** DEFLATE compression ratio (compressed/original bytes) — the entropy
    * proxy several public pipelines gate on (e.g. Dolma's document
    * filters): machine-generated boilerplate, keyword stuffing and
    * repeated templates compress far below natural prose (~0.3-0.4 for
    * English text; near-duplicated spam can reach < 0.1), while already-
    * compressed or random content sits near or above 1. One bounded
    * Deflater per call at level 6, raw mode (no zlib header bias on
    * short docs); empty/null → 1.0 (no evidence of anything). Rows-only
    * by nature — DEFLATE has no SQL form; spec pins order relations
    * (repetitive << prose << random) rather than exact bytes, which may
    * legitimately drift across zlib versions.
    */
  def compressionRatio(s: String): Double = {
    if (s == null || s.isEmpty) return 1.0
    val in = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      math.rint(out.toDouble / in.length * 10000) / 10000
    } finally d.end()
  }

  val compressionRatioUdf = udf((s: String) => compressionRatio(s))

  /** Corpus vocabulary builder — the tokenizer-training / vocab-pruning
    * prep pass every training-data pipeline needs: whitespace words →
    * global counts → frequency floor → deterministic top-k. One explode
    * + one partial+final aggregation; at 100 TB the explode carries
    * O(tokens) narrow rows into a combiner that reduces to O(vocab)
    * before the exchange, so the shuffle is vocabulary-sized, not
    * corpus-sized.
    */
  def vocabulary(df: org.apache.spark.sql.DataFrame, textCol: String,
                 minCount: Long = 1L, topK: Int = 0): org.apache.spark.sql.DataFrame = {
    val counts = df
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val ordered = counts.orderBy(col("cnt").desc, col("word"))
    if (topK > 0) ordered.limit(topK) else ordered
  }

  /** Per-document Shannon word entropy in bits — the unigram-entropy
    * quality signal (low entropy = template/keyword-stuffed/generated
    * pages; RefinedWeb and Dolma both threshold on it). Lowercased
    * whitespace words; H = log2(n) − Σ c·log2(c) / n over per-doc word
    * frequencies, the algebraic form that needs no per-word p=c/n
    * division. Σ accumulates per-term-rounded DECIMAL(28,6) so the sum
    * is exact and order-independent — bit-for-bit replayable by the
    * DuckDB oracle regardless of either engine's aggregation order
    * (the repo-wide decimal-accumulation rule for double reductions).
    * Result rounds to 4 places; docs with no words yield no row.
    *
    * Scale shape: explode carries O(tokens) narrow (id, word) rows;
    * partial aggregation combines same-doc same-word repeats map-side,
    * and both groupBys hash-partition on doc id — per-doc work, no
    * global hotspot, nothing corpus-quadratic.
    *
    * Oracle-parity note: case-folds via `lower()`, which carries the
    * known cross-engine class shared with frac_unique_words /
    * stopword_frac — Java's full case mapping vs DuckDB's utf8proc
    * simple mapping diverge on exotic points (U+0130 İ), and Java `\s`
    * vs RE2 `\S` disagree on U+000B — none of which occur in web prose
    * after the pipeline's normalization or in the fixture corpora.
    */
  def wordEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): org.apache.spark.sql.DataFrame = {
    val words = df.select(col(idCol),
      explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    words.groupBy(idCol, "w").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(
        sum("c").as("n"),
        sum(round(col("c") * log2(col("c")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(28, 6))).as("s"))
      .select(col(idCol),
        // greatest(0, ·) INSIDE the round: rounded-term residue can land
        // at -1e-7 for single-distinct-word docs, and Spark's round
        // would emit +0.0 where DuckDB's preserves -0.0 — which
        // hash-compares differently (same hazard as DomainStats
        // .diversityReport). The clamped value can never be -0.0
        // (IEEE a-b with a==b is +0.0), so round sees a clean sign.
        round(greatest(lit(0.0),
          log2(col("n")) - col("s").cast("double") / col("n")), 4)
          .as("word_entropy"))
  }

  /** All word `n`-gram shingles of a text, repeats INCLUDED — the
    * occurrence-counting sibling of [[NearDup.shingleSet]] (which
    * de-duplicates for Jaccard). Pure Column: `regexp_extract_all`
    * tokens, sliding windows via `transform(sequence(...))`; documents
    * shorter than `n` words yield the empty list.
    */
  def shingleAll(textCol: Column, n: Int): Column = {
    val words = regexp_extract_all(textCol, lit("\\S+"), lit(0))
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Character classes for [[scriptProfile]]: name → Java regex character
    * class. Scripts use the Unicode Script property (`IsLatin` etc. in
    * Java; the DuckDB oracle replays them as RE2 `\p{Latin}` — the same
    * property, different spelling), digits/space are explicit ASCII
    * classes so both engines match identical char sets.
    */
  private val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[\\p{IsLatin}]+",
    "cyrillic" -> "[\\p{IsCyrillic}]+",
    "han" -> "[\\p{IsHan}]+",
    "kana" -> "[\\p{IsHiragana}\\p{IsKatakana}]+",
    "arabic" -> "[\\p{IsArabic}]+",
    "digit" -> "[0-9]+",
    "space" -> "[ \\t\\n\\r]+")

  /** Unicode script profile: per-document fraction of characters in each
    * major script class (latin / cyrillic / han / kana / arabic / ascii
    * digits / whitespace / other) — the cheap screen that routes documents
    * to script-appropriate handling (CJK tokenization, RTL, langid
    * prefilter) and flags encoding damage (abnormal `frac_other`).
    * Scripts are disjoint by the Unicode Script property, so `other` is
    * the exact remainder (punctuation, symbols, unlisted scripts).
    *
    * Pure narrow projection — each class costs one linear
    * `regexp_replace` scan, zero UDFs, zero shuffles; at 100 TB this
    * rides the same whole-stage-codegen pass as the rest of the signal
    * vector. Fractions are round(count/chars, 4); the empty/null document
    * profiles to all-zero.
    */
  def scriptProfile(textCol: Column): Column = {
    val len = length(textCol)
    val counts = ScriptClasses.map { case (name, pat) =>
      name -> (len - length(regexp_replace(textCol, pat, "")))
    }
    val listed = counts.map(_._2).reduce(_ + _)
    val all = counts :+ ("other" -> (len - listed))
    val fracs = all.map { case (name, cnt) =>
      when(len > 0, round(cnt.cast("double") / len.cast("double"), 4))
        .otherwise(0.0).as(s"frac_$name")
    }
    struct(fracs: _*)
  }

  /** Dominant script label: argmax over [[scriptProfile]]'s script classes
    * (digit/space/other excluded — they are not scripts), ties resolved by
    * the fixed class order, 'und' when no script character appears. A
    * deterministic when-chain of >= comparisons, so a SQL oracle replays
    * it as the same CASE chain — no engine-specific argmax semantics.
    */
  def dominantScript(textCol: Column): Column = {
    val scripts = ScriptClasses.filterNot { case (n, _) =>
      n == "digit" || n == "space" }
    val counts = scripts.map { case (name, pat) =>
      name -> (length(textCol) - length(regexp_replace(textCol, pat, "")))
    }
    // first-max-wins: class i is dominant iff cnt_i > 0 and cnt_i >= every
    // LATER class count (an earlier class with the same count already won)
    val exprs = counts.zipWithIndex.map { case ((name, cnt), i) =>
      val geAllLater = counts.drop(i + 1).map(_._2)
        .foldLeft(lit(true))((a, c) => a && cnt >= c)
      (cnt > 0 && geAllLater, lit(name))
    }
    exprs.reverse.foldLeft(lit("und")) { case (acc, (cond, name)) =>
      when(cond, name).otherwise(acc)
    }
  }

  /** Corpus-wide boilerplate report: the most-repeated word `n`-gram
    * shingles with their total occurrence count and document frequency —
    * the MassiveText/RefinedWeb "most duplicated lines" diagnostic
    * (Rae et al. 2021 §A.2; Penedo et al. 2023 §3.3) adapted to shingles
    * so it also catches templated text that never shares full lines.
    * Deterministic total order: (occurrences desc, doc_freq desc,
    * shingle asc) — the top-K cut never depends on partitioning.
    *
    * 100-TB shape — measured at 2M docs / 200M shingle occurrences
    * (BENCH.md): exact doc_freq needs a `groupBy(shingle, doc)` whose
    * keys are ~all distinct (within-doc repeats are rare), so its
    * map-side combine cannot reduce ROWS — the exchange carries one row
    * per occurrence. The exact path therefore narrows the WIDTH instead
    * (doc id → xxhash64 long before the shuffle; doc_freq then counts
    * distinct 64-bit ids — collision odds n²/2^65 per shingle,
    * immaterial below ~10^9 docs sharing one shingle). The second
    * `groupBy(shingle)` reduces to shingle-vocabulary size and the
    * top-K plans as TakeOrderedAndProject (no global sort). At full
    * corpus scale pass `approxDocFreq = true`: ONE `groupBy(shingle)`
    * pass where occurrences count-combines and doc_freq rides an HLL
    * sketch (`approx_count_distinct`, mergeable map-side) — the
    * exchange shrinks from per-occurrence to per-distinct-shingle
    * (measured at 2M docs / 200M occurrences: 776 s naive exact → 595 s
    * hash-narrowed exact → 242 s single-shuffle approx, identical
    * occurrence ranking; the gap widens with corpus size). No SQL
    * oracle for the sketch, which is why the driver query pins the
    * exact form.
    */
  def boilerplateShingles(df: org.apache.spark.sql.DataFrame, idCol: String,
                          textCol: String, n: Int = 3,
                          minOccurrences: Long = 2L,
                          topK: Int = 100,
                          approxDocFreq: Boolean = false,
                          rsd: Double = 0.02): org.apache.spark.sql.DataFrame = {
    val exploded = df.select(col(idCol).as("_bp_id"),
      explode(shingleAll(col(textCol), n)).as("shingle"))
    val counts =
      if (approxDocFreq)
        exploded.groupBy("shingle")
          .agg(count(lit(1)).as("occurrences"),
            approx_count_distinct(col("_bp_id"), rsd).as("doc_freq"))
      else
        exploded
          .groupBy(col("shingle"), xxhash64(col("_bp_id")).as("_d"))
          .agg(count(lit(1)).as("_c"))
          .groupBy("shingle")
          .agg(sum("_c").as("occurrences"), count(lit(1)).as("doc_freq"))
    counts
      .filter(col("occurrences") >= minOccurrences)
      .orderBy(col("occurrences").desc, col("doc_freq").desc, col("shingle"))
      .limit(topK)
  }

  /** Corpus duplication statistic: what fraction of all word `n`-gram
    * occurrences belong to shingles that occur more than once anywhere in
    * the corpus (within-doc repeats count — RefinedWeb's
    * characters-in-duplicated-n-grams semantics, Penedo et al. 2023 §3.3,
    * at occurrence granularity). One row: total / duplicated occurrence
    * counts, distinct shingle count, and the duplicated fraction. The
    * number operators watch to decide whether a span-dedup pass is worth
    * scheduling on a new crawl slice.
    *
    * 100-TB shape: explode → one combined `groupBy(shingle)` count (map-
    * side combine reduces to shingle-vocabulary size) → a single final
    * aggregate row. No joins, no window, nothing collected.
    */
  def duplicatedGramStats(df: org.apache.spark.sql.DataFrame,
                          textCol: String,
                          n: Int = 3): org.apache.spark.sql.DataFrame =
    df.select(explode(shingleAll(col(textCol), n)).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("_c"))
      .agg(sum("_c").as("total_occurrences"),
        sum(when(col("_c") > 1, col("_c")).otherwise(0L))
          .as("dup_occurrences"),
        count(lit(1)).as("distinct_shingles"),
        round(sum(when(col("_c") > 1, col("_c")).otherwise(0L))
          .cast("double") / sum("_c"), 6).as("dup_fraction"))
}
