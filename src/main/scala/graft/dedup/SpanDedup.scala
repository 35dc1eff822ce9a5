package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document span deduplication — the C4 "three-sentence span"
  * rule (every span that occurs more than once in the CORPUS is removed
  * from all but its first occurrence) generalized to tumbling word- or
  * sentence-spans. Complements the document-level family: exact dedup
  * drops whole duplicate docs, MinHash drops near-duplicate docs, this
  * SURGICALLY removes repeated boilerplate spans (footers, cookie
  * banners, license blocks) while keeping the host documents.
  *
  * Reference anchor: the reference runs C4's PER-DOCUMENT line rules
  * (Heuristics.c4Process); the cross-document half of C4's dedup is this
  * operator. Kept out of the flagship pipeline by default for parity.
  *
  * Scale design (the 100-TB plan):
  *  1. Only a NARROW projection (id, span-pos, span-hash) ever shuffles
  *     — span text stays in place. One map-side-combined groupBy finds
  *     each hash's first occurrence (min (id, pos) struct), one join
  *     marks later occurrences; both are AQE-skew-safe (a viral footer
  *     span is a hot hash key, but the min-agg combines map-side and
  *     the join splits under AQE skew handling).
  *  2. Removal positions fold to one small array PER AFFECTED DOC and
  *     join back on id — typically broadcastable (only docs that lose a
  *     span appear), so the corpus-side scan is shuffle-free. Docs with
  *     no removals keep their text object untouched (no re-concat).
  *
  * Determinism: "first" is the lexicographically least (id, pos) — a
  * total order, independent of partitioning.
  */
object SpanDedup {

  /** Tumbling n-word spans over a single-space split. The split is kept
    * single-space (not general whitespace) so that reassembly via
    * `join(" ")` is byte-faithful for normalized corpora and matches the
    * SQL-oracle `string_split(text, ' ')` semantics exactly. The last
    * span may be shorter than n; only full spans are dedup-ELIGIBLE.
    */
  private[dedup] def wordSpans(text: String, n: Int): Array[String] = {
    val ws = (if (text == null) "" else text).split(' ')
    val out = new Array[String]((ws.length + n - 1) / n max 1)
    var s = 0
    while (s < out.length) {
      val from = s * n
      val until = math.min(from + n, ws.length)
      val sb = new StringBuilder
      var i = from
      while (i < until) {
        if (i > from) sb.append(' ')
        sb.append(ws(i))
        i += 1
      }
      out(s) = sb.toString
      s += 1
    }
    out
  }

  private[dedup] def sentenceSpans(text: String, n: Int): Array[String] = {
    val ss = graft.text.Segmenter.sentences(if (text == null) "" else text)
    if (ss.isEmpty) return Array("")
    val out = new Array[String]((ss.length + n - 1) / n)
    var s = 0
    while (s < out.length) {
      val from = s * n
      val until = math.min(from + n, ss.length)
      out(s) = ss.slice(from, until).mkString(" ")
      s += 1
    }
    out
  }

  /** Shared keep-first core: given the dedup-eligible occurrence table
    * (`_sd_id`, `_sd_pos`, `_sd_h`), keep each hash's lexicographically
    * least (id, pos) occurrence, fold the other positions to one array
    * per AFFECTED doc (usually broadcast under AQE — docs without
    * removals never join and never move), and rewrite affected docs'
    * text with `strip(text, removedPositions)`.
    *
    * PRECONDITION (all public entry points): `idCol` must be UNIQUE per
    * row — with a repeated id, removal positions of different rows merge
    * into one array and the join-back rewrites BOTH rows with the union,
    * silently deleting non-duplicate content. Key on a synthesized
    * unique id (e.g. xxhash64 of the full row) when the natural key can
    * recur, as `graft.Run` does.
    */
  private def stripNonFirst(df: DataFrame, idCol: String, textCol: String,
                            occ: DataFrame,
                            strip: (String, Seq[Int]) => String): DataFrame = {
    val first = occ.groupBy("_sd_h")
      .agg(min(struct(col("_sd_id"), col("_sd_pos"))).as("_sd_first"))
    val removals = occ.join(first, "_sd_h")
      .filter(struct(col("_sd_id"), col("_sd_pos")) =!= col("_sd_first"))
      .select(col("_sd_id"), col("_sd_pos"))
    stripPositions(df, idCol, textCol, removals, strip)
  }

  /** Join-back rewrite shared by every span remover: fold the removal
    * positions (`_sd_id`, `_sd_pos`) to one sorted array per AFFECTED
    * doc (usually broadcast under AQE — docs without removals never
    * join and never move) and rewrite affected docs' text with
    * `strip(text, removedPositions)`; untouched docs keep their text
    * object. Same unique-id precondition as [[stripNonFirst]].
    */
  private def stripPositions(df: DataFrame, idCol: String, textCol: String,
                             removals: DataFrame,
                             strip: (String, Seq[Int]) => String): DataFrame = {
    // join-back columns get names not present on the caller frame:
    // drop(name) removes EVERY column of that name, so a caller column
    // that happened to be called _sd_id/_sd_rm would silently vanish
    def freshName(base: String): String = {
      var n = base
      while (df.columns.contains(n)) n = n + "_"
      n
    }
    val (idN, rmN) = (freshName("_sd_id"), freshName("_sd_rm"))
    val remPerDoc = removals.groupBy("_sd_id")
      .agg(sort_array(collect_list(col("_sd_pos"))).as(rmN))
      .withColumnRenamed("_sd_id", idN)
    val stripUdf = udf(strip)
    df.join(remPerDoc, df(idCol) === col(idN), "left")
      .withColumn(textCol,
        when(col(rmN).isNull, col(textCol))
          .otherwise(stripUdf(col(textCol), col(rmN))))
      .drop(idN, rmN)
  }

  /** Core: chunk with `chunker`, drop every dedup-eligible chunk that is
    * not its hash's first (id, pos) occurrence, reassemble affected docs
    * with `sep`. `fullSpan` limits dedup to full spans (the trailing
    * partial span never dedups — C4 semantics).
    */
  private def removeDuplicate(df: DataFrame, idCol: String, textCol: String,
                              chunker: String => Array[String],
                              fullSpan: String => Boolean,
                              sep: String): DataFrame = {
    val chunkUdf = udf((t: String) => chunker(t))
    val spans = df
      .select(col(idCol).as("_sd_id"),
        posexplode(chunkUdf(col(textCol))).as(Seq("_sd_pos", "_sd_span")))
    val fullUdf = udf((s: String) => fullSpan(s))
    // narrow dedup decision: (id, pos, hash) only — span text never
    // crosses the exchange
    val narrow = spans.filter(fullUdf(col("_sd_span")))
      .select(col("_sd_id"), col("_sd_pos"),
        xxhash64(col("_sd_span")).as("_sd_h"))
    stripNonFirst(df, idCol, textCol, narrow, (t: String, rm: Seq[Int]) => {
      val chunks = chunker(t)
      val drop = rm.toSet
      val keep = chunks.indices.filterNot(drop)
      keep.map(chunks(_)).mkString(sep)
    })
  }

  /** Corpus-wide keep-first dedup of tumbling `spanWords`-word spans. */
  def removeDuplicateWordSpans(df: DataFrame, idCol: String, textCol: String,
                               spanWords: Int = 60): DataFrame = {
    require(spanWords > 0, "spanWords must be positive")
    removeDuplicate(df, idCol, textCol,
      wordSpans(_, spanWords),
      s => graft.text.TextStats.countWords(s) == spanWords &&
        !s.contains("  ") && !s.startsWith(" ") && !s.endsWith(" "),
      " ")
  }

  /** C4's actual shape: tumbling `spanSentences`-sentence spans
    * (abbreviation-aware splitter). Spans rejoin with a single space —
    * byte-faithful for single-space-normalized corpora.
    */
  def removeDuplicateSentenceSpans(df: DataFrame, idCol: String,
                                   textCol: String,
                                   spanSentences: Int = 3): DataFrame = {
    require(spanSentences > 0, "spanSentences must be positive")
    removeDuplicate(df, idCol, textCol,
      sentenceSpans(_, spanSentences),
      s => graft.text.Segmenter.sentences(s).length == spanSentences,
      " ")
  }

  /** Line-level form: each LINE is a span — the cross-document version
    * of boilerplate-line removal (nav/footer/cookie lines repeat
    * verbatim across pages). Lines rejoin with "\n" (split with -1
    * limit, so trailing newlines round-trip byte-faithfully). Only
    * lines of ≥ `minWords` words dedup-eligible: short strings like
    * "home" legitimately repeat and must not vanish corpus-wide.
    */
  def removeDuplicateLines(df: DataFrame, idCol: String, textCol: String,
                           minWords: Int = 3): DataFrame =
    removeDuplicate(df, idCol, textCol,
      // null guard like every sibling chunker (wordSpans/sentenceSpans):
      // a null-text row otherwise NPEs inside the chunk UDF
      t => if (t == null) Array.empty[String] else t.split("\n", -1),
      s => graft.text.TextStats.countWords(s) >= minWords,
      "\n")

  /** Corpus-frequency boilerplate-line removal — the rule
    * [[removeDuplicateLines]] deliberately is NOT: a line that appears
    * in MORE THAN `maxDocs` DISTINCT documents is template boilerplate
    * (cookie banners, nav bars, copyright footers) and is removed from
    * EVERY document, first occurrence included — keep-first semantics
    * would still ship one copy of every banner, and the corpus's
    * lexicographically first doc would keep ALL of them (the
    * RefinedWeb/Dolma-style document-frequency rule, public method).
    * Lines of fewer than `minWords` words are immune: short strings
    * ("home", "menu") legitimately repeat and must not vanish
    * corpus-wide. Lines split/rejoin with "\n" (-1 limit: trailing
    * newlines round-trip byte-faithfully).
    *
    * Scale shape: the occurrence table is the narrow (id, pos, hash)
    * projection — line text never crosses an exchange — built
    * zero-UDF (the eligibility word count is a codegen'd higher-order
    * filter over a single-space split, NOT [[graft.text.TextStats
    * .countWords]]'s any-whitespace walk; identical on the
    * single-space-normalized text this runs on after scrubbing, and
    * exactly replayable in SQL). The document-frequency cut is one
    * map-side-combinable count-distinct; the surviving frequent-hash
    * table is O(#boilerplate lines) — orders of magnitude below the
    * occurrence count — so the removal join broadcasts under AQE.
    * Fully SQL-expressible → oracle-checked (q_frequent_lines).
    */
  def removeFrequentLines(df: DataFrame, idCol: String, textCol: String,
                          maxDocs: Long, minWords: Int = 3): DataFrame = {
    require(maxDocs >= 1, "removeFrequentLines: maxDocs must be >= 1")
    require(minWords >= 1, "removeFrequentLines: minWords must be >= 1")
    val spans = df.select(col(idCol).as("_sd_id"),
      posexplode(split(col(textCol), "\n", -1))
        .as(Seq("_sd_pos", "_sd_span")))
    val eligible = size(filter(split(col("_sd_span"), " ", -1),
      x => x =!= lit(""))) >= minWords
    val narrow = spans.filter(eligible)
      .select(col("_sd_id"), col("_sd_pos"),
        xxhash64(col("_sd_span")).as("_sd_h"))
    val frequent = narrow.groupBy("_sd_h")
      .agg(countDistinct(col("_sd_id")).as("_sd_docs"))
      .filter(col("_sd_docs") > maxDocs)
      .select("_sd_h")
    val removals = narrow.join(frequent, "_sd_h")
      .select(col("_sd_id"), col("_sd_pos"))
    stripPositions(df, idCol, textCol, removals, (t: String, rm: Seq[Int]) => {
      val chunks = t.split("\n", -1)
      val drop = rm.toSet
      chunks.indices.filterNot(drop).map(chunks(_)).mkString("\n")
    })
  }

  /** WITHIN-document line dedup — the dolma `dedupe-paragraphs` /
    * RefinedWeb intra-doc repetition scrub: keep the FIRST occurrence
    * of each line inside a document, drop its repeats (templated pages
    * repeat nav/footer blocks several times in one page). Pure Column —
    * `array_distinct` preserves first-occurrence order (pinned in
    * SpanDedupSpec) — so the pass is narrow, zero-shuffle, zero-UDF:
    * nothing about it changes at any corpus size. The CROSS-document
    * form (one doc keeps the line corpus-wide) is
    * [[removeDuplicateLines]]; this one never looks outside the row.
    * Lines split/rejoin with "\n"; no eligibility floor — within one
    * document a repeated short line ("home") is just as much template
    * noise as a long one. EMPTY lines are exempt (dolma's
    * dedupe-paragraphs skips empty paragraphs): they are structure, not
    * content — a blanket distinct would collapse every blank-line
    * paragraph separator after the first and merge the document's
    * paragraphs. Null text stays null.
    */
  def dedupLinesWithinDoc(textCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    // r6: the line array is BOUND ONCE as a lambda variable (wrap in a
    // one-element array, transform, take element 0). The previous form
    // referenced the `split(...)` subtree both as the filter input and
    // inside `array_position` — higher-order functions evaluate
    // interpreted with no subexpression sharing, so the whole upstream
    // construction re-ran per line per row (measured 18.8 s → 1.8 s on
    // q_line_dedup_doc's synthesized-lines input under a noop sink).
    // Same values, same SQL-expressible semantics, oracle unchanged.
    when(textCol.isNull, lit(null).cast("string"))
      .otherwise(
        transform(array(split(textCol, "\n", -1)), a =>
          concat_ws("\n", filter(a,
            (x, i) => (x === lit("")) ||
              (array_position(a, x) === i.cast("long") + lit(1L)))))
          .getItem(0))
  }

  /** Per-word FNV-1a then polynomial rolling combine over every SLIDING
    * n-word window — O(words) total, vs O(words × n) for re-hashing
    * each window's characters. Index i = hash of words [i, i+n).
    */
  private[dedup] def slidingWindowHashes(words: Array[String], n: Int): Array[Long] = {
    if (words.length < n) return Array.empty
    val wh = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      var h = 0xcbf29ce484222325L
      val s = words(i)
      var j = 0
      while (j < s.length) { h ^= s.charAt(j); h *= 0x100000001b3L; j += 1 }
      wh(i) = h
      i += 1
    }
    val B = 0x9e3779b97f4a7c15L // odd multiplier, invertible mod 2^64
    var bn = 1L // B^(n-1)
    i = 1
    while (i < n) { bn *= B; i += 1 }
    val out = new Array[Long](words.length - n + 1)
    var h = 0L
    i = 0
    while (i < n) { h = h * B + wh(i); i += 1 }
    out(0) = h
    i = 1
    while (i < out.length) {
      h = (h - wh(i - 1) * bn) * B + wh(i + n - 1)
      out(i) = h
      i += 1
    }
    out
  }

  /** Exact-substring dedup (the Lee et al. 2022 "Deduplicating Training
    * Data" rule at sliding-window granularity): every `windowWords`-word
    * SLIDING window that occurs more than once in the corpus keeps only
    * its lexicographically first (id, start) occurrence — every other
    * occurrence's words are deleted. Consecutive duplicated windows
    * union into one removed region, so a long verbatim quote disappears
    * from all but the first document that carried it, at word (not
    * document or tumbling-span) granularity.
    *
    * Same scale shape as the tumbling form: only (id, start, hash)
    * shuffles (~word-count rows — the MinHash-shingle order of
    * magnitude), removed word-index arrays fold per affected doc and
    * join back; untouched docs keep their text object.
    */
  def removeDuplicateSubstrings(df: DataFrame, idCol: String,
                                textCol: String,
                                windowWords: Int = 50): DataFrame = {
    val n = windowWords
    require(n > 0, "windowWords must be positive")
    val winUdf = udf((t: String) =>
      slidingWindowHashes((if (t == null) "" else t).split(' '), n))
    val wins = df.select(col(idCol).as("_sd_id"),
      posexplode(winUdf(col(textCol))).as(Seq("_sd_pos", "_sd_h")))
    stripNonFirst(df, idCol, textCol, wins, (t: String, starts: Seq[Int]) => {
      val ws = t.split(' ')
      val gone = new java.util.BitSet(ws.length)
      starts.foreach { p =>
        var i = p
        while (i < p + n && i < ws.length) { gone.set(i); i += 1 }
      }
      val sb = new StringBuilder
      var i = 0
      while (i < ws.length) {
        if (!gone.get(i)) {
          if (sb.nonEmpty) sb.append(' ')
          sb.append(ws(i))
        }
        i += 1
      }
      sb.toString
    })
  }
}
