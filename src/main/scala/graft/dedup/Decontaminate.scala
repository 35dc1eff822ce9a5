package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination by word n-gram overlap — the published
  * standard for training-corpus hygiene (GPT-3 appendix C / PaLM-style
  * 13-gram collision removal): a training document is contaminated when
  * it shares ANY word n-gram with the evaluation benchmark. Complements
  * the exact-text paths ([[ExactDedup.bloomDecontaminate]], anti-join
  * decontamination): those catch verbatim copies, this catches partial
  * inclusion (a benchmark question quoted inside a larger page).
  *
  * Two execution paths, chosen by the caller per benchmark size:
  *
  *  - `broadcast = true` (default; benchmarks are MB-scale): the
  *    benchmark's n-gram hash set is collected and broadcast; each
  *    corpus doc is probed by ONE narrow UDF pass — no shuffle, no
  *    explode, cost O(corpus words). The 100 TB plan: the corpus side
  *    stays a shuffle-free scan.
  *  - `broadcast = false` (benchmark too big for one executor's heap):
  *    both sides explode to (id, gram-hash) and a semi-join marks
  *    contaminated ids — shuffles O(corpus grams), always correct.
  *
  * Hashes are 64-bit FNV-1a over the joined gram words; at corpus scale
  * the false-collision probability (a clean doc dropped) is
  * |corpus grams| × |bench grams| / 2^64 — vanishing, and only ever
  * drops extra (never leaks contamination through).
  */
object Decontaminate {

  /** 64-bit FNV-1a over the n-gram's words joined by a single space. */
  private def fnv64(words: Array[String], start: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var w = 0
    while (w < n) {
      if (w > 0) { h ^= ' '; h *= 0x100000001b3L }
      val s = words(start + w)
      var i = 0
      while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
      w += 1
    }
    h
  }

  private[dedup] def gramHashes(text: String, n: Int): Array[Long] = {
    val ws = graft.text.TextStats.words(if (text == null) "" else text)
    if (ws.length < n) return Array.empty
    val out = new Array[Long](ws.length - n + 1)
    var i = 0
    while (i <= ws.length - n) { out(i) = fnv64(ws, i, n); i += 1 }
    out
  }

  /** Ceiling on the broadcast path's collected benchmark gram-hash set:
    * 64M longs ≈ 512 MB on the driver — real eval benchmarks are far
    * below it. Crossing it fails with a pointer to `broadcast = false`
    * instead of silently OOMing the driver (the Similarity.MaxHotKeys
    * lesson applied at design time).
    */
  val MaxBroadcastGrams: Long = 64L * 1024 * 1024

  /** Collect `bench`'s distinct gram hashes as a SORTED PRIMITIVE array
    * and broadcast it — 8 B per gram on the driver and every executor
    * (a boxed Set[Long] costs 40-80 B/entry, defeating the
    * [[MaxBroadcastGrams]] ≈ 512 MB guard math). Shared by the [[mark]]
    * probe and [[overlapReport]].
    */
  private def broadcastBenchGrams(bench: DataFrame, benchTextCol: String,
      n: Int): org.apache.spark.broadcast.Broadcast[Array[Long]] = {
    val gramRdd = bench.select(col(benchTextCol))
      .na.drop()
      .rdd.flatMap(r => gramHashes(r.getString(0), n))
      .distinct()
    val nGrams = gramRdd.count()
    require(nGrams <= MaxBroadcastGrams,
      s"benchmark has $nGrams distinct $n-grams (> $MaxBroadcastGrams); " +
        "too large to broadcast — use the semi-join path " +
        "(mark(broadcast = false))")
    val grams: Array[Long] = gramRdd.collect()
    java.util.Arrays.sort(grams)
    bench.sparkSession.sparkContext.broadcast(grams)
  }

  /** Adds `is_contaminated` (doc shares ≥1 word n-gram with `bench`). */
  def mark(df: DataFrame, textCol: String,
           bench: DataFrame, benchTextCol: String,
           n: Int = 13, broadcast: Boolean = true): DataFrame = {
    if (broadcast) {
      val bc = broadcastBenchGrams(bench, benchTextCol, n)
      // read the broadcast once per task, not per row (SoftReference +
      // global-lock re-deserialization trap; see bloomDecontaminate)
      val probe = udf(new (String => Boolean) with Serializable {
        @transient private lazy val sorted = bc.value
        def apply(t: String): Boolean = {
          val hs = gramHashes(t, n)
          var i = 0
          while (i < hs.length) {
            if (java.util.Arrays.binarySearch(sorted, hs(i)) >= 0) return true
            i += 1
          }
          false
        }
      })
      df.withColumn("is_contaminated", probe(col(textCol)))
    } else {
      // fresh working names (the stripPositions discipline): a caller
      // frame already carrying _k/_g would hit an ambiguous-reference
      // error on the join-back — the broadcast path has no such
      // restriction, and the two must be drop-in interchangeable
      def freshName(base: String): String = {
        var nm = base
        while (df.columns.contains(nm)) nm = nm + "_"
        nm
      }
      val (kN, gN) = (freshName("_k"), freshName("_g"))
      val gramUdf = udf((t: String) => gramHashes(t, n))
      val benchGrams = bench.select(explode(gramUdf(col(benchTextCol))).as(gN))
        .distinct()
      val docGrams = df.select(col(textCol).as("_t"))
        // uniquely tag rows by the full text hash: the join-back key.
        // (Callers with an id column can pre-project; text hash keeps the
        // API symmetric with the broadcast path.)
        .withColumn(kN, xxhash64(col("_t")))
        .select(col(kN), explode(gramUdf(col("_t"))).as(gN))
      val contaminatedKeys = docGrams.join(benchGrams, gN)
        .select(kN).distinct()
      df.join(contaminatedKeys,
          xxhash64(col(textCol)) === contaminatedKeys(kN), "left")
        .withColumn("is_contaminated", col(kN).isNotNull)
        .drop(kN)
    }
  }

  /** Survivors only: drops contaminated docs. */
  def filter(df: DataFrame, textCol: String,
             bench: DataFrame, benchTextCol: String,
             n: Int = 13, broadcast: Boolean = true): DataFrame =
    mark(df, textCol, bench, benchTextCol, n, broadcast)
      .filter(!col("is_contaminated")).drop("is_contaminated")

  /** Per-benchmark-document overlap report — the eval-hygiene summary
    * a release audit wants NEXT TO the binary contaminated/clean call:
    * for each benchmark doc, how many of its DISTINCT word n-grams
    * appear anywhere in the training corpus (`grams_total`,
    * `grams_matched`, `overlap_frac`). High-but-below-threshold
    * fractions flag paraphrase-level leakage the binary filter misses.
    *
    * Scale shape: the benchmark's gram-hash set broadcasts (same
    * `MaxBroadcastGrams` guard as [[mark]]); the CORPUS scan emits only
    * the hashes it matched — output bounded by the benchmark size, not
    * the corpus — which then semi-join the per-bench-doc gram table.
    * One corpus scan, no corpus-sized shuffle.
    */
  def overlapReport(df: DataFrame, textCol: String,
                    bench: DataFrame, benchIdCol: String,
                    benchTextCol: String, n: Int = 13,
                    broadcast: Boolean = true): DataFrame = {
    val gramUdf = udf((t: String) => gramHashes(t, n).distinct)
    val benchGramsRaw = bench.select(col(benchIdCol),
      explode(gramUdf(col(benchTextCol))).as("_g"))
    // the join path consumes the benchmark explode TWICE (semi-join
    // right side + the final per-doc join) — on the path chosen because
    // the benchmark is huge, materialize it once; the broadcast path
    // reads it once and skips the cost
    val benchGrams =
      if (broadcast) benchGramsRaw
      else graft.SparkUtil.materialize(benchGramsRaw)
    val seen =
      if (broadcast) {
        val bc = broadcastBenchGrams(bench, benchTextCol, n)
        val matchedUdf = udf(new (String => Array[Long]) with Serializable {
          @transient private lazy val sorted = bc.value
          def apply(t: String): Array[Long] = {
            val hs = gramHashes(t, n)
            val out = scala.collection.mutable.ArrayBuffer.empty[Long]
            var i = 0
            while (i < hs.length) {
              if (java.util.Arrays.binarySearch(sorted, hs(i)) >= 0) out += hs(i)
              i += 1
            }
            out.distinct.toArray
          }
        })
        df.select(explode(matchedUdf(col(textCol))).as("_g")).distinct()
      } else {
        // benchmark too big for one heap: semi-join the corpus's gram
        // hashes against the benchmark's — shuffles O(corpus grams)
        // narrow ids+hashes, always correct (mirror of mark's join path)
        df.select(explode(gramUdf(col(textCol))).as("_g")).distinct()
          .join(benchGrams.select("_g").distinct(), Seq("_g"), "left_semi")
      }
    benchGrams.join(seen.withColumn("_hit", lit(true)), Seq("_g"), "left")
      .groupBy(benchIdCol)
      .agg(count(lit(1)).as("grams_total"),
        count(col("_hit")).as("grams_matched"))
      .withColumn("overlap_frac",
        round(col("grams_matched") / col("grams_total"), 4))
  }
}
