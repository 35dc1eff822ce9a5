package graft

import graft.filters.{Heuristics, KneserNeyLM, Pii}
import graft.model.HeuristicConfig
import graft.pipeline.{CorpusPipeline, Synth}

/** Per-component scoring profiler: isolates the µs·core/doc cost of each
  * per-document function on the flagship hot path, outside Spark (plain
  * JVM loops over deterministic synthetic docs), at 1..N threads — so a
  * phase-level task-metrics reading ("score owns 6,517 CPU-s") can be
  * attributed to components with measurements instead of guesses, and a
  * single-JVM thread-scaling ceiling (allocation/GC contention, the
  * LmBench 0.68 finding) is visible per component rather than only in
  * the aggregate.
  *
  * Protocol: all components warm over a slice first (C2 needs the hot
  * loops compiled before any timing — the same steady-state discipline
  * as Bench), then each component times best-of-3 laps over the full doc
  * array. At `threads > 1` the doc array is striped across that many
  * plain threads (each with its own task-local state, e.g. a
  * TokenInterner), and per-doc cost is wall × threads / docs — the same
  * µs·core unit the task-metrics listener reports.
  *
  *   spark-submit --class graft.ProfileBench <jar> [nDocs=100000] [threads=1]
  *
  * Prints ONE JSON line: {"metric":"profile","n_docs":...,"threads":...,
  * "us_core_per_doc":{component:...}}.
  */
object ProfileBench {

  private def makeDocs(n: Int): Array[String] =
    Array.tabulate(n) { i =>
      Synth.cleanDoc(Synth.rngFor(7L, i.toLong), Synth.EnVocab, 8 + (i % 4))
    }

  /** Time `mk()`-produced per-thread consumers over `docs` striped across
    * `threads` threads; returns µs·core/doc (wall × threads / docs).
    * The per-doc results fold into a blackhole accumulator per thread so
    * nothing dead-code-eliminates.
    */
  private def timeComponent(docs: Array[String], threads: Int)
                           (mk: () => String => Long): Double = {
    def oneLap(): Double = {
      val hole = new java.util.concurrent.atomic.AtomicLong(0L)
      // a worker crash must FAIL the bench, not shorten the lap into a
      // plausible-but-bogus timing — first failure is rethrown after join
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { tid =>
        val th = new Thread(() => {
          try {
            val f = mk()
            var acc = 0L
            var i = tid
            while (i < docs.length) { acc ^= f(docs(i)); i += threads }
            hole.addAndGet(acc)
          } catch {
            case e: Throwable => failure.compareAndSet(null, e)
          }
        })
        th.start(); th
      }
      ts.foreach(_.join())
      if (failure.get() != null) throw failure.get()
      if (hole.get() == Long.MinValue) println("") // keep `hole` live
      (System.nanoTime() - t0) / 1e9
    }
    val wall = Seq.fill(3)(oneLap()).min
    wall * threads / docs.length * 1e6
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toInt).getOrElse(100000)
    val threads = args.lift(1).map(_.toInt).getOrElse(1)
    require(nDocs > 0 && threads > 0, "nDocs and threads must be positive")

    val docs = makeDocs(nDocs)
    val models = CorpusPipeline.defaultModels
    val heurCfg = HeuristicConfig()
    val mhCfg = graft.dedup.MinHash.Config()
    val lm = models.lm

    // heuristics_analyze_rewrite gets its own pre-built input (identical
    // docs plus a citation-scrubbed line) so the timed closure never
    // pays a per-call string concat the production path doesn't
    val rewriteDocs = docs.map(
      _ + "\nthe result was shown [citation needed] here today.")

    // name, input docs, per-thread consumer factory (returns Long so
    // results fold into the blackhole without boxing). Inputs are paired
    // DIRECTLY with their component — the old name-string dispatch meant
    // a key rename silently timed the wrong input (ADVICE r5).
    def c(name: String, mk: () => String => Long,
          input: Array[String] = docs): (String, Array[String], () => String => Long) =
      (name, input, mk)
    val components: Seq[(String, Array[String], () => String => Long)] = Seq(
      c("tokenize", () => t => lm.tokenize(t).length.toLong),
      c("perplexity_plain", () => t =>
        java.lang.Double.doubleToLongBits(lm.perplexity(t))),
      c("perplexity_interned", () => {
        val interner = new KneserNeyLM.TokenInterner()
        t => java.lang.Double.doubleToLongBits(lm.perplexity(t, interner))
      }),
      c("langid_predict", () => t =>
        java.lang.Double.doubleToLongBits(models.lang.predict(t)._2)),
      c("heuristics_analyze", () => t =>
        Heuristics.analyze(t, heurCfg).n_tokens.toLong),
      // rewriteDocs: C4 rewrites every doc, so this times the
      // NON-identity path (line-level FineWeb pass instead of a full
      // second compute); the suffix is pre-appended outside the timed
      // region so the closure shape matches heuristics_analyze
      c("heuristics_analyze_rewrite", () => t =>
        Heuristics.analyze(t, heurCfg).n_tokens.toLong, rewriteDocs),
      c("pii_scrub", () => t => Pii.scrub(t).length.toLong),
      c("clean_text", () => t => graft.text.CleanText(t).length.toLong),
      // clean_text sub-components, isolated: NFD normalization, the fold
      // loop (includes NFD), and the three-regex scrub chain alone
      c("nfd_normalize", () => t => java.text.Normalizer
        .normalize(t, java.text.Normalizer.Form.NFD).length.toLong),
      c("ascii_fold", () => t =>
        graft.text.AsciiFold(t.toLowerCase(java.util.Locale.ROOT)).length.toLong),
      // the retained reference implementation itself (shared compiled
      // patterns, exactly what production ran before the fusion) — the
      // regression sentinel cannot drift from what it claims to measure
      c("clean_regex_chain", () => t =>
        graft.text.CleanText.scrubReference(t).length.toLong),
      c("minhash_bands", () => t =>
        graft.dedup.MinHash.bandHashesOf(t, mhCfg).sum),
      c("simhash64", () => t => graft.analytics.NearDup.simhash64(t)),
      // remaining regex-bearing per-doc operators, watched for the same
      // thread-scaling collapse the clean_text chain had
      c("pii_scrub_extended", () => t => Pii.scrubExtended(t).length.toLong),
      c("segment_sentences", () => t =>
        graft.text.Segmenter.sentences(t).length.toLong),
      c("textstats_compute", () => t =>
        graft.text.TextStats.compute(t).nWords.toLong),
      // flagship INPUT-SIDE cost: one full Synth row (url/ts/html/text/
      // labels) per call — the generation work every filterScrub lap
      // pays before any scoring; the input string is ignored, a
      // per-thread counter drives the row index
      c("synth_row", () => {
        var i = 0L
        t => {
          i += 1
          val r = Synth.row(i, 1000000L, Synth.DefaultSeed)
          r.text.length.toLong + r.html.length
        }
      }))

    // global warmup: every component over a slice, twice, so C2 compiles
    // all hot loops before any lap is timed
    (1 to 2).foreach { _ =>
      components.foreach { case (_, input, mk) =>
        val f = mk()
        input.take(math.min(nDocs, 20000)).foreach(f(_))
      }
    }

    val results = components.map { case (name, input, mk) =>
      name -> timeComponent(input, threads)(mk)
    }
    val js = results
      .map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"profile","n_docs":$nDocs,"threads":$threads,"us_core_per_doc":$js}""")
  }
}
