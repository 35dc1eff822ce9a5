package graft.filters

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pluggable document-quality scorer stage — SURVEY.md §2.12 L4, the
  * engine-side surface of the reference's external LLM-judge flow
  * (/root/reference/utils/llm_judge.py).
  *
  * The reference scores each document 0–5 with an external model, writes
  * the score into a column, and — crucially — is RESUMABLE BY SCORE
  * VALUE: on restart it re-scores only rows whose score is missing,
  * negative, above the scale, or an error marker
  * (llm_judge.py:216-226), keeping every already-valid score untouched.
  * It then reports per-file and global score distributions
  * (llm_judge.py:345-416).
  *
  * Spark-first mapping: a scorer is any `Column => Column` (a codegen'd
  * expression, a broadcast-model UDF like [[FastTextModel]], or a stub),
  * so the whole stage stays declarative — scoring is one narrow
  * projection, resume-with-repair is a `when(valid, old).otherwise(new)`
  * coalesce over the same pass (no shuffle, no driver loop), and the
  * distributions are relational aggregations. The external-API batching
  * and retry queue of the reference is transport, not engine semantics,
  * and is deliberately out of scope; any real scorer plugs in as the
  * `Scorer` function.
  */
object JudgeScorer {

  /** A scorer maps the text column to an integer score column. */
  type Scorer = Column => Column

  /** Deterministic structural stub scorer (0..maxScore) for tests and
    * offline runs: text length plus 'e'-count, mod the scale.
    * SQL-expressible on purpose so the driver's DuckDB oracle can verify
    * the stage end to end (`(2*length(t) - length(translate(t,'e','')))
    * % (maxScore+1)`).
    */
  def stubScorer(maxScore: Int = 5): Scorer = textCol =>
    pmod(length(textCol) * 2 - length(translate(textCol, "e", "")),
      lit(maxScore + 1)).cast("int")

  /** Valid = present, on the 0..maxScore scale, and INTEGRAL
    * (llm_judge.py:216-226: NaN, negative — including the reference's -1
    * error marker — and above-scale values are all re-scored; the scale
    * is integer, so a fractional value like 4.5 in a double column is a
    * malformed score, not a valid one — without the floor check `repair`
    * would keep it and silently truncate it to 4 via the int cast).
    */
  def isValid(scoreCol: Column, maxScore: Int = 5): Column =
    scoreCol.isNotNull && scoreCol >= 0 && scoreCol <= maxScore &&
      scoreCol === floor(scoreCol)

  /** Fresh scoring pass: adds/overwrites `scoreCol` for every row. */
  def score(df: DataFrame, scorer: Scorer,
            textCol: String = "text",
            scoreCol: String = "judge_score"): DataFrame =
    df.withColumn(scoreCol, scorer(col(textCol)))

  /** Resume-with-repair: re-score ONLY rows whose existing score is
    * invalid, keep valid scores byte-for-byte. One narrow projection —
    * at 100 TB the resumed run's cost is proportional to the scorer
    * evaluations actually needed, and nothing shuffles.
    */
  def repair(df: DataFrame, scorer: Scorer,
             textCol: String = "text",
             scoreCol: String = "judge_score",
             maxScore: Int = 5): DataFrame =
    df.withColumn(scoreCol,
      when(isValid(col(scoreCol), maxScore), col(scoreCol).cast("int"))
        .otherwise(scorer(col(textCol))))

  /** Wrap an external BATCH transport (the reference's HTTP judge
    * endpoint shape — llm_judge.py:102-173 scores texts in batches with
    * a failed-batch retry queue) as a scoring stage. Per partition,
    * texts stream through `transport` in `batchSize` groups (bounded
    * memory: one batch buffered at a time); a transport failure or
    * malformed answer (None) lands as the reference's `-1` error marker,
    * which [[repair]] — the engine's retry queue — re-scores on the next
    * pass, touching ONLY the failed rows. So the reference's
    * score-with-retries flow is `scoreBatched` → `repair*`, and the
    * HTTP/threading itself stays out of engine scope: any `Seq[String]
    * => Seq[Option[Int]]` plugs in.
    */
  def scoreBatched(df: DataFrame,
                   transport: Seq[String] => Seq[Option[Int]],
                   textCol: String = "text",
                   scoreCol: String = "judge_score",
                   batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val inSchema = df.schema
    val tIdx = inSchema.fieldIndex(textCol)
    val outSchema = org.apache.spark.sql.types.StructType(
      inSchema.fields.filterNot(_.name == scoreCol) :+
        org.apache.spark.sql.types.StructField(scoreCol,
          org.apache.spark.sql.types.IntegerType, nullable = false))
    val dropIdx =
      if (inSchema.fieldNames.contains(scoreCol)) inSchema.fieldIndex(scoreCol)
      else -1
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val scores =
          try transport(batch.map(r => r.getString(tIdx)))
          catch { case scala.util.control.NonFatal(_) =>
            Seq.fill(batch.size)(None) }
        val padded =
          if (scores.length == batch.size) scores
          else Seq.fill(batch.size)(None) // size-mismatched answer = failed
        batch.zip(padded).map { case (r, s) =>
          val base = r.toSeq.zipWithIndex.collect {
            case (v, i) if i != dropIdx => v
          }
          org.apache.spark.sql.Row.fromSeq(base :+ s.getOrElse(-1))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Minimal thread-safe token bucket for transport rate limiting.
    * `ratePerSec` permits refill continuously up to a burst of
    * `ratePerSec` (one second of headroom). Clock and sleep are
    * injectable so tests run on a fake timeline. Threads sleep inside
    * the monitor by design: every waiter is rate-bound anyway, and a
    * single queue keeps wakeups fair-enough for a per-process API cap.
    */
  final class TokenBucket(val ratePerSec: Double,
                          nanoTime: () => Long = () => System.nanoTime(),
                          sleep: Long => Unit = Thread.sleep) {
    require(ratePerSec > 0.0, "ratePerSec must be positive")
    private[this] var tokens = ratePerSec // start with one second's burst
    private[this] var last = nanoTime()
    def acquire(): Unit = synchronized {
      while (true) {
        val now = nanoTime()
        tokens = math.min(ratePerSec,
          tokens + (now - last) * 1e-9 * ratePerSec)
        last = now
        if (tokens >= 1.0) { tokens -= 1.0; return }
        val waitMs =
          math.ceil((1.0 - tokens) / ratePerSec * 1000.0).toLong.max(1L)
        sleep(waitMs)
      }
    }
  }

  /** Per-JVM limiter registry: transport instances deserialize fresh per
    * task, so instance-held state would rate-limit per TASK; executors
    * need one bucket per (executor JVM, limiter id) for the cap to mean
    * "this worker's share of the API budget".
    */
  private val limiters =
    new java.util.concurrent.ConcurrentHashMap[String, TokenBucket]

  /** Wrap a raw batch transport with the operational behavior of the
    * reference's threaded HTTP judge loop (llm_judge.py:102-173): a
    * token-bucket rate limit (requests/sec per executor JVM) and
    * bounded exponential-backoff retries of FAILED BATCHES (exception
    * or malformed/size-mismatched answer). A batch that stays failed
    * after `maxRetries` retries returns all-None — [[scoreBatched]]
    * turns that into the reference's `-1` error markers, and [[repair]]
    * (the resume queue) re-scores exactly those rows on the next pass.
    * Per-item Nones inside an otherwise well-formed answer are NOT
    * retried here: they are item-level judge failures, which the
    * reference also defers to its repair pass rather than re-posting
    * the batch.
    *
    * The HTTP client itself stays out of engine scope — `inner` is any
    * `Seq[String] => Seq[Option[Int]]`. `sleep`/`nanoTime` are
    * injectable so the backoff/limit logic is testable on a fake
    * timeline without real waiting.
    */
  def retryingTransport(inner: Seq[String] => Seq[Option[Int]],
                        maxRetries: Int = 3,
                        backoffMs: Long = 200L,
                        ratePerSec: Double = 0.0,
                        limiterId: String = "judge",
                        sleep: Long => Unit = Thread.sleep,
                        nanoTime: () => Long = () => System.nanoTime())
      : Seq[String] => Seq[Option[Int]] = {
    require(maxRetries >= 0 && backoffMs >= 0, "invalid retry config")
    new (Seq[String] => Seq[Option[Int]]) with Serializable {
      def apply(batch: Seq[String]): Seq[Option[Int]] = {
        var attempt = 0
        while (attempt <= maxRetries) {
          if (ratePerSec > 0.0) {
            val bucket = limiters.computeIfAbsent(limiterId,
              _ => new TokenBucket(ratePerSec, nanoTime, sleep))
            // the registry keys on limiterId only: a second transport
            // re-using the id with a DIFFERENT rate would silently
            // inherit the first bucket's rate — fail loudly instead
            require(bucket.ratePerSec == ratePerSec,
              s"rate limiter '$limiterId' already registered at " +
                s"${bucket.ratePerSec}/s (requested $ratePerSec/s) — use " +
                "a distinct limiterId for a different rate")
            bucket.acquire()
          }
          val answer =
            try {
              val a = inner(batch)
              if (a != null && a.length == batch.length) Some(a) else None
            } catch { case scala.util.control.NonFatal(_) => None }
          answer match {
            case Some(a) => return a
            case None =>
              if (attempt < maxRetries && backoffMs > 0)
                sleep(backoffMs << attempt) // exponential backoff
          }
          attempt += 1
        }
        Seq.fill(batch.length)(None) // exhausted → repair queue
      }
    }
  }

  /** Score distribution — count and within-group share per score value,
    * globally (`groupCols` empty) or per group (the reference's per-file
    * stats; llm_judge.py:345-416 prints count + pct per score). One
    * partial+final aggregation plus a broadcast-sized window over the
    * score-cardinality rows.
    */
  def distribution(df: DataFrame, scoreCol: String = "judge_score",
                   groupCols: Seq[String] = Seq.empty): DataFrame = {
    val keys = groupCols.map(col) :+ col(scoreCol)
    val counts = df.groupBy(keys: _*).agg(count(lit(1)).as("cnt"))
    val w =
      if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(groupCols.map(col): _*)
    counts.withColumn("share",
      round(col("cnt") / sum(col("cnt")).over(w), 4))
  }
}
