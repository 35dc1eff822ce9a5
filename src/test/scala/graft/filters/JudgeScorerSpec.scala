package graft.filters

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JudgeScorerSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "every engineer eventually meets the elephant"),
    (3L, "short"),
    (4L, "a b c d e f g h i j"),
    (5L, "texts with several e letters everywhere seen")
  ).toDF("doc_id", "text")

  test("fresh scoring stays on the 0..maxScore scale") {
    val scored = JudgeScorer.score(docs, JudgeScorer.stubScorer())
    val vals = scored.select("judge_score").as[Int].collect()
    assert(vals.forall(s => s >= 0 && s <= 5))
    // deterministic: same input, same scores
    val again = JudgeScorer.score(docs, JudgeScorer.stubScorer())
      .select("judge_score").as[Int].collect()
    assert(vals.toSeq == again.toSeq)
  }

  test("repair re-scores only invalid rows and keeps valid scores") {
    // plant: doc 1 valid (2), doc 2 error marker (-1), doc 3 missing,
    // doc 4 above scale (9), doc 5 valid (0)
    val planted = docs.withColumn("judge_score",
      when($"doc_id" === 1, lit(2))
        .when($"doc_id" === 2, lit(-1))
        .when($"doc_id" === 3, lit(null).cast("int"))
        .when($"doc_id" === 4, lit(9))
        .otherwise(lit(0)))
    val repaired = JudgeScorer.repair(planted, JudgeScorer.stubScorer())
      .select("doc_id", "judge_score").as[(Long, Int)].collect().toMap
    val fresh = JudgeScorer.score(docs, JudgeScorer.stubScorer())
      .select("doc_id", "judge_score").as[(Long, Int)].collect().toMap
    // valid rows untouched even where the scorer disagrees
    assert(repaired(1L) == 2 && repaired(5L) == 0)
    // invalid rows re-scored by the scorer
    assert(repaired(2L) == fresh(2L))
    assert(repaired(3L) == fresh(3L))
    assert(repaired(4L) == fresh(4L))
    // post-repair invariant: every score valid
    assert(repaired.values.forall(s => s >= 0 && s <= 5))
  }

  test("repair re-scores fractional scores instead of truncating them") {
    // ADVICE r2: 4.5 in a double column passed the old isValid and was
    // silently truncated to 4 by the int cast; integrality makes it a
    // malformed score that gets re-scored like -1/null/above-scale.
    // doc 3 ("short"): stub re-score = (2*5-5)%6 = 5, distinct from the
    // truncation result 4 — so the assertion separates the two behaviors
    val planted = docs.withColumn("judge_score",
      when($"doc_id" === 3, lit(4.5))
        .when($"doc_id" === 2, lit(3.0))
        .otherwise(lit(1.0)))
    val repaired = JudgeScorer.repair(planted, JudgeScorer.stubScorer())
      .select("doc_id", "judge_score").as[(Long, Int)].collect().toMap
    assert(repaired(3L) == 5, s"fractional score must be re-scored, got ${repaired(3L)}")
    assert(repaired(2L) == 3 && repaired(1L) == 1 && repaired(4L) == 1,
      "integral in-scale scores stay byte-for-byte")
  }

  test("repair of an already-valid frame is the identity") {
    val scored = JudgeScorer.score(docs, JudgeScorer.stubScorer())
    val repaired = JudgeScorer.repair(scored, JudgeScorer.stubScorer())
    assert(scored.exceptAll(repaired).count() == 0)
    assert(repaired.exceptAll(scored).count() == 0)
  }

  test("batched transport scoring: batch shape, failure markers, repair retry") {
    // a transport that records batch sizes and fails on texts with 'z'
    val batchSizes = spark.sparkContext.collectionAccumulator[Int]("sizes")
    val transport: Seq[String] => Seq[Option[Int]] = { texts =>
      batchSizes.add(texts.size)
      texts.map(t => if (t.contains("z")) None else Some(t.length % 6))
    }
    val docs5 = docs.repartition(1) // deterministic batching for the test
    val scored = JudgeScorer.scoreBatched(docs5, transport, batchSize = 2)
      .select("doc_id", "judge_score").as[(Long, Int)].collect().toMap
    // 'lazy' (doc 1) contains z → failed → -1 error marker
    assert(scored(1L) == -1)
    assert(scored(3L) == "short".length % 6)
    // batches respected the size cap
    batchSizes.value.forEach(s => assert(s <= 2))
    // the reference's retry queue == repair over the failed markers:
    // only doc 1 is invalid, and one repair pass fixes exactly it
    val planted = docs.withColumn("judge_score",
      when($"doc_id" === 1, lit(-1)).otherwise(lit(2)))
    val repaired = JudgeScorer.repair(planted, JudgeScorer.stubScorer())
      .select("doc_id", "judge_score").as[(Long, Int)].collect().toMap
    assert(repaired(1L) >= 0 && repaired(2L) == 2)
  }

  test("batched transport that throws or answers malformed marks the batch") {
    val transport: Seq[String] => Seq[Option[Int]] = { texts =>
      if (texts.exists(_.contains("elephant"))) throw new RuntimeException("502")
      else Seq.empty // malformed (wrong-size) answer for non-throwing batches
    }
    val scored = JudgeScorer.scoreBatched(docs.repartition(1), transport,
      batchSize = 2)
      .select("doc_id", "judge_score").as[(Long, Int)].collect()
    // every batch either threw or answered the wrong size → all -1
    assert(scored.forall(_._2 == -1))
  }

  test("retrying transport: backoff schedule, recovery, exhaustion") {
    // fake timeline: sleeps are recorded, never waited
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val flaky: Seq[String] => Seq[Option[Int]] = { texts =>
      calls += 1
      if (calls <= 2) throw new RuntimeException("503")
      texts.map(t => Some(t.length % 6))
    }
    val t = JudgeScorer.retryingTransport(flaky, maxRetries = 3,
      backoffMs = 100L, sleep = sleeps.append(_))
    val out = t(Seq("abc", "defgh"))
    assert(out == Seq(Some(3), Some(5)), "recovered answer returned")
    assert(calls == 3, "two failures + one success")
    assert(sleeps.toSeq == Seq(100L, 200L), "exponential backoff schedule")
    // exhaustion: always failing → all-None after maxRetries+1 attempts,
    // feeding scoreBatched's -1 markers / the repair queue
    var failCalls = 0
    val dead: Seq[String] => Seq[Option[Int]] =
      _ => { failCalls += 1; Seq.empty /* malformed size */ }
    val sleeps2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val t2 = JudgeScorer.retryingTransport(dead, maxRetries = 2,
      backoffMs = 50L, sleep = sleeps2.append(_))
    assert(t2(Seq("a", "b", "c")) == Seq(None, None, None))
    assert(failCalls == 3 && sleeps2.toSeq == Seq(50L, 100L))
  }

  test("retrying transport rate limit enforces the per-second budget") {
    // fake clock: time only advances when the limiter sleeps
    var now = 0L
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sleep: Long => Unit = { ms => slept += ms; now += ms * 1000000L }
    var calls = 0
    val inner: Seq[String] => Seq[Option[Int]] =
      texts => { calls += 1; texts.map(_ => Some(1)) }
    val t = JudgeScorer.retryingTransport(inner, maxRetries = 0,
      ratePerSec = 2.0, limiterId = s"test-${System.nanoTime()}",
      sleep = sleep, nanoTime = () => now)
    // burst of 2 tokens → first two calls pass without waiting, the
    // third must wait ~500ms (one token at 2/sec)
    t(Seq("a")); t(Seq("b"))
    assert(slept.isEmpty, s"burst calls must not wait: $slept")
    t(Seq("c"))
    assert(slept.sum >= 500L, s"third call under-waited: $slept")
    assert(calls == 3)
  }

  test("retrying transport composes with scoreBatched end to end") {
    // batches containing 'z' fail twice then succeed — with retries the
    // whole frame scores cleanly, no -1 markers
    val attempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]
    val flaky: Seq[String] => Seq[Option[Int]] = { texts =>
      val key = texts.mkString("|")
      val n = attempts.merge(key, 1, (a, b) => a + b)
      if (texts.exists(_.contains("z")) && n <= 2)
        throw new RuntimeException("503")
      texts.map(t => Some(t.length % 6))
    }
    val t = JudgeScorer.retryingTransport(flaky, maxRetries = 3,
      backoffMs = 0L)
    val scored = JudgeScorer.scoreBatched(docs.repartition(1), t,
      batchSize = 2)
      .select("doc_id", "judge_score").as[(Long, Int)].collect().toMap
    assert(scored.values.forall(_ >= 0),
      s"retries should have cleared every failure: $scored")
    assert(scored(3L) == "short".length % 6)
  }

  test("distribution shares sum to 1 per group; counts sum to N") {
    val df = Seq(
      ("en", 5), ("en", 5), ("en", 3), ("en", 1),
      ("fr", 2), ("fr", 2)
    ).toDF("lang", "judge_score")
    val dist = JudgeScorer.distribution(df, "judge_score", Seq("lang"))
    assert(dist.agg(sum("cnt")).head().getLong(0) == 6L)
    val perGroup = dist.groupBy("lang").agg(sum("share").as("s"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(perGroup("en") - 1.0) < 1e-6)
    assert(math.abs(perGroup("fr") - 1.0) < 1e-6)
    val en5 = dist.filter($"lang" === "en" && $"judge_score" === 5)
      .select("cnt", "share").head()
    assert(en5.getLong(0) == 2L && en5.getDouble(1) == 0.5)
    // global form: one row per score value
    val global = JudgeScorer.distribution(df, "judge_score")
    assert(global.agg(sum("share")).head().getDouble(0) == 1.0)
  }
}
