package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("lineage_test").toString

  test("stage runs to completion and records per-bucket metrics") {
    val dir = freshDir()
    val input = Synth.pages(spark, 400L)
    val run = Lineage.runStage(input, dir, "url", nBuckets = 8,
      bucketsPerCommit = 4)(df => df.filter(length(col("text")) > 0))
    assert(run.output.count() == 400L)
    assert(run.commits.map(_.bucket).sorted == (0 until 8))
    assert(run.commits.map(_.rowsIn).sum == 400L)
    assert(run.commits.map(_.rowsOut).sum == 400L)
  }

  test("fresh run with default commit granularity scans the input once") {
    val dir = freshDir()
    val acc = spark.sparkContext.longAccumulator("scanned")
    // nondeterministic so the optimizer can't duplicate the probe into
    // both the bucket-hash and the output projection
    val counting = udf { (u: String) => acc.add(1L); u }.asNondeterministic()
    val input = Synth.pages(spark, 400L)
      .withColumn("url", counting(col("url")))
    val run = Lineage.runStage(input, dir, "url", nBuckets = 64)(identity)
    assert(run.output.count() == 400L)
    assert(run.commits.size == 64)
    assert(run.commits.map(_.rowsIn).sum == 400L)
    assert(run.commits.map(_.rowsOut).sum == 400L)
    assert(acc.value == 400L,
      s"input scanned ${acc.value / 400.0} times, expected exactly once")
  }

  test("crash mid-stage resumes from committed buckets without recompute") {
    val dir = freshDir()
    val input = Synth.pages(spark, 400L).cache()
    val poison = udf { (u: String) =>
      if (u == null) throw new RuntimeException("poison")
      u
    }

    // first attempt: second commit group fails (simulated executor crash)
    val bomb = udf { (s: String) => throw new RuntimeException("boom"); s }
    val attempt = scala.util.Try {
      Lineage.runStage(input, dir, "url", nBuckets = 8, bucketsPerCommit = 4) {
        df =>
          // fail only for buckets in the second commit group
          val failCol = when(col("_bucket") >= 4, bomb(col("url")))
            .otherwise(col("url"))
          df.withColumn("url", failCol)
      }
    }
    assert(attempt.isFailure)
    val committed = Lineage.readManifest(dir).map(_.bucket).toSet
    assert(committed == Set(0, 1, 2, 3), s"committed=$committed")

    // resume with healthy fn; count how many rows get reprocessed
    val acc = spark.sparkContext.longAccumulator("reprocessed")
    val counting = udf { (u: String) => acc.add(1L); u }
    val run2 = Lineage.runStage(input, dir, "url", nBuckets = 8,
      bucketsPerCommit = 4)(df => df.withColumn("url", counting(col("url"))))
    assert(run2.recomputedBuckets.toSet == Set(4, 5, 6, 7))
    assert(run2.output.count() == 400L)
    // only the missing buckets' rows were reprocessed (~half the corpus);
    // udf may evaluate more than once per row, so bound loosely
    val firstHalf = run2.commits.filter(c => c.bucket < 4).map(_.rowsOut).sum
    val secondHalf = run2.commits.filter(c => c.bucket >= 4).map(_.rowsOut).sum
    assert(firstHalf + secondHalf == 400L)
    assert(acc.value < 400L, s"reprocessed ${acc.value} rows, expected < 400")

    // final output identical to a clean full run
    val clean = Lineage.runStage(input, freshDir(), "url", nBuckets = 8,
      bucketsPerCommit = 8)(identity)
    val a = run2.output.select("url").as[String].collect().sorted
    val b = clean.output.select("url").as[String].collect().sorted
    assert(a.toSeq == b.toSeq)
  }

  test("re-running a completed stage is a no-op") {
    val dir = freshDir()
    val input = Synth.pages(spark, 200L)
    Lineage.runStage(input, dir, "url", nBuckets = 4)(identity)
    val acc = spark.sparkContext.longAccumulator("rerun")
    val counting = udf { (u: String) => acc.add(1L); u }
    val run2 = Lineage.runStage(input, dir, "url", nBuckets = 4)(
      df => df.withColumn("url", counting(col("url"))))
    assert(run2.recomputedBuckets.isEmpty)
    assert(acc.value == 0L)
    assert(run2.output.count() == 200L)
  }
}
