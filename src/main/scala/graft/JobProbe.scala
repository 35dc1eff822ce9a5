package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round probe: run one bench query (steady-state — one
  * untimed lap first) and print every Spark job/stage it launches with
  * wall duration and task counts, so per-query seconds can be attributed
  * to concrete jobs instead of guessed at.
  *
  *   spark-submit --class graft.JobProbe <jar> <queryName> [cpus=32]
  */
object JobProbe {

  private final class Rec(
      val jobs: java.util.concurrent.ConcurrentLinkedQueue[String],
      val stages: java.util.concurrent.ConcurrentLinkedQueue[String])

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_minhash_mark")
    val cpus = args.lift(1).map(_.toInt).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobprobe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def job(): Long = name match {
      case "pipeline_filter_scrub" =>
        pipeline.CorpusPipeline.score(pipeline.Synth.pages(spark, 40000L)).count()
      case "pipeline_full_dedup" =>
        pipeline.CorpusPipeline.run(pipeline.Synth.pages(spark, 40000L))
          .filter(col("keep")).count()
      case "dedup_steps" =>
        // isolate the dedup stage costs over a fixed scored checkpoint
        val t0 = System.nanoTime()
        def lap(tag: String)(f: => Long): Unit = {
          val s = System.nanoTime()
          val n = f
          println(f"  [step] $tag%-28s ${(System.nanoTime() - s) / 1e9}%7.3f s  (n=$n)")
        }
        val scored = pipeline.CorpusPipeline.score(
          pipeline.Synth.pages(spark, 40000L))
          .transform(SparkUtil.materialize)
        println(f"  [step] materialize-score          ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        lap("scan-count")(scored.count())
        lap("scan-count-again")(scored.count())
        lap("uniq-check")(
          if (dedup.ExactDedup.idIsUniqueKey(scored, "url")) 1L else 0L)
        lap("narrow-project-count")(scored.filter(col("drop_stage").isNull)
          .select("url", "warc_ts", "scrubbed_text").count())
        lap("xxhash-agg")(scored.filter(col("drop_stage").isNull)
          .select(col("url"), dedup.ExactDedup.key(Seq(col("scrubbed_text"))).as("k"))
          .agg(count(col("k"))).head().getLong(0))
        lap("full-dedup")(pipeline.CorpusPipeline.dedup(scored)
          .filter(col("keep")).count())
        0L
      case q => SparkEntry.queries(q)(spark, sfDir).count()
    }

    pipeline.CorpusPipeline.defaultModels
    job(); job() // two warm laps (plan compile + codegen + JIT)

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val stageInfo = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobInfo = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart.put(e.jobId, (e.time,
          Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobStart.getOrDefault(e.jobId, (e.time, "?"))
        jobInfo.add(f"job ${e.jobId}%3d  ${e.time - t0}%5d ms  $desc")
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        val m = si.taskMetrics
        val io =
          if (m == null) ""
          else f"  in=${m.inputMetrics.recordsRead}%7d " +
            f"sr=${m.shuffleReadMetrics.recordsRead}%7d " +
            f"sw=${m.shuffleWriteMetrics.recordsWritten}%7d " +
            f"cpu=${m.executorCpuTime / 1000000}%5d ms"
        stageInfo.add(f"stage ${si.stageId}%3d  $wall%5d ms  " +
          f"tasks=${si.numTasks}%3d$io  ${si.name.takeWhile(_ != '(').trim}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    job()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // listener drain
    spark.sparkContext.removeSparkListener(listener)
    println(f"== $name steady-state lap: $wall%.3f s ==")
    jobInfo.forEach(s => println(s))
    println("-- stages --")
    stageInfo.forEach(s => println(s))
    spark.stop()
  }
}
