package graft

import org.apache.spark.sql.SparkSession

import graft.filters.KneserNeyLM
import graft.pipeline.Synth

/** Full-corpus distributed KN training bench: synthesize the standard
  * page corpus, run [[KneserNeyLM.trainDistributed]] over every token,
  * and report wall time plus corpus/model shape. Launched twice via
  * spark-submit at two parallelism levels (the BENCH.md N-vs-4N scaling
  * protocol):
  *
  *   spark-submit --master local[8]  --class graft.LmBench <jar> 4000000
  *   spark-submit --master local[32] --class graft.LmBench <jar> 4000000
  *
  * args: nDocs [maxVocab=0] [minCount=1]
  *
  * Best-of-2 timing (VM noise protocol); token totals come from the
  * trained model itself (sum of unigram counts = corpus tokens + one
  * `<s>` per doc), so the throughput denominator is exact, not sampled.
  */
object LmBench {

  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(4000000L)
    val maxVocab = args.lift(1).map(_.toInt).getOrElse(0)
    val minCount = args.lift(2).map(_.toLong).getOrElse(1L)

    val spark = SparkSession.builder()
      .appName("graft-lm-bench")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cores = spark.sparkContext.defaultParallelism

    val docs = Synth.pages(spark, nDocs).select("text")

    def once(): (Double, KneserNeyLM) = {
      val t0 = System.nanoTime()
      val lm = KneserNeyLM.trainDistributed(docs, "text",
        maxVocab = maxVocab, minCount = minCount,
        maxCollectedRows = 64L * 1000 * 1000)
      ((System.nanoTime() - t0) / 1e9, lm)
    }
    val (w1, _) = once()
    val (w2, lm) = once()
    val wall = math.min(w1, w2)

    val totalTokens = lm.unigram.values.sum - nDocs // minus the <s> marks
    println(
      f"""{"metric":"lm_train_full_corpus","n_docs":$nDocs,"cores":$cores,"max_vocab":$maxVocab,"min_count":$minCount,"wall_sec":$wall%.2f,"wall_first_sec":$w1%.2f,"tokens":$totalTokens,"vocab":${lm.unigram.size},"bigram_types":${lm.bigramTypes},"docs_per_sec":${(nDocs / wall).toLong},"tokens_per_sec":${(totalTokens / wall).toLong}}""")
    spark.stop()
  }
}
