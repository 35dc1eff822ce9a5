package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.model.PipelineConfig
import graft.pipeline.CorpusPipeline

/** Structured-Streaming facade over the batch pipeline.
  *
  * The reference has no true streaming — its incrementality is file-level
  * resume (skip-if-output-exists, /root/reference/fasttext/mult_infer.py:
  * 162-164; executor skip_completed, 1_local:71). `readStream` over the
  * landing directory + `Trigger.AvailableNow` + `checkpointLocation`
  * reproduces exactly that contract with engine-managed bookkeeping: each
  * run drains whatever files are new since the last checkpoint and stops.
  *
  * The scoring stages (langid, heuristics, scrub, perplexity) are
  * stateless per-row transforms, so the batch `CorpusPipeline.score` plan
  * applies to a streaming frame unchanged. Exact dedup becomes
  * `dropDuplicatesWithinWatermark` (state-bounded by the event-time
  * watermark on `warc_ts`). MinHash/CC stays batch-only — it is a global
  * iterative computation; run it as a periodic batch compaction over the
  * streamed output (documented scale pattern, not a streaming operator).
  */
object StreamingPipeline {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Streaming source over a parquet landing dir of Page rows. */
  def readPages(spark: SparkSession, inputDir: String,
                maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(pageSchema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(inputDir)
  }

  /** Stateless filter+scrub scoring on a streaming frame. */
  def scoreStream(pages: DataFrame,
                  cfg: PipelineConfig = PipelineConfig()): DataFrame =
    CorpusPipeline.score(pages, cfg)

  /** Scoring + watermarked exact dedup: duplicates arriving within
    * `watermark` of each other collapse to the first-seen row (streaming
    * replacement for the batch keep-first window, state GC'd by the
    * watermark — D3's Bloom service without the service).
    */
  def scoreDedupStream(pages: DataFrame, watermark: String = "1 hour",
                       cfg: PipelineConfig = PipelineConfig()): DataFrame =
    scoreStream(pages, cfg)
      .withColumn("content_key",
        when(col("drop_stage").isNull, xxhash64(col("scrubbed_text")))
          .otherwise(xxhash64(col("url"))))
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("content_key")
      .drop("content_key")

  /** Drain-available-and-stop run: processes every file not yet recorded
    * in `checkpointDir`, appends results to `outputDir`, stops. Calling it
    * again later picks up only new files — the reference's resume loop as
    * one engine feature.
    */
  def runAvailableNow(spark: SparkSession, inputDir: String, outputDir: String,
                      checkpointDir: String,
                      cfg: PipelineConfig = PipelineConfig()): StreamingQuery = {
    val q = scoreStream(readPages(spark, inputDir), cfg)
      .writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }
}
