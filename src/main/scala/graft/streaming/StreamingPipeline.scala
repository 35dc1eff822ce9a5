package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.model.PipelineConfig
import graft.pipeline.CorpusPipeline

/** Narrow keyed row for the custom-state dedup operator: content key,
  * identity, event time, and how many duplicates of the key this row had
  * already seen when emitted.
  */
case class KeyedDoc(key: Long, url: String, warc_ts: java.sql.Timestamp,
                    dups_seen: Long)

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

  /** Stream-static near-dup gate: drop arriving pages that near-
    * duplicate a STORED reference corpus ([[graft.dedup.MinHash
    * .signatures]] snapshot, e.g. yesterday's corpus, read as a static
    * frame) and append survivors to `outputDir`. The anti-join's probe
    * side derives from the stream itself, which Structured Streaming
    * cannot plan as a stream-stream join — so each micro-batch runs the
    * BATCH operator ([[graft.dedup.MinHash.dedupAgainst]]) via
    * `foreachBatch`, the sanctioned shape for per-batch static joins.
    * No state store involved: the reference is immutable within a run
    * (restart the query on a new snapshot to refresh — checkpointed
    * progress carries over). Complements [[dedupFirstSeenStream]],
    * which dedups the stream against ITSELF.
    */
  def runDedupAgainst(spark: SparkSession, inputDir: String,
                      outputDir: String, checkpointDir: String,
                      refSigs: DataFrame, idCol: String = "url",
                      textCol: String = "text",
                      cfg: graft.dedup.MinHash.Config =
                        graft.dedup.MinHash.Config()): StreamingQuery =
    readPages(spark, inputDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // foreachBatch is at-least-once: a retried micro-batch must not
        // double its survivors, so each batch OVERWRITES its own
        // batchId-keyed subdirectory (idempotent replay; readers load
        // the whole tree). cfg MUST match the one refSigs was built
        // with or band hashes never collide and everything leaks.
        graft.dedup.MinHash.dedupAgainst(batch, idCol, textCol, refSigs, cfg)
          .write.mode("overwrite").parquet(s"$outputDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Semantic twin of [[runDedupAgainst]]: gate an embedding-bearing
    * stream against a static reference set in EMBEDDING space
    * ([[graft.analytics.SemDedup.markAgainst]] — paraphrased benchmark
    * leakage that n-gram/MinHash gates cannot see). Same foreachBatch
    * shape and the same idempotent batchId-keyed overwrite. Centroids
    * are trained ONCE from the reference before the query starts and
    * broadcast into every micro-batch — per-batch retraining would
    * shift cell boundaries between batches (and pay the driver-side
    * k-means on each one).
    */
  /** The gate's default centroid training, exposed for the determinism
    * pin: the sampling key is xxhash64 of the vector content, so the
    * trained set is a pure function of the reference's ROW SET — any
    * repartitioning/re-reading of the same reference trains bit-identical
    * centroids (StreamingSpec pins this against a `repartition(7)` copy).
    */
  def gateCentroids(reference: DataFrame, vecCol: String, nClusters: Int,
                    seed: Long = 42L): Array[Array[Double]] = {
    val refKeyed = reference.withColumn("_ref_id",
      org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col(vecCol).cast("array<double>")))
    graft.analytics.Similarity.trainCentroids(
      refKeyed, "_ref_id", vecCol,
      k = nClusters, sampleN = math.max(4096, nClusters), seed = seed)
  }

  def runSemGateAgainst(spark: SparkSession, inputDir: String,
                        outputDir: String, checkpointDir: String,
                        reference: DataFrame, idCol: String = "vec_id",
                        vecCol: String = "embedding", eps: Double = 0.05,
                        nClusters: Int = 64, nProbe: Int = 2,
                        seed: Long = 42L,
                        trainedCentroids: Option[Array[Array[Double]]] =
                          None): StreamingQuery = {
    // the training-sample key is derived from the VECTOR CONTENT, never
    // from monotonically_increasing_id: the latter depends on the
    // reference frame's partition layout, so a repartitioned (or simply
    // re-read) reference would train a different centroid set — and the
    // gate's cell boundaries, hence its hit/miss decisions near them,
    // would drift between query restarts. Content keying makes the
    // trained centroids a pure function of the reference SET, matching
    // the saveCentroids/loadCentroids discipline; long-lived deployments
    // pass `trainedCentroids` (Similarity.loadCentroids) and skip
    // training entirely.
    val centroids = trainedCentroids.getOrElse(
      gateCentroids(reference, vecCol, nClusters, seed))
    val schema = spark.read.parquet(inputDir).schema
    val idType = schema(idCol).dataType
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val marks = graft.analytics.SemDedup.markAgainst(
          batch, reference, idCol, vecCol, eps, nClusters, nProbe,
          seed = seed, trainedCentroids = Some(centroids))
        // cast the SMALL (kept-ids) side back to the batch's id type
        // once, instead of casting the batch's id column per micro-batch
        // row — the semi-join probe side stays untouched
        val clean = marks.filter(!org.apache.spark.sql.functions
          .col("sem_contaminated"))
          .select(org.apache.spark.sql.functions.col(idCol).cast(idType)
            .as("_keep_id"))
        batch.join(clean,
            batch(idCol) === org.apache.spark.sql.functions
              .col("_keep_id"), "left_semi")
          .write.mode("overwrite").parquet(s"$outputDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming keep-first dedup with EXPLICIT custom state —
    * `KeyValueGroupedDataset.flatMapGroupsWithState` over the content
    * key, the form to reach for when per-key state is richer than
    * "seen before" (the built-in `dropDuplicatesWithinWatermark` covers
    * that case; [[scoreDedupStream]] uses it). Here the state carries the
    * running duplicate count per key (surfaced as `dups_seen` on the kept
    * row — the reference's dedup counter logs, dedup_dataset.py:215-227,
    * as queryable state). State is GC'd via an event-time timeout of
    * `stateTtlMs` past the watermark: at corpus scale the state store
    * holds only keys seen within the TTL horizon, not history.
    */
  def dedupFirstSeenStream(pages: DataFrame, textCol: String = "text",
                           watermark: String = "1 hour",
                           stateTtlMs: Long = 3600L * 1000): Dataset[KeyedDoc] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val keyed = pages
      .withColumn("key", xxhash64(col(textCol)))
      // a null event time cannot participate in watermark semantics, and
      // withWatermark does NOT drop it for flatMapGroupsWithState — it
      // would reach the state function and NPE on .getTime, a permanent
      // poison pill (the checkpoint replays the same file on restart)
      .filter(col("warc_ts").isNotNull)
      .withWatermark("warc_ts", watermark)
      .select(col("key"), col("url"), col("warc_ts"), lit(0L).as("dups_seen"))
      .as[KeyedDoc]
    keyed.groupByKey(_.key)
      .flatMapGroupsWithState[Long, KeyedDoc](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, rows: Iterator[KeyedDoc], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toSeq
            val seenBefore = state.getOption.getOrElse(-1L) // -1 = new key
            state.update(math.max(seenBefore, 0L) + batch.size)
            // anchor the timeout to the key's LATEST sighting, not the
            // current watermark: in batch 1 the watermark is still 0, so
            // a watermark-anchored timeout would expire the moment real
            // event time arrives and later duplicates would re-emit as
            // first-seen. Event-time anchor + TTL keeps the key alive for
            // stateTtlMs of event time past its last occurrence (clamped
            // above the watermark, which Spark requires).
            val maxEvent = batch.map(_.warc_ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxEvent, state.getCurrentWatermarkMs()) + stateTtlMs)
            if (seenBefore >= 0) Iterator.empty // key already emitted
            else {
              // deterministic first within the batch: event time, then url
              val first = batch.minBy(d => (d.warc_ts.getTime, d.url))
              Iterator.single(first.copy(dups_seen = batch.size - 1L))
            }
          }
      }
  }

  /** Watermarked event-time windowed aggregation: per (window, lang)
    * docs-kept / docs-dropped counters on the streaming scored frame —
    * the stream form of the reference's per-run counter logs
    * (mult_infer.py:260-275) as continuously-maintained state. Append
    * mode + watermark: a window finalizes (emits once, state GC'd) when
    * the watermark passes its end, so state is bounded by
    * watermark-horizon windows, not stream history.
    */
  def keepRateByWindow(scored: DataFrame, windowLength: String = "1 hour",
                       watermark: String = "1 hour"): DataFrame =
    scored
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowLength), col("lang_pred"))
      .agg(count(lit(1)).as("docs"),
        count(when(col("drop_stage").isNull, 1)).as("kept"))

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

  /** Tumbling-window event aggregation run AS A STREAM to completion:
    * `readStream` over the parquet path, epoch-aligned `window(tsCol)`
    * groups in complete mode into a memory sink, `Trigger.AvailableNow`,
    * and the drained result returned as a plain batch DataFrame —
    * which makes this the one STREAMING operator whose output an
    * external batch engine can replay exactly (the driver's DuckDB
    * oracle recomputes the same windows with `time_bucket`). Complete
    * mode deliberately: AvailableNow may split the input into several
    * micro-batches in file order, and an append-mode watermark would
    * then emit or drop end-of-stream windows depending on that split —
    * complete mode keeps the result a pure function of the input set.
    * The memory sink holds O(#windows × #types) rows, never the events.
    */
  def streamWindowCounts(spark: SparkSession, path: String,
                         tsCol: String = "ts", typeCol: String = "event_type",
                         valueCol: String = "value",
                         windowLength: String = "1 hour"): DataFrame = {
    val schema = spark.read.parquet(path).schema
    val sink = "stream_win_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    // the file streaming source lists a DIRECTORY; a single local file
    // path becomes (parent, pathGlobFilter) so table-per-file layouts
    // (the driver's sf dirs) stream without picking up their siblings
    val f = new java.io.File(path)
    val (srcDir, glob) =
      if (f.isFile) (f.getParent, Some(f.getName)) else (path, None)
    val reader = spark.readStream.schema(schema)
    val q = glob.fold(reader)(g => reader.option("pathGlobFilter", g))
      .parquet(srcDir)
      .groupBy(window(col(tsCol), windowLength), col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("sum_value"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink).select(col("window.start").as("window_start"),
      col(typeCol), col("n_events"), col("sum_value"))
  }
}
