package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.Synth

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("available-now run drains new files only, with checkpoint resume") {
    val in = Files.createTempDirectory("stream_in").toString
    val out = Files.createTempDirectory("stream_out").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString

    // batch 1 lands
    Synth.pages(spark, 300L).write.mode("append").parquet(in)
    val q1 = StreamingPipeline.runAvailableNow(spark, in, out, ckpt)
    q1.awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 300L)

    // batch 2 lands as new files in the same dir; rerun with the same
    // checkpoint → only the new files are processed
    Synth.pages(spark, 500L).write.mode("append").parquet(in)
    val q2 = StreamingPipeline.runAvailableNow(spark, in, out, ckpt)
    q2.awaitTermination()
    val n2 = spark.read.parquet(out).count()
    assert(n2 == 300L + 500L, s"expected 800 got $n2")

    // scored columns present
    val cols = spark.read.parquet(out).columns.toSet
    assert(Set("url", "drop_stage", "scrubbed_text", "perplexity").subsetOf(cols))
  }

  test("stream-static near-dup gate equals batch dedupAgainst") {
    val in = Files.createTempDirectory("stream_sa_in").toString
    // reference snapshot = docs 0..39; incoming stream = docs 20..79 —
    // 20..39 are verbatim copies of reference docs and must be gated out
    val all = Synth.pages(spark, 80L)
    val refUrls = (0 until 40).map(i => Synth.urlOf(i.toLong))
    val ref = all.filter(col("url").isInCollection(refUrls))
    val refSigs = graft.dedup.MinHash.signatures(ref, "url", "text")
      .persist()
    refSigs.count()
    val incomingUrls = (20 until 80).map(i => Synth.urlOf(i.toLong))
    val incoming = all.filter(col("url").isInCollection(incomingUrls))
    incoming.write.mode("append").parquet(in)
    val out = Files.createTempDirectory("stream_sa_out").toString
    val ckpt = Files.createTempDirectory("stream_sa_ckpt").toString
    val q = StreamingPipeline.runDedupAgainst(spark, in, out, ckpt, refSigs)
    q.awaitTermination()
    val streamed = spark.read.parquet(out).select("url")
      .as[String].collect().toSet
    // none of the verbatim-overlap docs survive
    (20 until 40).foreach(i =>
      assert(!streamed.contains(Synth.urlOf(i.toLong)), s"doc $i leaked"))
    // micro-batch gating ≡ the batch operator (also covers the corpus's
    // planted near-dups crossing the reference boundary)
    val batchResult = graft.dedup.MinHash.dedupAgainst(
      incoming, "url", "text", refSigs)
      .select("url").as[String].collect().toSet
    assert(streamed == batchResult,
      s"stream/batch diverge: ${streamed.diff(batchResult)} / " +
      s"${batchResult.diff(streamed)}")
    refSigs.unpersist()
  }

  test("stream-static SEMANTIC gate equals batch markAgainst") {
    val in = Files.createTempDirectory("stream_sem_in").toString
    val out = Files.createTempDirectory("stream_sem_out").toString
    val ckpt = Files.createTempDirectory("stream_sem_ckpt").toString
    val dim = 16
    def vec(seed: Long, base: Option[Array[Double]] = None,
            sigma: Double = 0.0): Seq[Float] = {
      val r = new java.util.SplittableRandom(seed)
      base match {
        case None => Seq.fill(dim)(r.nextGaussian().toFloat)
        case Some(b) => b.map(x => (x + sigma * r.nextGaussian()).toFloat).toSeq
      }
    }
    val refVecs = (1 to 8).map(i => vec(100L + i).map(_.toDouble).toArray)
    val reference = refVecs.map(v => Tuple1(v.map(_.toFloat).toSeq))
      .toDF("embedding")
    // incoming: 10 leaked (jittered copies of ref vectors) + 30 clean
    val leaked = (0 until 10).map(i =>
      (s"leak$i", vec(500L + i, Some(refVecs(i % 8)), 0.003)))
    val clean = (0 until 30).map(i => (s"clean$i", vec(9000L + i)))
    val incoming = (leaked ++ clean).toDF("vec_id", "embedding")
    incoming.write.mode("append").parquet(in)

    val q = StreamingPipeline.runSemGateAgainst(spark, in, out, ckpt,
      reference, nClusters = 8, nProbe = 8)
    q.awaitTermination()
    val streamed = spark.read.parquet(out).select("vec_id")
      .as[String].collect().toSet
    assert(streamed.forall(_.startsWith("clean")), s"leaked: $streamed")
    // stream ≡ batch: the micro-batch gate must equal one batch call
    // with the same reference-trained centroids
    val cents = StreamingPipeline.gateCentroids(reference, "embedding", 8)
    val batchClean = graft.analytics.SemDedup.markAgainst(
        incoming, reference, "vec_id", "embedding", eps = 0.05,
        nClusters = 8, nProbe = 8, trainedCentroids = Some(cents))
      .filter(!col("sem_contaminated"))
      .select("vec_id").as[String].collect().toSet
    assert(streamed == batchClean,
      s"stream/batch diverge: ${streamed.diff(batchClean)} / " +
        s"${batchClean.diff(streamed)}")
  }

  test("gate centroids are partitioning-independent (content-keyed sample)") {
    // r4 advisory: the gate trained its centroids on a sample ranked by
    // monotonically_increasing_id — a partition-layout artifact, so a
    // repartitioned reference could shift cell boundaries between query
    // restarts. The sampling key is now xxhash64 of the vector content:
    // any layout of the same reference set must train BIT-IDENTICAL
    // centroids.
    val dim = 16
    def vec(seed: Long): Seq[Float] = {
      val r = new java.util.SplittableRandom(seed)
      Seq.fill(dim)(r.nextGaussian().toFloat)
    }
    val reference = (1 to 64).map(i => Tuple1(vec(3000L + i)))
      .toDF("embedding")
    val a = StreamingPipeline.gateCentroids(reference, "embedding", 8)
    val b = StreamingPipeline.gateCentroids(
      reference.repartition(7), "embedding", 8)
    val c = StreamingPipeline.gateCentroids(
      reference.coalesce(1), "embedding", 8)
    assert(a.length == b.length && a.length == c.length)
    a.indices.foreach { i =>
      assert(java.util.Arrays.equals(a(i), b(i)),
        s"centroid $i differs under repartition(7)")
      assert(java.util.Arrays.equals(a(i), c(i)),
        s"centroid $i differs under coalesce(1)")
    }
  }

  test("custom-state first-seen dedup emits one row per key with dup counts") {
    val in = Files.createTempDirectory("stream_fs_in").toString
    val pages = Synth.pages(spark, 60L)
    // inject two extra copies of doc 0's text under new urls
    val d0 = pages.filter(col("url") === Synth.urlOf(0))
    val dups = d0.withColumn("url", lit("https://dup.example.com/a"))
      .unionByName(d0.withColumn("url", lit("https://dup.example.com/b")))
    pages.unionByName(dups).write.mode("append").parquet(in)

    val stream = StreamingPipeline.dedupFirstSeenStream(
      StreamingPipeline.readPages(spark, in))
    val q = stream.writeStream.format("memory").queryName("fs_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.sql("SELECT url, dups_seen FROM fs_out")
      .as[(String, Long)].collect().toMap
    // doc 0's key: exactly the original (earliest warc_ts) survives,
    // carrying dups_seen = 2
    assert(got.contains(Synth.urlOf(0)))
    assert(!got.contains("https://dup.example.com/a"))
    assert(!got.contains("https://dup.example.com/b"))
    assert(got(Synth.urlOf(0)) == 2L, s"dups_seen=${got(Synth.urlOf(0))}")
    // 60 distinct texts in this slice (the corpus's planted dup triple
    // sits at idx 86-88, outside it) + 2 injected copies − 2 suppressed
    assert(got.size == 60, s"got ${got.size}, expected 60")
    // every non-duplicated key reports zero dups
    assert(got.count(_._2 == 0L) == 59)
  }

  test("first-seen dedup survives a null event-time row (poison-pill pin)") {
    val in = Files.createTempDirectory("stream_fs_null_in").toString
    val pages = Synth.pages(spark, 10L)
    // one landing row with a null warc_ts: withWatermark does NOT drop
    // it for flatMapGroupsWithState — unguarded, the state function
    // NPEs on .getTime and the checkpoint replays it forever
    pages.unionByName(
      pages.limit(1).withColumn("url", lit("https://null-ts.example.com/"))
        .withColumn("warc_ts", lit(null).cast("timestamp"))
        .withColumn("text", lit("a unique null timestamp body")))
      .write.mode("append").parquet(in)
    val q = StreamingPipeline.dedupFirstSeenStream(
      StreamingPipeline.readPages(spark, in))
      .writeStream.format("memory").queryName("fs_null_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination() // unguarded: this THROWS StreamingQueryException
    val urls = spark.sql("SELECT url FROM fs_null_out")
      .as[String].collect().toSet
    assert(!urls.contains("https://null-ts.example.com/"),
      "null event-time row must be excluded, not emitted")
    assert(urls.size == 10, s"real rows all emitted, got ${urls.size}")
  }

  test("first-seen dedup state survives batch boundaries within the TTL") {
    val in = Files.createTempDirectory("stream_fs2_in").toString
    val out = Files.createTempDirectory("stream_fs2_out").toString
    val ckpt = Files.createTempDirectory("stream_fs2_ckpt").toString
    def drain(): Unit = {
      val q = StreamingPipeline.dedupFirstSeenStream(
        StreamingPipeline.readPages(spark, in))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: the corpus slice
    val pages = Synth.pages(spark, 20L)
    pages.write.mode("append").parquet(in)
    drain()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 20L)
    // batch 2 (separate micro-batch via new files + checkpoint): a
    // duplicate of doc 0's text at an event time just after the original
    // — inside the TTL horizon, so it must NOT re-emit as first-seen
    pages.filter(col("url") === Synth.urlOf(0))
      .withColumn("url", lit("https://dup.example.com/late"))
      .withColumn("warc_ts",
        col("warc_ts") + expr("INTERVAL 10 MINUTES"))
      .write.mode("append").parquet(in)
    drain()
    val urls = spark.read.parquet(out).select("url")
      .as[String].collect().toSet
    assert(!urls.contains("https://dup.example.com/late"),
      "cross-batch duplicate re-emitted: state expired prematurely")
    assert(spark.read.parquet(out).count() == 20L)
  }

  test("first-seen stream survivors equal batch ExactDedup.mark at two splits") {
    // VERDICT r2 #7: chain the streaming state operator to the batch
    // invariant — dedupFirstSeenStream over the synthetic corpus must
    // keep exactly the rows batch ExactDedup.mark keeps, regardless of
    // how the input is carved into micro-batches. warc_ts increases with
    // doc index, so file-append order respects event time and
    // "first-seen" coincides with the batch keep-first order
    // (warc_ts, url).
    val pages = Synth.pages(spark, 100L).cache()
    val batchSurvivors = graft.dedup.ExactDedup
      .mark(pages, Seq("text"), Seq("warc_ts", "url"))
      .filter(!col("is_exact_dup")).select("url")
      .as[String].collect().toSet

    def streamSurvivors(splits: Seq[org.apache.spark.sql.DataFrame]): Set[String] = {
      val in = Files.createTempDirectory("stream_eq_in").toString
      val out = Files.createTempDirectory("stream_eq_out").toString
      val ckpt = Files.createTempDirectory("stream_eq_ckpt").toString
      splits.foreach { part =>
        part.write.mode("append").parquet(in)
        val q = StreamingPipeline.dedupFirstSeenStream(
          StreamingPipeline.readPages(spark, in))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      spark.read.parquet(out).select("url").as[String].collect().toSet
    }

    // split 1: everything in one micro-batch
    assert(streamSurvivors(Seq(pages)) == batchSurvivors)
    // split 2: boundary cuts THROUGH the planted exact-dup triple
    // (idx 86/87/88 share one text): 0..86 then 87..99 — the first-seen
    // state must suppress the batch-2 copies
    val cut = Synth.tsOf(87)
    assert(streamSurvivors(Seq(
      pages.filter(col("warc_ts") < cut),
      pages.filter(col("warc_ts") >= cut))) == batchSurvivors)
    pages.unpersist()
  }

  test("watermarked windowed aggregation counts kept/dropped per window") {
    val in = Files.createTempDirectory("stream_win_in").toString
    Synth.pages(spark, 120L).write.mode("append").parquet(in)
    val agg = StreamingPipeline.keepRateByWindow(
      StreamingPipeline.scoreStream(StreamingPipeline.readPages(spark, in)),
      windowLength = "10 minutes", watermark = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("complete") // finite AvailableNow drain: emit all state
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.sql("SELECT docs, kept FROM win_out").collect()
    assert(rows.map(_.getLong(0)).sum == 120L, "window counts must cover input")
    assert(rows.forall(r => r.getLong(1) <= r.getLong(0)))
    assert(rows.map(_.getLong(1)).sum > 0L)
  }

  test("watermarked dedup collapses in-window duplicates") {
    val in = Files.createTempDirectory("stream_dd_in").toString
    val pages = Synth.pages(spark, 100L)
    // plant an exact duplicate pair with distinct urls inside the window
    val dup = pages.filter(col("url") === Synth.urlOf(0))
      .withColumn("url", lit("https://dup.example.com/copy"))
    pages.unionByName(dup).write.mode("append").parquet(in)

    val stream = StreamingPipeline.scoreDedupStream(
      StreamingPipeline.readPages(spark, in))
    val q = stream.writeStream.format("memory").queryName("dd_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.sql("SELECT url FROM dd_out").as[String].collect()
    // 101 in (100 + injected dup) − injected dup − 2 of the corpus's own
    // planted exact-dup triple (idx 86/87/88 share one text) = 98
    assert(got.length == 98L, s"got ${got.length}")
    // exactly one of the duplicate pair survived
    val survivors = got.count(u =>
      u == Synth.urlOf(0) || u == "https://dup.example.com/copy")
    assert(survivors == 1)
  }

  test("streamed tumbling-window aggregation equals the batch groupBy") {
    val dir = Files.createTempDirectory("stream_win").toString
    val events = (0 until 500).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        s"2024-01-01 ${"%02d".format(i % 13)}:${"%02d".format(i % 60)}:00"),
        if (i % 3 == 0) "click" else "view", (i % 97) * 0.37)
    }.toDF("event_id", "ts", "event_type", "value")
    events.write.mode("overwrite").parquet(dir)
    val streamed = graft.streaming.StreamingPipeline
      .streamWindowCounts(spark, dir)
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = spark.read.parquet(dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == batch, s"stream/batch window mismatch")
    assert(streamed.nonEmpty && streamed.size == 13 * 2)
  }
}
