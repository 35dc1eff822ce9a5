package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.{CorpusPipeline, Synth}

class CorpusIOSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_io").toString

  test("format sniffing follows reference keyword precedence") {
    assert(CorpusIO.sniffFormat("/data/dclm/x.jsonl.zst") == CorpusIO.Jsonl)
    assert(CorpusIO.sniffFormat("/data/shard.parquet") == CorpusIO.Parquet)
    assert(CorpusIO.sniffFormat("/cc/segment.warc.gz") == CorpusIO.Warc)
    assert(CorpusIO.sniffFormat("/out/scores.csv") == CorpusIO.Csv)
    assert(CorpusIO.sniffFormat("/mystery/dir") == CorpusIO.Jsonl)
    // jsonl wins when several keywords appear (findweb.py:27-55 order)
    assert(CorpusIO.sniffFormat("/x/jsonl_from_csv") == CorpusIO.Jsonl)
  }

  test("jsonl.gz round-trip preserves pages byte-exactly") {
    val dir = tmp()
    val pages = Synth.pages(spark, 50L)
    CorpusIO.writeCorpus(pages, s"$dir/out_jsonl", CorpusIO.Jsonl)
    val back = CorpusIO.readJsonl(spark, s"$dir/out_jsonl")
    assert(back.count() == 50)
    val a = pages.select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    back.select("url", "text").collect().foreach { r =>
      assert(a(r.getString(0)) == r.getString(1))
    }
  }

  test("jsonl reader drops malformed lines instead of failing") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "bad.jsonl"),
      """{"url":"u1","warc_ts":"2024-01-01T00:00:00Z","html":null,"text":"ok","lang":"en"}
        |not json at all {{{
        |{"url":"u2","warc_ts":"2024-01-01T00:00:01Z","html":null,"text":"ok2","lang":"en"}
        |""".stripMargin)
    val df = CorpusIO.readJsonl(spark, dir)
    assert(df.filter(col("url").isNotNull).count() == 2)
  }

  test("csv reader skips malformed rows with explicit schema") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "t.csv"),
      "id,score\n1,2.5\nbroken_row_only_one_col\n3,4.0\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType)))
    val df = CorpusIO.readCsv(spark, dir, schema)
    assert(df.filter(col("id").isNotNull && col("score").isNotNull).count() == 2)
  }

  test("warc splitter extracts response records only") {
    val warc =
      "WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n\r\ninfo\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://a.example/x\r\nWARC-Date: 2024-01-02T00:00:00Z\r\n\r\n<html>A</html>\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://a.example/x\r\nWARC-Date: 2024-01-02T00:00:00Z\r\n\r\nGET /x\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://b.example/y\r\nWARC-Date: 2024-01-03T00:00:00Z\r\n\r\n<html>B</html>"
    val recs = CorpusIO.splitWarc(warc)
    assert(recs.map(_._1) == Seq("https://a.example/x", "https://b.example/y"))
    assert(recs.head._3 == "<html>A</html>")
  }

  test("warc splitter honors Content-Length over the record marker") {
    // the payload QUOTES a WARC header — only Content-Length delimiting
    // keeps it one record with the full payload intact
    val quoted = "<html>see WARC/1.0\r\nWARC-Type: response\r\n inside</html>"
    val warc =
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://q.example/1\r\n" +
      s"WARC-Date: 2024-02-01T00:00:00Z\r\nContent-Length: ${quoted.length}\r\n\r\n" +
      quoted + "\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://q.example/2\r\n" +
      "WARC-Date: 2024-02-02T00:00:00Z\r\nContent-Length: 7\r\n\r\n<html>B"
    val recs = CorpusIO.splitWarc(warc)
    assert(recs.map(_._1) == Seq("https://q.example/1", "https://q.example/2"))
    assert(recs.head._3 == quoted, s"payload truncated: ${recs.head._3}")
    assert(recs(1)._3 == "<html>B")
  }

  test("warc source reads files end-to-end") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "seg.warc"),
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://c.example/z\r\nWARC-Date: 2024-01-04T00:00:00Z\r\n\r\n<html>C</html>")
    val df = CorpusIO.readWarc(spark, dir)
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "https://c.example/z")
    assert(new String(rows.head.getAs[Array[Byte]]("html")) == "<html>C</html>")
  }

  test("dispatching reader honors explicit format over sniffed") {
    val dir = tmp()
    Synth.pages(spark, 10L).write.parquet(s"$dir/pages_dir")
    val df = CorpusIO.read(spark, s"$dir/pages_dir",
      Some(CorpusIO.Parquet))
    assert(df.count() == 10)
  }

  test("sharded writer rolls files at targetRowsPerFile") {
    val dir = tmp()
    CorpusIO.writeCorpus(Synth.pages(spark, 100L), s"$dir/sharded",
      CorpusIO.Jsonl, shards = 2, targetRowsPerFile = 20L)
    val files = new java.io.File(s"$dir/sharded").listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.length >= 5, s"expected >=5 rolled files, got ${files.length}")
    assert(CorpusIO.readJsonl(spark, s"$dir/sharded").count() == 100)
  }

  test("append-mode sinks accumulate across writes (jsonl and csv)") {
    val dir = tmp()
    val p1 = Synth.pages(spark, 30L)
    val p2 = Synth.pages(spark, 70L).filter(col("url").isNotNull)
      .exceptAll(p1) // disjoint second batch
    // jsonl append: write twice, read back the union
    CorpusIO.writeCorpus(p1, s"$dir/app_jsonl", CorpusIO.Jsonl, mode = "append")
    CorpusIO.writeCorpus(p2, s"$dir/app_jsonl", CorpusIO.Jsonl, mode = "append")
    assert(CorpusIO.readJsonl(spark, s"$dir/app_jsonl").count() == 70)
    // csv append: header-aware read reassembles both batches
    val narrow1 = p1.select("url", "lang")
    val narrow2 = p2.select("url", "lang")
    CorpusIO.writeCorpus(narrow1, s"$dir/app_csv", CorpusIO.Csv, mode = "append")
    CorpusIO.writeCorpus(narrow2, s"$dir/app_csv", CorpusIO.Csv, mode = "append")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType)))
    val back = CorpusIO.readCsv(spark, s"$dir/app_csv", schema)
    assert(back.count() == 70)
    assert(back.select("url").distinct().count() == 70)
    // overwrite mode still replaces
    CorpusIO.writeCorpus(narrow1, s"$dir/app_csv", CorpusIO.Csv)
    assert(CorpusIO.readCsv(spark, s"$dir/app_csv", schema).count() == 30)
  }

  test("partition-by-lang layout mirrors templated output paths") {
    val dir = tmp()
    CorpusIO.writeCorpus(Synth.pages(spark, 200L), s"$dir/by_lang",
      CorpusIO.Jsonl, partitionByLang = Some("lang"))
    val langDirs = new java.io.File(s"$dir/by_lang").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang="))
    assert(langDirs.nonEmpty)
  }

  test("co-bucketed tables join with zero exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val pages = Synth.pages(spark, 200L).select("url", "lang", "text")
    val scores = Synth.pages(spark, 200L)
      .select(col("url"), length(col("text")).as("n_chars"))
    CorpusIO.writeBucketedTable(pages, "bk_pages", "url", 4,
      sortCol = Some("url"))
    CorpusIO.writeBucketedTable(scores, "bk_scores", "url", 4,
      sortCol = Some("url"))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // force the join shape under audit
    try {
      val joined = spark.table("bk_pages")
        .join(spark.table("bk_scores"), "url")
      assert(joined.count() == 200L)
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join still shuffled:\n${joined.queryExecution.executedPlan}")
    } finally {
      spark.conf.set(key, prev)
      spark.sql("DROP TABLE IF EXISTS bk_pages")
      spark.sql("DROP TABLE IF EXISTS bk_scores")
    }
  }

  test("exclusion tee writes kept and per-stage removed dirs") {
    val dir = tmp()
    val result = CorpusPipeline.run(Synth.pages(spark, 300L))
      .select("url", "lang", "drop_stage", "keep", "scrubbed_text")
      .persist()
    CorpusIO.writeWithExclusions(result, s"$dir/tee", CorpusIO.Parquet)
    val kept = spark.read.parquet(s"$dir/tee/kept")
    val removed = spark.read.parquet(s"$dir/tee/removed")
    assert(kept.count() == result.filter(col("keep")).count())
    assert(removed.count() == result.filter(!col("keep")).count())
    val stages = removed.select("drop_stage").distinct().collect()
      .map(_.getString(0)).toSet
    assert(stages.size >= 2, s"expected multiple drop stages, got $stages")
    result.unpersist()
  }

  test("compactParquet collapses small files, preserves the row set") {
    import spark.implicits._
    val dir = tmp()
    val df = (1 to 2000).map(i => (i.toLong, s"doc body number $i"))
      .toDF("id", "text")
    df.repartition(40).write.parquet(s"$dir/small")
    def parquetFiles(d: String): Int =
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$dir/small") == 40)
    // generous target -> everything fits in one file
    val n1 = CorpusIO.compactParquet(spark, s"$dir/small",
      s"$dir/one", 1L << 30)
    assert(n1 == 1 && parquetFiles(s"$dir/one") == 1)
    assert(spark.read.parquet(s"$dir/one").as[(Long, String)]
      .collect().toSet == df.as[(Long, String)].collect().toSet)
    // tight target -> several files, still the same row set
    val bytes = new java.io.File(s"$dir/small").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val n2 = CorpusIO.compactParquet(spark, s"$dir/small",
      s"$dir/few", math.max(1L, bytes / 4))
    assert(n2 >= 2 && parquetFiles(s"$dir/few") == n2)
    assert(spark.read.parquet(s"$dir/few").as[(Long, String)]
      .collect().toSet == df.as[(Long, String)].collect().toSet)
    intercept[IllegalArgumentException] {
      CorpusIO.compactParquet(spark, s"$dir/small", s"$dir/bad", 0L)
    }
  }
}
