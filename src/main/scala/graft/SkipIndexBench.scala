package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-skipping sink benchmark main: measures what
  * [[graft.sources.CorpusIO.writeSkipIndexed]] actually buys a
  * downstream reader, against an unindexed round-robin control of the
  * SAME data at the SAME file count.
  *
  * Three probe shapes, each measured as (wall seconds, records read
  * from the source via task inputMetrics):
  *   - `id_point` / `id_range`: lookups on the SORT key — row groups
  *     prune on footer min/max (the mark-table / removed-ids membership
  *     probe shape).
  *   - `url_absent`: a point probe on a BLOOM column for a value that
  *     is not in the corpus but lies inside every row group's min/max
  *     span — only the bloom filter can reject it (the "is this url
  *     already in the kept corpus?" negative-membership shape, which at
  *     incremental-crawl scale is the COMMON case).
  *
  * Also prices the write: indexed (range shuffle + sort + bloom build)
  * vs control (round-robin), same row count, so the record shows both
  * sides of the trade.
  *
  * Args (optional): nRows nFiles
  * Defaults: 5,000,000 rows, 32 files (~0.5 KB/row payload).
  */
object SkipIndexBench {

  def main(args: Array[String]): Unit = {
    val nRows = args.lift(0).map(_.toLong).getOrElse(5000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(32)

    val spark = SparkSession.builder()
      .appName("graft-skipindex-bench")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def wall[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    /** (wall seconds, records read from the source) for `action` —
      * scoped-listener drain shared with the pruning specs.
      */
    def measured(action: => Unit): (Double, Long) = {
      val ((t, _), recs) = SparkUtil.measureRecordsRead(spark)(wall(action))
      (t, recs)
    }

    // kept-corpus-shaped rows: sorted key doc_id, bloom key url (md5 —
    // uncorrelated with doc_id, so url min/max spans every row group),
    // ~0.5 KB payload
    val corpus = spark.range(nRows).select(
      col("id").as("doc_id"),
      md5(col("id").cast("string")).as("url"),
      repeat(md5(concat(lit("t"), col("id").cast("string"))), 16)
        .as("text"))

    val base = java.nio.file.Files.createTempDirectory("skipbench").toString
    val idxDir = s"$base/indexed"
    val ctlDir = s"$base/control"

    val (tIdx, _) = wall {
      sources.CorpusIO.writeSkipIndexed(corpus, idxDir, "doc_id",
        bloomCols = Seq("url"), nFiles = nFiles, bloomNdv = nRows)
    }
    val (tCtl, _) = wall {
      corpus.repartition(nFiles).write.mode("overwrite").parquet(ctlDir)
    }

    val probeId = nRows / 2 + 7
    // clamp the range probe to the id space so small user-supplied
    // nRows (quick sizing runs) measure instead of tripping the assert
    val rangeLen = math.min(10000L, nRows - probeId)
    require(rangeLen >= 1, s"nRows=$nRows leaves no id space to probe")
    val absentUrl = spark.range(1)
      .select(md5(lit((nRows + 99991L).toString))).head().getString(0)

    def probes(dir: String): Map[String, (Double, Long)] = {
      def df: DataFrame = spark.read.parquet(dir)
      Map(
        "id_point" -> measured {
          assert(df.filter(col("doc_id") === probeId).count() == 1L)
        },
        "id_range" -> measured {
          assert(df.filter(col("doc_id")
            .between(probeId, probeId + rangeLen - 1)).count() == rangeLen)
        },
        "url_absent" -> measured {
          assert(df.filter(col("url") === absentUrl).count() == 0L)
        })
    }
    // warm the FS cache symmetrically, then probe each layout
    spark.read.parquet(idxDir).count()
    spark.read.parquet(ctlDir).count()
    val pIdx = probes(idxDir)
    val pCtl = probes(ctlDir)

    // compaction leg: a maintenance rewrite of the indexed layout into
    // ~256 MB files — the layout-preserving path must re-sort on the
    // key and rebuild the bloom footers, else every subsequent probe
    // silently degrades to a full scan. Probes after compaction must
    // read the same order of magnitude as before (id_point one larger
    // row group, url_absent still ZERO records).
    val cmpDir = s"$base/compacted"
    val (tCmp, nCmp) = wall {
      sources.CorpusIO.compactParquet(spark, idxDir, cmpDir,
        targetBytesPerFile = 256L * 1024 * 1024,
        orderBy = Some("doc_id"),
        writerOptions = sources.CorpusIO.bloomOptions(Seq("url"), nRows))
    }
    spark.read.parquet(cmpDir).count()
    val pCmp = probes(cmpDir)

    def fmt(m: Map[String, (Double, Long)]): String =
      m.toSeq.sortBy(_._1).map { case (k, (t, r)) =>
        s""""$k":{"sec":${math.rint(t * 1000) / 1000},"records_read":$r}"""
      }.mkString(",")
    println(s"""{"metric":"skip_index_probe","rows":$nRows,""" +
      s""""files":$nFiles,""" +
      s""""write_sec_indexed":${math.rint(tIdx * 100) / 100},""" +
      s""""write_sec_control":${math.rint(tCtl * 100) / 100},""" +
      s""""indexed":{${fmt(pIdx)}},"control":{${fmt(pCtl)}},""" +
      s""""compact_sec":${math.rint(tCmp * 100) / 100},""" +
      s""""compact_files":$nCmp,"compacted":{${fmt(pCmp)}}}""")
    spark.stop()
  }
}
