package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Pins for [[CorpusIO.writeSkipIndexed]]: the data-skipping sink must
  * (a) preserve the row set, (b) actually write the skip structures
  * (disjoint per-file min/max on the sort key; bloom filter metadata on
  * the requested columns — asserted from the parquet FOOTERS, not from
  * accepted options), and (c) actually SKIP: point lookups measured
  * through task inputMetrics read a fraction of the corpus on the
  * indexed layout and ~all of it on an unindexed control, and an
  * absent bloom probe reads zero records.
  */
class SkipIndexSpec extends SparkSpec {
  import spark.implicits._

  private val N = 60000L
  private val Files = 12

  /** url = md5 hex of the id — uncorrelated with doc_id order, so every
    * row group's url min/max spans ~the full hex space and statistics
    * CANNOT prune a url probe; only the bloom filter can.
    */
  private def corpus(): DataFrame =
    spark.range(N).select(col("id").as("doc_id"),
      md5(col("id").cast("string")).as("url"),
      concat(lit("body "), col("id")).as("text"))

  private def footers(dir: String) = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => org.apache.parquet.hadoop.ParquetFileReader
        .open(conf, new org.apache.hadoop.fs.Path(f.getAbsolutePath)))
      .map { r => val footer = r.getFooter; r.close(); footer }
      .toSeq
  }

  /** Records read from the source by `action`, via task inputMetrics
    * (shared scoped-listener drain — SparkUtil.measureRecordsRead).
    */
  private def recordsRead(action: => Unit): Long =
    graft.SparkUtil.measureRecordsRead(spark)(action)._2

  test("skip-indexed write preserves the row set and writes the skip structures") {
    val dir = java.nio.file.Files.createTempDirectory("skipidx").toString
    CorpusIO.writeSkipIndexed(corpus(), dir, "doc_id",
      bloomCols = Seq("url"), nFiles = Files, bloomNdv = N)

    val back = spark.read.parquet(dir)
    assert(back.count() == N)
    assert(back.agg(sum("doc_id")).as[Long].head() == N * (N - 1) / 2)

    val fts = footers(dir)
    assert(fts.size == Files, s"expected $Files files, got ${fts.size}")
    // per-file doc_id [min,max] intervals are pairwise disjoint (range
    // layout) and bloom metadata is present on url, absent on doc_id
    val ranges = fts.map { f =>
      val cols = f.getBlocks.asScala.flatMap(_.getColumns.asScala)
      val idCols = cols.filter(_.getPath.toDotString == "doc_id")
      val urlCols = cols.filter(_.getPath.toDotString == "url")
      assert(urlCols.nonEmpty && urlCols.forall(_.getBloomFilterOffset >= 0),
        "url column chunk has no bloom filter offset in the footer")
      assert(idCols.forall(_.getBloomFilterOffset < 0),
        "doc_id unexpectedly carries a bloom filter")
      val mins = idCols.map(_.getStatistics.genericGetMin
        .asInstanceOf[java.lang.Long].longValue)
      val maxs = idCols.map(_.getStatistics.genericGetMax
        .asInstanceOf[java.lang.Long].longValue)
      (mins.min, maxs.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"file key ranges overlap: $ranges")
      case _ =>
    }
  }

  test("sort-key point lookup prunes row groups; unindexed control does not") {
    val dir = java.nio.file.Files.createTempDirectory("skipidx_sorted").toString
    val ctl = java.nio.file.Files.createTempDirectory("skipidx_ctl").toString
    CorpusIO.writeSkipIndexed(corpus(), dir, "doc_id", nFiles = Files)
    // control: same data, same file count, round-robin layout — every
    // row group's doc_id min/max spans ~[0, N), nothing can prune
    corpus().repartition(Files).write.mode("overwrite").parquet(ctl)

    val probe = N / 2 + 7
    val pruned = recordsRead {
      val hit = spark.read.parquet(dir)
        .filter(col("doc_id") === probe).collect()
      assert(hit.length == 1)
    }
    val control = recordsRead {
      val hit = spark.read.parquet(ctl)
        .filter(col("doc_id") === probe).collect()
      assert(hit.length == 1)
    }
    // indexed: one ~N/Files row group; control: all row groups
    assert(pruned <= N / Files + 1024,
      s"sorted layout read $pruned of $N rows — row-group pruning did not engage")
    assert(control >= N / 2,
      s"control layout read only $control of $N rows — control is not a control")
  }

  test("bloom filter rejects an absent probe with zero records read") {
    val dir = java.nio.file.Files.createTempDirectory("skipidx_bloom").toString
    val ctl = java.nio.file.Files.createTempDirectory("skipidx_nobloom").toString
    CorpusIO.writeSkipIndexed(corpus(), dir, "doc_id",
      bloomCols = Seq("url"), nFiles = Files, bloomNdv = N)
    CorpusIO.writeSkipIndexed(corpus(), ctl, "doc_id",
      nFiles = Files) // same layout, no bloom

    // an md5 of an id OUTSIDE the corpus: absent, but lexicographically
    // inside every row group's url min/max span — statistics cannot
    // reject it, only the bloom filter can
    val absent = spark.range(1).select(md5(lit((N + 12345L).toString)))
      .as[String].head()
    val present = spark.range(1).select(md5(lit((N / 3).toString)))
      .as[String].head()

    val bloomAbsent = recordsRead {
      assert(spark.read.parquet(dir)
        .filter(col("url") === absent).collect().isEmpty)
    }
    val ctlAbsent = recordsRead {
      assert(spark.read.parquet(ctl)
        .filter(col("url") === absent).collect().isEmpty)
    }
    val bloomPresent = recordsRead {
      assert(spark.read.parquet(dir)
        .filter(col("url") === present).collect().length == 1)
    }
    assert(bloomAbsent == 0L,
      s"bloom layout read $bloomAbsent records for an absent key")
    assert(ctlAbsent >= N / 2,
      s"no-bloom control read only $ctlAbsent of $N — not a control")
    assert(bloomPresent >= 1L && bloomPresent <= N / Files + 1024,
      s"present-key probe read $bloomPresent rows — expected ~one row group")
  }
}
