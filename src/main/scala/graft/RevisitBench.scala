package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-revisit resolution benchmark main: `ExactDedup.keepLatest`'s
  * single `max_by` aggregation vs the textbook window form
  * (`row_number() OVER (PARTITION BY url ORDER BY ts DESC ...)` +
  * `count(*) OVER` for the churn column) on a synthetic multi-snapshot
  * crawl with a realistic page payload. The claim under test (SURVEY
  * §2.12): the aggregation combines revision groups MAP-SIDE, so the
  * exchange carries one candidate row per (url, map partition) instead
  * of every revision, and nothing sorts — the window form shuffles the
  * full corpus and sorts every partition. Both outputs are checksummed
  * (order-invariant decimal sum of a full-row hash) and must match.
  *
  * Synthesis is pure column arithmetic (reproducible anywhere): nUrls
  * urls × revisitFactor fetches, ~512 B payload per row.
  *
  * Args (optional): nRows revisitFactor hotPct
  * Defaults: 10,000,000 rows, 15 revisits/url, hotPct 0.
  * hotPct > 0 routes that percentage of ALL rows to one mega-hot url —
  * the crawl-trap skew case: the window form must sort the hot url in
  * ONE task, while both aggregation forms partial-combine it map-side.
  */
object RevisitBench {

  def main(args: Array[String]): Unit = {
    val nRows = args.lift(0).map(_.toLong).getOrElse(10000000L)
    val factor = args.lift(1).map(_.toLong).getOrElse(15L)
    val hotPct = args.lift(2).map(_.toInt).getOrElse(0)
    val nUrls = math.max(nRows / factor, 1L)

    val spark = SparkSession.builder()
      .appName("graft-revisit-bench")
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

    // url_id uniform; ts a hash (distinct per row with overwhelming
    // probability — ties break on the unique id anyway); ~512 B payload
    val urlId =
      if (hotPct <= 0) pmod(col("id"), lit(nUrls))
      else when(pmod(xxhash64(col("id"), lit(9)), lit(100)) < hotPct, lit(0L))
        .otherwise(pmod(col("id"), lit(nUrls)))
    val pages = spark.range(nRows).select(
      concat(lit("https://site.example.com/p/"),
        urlId.cast("string")).as("url"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000000000L)).as("ts"),
      col("id"),
      repeat(md5(col("id").cast("string")), 16).as("text"))
    val mat = SparkUtil.materialize(pages)
    val built = mat.count()

    def checksum(df: DataFrame): String =
      df.agg(sum(xxhash64(col("url"), col("ts"), col("id"), col("text"))
        .cast("decimal(38,0)")).cast("string")).head().getString(0)

    def aggPath(): DataFrame =
      dedup.ExactDedup.keepLatest(mat, Seq("url"), "ts", Seq("id"))
        .drop("n_revisions")

    def byIdPath(): DataFrame =
      dedup.ExactDedup.keepLatestById(mat, Seq("url"), "ts", "id",
        idIsUnique = Some(true))
        .drop("n_revisions")

    def windowPath(): DataFrame = {
      val w = Window.partitionBy(col("url"))
        .orderBy(col("ts").desc, col("id").desc)
      mat.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }

    // best-of-2 per path (this VM phase-swings; see BENCH.md protocol)
    def best(f: () => DataFrame): (Double, Long) =
      (1 to 2).map { _ => wall(f().count()) }.minBy(_._1)

    val (aggSec, aggRows) = best(aggPath)
    val (winSec, winRows) = best(windowPath)
    val (byIdSec, byIdRows) = best(byIdPath)
    val okRows = aggRows == winRows && winRows == byIdRows
    val sums = Seq(aggPath(), windowPath(), byIdPath()).map(checksum)
    val okSum = sums.distinct.size == 1

    println(s"""{"bench":"revisit","rows":$built,"urls":$nUrls,""" +
      s""""revisit_factor":$factor,"hot_pct":$hotPct,""" +
      s""""agg_sec":$aggSec,"window_sec":$winSec,""" +
      s""""by_id_sec":$byIdSec,"survivors":$aggRows,""" +
      s""""rows_match":$okRows,"checksum_match":$okSum,""" +
      s""""by_id_speedup_vs_window":${winSec / byIdSec}}""")
    spark.stop()
  }
}
