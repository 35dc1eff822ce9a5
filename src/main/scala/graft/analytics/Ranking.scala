package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable group-wise global ranking — the primitive behind CCNet-style
  * perplexity bucketing ([[graft.filters.CcNet]]) and temperature-based
  * mixture sampling ([[Sampling.temperatureSample]]).
  *
  * Semantics are exactly `row_number() OVER (PARTITION BY groupCols
  * ORDER BY orderCols)` — but the window runs each group through ONE
  * task after a per-group sort, which dies on web-scale groups (a
  * single language holds most of a Common-Crawl corpus; CCNet buckets
  * per language). Scale path instead:
  *
  *  1. Range-partition AND sort by (groupCols ++ orderCols) — Spark's
  *     sampling range partitioner splits the big groups across many
  *     tasks while keeping global order across partitions.
  *  2. One partial-agg pass counts rows per (partition, group). The
  *     result is tiny — a group spans contiguous partitions, so the
  *     count table holds ≤ (#partitions + #groups) rows — and the
  *     driver prefix-sums it into per-(partition, group) rank offsets.
  *  3. One `mapPartitions` pass emits offset + local position. No
  *     group ever sorts through a single task.
  *
  * The result is partition-boundary-independent: ranks derive from the
  * global (group, order) ordering, which the range property guarantees
  * regardless of where the sampled boundaries land, so output is
  * deterministic at ANY parallelism (property-pinned vs the naive
  * window in AnalyticsSpec).
  *
  * Caller contract: `orderCols` must be a TOTAL order within each group
  * (append a unique tiebreak, e.g. the doc id) — ties would otherwise
  * rank in arrival order. Nulls in group columns form their own group,
  * distinct from empty string (null-flagged key encoding). Null order
  * keys sort FIRST (Spark's asc default) — mirror `NULLS FIRST` in any
  * SQL you compare against.
  */
object Ranking {

  /** Max rows the per-(partition, group) count pass may collect: the
    * table is (#partitions + #groups)-bounded by the range property, so
    * only a caller grouping by a near-unique key can approach this —
    * fail loudly instead of OOMing the driver.
    */
  val MaxCountRows: Int = 1 << 20

  /** Null-flagged string encoding of the group key: a `v`/`n` marker per
    * column keeps null distinct from empty string, U+0001 separators
    * keep multi-column boundaries unambiguous (same convention as
    * [[graft.Run.rowKey128]]).
    */
  private def groupKey(cols: Seq[String]): Column =
    if (cols.isEmpty) lit("")
    else concat_ws("\u0001", cols.map { c =>
      concat(when(col(c).isNull, lit("n")).otherwise(lit("v")),
        coalesce(col(c).cast("string"), lit("")))
    }: _*)

  /** Adds `outCol` = 1-based rank of the row within its `groupCols`
    * group under `orderCols` order. See the object doc for the scale
    * design and the total-order caller contract.
    */
  def rankInGroup(df: DataFrame, groupCols: Seq[String],
                  orderCols: Seq[String], outCol: String = "rank",
                  numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "rankInGroup: need order columns")
    require(!df.columns.contains(outCol),
      s"rankInGroup: output column $outCol already exists on the frame")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    def freshName(base: String): String = {
      // fresh internal name (withColumn REPLACES silently)
      var n = base; var i = 0
      while (df.columns.contains(n) || n == outCol) { i += 1; n = s"$base$i" }
      n
    }
    val (gc, pc) = (freshName("_rg"), freshName("_rp"))
    val keys = groupCols.map(col) ++ orderCols.map(col)
    // materialize (localCheckpoint) so the count pass and the rank pass
    // see the SAME physical partitioning — and the corpus-wide range
    // shuffle runs once, not twice. The partition id is STAMPED INTO THE
    // DATA before the checkpoint, not read from TaskContext at rank
    // time: a downstream coalesce() re-tasks the scan (one task computes
    // many stored partitions, all with the same TaskContext partition
    // id), which would silently mismatch every offset lookup — both
    // passes below key off the frozen column instead, so they agree
    // under any downstream re-tasking (coalesce-pinned in RankingSpec).
    val arranged = graft.SparkUtil.materialize(
      df.withColumn(gc, groupKey(groupCols))
        .repartitionByRange(parts, keys: _*)
        .sortWithinPartitions(keys: _*)
        .withColumn(pc, spark_partition_id()))

    // per-(partition, group) counts → per-(partition, group) offsets
    val countRows = arranged
      .groupBy(col(pc), col(gc))
      .count()
      .limit(MaxCountRows + 1)
      .collect()
    require(countRows.length <= MaxCountRows,
      s"rankInGroup: > $MaxCountRows (partition, group) count rows — " +
        "the group key is near-unique; rank such keys directly instead")
    val offsets = new scala.collection.mutable.HashMap[(Int, String), Long]
    countRows
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2)
      .foreach { case (g, rows) =>
        var acc = 0L
        rows.sortBy(_._1).foreach { case (pid, _, n) =>
          offsets((pid, g)) = acc
          acc += n
        }
      }
    val bcOffsets = df.sparkSession.sparkContext.broadcast(offsets.toMap)

    val outSchema = StructType(arranged.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val gIdx = arranged.schema.fieldIndex(gc)
    val pIdx = arranged.schema.fieldIndex(pc)
    arranged.mapPartitions { rows =>
      val off = bcOffsets.value
      // keyed on the STORED (pid, group), not TaskContext: re-tasking
      // (coalesce) may stream several stored partitions through one
      // invocation, so reset on either changing
      var curPid = Int.MinValue
      var curGroup: String = null
      var rank = 0L
      rows.map { r =>
        val p = r.getInt(pIdx)
        val g = r.getString(gIdx)
        if (p != curPid || g != curGroup) {
          curPid = p
          curGroup = g
          rank = off.getOrElse((p, g), 0L)
        }
        rank += 1L
        Row.fromSeq(r.toSeq :+ rank)
      }
    }(Encoders.row(outSchema))
      .drop(gc, pc)
  }

  /** SQL-standard `ntile(k)` bucket from a precomputed (rank, groupSize)
    * pair — pure integer arithmetic (no float quantile cutoffs, so the
    * result is exactly reproducible by any engine's ntile): with
    * q = n / k and rem = n % k, the first `rem` tiles hold q+1 rows and
    * the rest hold q. Equal to Spark's / DuckDB's `ntile(k)` over the
    * same total order (property-pinned in AnalyticsSpec).
    */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    require(k > 0, "ntile: k must be positive")
    val q = floor(n / k).cast("long")
    val rem = n % k
    // q == 0 (n < k) never reaches the otherwise branch: rem == n there,
    // so rank <= rem * 1 covers every row (CaseWhen evaluates lazily)
    when(rank <= rem * (q + lit(1L)),
      floor((rank - 1) / (q + lit(1L))).cast("long") + 1L)
      .otherwise(rem +
        floor((rank - lit(1L) - rem * (q + lit(1L))) / q).cast("long") + 1L)
  }

  /** Per-group quantile profile of a numeric column — the distribution
    * summary (p50/p90/p99 of doc length, token count, perplexity…) read
    * before choosing filter cut-offs. `exact = true` uses Spark's exact
    * `percentile` (R-7 linear interpolation, matching DuckDB
    * `quantile_cont` — oracle parity); its per-group sorted buffer is
    * fine up to ~10^8 rows per group. At full corpus scale pass
    * `exact = false` for `approx_percentile` (bounded-memory t-digest
    * sketch, mergeable map-side — the 100-TB path; no SQL oracle, which
    * is why the driver query pins the exact form).
    */
  def quantileProfile(df: DataFrame, groupCol: String, valueCol: String,
                      ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
                      exact: Boolean = true,
                      accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantileProfile: percentiles must be in [0,1], got $ps")
    val aggs = ps.map { p =>
      // name via decimal string, not p*100 (0.99*100 = 98.999… in binary)
      val name = "p" + (BigDecimal(p.toString) * 100)
        .underlying.stripTrailingZeros.toPlainString.replace(".", "_")
      val c =
        if (exact) percentile(col(valueCol), lit(p))
        else percentile_approx(col(valueCol), lit(p), lit(accuracy))
      round(c.cast("double"), 4).as(name)
    }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
