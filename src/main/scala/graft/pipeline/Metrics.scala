package graft.pipeline

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.util.{AccumulatorV2, LongAccumulator}

/** Run metrics — the Spark-native form of the reference's per-run counter
  * logs (processed/duplicates/unique/per-filter-removed totals at
  * /root/reference/utils/dedup_dataset.py:215-227,
  * /root/reference/fasttext/mult_infer.py:260-275).
  *
  * Two complementary mechanisms, per the north rule's "per-partition
  * metrics accumulators":
  *
  *  - [[PipelineMetrics]]: executor-side `LongAccumulator`s incremented
  *    inside the langid `mapPartitions` pass (zero extra scans; one update
  *    per partition, one per row batch). Gives docs seen, null/empty texts,
  *    partitions processed, and max-partition-rows — the skew canary.
  *  - [[ObservedMetrics]]: a `QueryExecutionListener` capturing the named
  *    `Dataset.observe` aggregates (`docs_in`/`docs_alive`/`tokens_alive`
  *    from `CorpusPipeline.score`) after each action, keyed by observation
  *    name — the declarative, plan-visible half.
  */
object Metrics {

  /** Accumulator whose merge is `max` — tracks the largest per-task value
    * with O(1) driver state instead of collecting one entry per task
    * attempt (a CollectionAccumulator at 10^12-doc scale is millions of
    * driver-side boxed Longs).
    */
  final class MaxAccumulator extends AccumulatorV2[java.lang.Long, java.lang.Long] {
    private var _max: Long = 0L
    override def isZero: Boolean = _max == 0L
    override def copy(): MaxAccumulator = {
      val a = new MaxAccumulator; a._max = _max; a
    }
    override def reset(): Unit = _max = 0L
    override def add(v: java.lang.Long): Unit =
      _max = math.max(_max, v.longValue())
    override def merge(other: AccumulatorV2[java.lang.Long, java.lang.Long]): Unit =
      _max = math.max(_max, other.value.longValue())
    override def value: java.lang.Long = _max
  }

  /** Executor-side counters for one pipeline run.
    *
    * Accumulator semantics are AT-LEAST-ONCE for non-result stages: stage
    * retries and cache-eviction recomputation re-apply updates, so treat
    * `docsSeen`/`partitionsProcessed` as monitoring signals, not exact
    * ledgers (the exact ledger is the [[Lineage]] manifest / `observe`
    * metrics, which Spark applies exactly once per action).
    */
  final class PipelineMetrics(spark: SparkSession) extends Serializable {
    /** Docs that reached the langid scorer. With a URL blocklist
      * configured, blocked rows skip inference and are NOT counted here
      * (they show up in the `0_url_filter` stage counts instead).
      * `partitionsProcessed` likewise counts tasks that scored at least
      * one document — genuinely empty partitions contribute no task work
      * and no count.
      */
    val docsSeen: LongAccumulator =
      spark.sparkContext.longAccumulator("graft.docs_seen")
    val emptyTexts: LongAccumulator =
      spark.sparkContext.longAccumulator("graft.empty_texts")
    val partitionsProcessed: LongAccumulator =
      spark.sparkContext.longAccumulator("graft.partitions_processed")
    /** Largest row count seen by any single task — the skew canary.
      * Merge = max, so driver state stays O(1) regardless of task count.
      */
    val partitionRows: MaxAccumulator = {
      val a = new MaxAccumulator
      spark.sparkContext.register(a, "graft.max_partition_rows")
      a
    }

    def maxPartitionRows: Long = partitionRows.value.longValue()

    /** Partition balance: max/mean rows per partition (1.0 = perfectly
      * even; the skew canary the reference lacked). At-least-once
      * accumulator updates can inflate the mean's denominator on retries —
      * the reported factor is a monitoring estimate.
      */
    def skewFactor: Double = {
      val n = partitionsProcessed.value
      if (n == 0 || docsSeen.value == 0) 1.0
      else maxPartitionRows.toDouble / (docsSeen.value.toDouble / n)
    }
  }

  def pipelineMetrics(spark: SparkSession): PipelineMetrics =
    new PipelineMetrics(spark)

  /** Captured `observe` results, keyed by observation name. */
  final class ObservedMetrics private[Metrics] (spark: SparkSession) {
    private val captured = TrieMap.empty[String, Map[String, Any]]
    private val listener = new QueryExecutionListener {
      private def capture(qe: QueryExecution): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          captured.put(name,
            row.schema.fieldNames.zip(row.toSeq).toMap)
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = capture(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = capture(qe)
    }
    spark.listenerManager.register(listener)

    /** Metrics of the latest completed action for `observationName`.
      * `spark.listenerManager` delivers asynchronously — callers in tests
      * should `waitFor` below.
      */
    def get(observationName: String): Option[Map[String, Any]] =
      captured.get(observationName)

    def waitFor(observationName: String, timeoutMs: Long = 10000L): Option[Map[String, Any]] = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (get(observationName).isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      get(observationName)
    }

    def unregister(): Unit = spark.listenerManager.unregister(listener)
  }

  def observedMetrics(spark: SparkSession): ObservedMetrics =
    new ObservedMetrics(spark)
}
