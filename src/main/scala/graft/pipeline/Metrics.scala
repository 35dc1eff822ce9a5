package graft.pipeline

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.util.LongAccumulator

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

  /** Executor-side counters for one pipeline run. */
  final class PipelineMetrics(spark: SparkSession) extends Serializable {
    val docsSeen: LongAccumulator =
      spark.sparkContext.longAccumulator("graft.docs_seen")
    val emptyTexts: LongAccumulator =
      spark.sparkContext.longAccumulator("graft.empty_texts")
    val partitionsProcessed: LongAccumulator =
      spark.sparkContext.longAccumulator("graft.partitions_processed")
    /** max rows in any single partition (via max-trick: accumulate only
      * the per-partition count, reduce with max on the driver is not
      * directly supported by LongAccumulator — so this tracks the sum and
      * [[partitionRows]] keeps the per-partition values for skew checks).
      */
    val partitionRows: org.apache.spark.util.CollectionAccumulator[java.lang.Long] =
      spark.sparkContext.collectionAccumulator[java.lang.Long]("graft.partition_rows")

    def maxPartitionRows: Long = {
      val it = partitionRows.value.iterator()
      var m = 0L
      while (it.hasNext) m = math.max(m, it.next().longValue())
      m
    }

    /** Partition balance: max/mean rows per partition (1.0 = perfectly
      * even; the skew canary the reference lacked).
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
