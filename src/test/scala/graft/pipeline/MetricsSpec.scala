package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MetricsSpec extends SparkSpec {

  test("per-partition accumulators count docs, partitions, and skew") {
    val m = Metrics.pipelineMetrics(spark)
    val pages = Synth.pages(spark, 1000L).repartition(8)
    CorpusPipeline.score(pages, metrics = Some(m)).count()
    assert(m.docsSeen.value == 1000L)
    assert(m.partitionsProcessed.value == 8L)
    assert(m.maxPartitionRows >= 125L) // ceil(1000/8)
    assert(m.skewFactor >= 1.0 && m.skewFactor < 2.0,
      s"unexpected skew ${m.skewFactor}")
  }

  test("observe metrics are captured by the listener") {
    val o = Metrics.observedMetrics(spark)
    try {
      val scored = CorpusPipeline.score(Synth.pages(spark, 500L))
      val obsName = scored.queryExecution.analyzed.collectFirst {
        case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => c.name
      }.getOrElse(fail("no CollectMetrics node in plan"))
      scored.count()
      val got = o.waitFor(obsName)
      assert(got.nonEmpty, "observed metrics not delivered")
      assert(got.get("docs_in") == 500L)
      val alive = got.get("docs_alive").asInstanceOf[Long]
      assert(alive > 0 && alive <= 500L)
    } finally o.unregister()
  }
}
