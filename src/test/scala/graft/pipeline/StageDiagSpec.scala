package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Diagnostic crosstab of planted vs actual stages (kept out of the gate;
  * prints the confusion so regressions are explainable).
  */
class StageDiagSpec extends SparkSpec {
  import spark.implicits._

  test("diag: stage confusion") {
    val rows = Synth.rows(spark, 2000L).cache()
    val result = CorpusPipeline.run(
      rows.select("url", "warc_ts", "html", "text", "lang"))
    val joined = result.join(
      rows.select("url", "expect_keep", "expect_stage"), "url")
    val conf = joined
      .filter(coalesce($"drop_stage", lit("-")) =!= coalesce($"expect_stage", lit("-")))
      .groupBy("expect_stage", "drop_stage").count()
      .orderBy($"count".desc)
      .collect()
    conf.foreach(r => info(s"expect=${r.get(0)} got=${r.get(1)} n=${r.get(2)}"))
    val sample = joined
      .filter(coalesce($"drop_stage", lit("-")) =!= coalesce($"expect_stage", lit("-")))
      .select("url", "expect_stage", "drop_stage").limit(5).collect()
    sample.foreach(r => info(r.toString))
    assert(true)
  }
}
