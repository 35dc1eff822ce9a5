package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round auxiliary bench (guide §1.4): time EVERY declared
  * query in `SparkEntry.queries` with the noop sink — which computes
  * every column of every row and discards it, so no count-side column
  * pruning flatters a query — one untimed warm lap then one timed lap
  * each. The frozen `graft.Bench` main remains the driver's graded
  * record; this sweep exists to evidence the full 124-query operator
  * surface (OPTIMIZATION_r06.md), not to replace it.
  *
  *   spark-submit --class graft.BenchExtra <jar> [namePrefix]
  *
  * Prints ONE JSON line {"metric":"noop_sweep","queries":{name:sec}}.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val prefix = args.headOption.getOrElse("")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    pipeline.CorpusPipeline.defaultModels

    def noop(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted.filter(_.startsWith(prefix))
    val results = names.flatMap { name =>
      spark.sparkContext.setJobDescription(s"noop: $name")
      try {
        noop(name) // warm: plan compile + codegen + JIT
        val t0 = System.nanoTime()
        noop(name)
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[benchextra] $name failed: ${e.getMessage}")
          None
      } finally spark.sparkContext.setJobDescription(null)
    }
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"noop_sweep","value":$total%.3f,"unit":"sec","n":${results.size},"queries":$qs}""")
    spark.stop()
  }
}
