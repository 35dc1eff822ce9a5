package graft

import org.apache.spark.sql.DataFrame

/** Cross-cutting Spark helpers. */
object SparkUtil {

  /** Eagerly materialize an intermediate frame, truncating its lineage.
    *
    * Picks the strongest checkpoint available: a RELIABLE checkpoint
    * (recomputable-free AND executor-loss-safe — blocks live on shared
    * storage) when the session has a checkpoint dir configured — the
    * normal state on a real cluster (`sc.setCheckpointDir("hdfs://…")`)
    * — falling back to `localCheckpoint` otherwise (blocks live only on
    * the computing executors; fine for local[/test] runs, NOT safe
    * against executor loss). Both variants are ContextCleaner-managed,
    * so dropping the returned frame releases the blocks — unlike
    * `persist`, which leaks a CacheManager entry per call in a
    * long-lived session unless the caller remembers to unpersist.
    */
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
