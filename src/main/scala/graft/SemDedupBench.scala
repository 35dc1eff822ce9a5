package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.SemDedup

/** SemDeDup scale bench: plant duplicate triples inside a clustered
  * embedding corpus, run [[SemDedup.mark]], and report wall time plus
  * planted-duplicate precision/recall. Launched twice via spark-submit
  * at two parallelism levels (the BENCH.md N-vs-4N scaling protocol):
  *
  *   spark-submit --master local[8]  --class graft.SemDedupBench <jar> 500000
  *   spark-submit --master local[32] --class graft.SemDedupBench <jar> 500000
  *
  * args: nVec [dim=64] [nCells=256] [groupFrac=0.3]
  *
  * Synthesis is per-row seeded (reproducible at any parallelism): ids
  * below `nVec*groupFrac` form consecutive triples sharing a tight
  * direction (within the 0.02 ε-ball); the rest are singletons spread
  * across the topic prototypes.
  */
object SemDedupBench {


  def main(args: Array[String]): Unit = {
    val nVec = args.lift(0).map(_.toInt).getOrElse(500000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val nCells = args.lift(2).map(_.toInt).getOrElse(256)
    val groupFrac = args.lift(3).map(_.toDouble).getOrElse(0.3)
    val nTriples = (nVec * groupFrac).toInt / 3

    val spark = SparkSession.builder()
      .appName("graft-semdedup-bench")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cores = spark.sparkContext.defaultParallelism

    // every document direction is an independent Gaussian (pairwise
    // cosine concentrates near 0 at dim=64 — far outside any ε-ball);
    // members of a planted triple share one direction plus a jitter well
    // inside ε. The k-means cells then partition the sphere itself,
    // which is exactly the operator mechanics this bench times.
    val vecUdf = udf { (id: Long) =>
      val dupMember = id < 3L * nTriples
      val baseSeed = if (dupMember) 0xABCDL + id / 3 else 0xEF0000L + id
      val bR = new java.util.SplittableRandom(baseSeed)
      val base = Array.fill(dim)(bR.nextGaussian())
      if (!dupMember) base
      else {
        val r = new java.util.SplittableRandom(id)
        base.map(x => x + 0.002 * r.nextGaussian())
      }
    }
    val emb: DataFrame = spark.range(nVec)
      .select(col("id").as("vec_id"), vecUdf(col("id")).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count() // synthesis off the clock

    // time the single-threaded driver phase (centroid training) apart
    // from the distributed mark: scaling efficiency is reported on the
    // distributed phase, which is what multiplies across executors
    val tTrain0 = System.nanoTime()
    val centroids = graft.analytics.Similarity.trainCentroids(
      emb, "vec_id", "embedding", k = nCells, iters = 8,
      sampleN = math.max(8192, 32 * nCells))
    val trainSec = (System.nanoTime() - tTrain0) / 1e9

    val t0 = System.nanoTime()
    val marked = SemDedup.mark(emb, "vec_id", "embedding",
        eps = 0.02, nClusters = nCells, sampleN = math.max(8192, 32 * nCells),
        maxCellSize = math.max(SemDedup.DefaultMaxCellSize, 4L * nVec / nCells),
        trainedCentroids = Some(centroids))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dropped = marked.filter(!col("keep_sem")).count()
    val wall = (System.nanoTime() - t0) / 1e9

    // planted truth: ids < 3*nTriples should collapse 3 -> 1
    val inTriples = marked.filter(col("vec_id") < 3L * nTriples)
    val tp = inTriples.filter(!col("keep_sem")).count()
    val fp = dropped - tp
    val expectedDrops = 2L * nTriples
    val recall = tp.toDouble / expectedDrops
    val precision = if (dropped == 0) 1.0 else tp.toDouble / dropped

    println(
      f"""{"metric":"semdedup","n_vectors":$nVec,"dim":$dim,"n_cells":$nCells,"cores":$cores,"train_sec":$trainSec%.3f,"mark_sec":$wall%.3f,"vecs_per_sec":${nVec / wall}%.0f,"planted_triples":$nTriples,"dropped":$dropped,"recall":$recall%.4f,"precision":$precision%.4f,"false_positives":$fp}""")
    spark.stop()
  }
}
