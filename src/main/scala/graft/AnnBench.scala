package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.Similarity

/** ANN benchmark main: brute-force cosine top-k vs trained-IVF probe at
  * the million-vector scale, printing ONE JSON line with wall times,
  * recall@k vs the exact answer, and the scanned-fraction the probe
  * achieves. Complements AnalyticsSpec's small-corpus recall assertions
  * with a record at a scale where the scan-fraction economics actually
  * show (BENCH.md "ANN at 1M vectors").
  *
  * Args (all optional): nVectors dim nClusters nProbe k
  * Defaults: 1,000,000 × 64-dim, 128 planted clusters, probe 4, k 100.
  *
  * The corpus is deterministic: planted cluster centers from a seeded
  * PRNG per cluster id, members = center + noise, so runs are
  * reproducible and recall is measured against planted structure that
  * resembles real embedding geometry (tight clusters, not uniform).
  */
object AnnBench {

  private def center(cluster: Int, dim: Int): Array[Double] = {
    val r = new java.util.SplittableRandom(0xC0FFEE00L + cluster)
    Array.fill(dim)(r.nextGaussian())
  }

  def main(args: Array[String]): Unit = {
    val nVec = args.lift(0).map(_.toInt).getOrElse(1000000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val nClusters = args.lift(2).map(_.toInt).getOrElse(128)
    val nProbe = args.lift(3).map(_.toInt).getOrElse(4)
    val k = args.lift(4).map(_.toInt).getOrElse(100)

    val spark = SparkSession.builder()
      .appName("graft-ann-bench")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecUdf = udf { (id: Long) =>
      val c = (id % nClusters).toInt
      val ctr = center(c, dim)
      val r = new java.util.SplittableRandom(id)
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) { v(i) = ctr(i) + 0.15 * r.nextGaussian(); i += 1 }
      v
    }
    val emb: DataFrame = spark.range(nVec)
      .select(col("id").as("vec_id"), vecUdf(col("id")).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count() // materialize so neither path pays synthesis

    // query: a fresh point inside planted cluster 7
    val qr = new java.util.SplittableRandom(-7L)
    val query = center(7, dim).map(_ + 0.15 * qr.nextGaussian())

    def wall[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val (bruteSec, bruteIds) = wall {
      Similarity.topK(emb, "vec_id", "embedding", query, k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }

    val (trainSec, centroids) = wall {
      Similarity.trainCentroids(emb, "vec_id", "embedding",
        nClusters, iters = 6, sampleN = math.max(4096, 32 * nClusters))
    }

    // Index build: one assignment pass, written partitioned by cell so
    // every later probe is a partition-pruned read. This is the amortized
    // cost; the probe below is the per-query cost.
    val indexPath = sys.env.getOrElse("SPARK_GRAFT_ANN_INDEX",
      "/tmp/graft_ann_index")
    val (buildSec, _) = wall {
      Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
        .write.mode("overwrite").partitionBy("ivf_cell").parquet(indexPath)
    }
    val index = spark.read.parquet(indexPath)

    val (probeSec, ivfIds) = wall {
      Similarity.ivfTopK(index, "vec_id", "embedding", query, k,
        centroids, nProbe)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }

    // scanned fraction: rows in the probed cells / corpus
    val cellSizes = index.groupBy("ivf_cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val probedCells = {
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        d / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
      }
      centroids.zipWithIndex.map { case (c, i) => (cos(query, c), i) }
        .sortBy { case (s, i) => (-s, i) }.take(nProbe).map(_._2)
    }
    val scanned = probedCells.map(c => cellSizes.getOrElse(c, 0L)).sum
    val recall = ivfIds.intersect(bruteIds).size.toDouble / bruteIds.size
    val balance = {
      val sizes = cellSizes.values.toArray.sorted
      if (sizes.isEmpty) 0.0
      else sizes.last.toDouble / math.max(1.0, nVec.toDouble / nClusters)
    }

    println(
      f"""{"metric":"ann_1m","n_vectors":$nVec,"dim":$dim,"n_clusters":$nClusters,"n_probe":$nProbe,"k":$k,"brute_sec":$bruteSec%.3f,"train_sec":$trainSec%.3f,"index_build_sec":$buildSec%.3f,"probe_sec":$probeSec%.3f,"recall_at_k":$recall%.4f,"scanned_fraction":${scanned.toDouble / nVec}%.4f,"max_cell_over_ideal":$balance%.2f}""")
    spark.stop()
  }
}
