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

  /** Batched top-k: ALL queries against the frame in ONE Spark job —
    * the shape a real retrieval/decontamination workload has (thousands
    * of probes), where one job per query would drown in scheduling
    * overhead. The query block broadcasts; each partition keeps one
    * bounded k-heap per query and emits ≤ queries × k candidate rows;
    * a final narrow window reduces to the exact per-query top-k.
    *
    * `cellsPerQuery` = the IVF path: the broadcast inverts to a
    * cell → querying-qids index, the scan prunes to the union of probed
    * cells, and each row dots only the queries probing ITS cell —
    * per-row work drops from Q to Q·nProbe/nCells. `None` = brute
    * ground truth (every row dots every query). Both paths run the SAME
    * kernel and tie-break (sim desc, vec_id asc), so recall compares
    * like with like.
    */
  private def batchTopK(df: DataFrame, queries: Array[Array[Double]],
                        k: Int,
                        cellsPerQuery: Option[Array[Array[Int]]])
      : Map[Int, Seq[Long]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    val bcQ = sc.broadcast(queries)
    val bcCellToQ = cellsPerQuery.map { per =>
      val m = scala.collection.mutable.HashMap
        .empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
      per.zipWithIndex.foreach { case (cells, q) =>
        cells.foreach(c => m.getOrElseUpdate(c,
          scala.collection.mutable.ArrayBuffer.empty[Int]) += q)
      }
      sc.broadcast(m.view.mapValues(_.toArray).toMap)
    }
    val pruned = cellsPerQuery match {
      case Some(per) =>
        val union = per.flatten.distinct.toSeq
        df.filter(col("ivf_cell").isInCollection(union))
          .select(col("vec_id").cast("long"),
            col("embedding").cast("array<double>"),
            col("ivf_cell").cast("int"))
      case None =>
        df.select(col("vec_id").cast("long"),
          col("embedding").cast("array<double>"), lit(-1).as("ivf_cell"))
    }
    val candidates = pruned.as[(Long, Array[Double], Int)]
      .mapPartitions { it =>
        val qs = bcQ.value
        val byCell = bcCellToQ.map(_.value)
        // per-query bounded worst-first heap; better = higher sim, then
        // LOWER vec_id (the window below uses the same total order)
        val ord = Ordering.by[(Double, Long), (Double, Long)] {
          case (s, id) => (-s, id)
        }
        val heaps = Array.fill(qs.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
        it.foreach { case (id, v, cell) =>
          val qids: Array[Int] = byCell match {
            case Some(m) => m.getOrElse(cell, Array.empty[Int])
            case None => null // brute: all queries
          }
          val nq = if (qids == null) qs.length else qids.length
          var qi = 0
          while (qi < nq) {
            val q = if (qids == null) qi else qids(qi)
            val qv = qs(q)
            var d = 0.0; var nv = 0.0
            var x = 0
            val n = math.min(v.length, qv.length)
            while (x < n) { d += v(x) * qv(x); nv += v(x) * v(x); x += 1 }
            val sim = d / math.max(math.sqrt(nv), 1e-12)
            val h = heaps(q)
            if (h.size < k) h.enqueue((sim, id))
            else {
              val (ws, wid) = h.head
              if (sim > ws || (sim == ws && id < wid)) {
                h.dequeue(); h.enqueue((sim, id))
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, q) =>
          h.iterator.map { case (s, id) => (q, id, s) }
        }
      }
      .toDF("qid", "vec_id", "sim")
    // exact reduce: ≤ partitions × Q × k narrow rows through one window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    candidates.withColumn("_rn",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rn") <= k)
      .select("qid", "vec_id")
      .collect()
      .groupBy(_.getInt(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSeq }
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

    // ---- batched probe (r5): Q queries, ONE job per path ----
    val nQueries = args.lift(5).map(_.toInt).getOrElse(1000)
    val queries: Array[Array[Double]] = Array.tabulate(nQueries) { q =>
      val r = new java.util.SplittableRandom(0xBA7C4000L + q)
      val ctr = center(q % nClusters, dim)
      ctr.map(_ + 0.15 * r.nextGaussian())
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
    }
    // per-query probe cells rank on the driver: Q × nClusters dots
    val cellsPerQuery: Array[Array[Int]] = queries.map { q =>
      centroids.zipWithIndex.map { case (c, i) => (cos(q, c), i) }
        .sortBy { case (s, i) => (-s, i) }.take(nProbe).map(_._2)
    }
    val (bruteBatchSec, truth) = wall {
      batchTopK(emb, queries, k, None)
    }
    val (probeBatchSec, got) = wall {
      batchTopK(index, queries, k, Some(cellsPerQuery))
    }
    val batchRecall = queries.indices.map { q =>
      val t = truth.getOrElse(q, Seq.empty).toSet
      if (t.isEmpty) 1.0
      else got.getOrElse(q, Seq.empty).toSet.intersect(t).size.toDouble / t.size
    }.sum / nQueries

    println(
      f"""{"metric":"ann_1m","n_vectors":$nVec,"dim":$dim,"n_clusters":$nClusters,"n_probe":$nProbe,"k":$k,"brute_sec":$bruteSec%.3f,"train_sec":$trainSec%.3f,"index_build_sec":$buildSec%.3f,"probe_sec":$probeSec%.3f,"recall_at_k":$recall%.4f,"scanned_fraction":${scanned.toDouble / nVec}%.4f,"max_cell_over_ideal":$balance%.2f,"batch":{"n_queries":$nQueries,"brute_batch_sec":$bruteBatchSec%.3f,"probe_batch_sec":$probeBatchSec%.3f,"brute_qps":${nQueries / bruteBatchSec}%.1f,"probe_qps":${nQueries / probeBatchSec}%.1f,"batch_recall_at_k":$batchRecall%.4f}}""")
    spark.stop()
  }
}
