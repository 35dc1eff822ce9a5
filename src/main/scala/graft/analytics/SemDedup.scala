package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.MinHash

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication"): remove documents that are
  * SEMANTIC duplicates — same content re-expressed, which MinHash/SimHash
  * (lexical overlap) cannot see — by clustering the embedding space with
  * spherical k-means and treating within-cluster pairs above a cosine
  * threshold as duplicates.
  *
  * Scale shape, stage by stage:
  *   1. centroids: driver-side spherical k-means over a bounded
  *      deterministic sample ([[Similarity.trainCentroids]]) — the
  *      model-then-broadcast flow every learned component here uses.
  *   2. cell assignment + own-centroid cosine: one narrow broadcast pass
  *      (no shuffle; [[Similarity.ivfAssign]]'s argmax-dot loop).
  *   3. candidate pairs: a self-join ON THE CELL KEY ONLY — the paper's
  *      trick that makes all-pairs tractable: O(Σ cell²) instead of
  *      O(n²). The caller sizes `nClusters` so cells stay small (the
  *      paper uses k ≈ n/10⁴ on LAION); a max-cell-size guard fails
  *      LOUDLY with that advice rather than letting one merged cell run
  *      a quadratic task. Unit-normalized vectors ride the shuffle once
  *      each per side; cosine is then a plain dot.
  *   4. duplicate groups: connected components over the ε-edges
  *      ([[MinHash.clusters]] — driver union-find on small graphs,
  *      pointer-doubling distributed CC beyond).
  *   5. representative: per group keep the member with the LOWEST cosine
  *      to its cluster centroid (the paper's diversity-preserving choice
  *      — the most "outlying" phrasing survives), deterministic id
  *      tiebreak, computed with one `min(struct(...))` aggregation over
  *      the duplicate subgraph only.
  *
  * Rows with null/zero embeddings carry no direction to compare: they get
  * a null cell and are always kept (a caller wanting them gone has the
  * exact-dedup family).
  */
object SemDedup {

  /** Default loud ceiling on a single cell's membership before the
    * within-cell self-join (2^14 members ≈ 1.3e8 dot products for the
    * worst task — heavy but bounded; beyond it the fix is more clusters,
    * not a bigger task).
    */
  val DefaultMaxCellSize: Long = 1L << 14

  /** Mark semantic duplicates: returns `(id, sem_cell, sem_cluster,
    * keep_sem)` — one row per input row. `sem_cluster` is null for rows
    * with no duplicate; `keep_sem` is true for uniques and for each
    * duplicate group's representative.
    *
    * `eps` is the paper's ε: members of a cell closer than cosine
    * `1 - eps` are duplicates (LAION dedup used ε ∈ [0.05, 0.5]).
    */
  def mark(embeddings: DataFrame, idCol: String, vecCol: String,
           eps: Double, nClusters: Int, iters: Int = 8,
           sampleN: Int = 4096, seed: Long = 42L,
           maxCellSize: Long = DefaultMaxCellSize): DataFrame = {
    require(eps > 0.0 && eps < 1.0, s"eps must be in (0,1), got $eps")
    val spark = embeddings.sparkSession
    val minSim = 1.0 - eps

    val centroids = Similarity.trainCentroids(embeddings, idCol, vecCol,
      k = nClusters, iters = iters, sampleN = math.max(sampleN, nClusters),
      seed = seed)
    val unit = centroids.map(c => {
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n > 0) c.map(_ / n) else c
    })
    val bc = spark.sparkContext.broadcast(unit)

    // one narrow pass: cell id, cosine to OWN centroid (the
    // representative-selection key), and the unit-normalized vector the
    // pair join will dot. Zero/null vectors → null cell.
    val assignUdf = udf { (v: Seq[Double]) =>
      if (v == null) null
      else {
        var norm = 0.0
        var i = 0
        while (i < v.length) { norm += v(i) * v(i); i += 1 }
        if (norm <= 0.0) null
        else {
          val inv = 1.0 / math.sqrt(norm)
          val u = new Array[Double](v.length)
          i = 0
          while (i < v.length) { u(i) = v(i) * inv; i += 1 }
          val cs = bc.value
          var best = 0
          var bestDot = Double.NegativeInfinity
          var c = 0
          while (c < cs.length) {
            val ctr = cs(c)
            var d = 0.0
            i = 0
            val n = math.min(u.length, ctr.length)
            while (i < n) { d += u(i) * ctr(i); i += 1 }
            if (d > bestDot) { bestDot = d; best = c }
            c += 1
          }
          (best, bestDot, u)
        }
      }
    }

    val assigned = embeddings
      .select(col(idCol).cast("string").as("_sid"),
        assignUdf(col(vecCol).cast("array<double>")).as("_a"))
      .select(col("_sid"), col("_a._1").as("sem_cell"),
        col("_a._2").as("_cdist"), col("_a._3").as("_u"))
      .transform(graft.SparkUtil.materialize)

    // loud guard BEFORE the quadratic join: a merged giant cell means
    // nClusters is undersized for this corpus, and the fix is more
    // clusters — never a silent hour-long straggler task
    val hottest = assigned.filter(col("sem_cell").isNotNull)
      .groupBy("sem_cell").count()
      .agg(max("count")).head().getLong(0)
    require(hottest <= maxCellSize,
      s"semDedup: largest cell holds $hottest members (cap $maxCellSize)" +
        s" — raise nClusters (paper guidance: k ≈ corpus/10^4) or " +
        s"maxCellSize if the quadratic task is intentional")

    // within-cell pairs above the ε threshold; vectors are unit, so
    // cosine is the plain dot (codegen'd higher-order aggregate)
    val a = assigned.filter(col("sem_cell").isNotNull)
      .select(col("sem_cell"), col("_sid").as("id_a"), col("_u").as("va"))
    val b = assigned.filter(col("sem_cell").isNotNull)
      .select(col("sem_cell"), col("_sid").as("id_b"), col("_u").as("vb"))
    val dot: Column = aggregate(
      zip_with(col("va"), col("vb"), (x, y) => x * y), lit(0.0), _ + _)
    val edges = a.join(b, Seq("sem_cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(dot >= lit(minSim))
      .select(col("id_a").as("src"), col("id_b").as("dst"))

    val labels = MinHash.clusters(edges)
      .select(col("id").as("_sid"), col("cluster").as("sem_cluster"))

    // representative per duplicate group: LOWEST cosine to the centroid
    // (keep the outlier — SemDeDup §3.1), lowest id as the tiebreak.
    // Aggregation runs over the duplicate subgraph only.
    val marked = assigned.join(labels, Seq("_sid"), "left")
    val reps = marked.filter(col("sem_cluster").isNotNull)
      .groupBy("sem_cluster")
      .agg(min(struct(col("_cdist"), col("_sid"))).as("_rep"))
      .select(col("sem_cluster"), col("_rep._sid").as("_rep_id"))
    marked.join(reps, Seq("sem_cluster"), "left")
      .select(col("_sid").as(idCol), col("sem_cell"), col("sem_cluster"),
        (col("sem_cluster").isNull || col("_sid") === col("_rep_id"))
          .as("keep_sem"))
  }

  /** Filter wrapper: drop semantic duplicates from `df` (keyed by
    * `idCol`), keeping each group's representative. The broadcast of the
    * O(duplicates) mark table follows the same shape as MinHash's
    * cluster-map join-back.
    */
  def dedup(df: DataFrame, embeddings: DataFrame, idCol: String,
            vecCol: String, eps: Double, nClusters: Int,
            iters: Int = 8, sampleN: Int = 4096, seed: Long = 42L,
            maxCellSize: Long = DefaultMaxCellSize): DataFrame = {
    val drops = mark(embeddings, idCol, vecCol, eps, nClusters, iters,
        sampleN, seed, maxCellSize)
      .filter(!col("keep_sem"))
      .select(col(idCol).as("_drop_id"))
    df.join(drops, df(idCol).cast("string") === col("_drop_id"),
        "left_anti")
  }
}
