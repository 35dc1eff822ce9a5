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
  *   3. candidate pairs: CELL-LOCAL ONLY — the paper's trick that makes
  *      all-pairs tractable: O(Σ cell²) COMPUTE instead of O(n²). The
  *      caller sizes `nClusters` so cells stay small (the paper uses
  *      k ≈ n/10⁴ on LAION); a max-cell-size guard fails LOUDLY with
  *      that advice rather than letting one merged cell run a quadratic
  *      task. Unit-normalized vectors ride the cell shuffle once;
  *      cosine is then a plain dot.
  *   4. duplicate groups (r5): resolved IN-TASK — cells partition the
  *      corpus, so ε-graph components never span cells, and the kernel
  *      that already holds the whole cell runs a union-find while it
  *      scans tiles, emitting one (id, min-id-of-component) row per
  *      non-trivial-group member: O(members) OUTPUT and zero extra
  *      jobs. (Through r4 the kernel emitted the raw passing-pair set
  *      into [[MinHash.clusters]]; on a too-loose ε that output is
  *      O(members²) — a measured 2M-doc run filled the disk with it.
  *      Now a pathological ε costs bounded compute only: rows already
  *      sharing a root skip their dot product.)
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
           maxCellSize: Long = DefaultMaxCellSize,
           trainedCentroids: Option[Array[Array[Double]]] = None)
      : DataFrame = {
    require(eps > 0.0 && eps < 1.0, s"eps must be in (0,1), got $eps")
    val spark = embeddings.sparkSession
    val minSim = 1.0 - eps

    // centroid training is the one driver-side (single-threaded) phase;
    // long-lived deployments train once and pass `trainedCentroids` to
    // amortize it across incremental batches (and to keep cell ids
    // stable between runs)
    val centroids = trainedCentroids.getOrElse(
      Similarity.trainCentroids(embeddings, idCol, vecCol,
        k = nClusters, iters = iters,
        sampleN = math.max(sampleN, nClusters), seed = seed))
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
    val hottestRow = assigned.filter(col("sem_cell").isNotNull)
      .groupBy("sem_cell").count()
      .agg(max("count")).head()
    // null max = zero comparable rows (every vector null/zero): nothing
    // to pair, the guard passes vacuously and mark returns all-kept
    val hottest = if (hottestRow.isNullAt(0)) 0L else hottestRow.getLong(0)
    require(hottest <= maxCellSize,
      s"semDedup: largest cell holds $hottest members (cap $maxCellSize)" +
        s" — raise nClusters (paper guidance: k ≈ corpus/10^4) or " +
        s"maxCellSize if the quadratic task is intentional")

    // within-cell duplicate GROUPS above the ε threshold. One shuffle
    // co-locates each cell, then a per-partition kernel runs the
    // quadratic dot loop over primitive arrays — ZERO allocation per
    // pair. The declarative alternative (cell self-join +
    // `aggregate(zip_with(...))` filter) allocates a fresh array per
    // candidate pair, and at 10⁸ pairs the collector becomes the
    // bottleneck: measured 129 s at 8 threads but 364 s at 32 (inverse
    // scaling — all threads queueing on GC) vs this kernel's
    // near-linear profile. Cell membership is bounded by the guard
    // above, so the buffer is ≤ maxCellSize rows.
    //
    // r5: the kernel resolves connectivity IN-TASK with a union-find
    // over the cell (cells partition the corpus, so ε-graph components
    // never span cells — a distributed CC pass can merge nothing the
    // task can't) and emits ONE (id, min-id-of-component) row per
    // member of a non-trivial group: O(members) output. The previous
    // form emitted the raw passing-pair set + ran CC over it, which is
    // O(members²) OUTPUT on a too-loose ε — a 2M-doc CLI run at
    // ε = 0.07 on the trigram embedding (within-cell pass rate ≈ 1)
    // materialized the pair set until the disk filled. Now a
    // pathological ε costs bounded compute only: once two rows share a
    // root the kernel skips their dot product entirely, so the
    // worst-case all-duplicates cell degrades to O(members²) find()
    // calls (~ns each), not 256-dim dots + a corpus-sized shuffle.
    val session = spark
    import session.implicits._
    // block-tiled upper triangle (GEMM-style): the naive i×j sweep
    // streams the cell's whole vector buffer once PER ROW — ~n/B×
    // more cache traffic than needed — and the kernel then scales
    // with shared-LLC bandwidth instead of cores (measured: 74 s at
    // 8 threads → 57 s at 32 on 1M×64). A 128-row tile (2×64 KB
    // working set) keeps both blocks L2-resident and restores
    // compute-bound scaling. Tile order affects only which pairs get
    // dotted (connectivity unions are order-insensitive), never the
    // final components or labels.
    val labels = assigned.filter(col("sem_cell").isNotNull)
      .select(col("sem_cell").cast("int").as("_c"), col("_sid"),
        col("_u"))
      .repartition(col("_c"))
      .sortWithinPartitions("_c", "_sid")
      .as[(Int, String, Array[Double])]
      .mapPartitions { rows =>
        val ids = scala.collection.mutable.ArrayBuffer.empty[String]
        val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        var cur = Int.MinValue
        def flush(): Iterator[(String, String)] = {
          val m = vecs.length
          if (m == 0) return Iterator.empty
          // union-find over cell-local indices; roots attach toward the
          // smaller index, and ids arrive SORTED (sortWithinPartitions
          // on (_c, _sid)), so a component's root index is its min id —
          // the same label MinHash.clusters assigns, order-independent
          val parent = Array.tabulate(m)(identity)
          def find(x: Int): Int = {
            var r = x
            while (parent(r) != r) r = parent(r)
            var c = x
            while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
            r
          }
          val B = 128
          var bi = 0
          while (bi < m) {
            val biEnd = math.min(bi + B, m)
            var bj = bi
            while (bj < m) {
              val bjEnd = math.min(bj + B, m)
              var i = bi
              while (i < biEnd) {
                val vi = vecs(i)
                var j = math.max(bj, i + 1)
                while (j < bjEnd) {
                  // roots re-found at EVERY use: a cached root can go
                  // stale after a union earlier in this row, and
                  // writing parent(<non-root>) would split components
                  if (find(i) != find(j)) {
                    val vj = vecs(j)
                    var d = 0.0
                    var x = 0
                    val n = math.min(vi.length, vj.length)
                    while (x < n) { d += vi(x) * vj(x); x += 1 }
                    if (d >= minSim) {
                      val ra = find(i)
                      val rb = find(j)
                      if (ra < rb) parent(rb) = ra
                      else if (rb < ra) parent(ra) = rb
                    }
                  }
                  j += 1
                }
                i += 1
              }
              bj += B
            }
            bi += B
          }
          val sizes = new Array[Int](m)
          var i = 0
          while (i < m) { sizes(find(i)) += 1; i += 1 }
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          i = 0
          while (i < m) {
            val r = find(i)
            if (sizes(r) > 1) out += ((ids(i), ids(r)))
            i += 1
          }
          ids.clear(); vecs.clear()
          out.iterator
        }
        rows.flatMap { case (c, id, v) =>
          val emitted = if (c != cur && cur != Int.MinValue) flush()
                        else Iterator.empty
          cur = c
          ids += id
          vecs += v
          emitted
        } ++ flush()
      }
      .toDF("_sid", "sem_cluster")

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

  /** Semantic decontamination: mark rows of `embeddings` whose vector
    * lies within the cosine ε-ball of ANY `reference` vector — the
    * embedding-space analogue of [[graft.dedup.MinHash.markAgainst]]
    * (n-gram decontamination misses paraphrased benchmark leakage; this
    * catches it). Returns `(id, sem_contaminated)` for every input row.
    *
    * Scale shape: centroids train on the CORPUS sample; both sides take
    * one narrow assignment pass, and the only join is cell-keyed corpus
    * × reference — the reference (benchmark suites: thousands of rows)
    * is the small side, so the join broadcasts per cell. Reference
    * vectors near a cell BOUNDARY are probed into `nProbe` nearest
    * cells, bounding the boundary-miss rate the same way IVF search
    * does.
    */
  def markAgainst(embeddings: DataFrame, reference: DataFrame,
                  idCol: String, vecCol: String, eps: Double,
                  nClusters: Int, nProbe: Int = 2, iters: Int = 8,
                  sampleN: Int = 4096, seed: Long = 42L,
                  trainedCentroids: Option[Array[Array[Double]]] = None)
      : DataFrame = {
    require(eps > 0.0 && eps < 1.0, s"eps must be in (0,1), got $eps")
    val spark = embeddings.sparkSession
    val minSim = 1.0 - eps
    // callers probing many batches against one reference (the streaming
    // gate) pass centroids trained ONCE — per-batch retraining would
    // shift cell boundaries between batches and pay the driver cost on
    // every micro-batch
    val centroids = trainedCentroids.getOrElse(
      Similarity.trainCentroids(embeddings, idCol, vecCol,
        k = nClusters, iters = iters,
        sampleN = math.max(sampleN, nClusters), seed = seed))
    require(nProbe >= 1 && nProbe <= centroids.length,
      s"nProbe must be in [1, ${centroids.length}], got $nProbe")
    val unit = centroids.map(c => {
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n > 0) c.map(_ / n) else c
    })
    val bc = spark.sparkContext.broadcast(unit)

    // corpus side: nearest cell + unit vector (top-1 — the corpus is the
    // big side and must not replicate)
    def topCells(k: Int) = udf { (v: Seq[Double]) =>
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
          val sims = cs.map { ctr =>
            var d = 0.0
            var j = 0
            val n = math.min(u.length, ctr.length)
            while (j < n) { d += u(j) * ctr(j); j += 1 }
            d
          }
          val cells = sims.zipWithIndex.sortBy { case (s, c) => (-s, c) }
            .take(k).map(_._2)
          (cells, u)
        }
      }
    }
    val corpus = embeddings
      .select(col(idCol).cast("string").as("_sid"),
        topCells(1)(col(vecCol).cast("array<double>")).as("_a"))
      .select(col("_sid"), col("_a._1").getItem(0).as("_cell"),
        col("_a._2").as("_u"))
    // reference side: replicated into its nProbe nearest cells
    val ref = reference
      .select(topCells(nProbe)(col(vecCol).cast("array<double>")).as("_a"))
      .filter(col("_a").isNotNull)
      .select(explode(col("_a._1")).as("_cell"), col("_a._2").as("_rv"))
    // tight-loop dot, not aggregate(zip_with(...)): the declarative form
    // allocates a fresh array per candidate pair, which inverts scaling
    // under many threads (see mark()'s kernel note)
    val dotUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
      var d = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { d += a(i) * b(i); i += 1 }
      d
    }
    val hits = corpus.filter(col("_cell").isNotNull)
      .join(ref, Seq("_cell"))
      .filter(dotUdf(col("_u"), col("_rv")) >= lit(minSim))
      .select(col("_sid")).distinct()
      .withColumn("_hit", lit(true))
    corpus.select("_sid").join(hits, Seq("_sid"), "left")
      .select(col("_sid").as(idCol),
        coalesce(col("_hit"), lit(false)).as("sem_contaminated"))
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
