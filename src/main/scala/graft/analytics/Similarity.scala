package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Training-data-pipeline extension beyond the reference surface (the
  * reference has no vector ops): brute-force cosine top-k as the exact
  * baseline, and a random-hyperplane LSH-bucketed variant as the scale
  * path (bucket join instead of full cross product; recall tunable via
  * bands × bits).
  */
object Similarity {

  /** Cosine similarity between a vector column and a broadcast query
    * vector, computed with codegen'd higher-order functions — no UDF, no
    * shuffle; stays inside whole-stage codegen.
    */
  def cosineToQuery(vecCol: Column, query: Array[Double]): Column = {
    val q = array(query.map(lit): _*)
    val dv = vecCol.cast("array<double>")
    val dot = aggregate(zip_with(dv, q, (a, b) => a * b), lit(0.0), _ + _)
    val nv = sqrt(aggregate(zip_with(dv, dv, (a, b) => a * b), lit(0.0), _ + _))
    val nq = math.sqrt(query.map(x => x * x).sum)
    dot / (nv * lit(nq))
  }

  /** Exact brute-force top-k: one narrow scan + one top-k reduce. */
  def topK(embeddings: DataFrame, idCol: String, vecCol: String,
           query: Array[Double], k: Int): DataFrame =
    embeddings
      .select(col(idCol), round(cosineToQuery(col(vecCol), query), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** Deterministic random hyperplanes: `planes(p)(d)` from a seeded mix —
    * executors regenerate identically, nothing to broadcast.
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val r = new java.util.SplittableRandom(seed)
    Array.fill(nPlanes, dim)(r.nextGaussian())
  }

  /** Sign-bit LSH bucket id for a vector column: `nPlanes` dot-product
    * signs packed into one long. Vectors with high cosine land in the
    * same bucket with high probability.
    */
  def lshBucket(vecCol: Column, planes: Array[Array[Double]]): Column = {
    val dv = vecCol.cast("array<double>")
    planes.zipWithIndex.map { case (p, i) =>
      val pc = array(p.map(lit): _*)
      val dot = aggregate(zip_with(dv, pc, (a, b) => a * b), lit(0.0), _ + _)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Scale path: all-pairs near-neighbor candidates via LSH buckets.
    * `bands` independent bucket functions of `bitsPerBand` planes each;
    * pairs sharing any band bucket are candidates, then exact cosine
    * filters by `minSim`. Shuffles only bucket-colocated pairs —
    * O(sum of bucket sizes squared), not O(n²).
    */
  def nearPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                minSim: Double, bands: Int = 4, bitsPerBand: Int = 12,
                dim: Int = 64, seed: Long = 42L): DataFrame = {
    val withBuckets = (0 until bands).map { b =>
      val planes = hyperplanes(bitsPerBand, dim, seed + b * 1000L)
      embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"),
        lit(b).as("band"), lshBucket(col(vecCol), planes).as("bucket"))
    }.reduce(_ unionByName _)

    val a = withBuckets.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("vec").as("vec_a"))
    val b = withBuckets.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("vec").as("vec_b"))
    val da = col("vec_a").cast("array<double>")
    val db = col("vec_b").cast("array<double>")
    val dot = aggregate(zip_with(da, db, (x, y) => x * y), lit(0.0), _ + _)
    val na = sqrt(aggregate(zip_with(da, da, (x, y) => x * y), lit(0.0), _ + _))
    val nb = sqrt(aggregate(zip_with(db, db, (x, y) => x * y), lit(0.0), _ + _))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(dot / (na * nb), 4))
      .filter(col("sim") >= minSim)
      .select("id_a", "id_b", "sim")
      .distinct()
  }

  /** IVF-style variant: assign each vector to its nearest of `centroids`
    * (deterministic seed vectors), search only within the probe cell.
    * At cluster scale the cell assignment is the partition key, so a
    * query touches one partition instead of the full corpus.
    */
  def ivfAssign(embeddings: DataFrame, idCol: String, vecCol: String,
                centroids: Array[Array[Double]]): DataFrame = {
    val sims = centroids.zipWithIndex.map { case (c, i) =>
      struct(round(cosineToQuery(col(vecCol), c), 6).as("sim"),
        lit(i).as("cell"))
    }
    embeddings.select(col(idCol), col(vecCol),
      greatest(sims: _*).getField("cell").as("ivf_cell"))
  }
}
