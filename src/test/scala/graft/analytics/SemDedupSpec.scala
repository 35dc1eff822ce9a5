package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SemDeDup over a planted fixture: 4 well-separated semantic topics,
  * each holding duplicate groups (same direction + tiny noise) and
  * genuine singletons (big noise). Correct behavior: every planted group
  * collapses to one representative — the member FARTHEST from its
  * k-means centroid (the paper's diversity rule) — singletons survive,
  * and nothing leaks across topics.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 24

  private def proto(p: Int): Array[Double] = {
    val r = new java.util.SplittableRandom(500L + p)
    val v = Array.fill(Dim)(r.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private def jitter(base: Array[Double], seed: Long, sigma: Double) = {
    val r = new java.util.SplittableRandom(seed)
    base.map(x => (x + sigma * r.nextGaussian()).toFloat).toSeq
  }

  // ids encode provenance: "t<topic>_g<group>_<member>" for planted dup
  // groups, "t<topic>_u<i>" for singletons
  private lazy val fixture = {
    val rows = (0 until 4).flatMap { t =>
      val base = proto(t)
      val groups = (0 until 3).flatMap { g =>
        val gBase = jitter(base, 900L + t * 10 + g, 0.25)
          .map(_.toDouble).toArray
        (0 until 3).map(m =>
          (f"t${t}_g${g}_$m", jitter(gBase, t * 100L + g * 10 + m, 0.005)))
      }
      val singles = (0 until 6).map(i =>
        (f"t${t}_u$i", jitter(base, 7000L + t * 50 + i, 0.4)))
      groups ++ singles
    }
    rows.toDF("vec_id", "embedding")
  }

  test("planted duplicate groups collapse to one representative each") {
    val got = SemDedup.mark(fixture, "vec_id", "embedding",
      eps = 0.02, nClusters = 4, sampleN = 256).cache()
    assert(got.count() == fixture.count())
    val rows = got.collect().map(r => (r.getString(0),
      Option(r.get(2)).map(_.toString), r.getBoolean(3)))
    val byGroup = rows.filter(_._1.contains("_g"))
      .groupBy(_._1.split("_").take(2).mkString("_"))
    byGroup.foreach { case (g, members) =>
      assert(members.length == 3, s"$g lost members")
      val clusters = members.flatMap(_._2).distinct
      assert(clusters.length == 1, s"$g not one cluster: $members")
      assert(members.count(_._3) == 1,
        s"$g must keep exactly one representative: $members")
    }
    // distinct groups never merge (0.25-sigma jitter between groups is
    // far outside the 0.02 epsilon ball)
    val clusterToGroups = rows.filter(_._2.isDefined)
      .groupBy(_._2.get)
      .view.mapValues(_.map(_._1.split("_").take(2).mkString("_")).distinct)
    clusterToGroups.foreach { case (c, gs) =>
      assert(gs.length == 1, s"cluster $c merged groups $gs")
    }
    // singletons are unique and kept
    rows.filter(_._1.contains("_u")).foreach { case (id, cl, keep) =>
      assert(cl.isEmpty && keep, s"singleton $id marked dup")
    }
    got.unpersist()
  }

  test("representative is the group member farthest from its centroid") {
    val got = SemDedup.mark(fixture, "vec_id", "embedding",
      eps = 0.02, nClusters = 4, sampleN = 256)
    // recompute each member's cosine to its own trained centroid
    val cents = Similarity.trainCentroids(fixture, "vec_id", "embedding",
      k = 4, iters = 8, sampleN = 256)
    val byId = fixture.collect().map(r => r.getString(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cosTo(id: String, c: Array[Double]): Double = {
      val v = byId(id)
      val nv = math.sqrt(v.map(x => x * x).sum)
      val nc = math.sqrt(c.map(x => x * x).sum)
      v.zip(c).map { case (x, y) => x * y }.sum / (nv * nc)
    }
    val marked = got.filter(col("sem_cluster").isNotNull)
      .select("vec_id", "sem_cell", "sem_cluster", "keep_sem")
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.get(2).toString, r.getBoolean(3)))
    marked.groupBy(_._3).foreach { case (_, members) =>
      val withCos = members.map(m => (m._1, cosTo(m._1, cents(m._2)), m._4))
      val expected = withCos.minBy(m => (m._2, m._1))._1
      val kept = withCos.filter(_._3).map(_._1)
      assert(kept.toSeq == Seq(expected),
        s"representative $kept != farthest-from-centroid $expected")
    }
  }

  test("deterministic at any partitioning; dedup wrapper drops exactly " +
       "the non-representatives") {
    val m1 = SemDedup.mark(fixture, "vec_id", "embedding",
      eps = 0.02, nClusters = 4, sampleN = 256)
      .orderBy("vec_id").collect().toSeq
    val m2 = SemDedup.mark(fixture.repartition(13), "vec_id", "embedding",
      eps = 0.02, nClusters = 4, sampleN = 256)
      .orderBy("vec_id").collect().toSeq
    assert(m1 == m2)
    val keepIds = m1.filter(_.getBoolean(3)).map(_.getString(0)).toSet
    val got = SemDedup.dedup(fixture, fixture, "vec_id", "embedding",
      eps = 0.02, nClusters = 4, sampleN = 256)
      .select("vec_id").as[String].collect().toSet
    assert(got == keepIds)
    // 4 topics × (3 groups collapsing 3→1 + 6 singletons) = 4 × 9
    assert(got.size == 4 * 9)
  }

  test("null and zero vectors are kept, never paired") {
    val extra = Seq(
      ("zz_null", null.asInstanceOf[Seq[Float]]),
      ("zz_zero", Seq.fill(Dim)(0.0f)),
      ("zz_zero2", Seq.fill(Dim)(0.0f))
    ).toDF("vec_id", "embedding")
    val got = SemDedup.mark(fixture.unionByName(extra), "vec_id",
        "embedding", eps = 0.02, nClusters = 4, sampleN = 256)
      .filter(col("vec_id").startsWith("zz_")).collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2) && r.getBoolean(3),
        s"degenerate vector mishandled: $r")
    }
  }

  test("an undersized cluster count fails loudly instead of running a " +
       "quadratic task") {
    val e = intercept[IllegalArgumentException] {
      SemDedup.mark(fixture, "vec_id", "embedding", eps = 0.02,
        nClusters = 1, sampleN = 256, maxCellSize = 10L)
    }
    assert(e.getMessage.contains("raise nClusters"))
  }
}
