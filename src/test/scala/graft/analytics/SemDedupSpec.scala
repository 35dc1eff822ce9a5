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

  test("a corpus of only degenerate vectors returns all-kept") {
    val df = Seq(
      ("a", null.asInstanceOf[Seq[Float]]),
      ("b", Seq.fill(Dim)(0.0f)),
      ("c", Seq.fill(Dim)(0.0f)),
      ("d", Seq(1.0f) ++ Seq.fill(Dim - 1)(0.0f)) // one real direction
    ).toDF("vec_id", "embedding")
    val got = SemDedup.mark(df, "vec_id", "embedding",
      eps = 0.02, nClusters = 2, sampleN = 4)
    assert(got.count() == 4 && got.filter(!col("keep_sem")).count() == 0)
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

  test("markAgainst flags corpus docs inside a reference vector's " +
       "epsilon-ball; clean docs and degenerate vectors pass") {
    // the reference set: near-copies of topic-0 group-0 and topic-2
    // group-1 members (paraphrased benchmark leakage), jittered inside
    // the 0.02 ball
    val leakSources = Seq("t0_g0_0", "t2_g1_2")
    val byId = fixture.collect().map(r => r.getString(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val reference = leakSources.zipWithIndex.map { case (id, i) =>
      jitter(byId(id), 40000L + i, 0.003)
    }.toDF("embedding")
    val withDegenerate = fixture.unionByName(Seq(
      ("zz_null", null.asInstanceOf[Seq[Float]]),
      ("zz_zero", Seq.fill(Dim)(0.0f))).toDF("vec_id", "embedding"))
    val got = SemDedup.markAgainst(withDegenerate, reference,
        "vec_id", "embedding", eps = 0.02, nClusters = 4,
        nProbe = 4, sampleN = 256)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got.size == withDegenerate.count())
    // the leaked groups' members (0.005-jitter siblings of the leak
    // sources) are contaminated; everything else is clean
    val expected = Set("t0_g0_0", "t0_g0_1", "t0_g0_2",
      "t2_g1_0", "t2_g1_1", "t2_g1_2")
    val flagged = got.filter(_._2).keySet
    assert(flagged == expected, s"got $flagged")
    assert(!got("zz_null") && !got("zz_zero"))
  }

  test("tiled pair kernel partitions exactly like driver brute force " +
       "(single cell, block-boundary sizes)") {
    // 300 rows > two 128-row tiles, with a ragged tail — exercises
    // within-block, cross-block, and tail index math. Mixed structure:
    // jittered twins (edges) + random directions (mostly non-edges).
    val r = new java.util.SplittableRandom(77L)
    val rows = (0 until 300).map { i =>
      val base =
        if (i % 3 == 0 && i > 0) // every third row twins its predecessor
          jitter(fixture.collect()(0).getSeq[Float](1)
            .map(_.toDouble).toArray, 3000L + i, 0.004)
        else Seq.fill(Dim)((r.nextGaussian()).toFloat)
      (f"v$i%03d", base.map(x => x: Float))
    }
    val df = rows.toDF("vec_id", "embedding")
    val eps = 0.02
    val got = SemDedup.mark(df, "vec_id", "embedding", eps = eps,
        nClusters = 1, sampleN = 300, maxCellSize = 1000L)
      .collect().map(r2 => r2.getString(0) -> Option(r2.get(2))
        .map(_.toString)).toMap
    // driver brute force: all-pairs cosine + union-find
    val vs = rows.map { case (id, v) =>
      val a = v.map(_.toDouble).toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      id -> a.map(_ / n)
    }
    val parent = scala.collection.mutable.Map(vs.map(_._1 -> null: (String, String))
      .map { case (k, _) => k -> k }: _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val rt = find(parent(x)); parent(x) = rt; rt }
    for (i <- vs.indices; j <- (i + 1) until vs.size) {
      val d = vs(i)._2.zip(vs(j)._2).map { case (a, b) => a * b }.sum
      if (d >= 1.0 - eps) parent(find(vs(i)._1)) = find(vs(j)._1)
    }
    val bruteGroups = vs.map(_._1).groupBy(find).values
      .map(_.toSet).filter(_.size > 1).toSet
    val gotGroups = got.toSeq.collect { case (id, Some(c)) => c -> id }
      .groupBy(_._1).values.map(_.map(_._2).toSet).toSet
    assert(gotGroups == bruteGroups,
      s"kernel clusters != brute force: ${gotGroups.size} vs ${bruteGroups.size}")
  }

  test("an undersized cluster count fails loudly instead of running a " +
       "quadratic task") {
    val e = intercept[IllegalArgumentException] {
      SemDedup.mark(fixture, "vec_id", "embedding", eps = 0.02,
        nClusters = 1, sampleN = 256, maxCellSize = 10L)
    }
    assert(e.getMessage.contains("raise nClusters"))
  }

  test("pathological loose eps: an all-pairs cell yields O(members) " +
       "labels and one representative, not a quadratic pair set") {
    // r5 regression pin: eps so loose EVERY within-cell pair passes.
    // Through r4 the kernel materialized the O(m²) passing-pair set
    // into a CC pass (a 2M-doc CLI run at eps=0.07 filled the disk
    // with it); the in-kernel union-find emits one row per member and
    // skips the dot for already-connected pairs.
    val n = 3000
    val df = (0 until n)
      .map(i => (f"v$i%05d", Array.tabulate(8)(d => 1.0 + (i * 8 + d) * 1e-9).toSeq))
      .toDF("id", "vec")
    val marked = SemDedup.mark(df, "id", "vec", eps = 0.5, nClusters = 2)
    assert(marked.count() == n)
    val kept = marked.filter(col("keep_sem")).count()
    // one epsilon-group per cell; k-means may split the blob across
    // the 2 cells, so 1 or 2 representatives survive
    assert(kept >= 1 && kept <= 2, s"kept=$kept of $n")
  }
}
