package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, groups: Int, seed: Long = 3L) = {
    val rng = new java.util.SplittableRandom(seed)
    (1 to n).map(i =>
      (i.toLong, s"g${rng.nextInt(groups)}", rng.nextInt(50)))
      .toDF("id", "grp", "score")
  }

  test("rankInGroup equals the naive row_number window") {
    val df = fixture(500, 4)
    val got = Ranking.rankInGroup(df, Seq("grp"), Seq("score", "id"),
      "rk", numPartitions = 7)
    val w = Window.partitionBy("grp").orderBy("score", "id")
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.count() == 500)
  }

  test("rankInGroup is identical at different parallelism") {
    val df = fixture(400, 3, seed = 9L)
    val a = Ranking.rankInGroup(df, Seq("grp"), Seq("score", "id"),
      "rk", numPartitions = 2).collect().toSet
    val b = Ranking.rankInGroup(df, Seq("grp"), Seq("score", "id"),
      "rk", numPartitions = 19).collect().toSet
    assert(a == b)
  }

  test("rankInGroup global rank (no group cols) and null groups") {
    val df = Seq(
      (1L, null.asInstanceOf[String], 5), (2L, "", 3),
      (3L, null.asInstanceOf[String], 1), (4L, "", 9)
    ).toDF("id", "grp", "score")
    // null group and empty-string group must rank independently
    val got = Ranking.rankInGroup(df, Seq("grp"), Seq("score", "id"), "rk")
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // empty groupCols = one global group
    val global = Ranking.rankInGroup(df, Nil, Seq("score", "id"), "rk")
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(global == Map(3L -> 1L, 2L -> 2L, 1L -> 3L, 4L -> 4L))
  }

  test("ntileFromRank matches Spark's ntile across sizes and k") {
    for (n <- Seq(1, 2, 5, 9, 10, 11, 47); k <- Seq(1, 3, 4, 10)) {
      val df = (1 to n).map(i => (i.toLong, i)).toDF("id", "v")
      val w = Window.orderBy("v")
      val want = df.withColumn("t", ntile(k).over(w).cast("long"))
        .select("id", "t").as[(Long, Long)].collect().toMap
      val got = df
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("t", Ranking.ntileFromRank(col("rk"), lit(n.toLong), k))
        .select("id", "t").as[(Long, Long)].collect().toMap
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("ranks survive a downstream coalesce(1)") {
    // regression: coalesce re-tasks the checkpoint scan, streaming every
    // stored partition through ONE task — a TaskContext-based partition
    // id would be 0 for all of them and every offset lookup would miss,
    // silently restarting ranks at each partition boundary (caught by
    // the driver oracle on the first Verify run). The stored-pid design
    // must produce identical ranks with and without the coalesce.
    val df = fixture(400, 2, seed = 21L)
    val ranked = Ranking.rankInGroup(df, Seq("grp"), Seq("score", "id"),
      "rk", numPartitions = 8)
    val direct = ranked.collect().toSet
    val out = s"/tmp/ranking-coalesce-${System.nanoTime()}"
    ranked.coalesce(1).write.parquet(out)
    val reread = spark.read.parquet(out).collect().toSet
    assert(reread == direct)
    val w = Window.partitionBy("grp").orderBy("score", "id")
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .collect().toSet
    assert(reread == want)
  }

  test("rankInGroup on an empty frame returns empty, schema intact") {
    val df = fixture(10, 2).filter(col("id") < 0)
    val got = Ranking.rankInGroup(df, Seq("grp"), Seq("score", "id"), "rk")
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("id", "grp", "score", "rk"))
  }

  test("rankInGroup refuses an existing output column") {
    val df = fixture(10, 2)
    intercept[IllegalArgumentException] {
      Ranking.rankInGroup(df, Seq("grp"), Seq("score", "id"), "score")
    }
  }

  test("quantileProfile matches R-7 interpolation by hand; approx close") {
    import spark.implicits._
    // group a: values 1..5 -> p50 = 3, p90 = 0.9*(5-1)+1 = 4.6
    // group b: values 10, 20 -> p50 = 15, p90 = 19
    val df = (Seq.tabulate(5)(i => ("a", (i + 1).toDouble)) ++
      Seq(("b", 10.0), ("b", 20.0))).toDF("grp", "v")
    val got = Ranking.quantileProfile(df, "grp", "v", Seq(0.5, 0.9))
      .as[(String, Double, Double)].collect()
      .map { case (k, p50, p90) => k -> ((p50, p90)) }.toMap
    assert(got("a") == ((3.0, 4.6)))
    assert(got("b") == ((15.0, 19.0)))
    assert(Ranking.quantileProfile(df, "grp", "v", Seq(0.99))
      .columns.toSeq == Seq("grp", "p99"))
    val approx = Ranking.quantileProfile(df, "grp", "v", Seq(0.5),
      exact = false).as[(String, Double)].collect().toMap
    assert(math.abs(approx("a") - 3.0) <= 1.0)
    intercept[IllegalArgumentException] {
      Ranking.quantileProfile(df, "grp", "v", Seq(1.5))
    }
  }
}

class CcNetSpec extends SparkSpec {
  import spark.implicits._

  test("buckets equals ntile(3) window; head is the lowest-score third") {
    val rng = new java.util.SplittableRandom(7L)
    val df = (1 to 300).map(i =>
      (i.toLong, s"l${rng.nextInt(3)}", rng.nextInt(1000)))
      .toDF("doc_id", "lang", "ppl")
    val got = graft.filters.CcNet.buckets(df, "ppl", "lang", Seq("doc_id"))
    val w = Window.partitionBy("lang").orderBy("ppl", "doc_id")
    val want = df.withColumn("ppl_bucket",
      when(ntile(3).over(w) === 1, "head")
        .when(ntile(3).over(w) === 2, "middle").otherwise("tail"))
    assert(got.select("doc_id", "lang", "ppl", "ppl_bucket")
      .except(want).isEmpty)
    assert(got.count() == 300)
    // head really is the fluent (low-perplexity) side
    val headMax = got.filter(col("ppl_bucket") === "head" &&
      col("lang") === "l0").agg(max("ppl")).as[Int].head()
    val tailMin = got.filter(col("ppl_bucket") === "tail" &&
      col("lang") === "l0").agg(min("ppl")).as[Int].head()
    assert(headMax <= tailMin)
  }

  test("null scores rank LAST (tail), never head") {
    // Spark's ascending sort is nulls-first: unguarded, a doc with no
    // fluency evidence (untrained language -> null perplexity) ranked
    // ahead of every scored doc and shipped under a keep-head recipe
    val df = ((1 to 9).map(i => (i.toLong, "en", Some(i * 10))) ++
      Seq((100L, "en", None: Option[Int]), (101L, "en", None: Option[Int]),
        (102L, "en", None: Option[Int])))
      .toDF("doc_id", "lang", "ppl")
    val got = graft.filters.CcNet.buckets(df, "ppl", "lang", Seq("doc_id"))
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    assert(Seq(100L, 101L, 102L).forall(got(_) == "tail"),
      s"null-score docs must land in tail: $got")
    assert((1 to 4).forall(i => got(i.toLong) == "head"), s"got $got")
  }

  test("k > group size yields one row per bucket; generic labels") {
    val df = Seq((1L, "en", 2.0), (2L, "en", 1.0))
      .toDF("doc_id", "lang", "ppl")
    val got = graft.filters.CcNet.buckets(df, "ppl", "lang",
      Seq("doc_id"), k = 5)
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "b1", 1L -> "b2"))
  }

  test("real KN perplexity column flows through the bucketer") {
    val lm = graft.filters.KneserNeyLM.train(Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox likes the lazy dog"))
    val docs = Seq(
      (1L, "en", "the quick brown fox"),
      (2L, "en", "zxq vbn mkl pqr"),
      (3L, "en", "the lazy dog"),
      (4L, "en", "the quick brown fox jumps"),
      (5L, "en", "over the lazy dog"),
      (6L, "en", "qqq www eee rrr")
    ).toDF("doc_id", "lang", "text")
    val bc = spark.sparkContext.broadcast(lm)
    val pplUdf = udf(graft.filters.KneserNeyLM.perplexityFn(bc))
    val scored = docs.withColumn("ppl", pplUdf(col("text")))
    val b = graft.filters.CcNet.buckets(scored, "ppl", "lang", Seq("doc_id"))
    val byBucket = b.select("ppl_bucket", "doc_id").as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // gibberish docs (2, 6) must land in the tail, fluent ones in head
    assert(byBucket("tail").intersect(Set(2L, 6L)) == Set(2L, 6L))
    assert(!byBucket("head").exists(Set(2L, 6L)))
  }
}

class TemperatureSampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // group sizes 100 / 25 / 4 → sqrt-weights 10 / 5 / 2 (W = 17)
    ((1 to 100).map(i => (i.toLong, "en")) ++
      (101 to 125).map(i => (i.toLong, "fr")) ++
      (126 to 129).map(i => (i.toLong, "sw")))
      .toDF("doc_id", "lang")
  }

  test("targets follow floor-sqrt temperature weights exactly") {
    val got = Sampling.temperatureSample(corpus, "lang", totalTarget = 17L,
      keyCols = Seq("doc_id"))
    val counts = got.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    // 17 * 10/17 = 10, 17 * 5/17 = 5, 17 * 2/17 = 2
    assert(counts == Map("en" -> 10L, "fr" -> 5L, "sw" -> 2L))
    // T upweights the small groups vs proportional sampling (en share
    // drops from 100/129 ≈ 78% to 10/17 ≈ 59%)
    assert(counts("en").toDouble / 17 < 100.0 / 129)
  }

  test("per-group target caps at the group size") {
    val got = Sampling.temperatureSample(corpus, "lang",
      totalTarget = 1000L, keyCols = Seq("doc_id"))
    val counts = got.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    // 1000*10/17=588 → capped 100; 1000*5/17=294 → capped 25; 2/17 → 4
    assert(counts == Map("en" -> 100L, "fr" -> 25L, "sw" -> 4L))
  }

  test("selection is deterministic across parallelism and salts differ") {
    val a = Sampling.temperatureSample(corpus, "lang", 17L, Seq("doc_id"),
      salt = "s", numPartitions = 2).select("doc_id")
      .as[Long].collect().toSet
    val b = Sampling.temperatureSample(corpus, "lang", 17L, Seq("doc_id"),
      salt = "s", numPartitions = 23).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b)
    val c = Sampling.temperatureSample(corpus, "lang", 17L, Seq("doc_id"),
      salt = "other").select("doc_id").as[Long].collect().toSet
    assert(c != a) // different epoch salt draws a different mix
    assert(a.subsetOf((1L to 129L).toSet) && c.subsetOf((1L to 129L).toSet))
  }
}
