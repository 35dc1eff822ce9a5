package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BM25 relevance (analytics.Relevance): formula parity against a
  * scalar reimplementation, ranking sanity, null/empty handling,
  * determinism across partitionings, and the loud guards. Expression
  * parity over the full table is the q_bm25_score DuckDB oracle's job.
  */
class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark shuffle join spark spark"),       // stuffed with terms
    (2L, "the quick brown fox jumps over dogs"),  // zero term hits
    (3L, "join the window"),                      // short, two hits
    (4L, "spark"),                                // shortest, one hit
    (5L, null.asInstanceOf[String]),              // null text
    (6L, "")                                      // empty text
  )
  private val terms = Seq("spark", "join")

  /** scalar BM25 over the same corpus, same tokenizer */
  private def naive(k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) =>
      id -> Option(t).getOrElse("").toLowerCase
        .split("[^a-z0-9']+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = toks.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    toks.map { case (id, tk) =>
      val dl = tk.size.toDouble
      id -> terms.map { t =>
        val df = toks.values.count(_.contains(t))
        val tf = tk.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      }.sum
    }
  }

  test("matches the scalar formula on every row") {
    val got = Relevance.bm25(corpus.toDF("doc_id", "text"), "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = naive()
    assert(got.keySet == want.keySet)
    for ((id, w) <- want)
      assert(math.abs(got(id) - w) < 1e-12, s"doc $id: ${got(id)} vs $w")
  }

  test("ranking: stuffed doc first, no-hit and null/empty docs at zero") {
    val byScore = Relevance.bm25(corpus.toDF("doc_id", "text"),
        "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byScore(1L) == byScore.values.max)
    assert(byScore(2L) == 0.0 && byScore(5L) == 0.0 && byScore(6L) == 0.0)
    assert(byScore(4L) > 0.0)
  }

  test("selectTopK returns k rows in deterministic order") {
    val top = Relevance.selectTopK(corpus.toDF("doc_id", "text"),
      "doc_id", "text", terms, 3).collect()
    assert(top.length == 3)
    assert(top.head.getLong(0) == 1L)
    // scores non-increasing; ids ascend inside a tie (docs 5 and 6
    // both score 0 and sit outside the cut here)
    val scores = top.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, c) => a >= c })
  }

  test("bit-identical across partitionings (term-order summation)") {
    val df1 = corpus.toDF("doc_id", "text").repartition(1)
    val df7 = corpus.toDF("doc_id", "text").repartition(7)
    val a = Relevance.bm25(df1, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val c = Relevance.bm25(df7, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(a.sameElements(c))
  }

  // --- tfIdfKeywords ------------------------------------------------------

  private val kwCorpus = Seq(
    (1L, "apple apple apple banana cherry"),
    (2L, "apple banana banana date date date"),
    (3L, "apple cherry cherry unique"),   // "unique" df=1 → cut at minDf=2
    (4L, "apple")                          // only the ubiquitous term
  )

  /** scalar TF-IDF over kwCorpus, same tokenizer, smoothed idf */
  private def naiveKw(minDf: Long): Map[(Long, String), Double] = {
    val toks = kwCorpus.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = toks.size
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, o) => t -> o.size.toLong }.filter(_._2 >= minDf)
    (for {
      (id, tk) <- toks.toSeq; (t, df) <- dfm if tk.contains(t)
    } yield (id, t) ->
      tk.count(_ == t) * (math.log((n + 1.0) / (df + 1.0)) + 1.0)).toMap
  }

  test("tfIdfKeywords matches the scalar formula; ranks by score then term") {
    val got = Relevance.tfIdfKeywords(kwCorpus.toDF("doc_id", "text"),
      "doc_id", "text", topK = 10, minDf = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val want = naiveKw(2)
    assert(got.map(g => (g._1, g._3)).toSet == want.keySet)
    for ((id, rk, t, s) <- got)
      assert(math.abs(s - want((id, t))) < 1e-12, s"($id,$t): $s")
    // ranks are 1..k per doc, non-increasing score, term-asc inside ties
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3))
        case _ =>
      }
    }
  }

  test("tfIdfKeywords: topK caps per doc; sub-minDf and empty docs emit none") {
    val out = Relevance.tfIdfKeywords(kwCorpus.toDF("doc_id", "text"),
      "doc_id", "text", topK = 1, minDf = 2).collect()
    assert(out.groupBy(_.getLong(0)).values.forall(_.length == 1))
    assert(!out.exists(_.getString(2) == "unique"))   // df=1 cut
    val empty = Relevance.tfIdfKeywords(
      Seq((9L, ""), (10L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", topK = 3, minDf = 1)
    assert(empty.count() == 0)
  }

  test("tfIdfKeywords is partitioning-invariant and guards the vocab bound") {
    val df1 = kwCorpus.toDF("doc_id", "text").repartition(1)
    val df7 = kwCorpus.toDF("doc_id", "text").repartition(7)
    def run(df: org.apache.spark.sql.DataFrame) =
      Relevance.tfIdfKeywords(df, "doc_id", "text", topK = 2, minDf = 2)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
        .sortBy(x => (x._1, x._2))
    assert(run(df1).sameElements(run(df7)))
    intercept[IllegalArgumentException] {   // 4-term vocab > maxVocab=2
      Relevance.tfIdfKeywords(kwCorpus.toDF("doc_id", "text"),
        "doc_id", "text", topK = 2, minDf = 1, maxVocab = 2)
    }
    intercept[IllegalArgumentException] {
      Relevance.tfIdfKeywords(kwCorpus.toDF("doc_id", "text"),
        "doc_id", "text", topK = 0)
    }
  }

  test("loud guards: empty/duplicate/oversized term sets, empty corpus") {
    val df = corpus.toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Relevance.bm25(df, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      Relevance.bm25(df, "doc_id", "text", Seq("a", "A"))  // dup after fold
    }
    intercept[IllegalArgumentException] {
      Relevance.bm25(df, "doc_id", "text",
        (1 to Relevance.MaxQueryTerms + 1).map("t" + _))
    }
    intercept[IllegalArgumentException] {
      Relevance.bm25(df.limit(0), "doc_id", "text", terms)
    }
  }

  test("all-empty-token corpus scores 0.0, never NaN (avgdl = 0 guard)") {
    val df = Seq((1L, ""), (2L, "!!! ???"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Relevance.bm25(df, "doc_id", "text", Seq("spark"))
      .as[(Long, Double)].collect().toMap
    assert(got.size == 3 && got.values.forall(_ == 0.0), s"got $got")
  }

  test("b = 1.0: an empty-token doc in a live corpus scores 0.0, not NaN") {
    // denom = tf + k1*(dl/avgdl) = 0 for the empty doc at full length
    // normalization — only the tf > 0 short-circuit keeps this finite
    val df = Seq((1L, "spark shuffle"), (2L, "!!!"))
      .toDF("doc_id", "text")
    val got = Relevance.bm25(df, "doc_id", "text", Seq("spark"), b = 1.0)
      .as[(Long, Double)].collect().toMap
    assert(got(1L) > 0.0 && got(2L) == 0.0, s"got $got")
  }
}
