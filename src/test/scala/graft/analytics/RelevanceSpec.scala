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
}
