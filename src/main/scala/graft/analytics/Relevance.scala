package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query-targeted relevance scoring (BM25) for data selection.
  *
  * The reference's selection stages are membership- and classifier-driven
  * (`infer.py`, DSIR in `analytics.Dsir`); this adds the third standard
  * web-corpus selection primitive: score every document against a small
  * seed-term set with BM25 (Robertson/Spärck Jones, public literature)
  * and keep the most relevant slice — "give me the documents that look
  * like my target domain" without training a model.
  *
  * Scale shape (the whole point at 100 TB):
  *   - ONE tiny aggregate job computes the corpus stats BM25 needs —
  *     doc count N, mean token length avgdl, and per-query-term document
  *     frequencies — as `1 + 1 + |q|` sums over a narrow projection.
  *     Nothing corpus-sized shuffles: the agg's partial aggregation
  *     reduces each partition to one row of |q|+2 numbers map-side.
  *   - The per-term IDFs (O(|q|) doubles) ride into the second pass as
  *     plan literals — broadcast-by-closure, no join.
  *   - The scoring pass is a single narrow whole-stage-codegen
  *     projection: per-term tf via `size(filter(tokens, _ == t))`
  *     (codegen'd higher-order functions, no UDF), summed in QUERY-TERM
  *     ORDER so the float result is deterministic and oracle-matchable.
  *   - No shuffle anywhere; top-k selection afterwards is Spark's
  *     standard TakeOrdered (O(k) per partition, no global sort).
  *
  * Tokenizer convention (mirrored verbatim by the DuckDB oracle):
  * lowercase, split on runs of `[^a-z0-9']`, drop empty tokens. Null
  * text coalesces to "" → dl = 0, every tf = 0 → score 0.0, never null.
  */
/** One extracted keyword of a document: surfaced by
  * [[Relevance.tfIdfKeywords]]'s scoring UDF (top-level so Spark can
  * derive its struct schema reflectively). */
case class KeywordScore(keyword: String, tfidf: Double)

object Relevance {

  /** Max query-term count: each term adds one agg column and one filter
    * expression to the plan — thousands are fine, unbounded is not. */
  val MaxQueryTerms = 4096

  /** Hard ceiling on the idf broadcast (entries). 2M string→double
    * entries ≈ low hundreds of MB — the most any executor should hold. */
  val MaxVocabCeiling = 1 << 21

  private def tokens(textCol: String): Column =
    filter(split(lower(coalesce(col(textCol), lit(""))), "[^a-z0-9']+"),
      t => t =!= lit(""))

  /** BM25 score of every document against `queryTerms`.
    *
    * Returns `idCol, bm25` (double, unrounded). Standard Okapi BM25:
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)),
    * score  = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    *
    * Determinism: the per-doc sum is built in the caller's term order,
    * so identical inputs give bit-identical doubles on any partitioning.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase.trim).filter(_.nonEmpty)
    require(terms.nonEmpty, "bm25: queryTerms must be non-empty")
    require(terms.distinct.size == terms.size,
      s"bm25: duplicate query terms: ${terms.diff(terms.distinct).mkString(",")}")
    require(terms.size <= MaxQueryTerms,
      s"bm25: ${terms.size} query terms > $MaxQueryTerms — each term adds " +
        "plan width; pre-aggregate the seed set")
    require(k1 > 0 && b >= 0 && b <= 1, s"bm25: bad k1=$k1 b=$b")

    val tk = docs.select(col(idCol), tokens(textCol).as("_tk"))
      .withColumn("_dl", size(col("_tk")))

    // stats job: one row of |q|+2 numbers; partial agg makes it map-side
    val statAggs =
      count(lit(1)).as("_n") +: avg(col("_dl")).as("_avgdl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("_tk"), t), 1L).otherwise(0L))
            .as(s"_df_$i")
        }
    val row = tk.agg(statAggs.head, statAggs.tail: _*).head()
    val n = row.getLong(0)
    require(n > 0, "bm25: empty corpus")
    // avgdl = 0 (every doc tokenizes empty) would make dl/avgdl = 0/0 =
    // NaN and poison every score; any positive stand-in keeps the
    // documented contract — dl is 0 wherever avgdl is, tf is 0, score 0.0
    val avgdl = { val a = row.getDouble(1); if (a > 0.0) a else 1.0 }
    val idf = terms.indices.map { i =>
      val df = row.getLong(2 + i)
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }

    // scoring pass: narrow projection, summed in term order. The tf = 0
    // short-circuit is semantic, not just cosmetic: at b = 1 an
    // empty-token doc has denominator tf + k1*(dl/avgdl) = 0, so the
    // unguarded ratio is 0/0 = NaN even with avgdl itself guarded
    val dl = col("_dl").cast("double")
    val score = terms.zip(idf).map { case (t, w) =>
      val tf = size(filter(col("_tk"), x => x === lit(t))).cast("double")
      when(tf > 0.0,
        lit(w) * tf * lit(k1 + 1.0) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)

    tk.select(col(idCol), score.as("bm25"))
  }

  /** Per-document TF-IDF keyword extraction: the `topK` most
    * characteristic terms of every document, with sklearn's smoothed
    * idf (`ln((N+1)/(df+1)) + 1`, always > 0) so rare-but-present terms
    * rank above ubiquitous ones. Returns
    * `(idCol, rank:int 1-based, keyword:string, tfidf:double)`; a
    * document whose every token falls under `minDf` (or has no tokens
    * at all) emits no rows.
    *
    * Scale shape — deliberately NOT the textbook explode-join-window:
    *   1. ONE corpus shuffle builds the document-frequency table:
    *      `explode(array_distinct(tokens)) → groupBy(term).count` —
    *      partial aggregation collapses each partition's repeats
    *      map-side, and only `(term)` rows move, never text.
    *   2. The df table is cut to `df >= minDf` and collected under a
    *      LOUD `maxVocab` bound (the repo-wide bounded-collect idiom:
    *      `limit(maxVocab+1)` so an over-large vocabulary fails fast
    *      instead of OOMing the driver), then broadcast as a
    *      term → idf map — the same broadcast-model shape as LangId
    *      inference.
    *   3. Scoring + per-doc top-k run in ONE NARROW pass: a UDF counts
    *      the doc's terms locally, scores only broadcast-resident
    *      terms, and heap-selects k — no (id, term) shuffle, no
    *      per-document window, no corpus-sized join. The textbook plan
    *      shuffles the exploded token table TWICE (tf groupBy + rank
    *      window); this shuffles tokens once and documents never.
    *
    * Determinism: tf is integral, idf is computed once on the driver,
    * ranking ties break on the keyword string — identical output on
    * any partitioning.
    */
  def tfIdfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    topK: Int = 5, minDf: Long = 2,
                    maxVocab: Int = 1 << 20): DataFrame = {
    require(topK > 0, s"tfIdfKeywords: topK=$topK")
    require(minDf >= 1, s"tfIdfKeywords: minDf=$minDf")
    require(maxVocab > 0 && maxVocab <= MaxVocabCeiling,
      s"tfIdfKeywords: maxVocab=$maxVocab outside (0, $MaxVocabCeiling]")

    val tk = docs.select(col(idCol), tokens(textCol).as("_tk"))
    val n = tk.count()
    require(n > 0, "tfIdfKeywords: empty corpus")

    val dfRows = tk
      .select(explode(array_distinct(col("_tk"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .limit(maxVocab + 1).collect()
    require(dfRows.length <= maxVocab,
      s"tfIdfKeywords: vocabulary exceeds maxVocab=$maxVocab at " +
        s"minDf=$minDf — raise minDf (or maxVocab, ceiling " +
        s"$MaxVocabCeiling) so the idf broadcast stays bounded")
    val idf: Map[String, Double] = dfRows.map { r =>
      r.getString(0) -> (math.log((n + 1.0) / (r.getLong(1) + 1.0)) + 1.0)
    }.toMap
    val bIdf = docs.sparkSession.sparkContext.broadcast(idf)

    val kTop = topK
    val kwUdf = udf { (tks: Seq[String]) =>
      val m = bIdf.value
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      tks.foreach { t =>
        if (m.contains(t)) counts.update(t, counts.getOrElse(t, 0L) + 1L)
      }
      counts.iterator
        .map { case (t, tf) => KeywordScore(t, tf * m(t)) }
        .toArray
        .sortBy(k => (-k.tfidf, k.keyword))
        .take(kTop)
    }
    tk.select(col(idCol), posexplode(kwUdf(col("_tk"))).as(Seq("_pos", "_kw")))
      .select(col(idCol), (col("_pos") + 1).cast("int").as("rank"),
        col("_kw.keyword").as("keyword"), col("_kw.tfidf").as("tfidf"))
  }

  /** The selection step: top-k most relevant documents (ties broken by
    * id so the cut is deterministic). Plans as TakeOrdered — O(k) heap
    * per partition + one k-row collect to the driver-side limit, no
    * global sort of the corpus. */
  def selectTopK(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"selectTopK: k=$k")
    bm25(docs, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("bm25").desc, col(idCol)).limit(k)
  }
}
