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
object Relevance {

  /** Max query-term count: each term adds one agg column and one filter
    * expression to the plan — thousands are fine, unbounded is not. */
  val MaxQueryTerms = 4096

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
    val avgdl = row.getDouble(1)
    val idf = terms.indices.map { i =>
      val df = row.getLong(2 + i)
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }

    // scoring pass: narrow projection, summed in term order
    val dl = col("_dl").cast("double")
    val score = terms.zip(idf).map { case (t, w) =>
      val tf = size(filter(col("_tk"), x => x === lit(t))).cast("double")
      lit(w) * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    }.reduce(_ + _)

    tk.select(col(idCol), score.as("bm25"))
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
