package graft.filters

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.{broadcast, col, lit, when}

import graft.analytics.Ranking

/** CCNet-style per-language perplexity bucketing (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data" — public method): within each language, split the corpus into
  * `head` / `middle` / `tail` thirds by LM perplexity, lowest-perplexity
  * (most fluent) third first. Downstream recipes keep head+middle, or
  * weight the buckets differently in the training mix — the canonical
  * quality partition a Common-Crawl pipeline applies after scoring.
  *
  * Design: RANK-based tiles, not float quantile cutoffs. CCNet's own
  * implementation computes per-language perplexity cutoffs and compares
  * each doc against them; reproducing that with floating-point quantiles
  * makes the bucket of every cutoff-adjacent doc depend on ulp-level
  * interpolation details (engine-specific). Ranking + integer ntile
  * arithmetic gives the same partition (identical thirds for any
  * cutoff-consistent definition) with EXACT cross-engine reproducibility
  * — the oracle replays it as `ntile(k) OVER (PARTITION BY lang ORDER BY
  * score, tiebreak)` and hash-matches.
  *
  * Scale: one range shuffle + a tiny (partition, lang) count collect
  * ([[Ranking.rankInGroup]] — no per-language single-task sort; the
  * dominant language IS most of the corpus) and one broadcast join of
  * the O(#languages) group-size table. No corpus-sized collect.
  */
object CcNet {

  /** Bucket labels for k = 3, index 0 = lowest score (best perplexity). */
  private val Labels = Seq("head", "middle", "tail")

  /** Adds `bucketCol` with the doc's per-`langCol` score tile: `head` /
    * `middle` / `tail` for k = 3, `b1`..`bk` otherwise. `tieCols` must
    * make (scoreCol, tieCols) a total order within each language (pass
    * the doc id). Lower score = earlier bucket; with perplexity that
    * means `head` is the most-fluent third, as in CCNet.
    */
  def buckets(df: DataFrame, scoreCol: String, langCol: String,
              tieCols: Seq[String], k: Int = 3,
              bucketCol: String = "ppl_bucket",
              numPartitions: Int = 0): DataFrame = {
    require(k > 0, "buckets: k must be positive")
    require(!df.columns.contains(bucketCol),
      s"buckets: $bucketCol already exists on the frame")
    def freshName(base: String): String = {
      var n = base; var i = 0
      while (df.columns.contains(n)) { i += 1; n = s"$base$i" }
      n
    }
    val (rc, nc, lk, sn) =
      (freshName("_ppl_rank"), freshName("_lang_n"), freshName("_lang_k"),
        freshName("_ppl_scored"))
    // null scores rank LAST (tail), not first: Spark's ascending sort is
    // nulls-first, so an unscored doc (e.g. a language with no trained
    // LM) would otherwise outrank every scored doc and land in `head` —
    // shipping precisely the docs with no fluency evidence under a
    // keep-head recipe. The 0/1 sentinel leads the order key.
    val ranked = Ranking.rankInGroup(
      df.withColumn(sn, when(col(scoreCol).isNull, 1).otherwise(0)),
      Seq(langCol), sn +: scoreCol +: tieCols, rc, numPartitions)
      .drop(sn)
    // O(#languages) size table, broadcast; null-safe equi-join so a null
    // language (its own rank group) joins its own size too
    val sizes = broadcast(
      df.groupBy(col(langCol).as(lk)).agg(F.count(lit(1)).as(nc)))
    val tile = Ranking.ntileFromRank(col(rc), col(nc), k)
    val label =
      if (k == 3)
        when(tile === 1, Labels(0))
          .when(tile === 2, Labels(1))
          .otherwise(Labels(2))
      else F.concat(lit("b"), tile.cast("string"))
    ranked
      .join(sizes, ranked(langCol) <=> sizes(lk), "left")
      .withColumn(bucketCol, label)
      .drop(rc, nc, lk)
  }
}
