package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot management (training-data-pipeline extension beyond
  * the reference surface): diffing two crawl snapshots and verifying
  * corpus integrity without moving documents.
  *
  * Both operators follow the repo's narrow-shuffle discipline — only
  * (id, 128-bit content hash) rows ever cross an exchange, never text.
  */
object Snapshots {

  /** Internal: md5 of the compared columns, null-safe and
    * concatenation-unambiguous (\\u0001 separator, \\u0000 for null —
    * ("a", null) never collides with ("a\\u0001", …)).
    */
  private def contentHash(cols: Seq[String]) =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))

  /** Classify every id across two corpus snapshots: `added` (only in
    * `newDf`), `removed` (only in `oldDf`), `changed` (same id,
    * different content under `compareCols`), `unchanged`.
    *
    * The incremental-crawl bookkeeping tool: what did this month's
    * snapshot actually do to the corpus? Composes with
    * [[graft.dedup.MinHash.markAgainst]] (near-dup growth) — this is
    * the EXACT by-id ledger.
    *
    * 100-TB shape: each side reduces to (id, md5) before the single
    * full-outer join — ~50 B/row through the exchange regardless of
    * document size; when both snapshots are bucketed by the id
    * ([[graft.sources.CorpusIO.writeBucketedTable]]) the join plans
    * with zero exchanges.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "diff: compareCols must be non-empty")
    def side(df: DataFrame, out: String) =
      df.select(col(idCol).as("_sd_id"), contentHash(compareCols).as(out))
    side(oldDf, "_h_old")
      .join(side(newDf, "_h_new"), Seq("_sd_id"), "full_outer")
      .select(col("_sd_id").as(idCol),
        when(col("_h_old").isNull, "added")
          .when(col("_h_new").isNull, "removed")
          .when(col("_h_old") =!= col("_h_new"), "changed")
          .otherwise("unchanged").as("change"))
  }

  /** O(4)-row rollup of [[diff]] — the number a snapshot report quotes. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                  compareCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, idCol, compareCols)
      .groupBy("change").agg(count(lit(1)).as("n"))

  /** Content-level overlap ledger between two corpora whose ID SPACES
    * are unrelated (two crawl snapshots, a vendor dump vs the existing
    * corpus, a candidate acquisition): distinct-content counts per
    * side, the intersection, containment in both directions, and the
    * Jaccard index — the numbers that decide whether ingesting corpus B
    * buys anything beyond what corpus A already holds. [[diff]] answers
    * the same question BY ID; this answers it by content alone.
    *
    * 100-TB shape: each side reduces to its distinct 128-bit content
    * hashes (one partial-aggregated distinct each — ~20 B/row through
    * the exchange, never text), then one hash-keyed full-outer join and
    * an O(1)-row rollup. Ratios divide as decimals and round to 6
    * places so the single output row is bit-stable on any partitioning.
    */
  def overlap(aDf: DataFrame, bDf: DataFrame,
              contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "overlap: contentCols must be non-empty")
    def side(df: DataFrame, mark: String) =
      df.select(contentHash(contentCols).as("_h")).distinct()
        .withColumn(mark, lit(1L))
    val joined = side(aDf, "_in_a")
      .join(side(bDf, "_in_b"), Seq("_h"), "full_outer")
      .agg(coalesce(sum(coalesce(col("_in_a"), lit(0L))), lit(0L)).as("_da"),
        coalesce(sum(coalesce(col("_in_b"), lit(0L))), lit(0L)).as("_db"),
        coalesce(sum(when(col("_in_a").isNotNull && col("_in_b").isNotNull,
          1L).otherwise(0L)), lit(0L)).as("_ov"))
    // double division of two exact longs (order-independent, identical
    // in DuckDB — unlike decimal division, whose intermediate scale is
    // engine-specific), rounded to 6 for a bit-stable ledger row
    def ratio(num: Column, den: Column) =
      when(den === 0L, lit(null).cast("double"))
        .otherwise(round(num.cast("double") / den.cast("double"), 6))
    joined.select(
      col("_da").cast("bigint").as("distinct_a"),
      col("_db").cast("bigint").as("distinct_b"),
      col("_ov").cast("bigint").as("overlap"),
      ratio(col("_ov"), col("_da")).as("containment_a_in_b"),
      ratio(col("_ov"), col("_db")).as("containment_b_in_a"),
      ratio(col("_ov"), col("_da") + col("_db") - col("_ov")).as("jaccard"))
  }

  /** Order-independent per-group content checksum: row count plus the
    * mod-2^64 SUM of each row's 64-bit content hash (the first 16 hex
    * digits of its md5), exposed as a signed long.
    *
    * Verifies two copies of a corpus are identical — across clusters,
    * after a migration, between an Iceberg snapshot and its replica —
    * by exchanging O(#groups) rows instead of re-reading both sides
    * into a join. Addition is commutative, so the checksum is invariant
    * to partitioning, task order and file layout; any single-document
    * change flips it with probability 1 - 2^-64. One narrow scan, one
    * partial-aggregated groupBy.
    */
  def checksum(df: DataFrame, groupCols: Seq[String],
               contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "checksum: contentCols must be non-empty")
    val two64 = lit("18446744073709551616").cast("decimal(38,0)")
    val two63 = lit("9223372036854775808").cast("decimal(38,0)")
    // conv(hex, 16, 10) yields the unsigned value as a decimal string;
    // decimal(38,0) holds 2^64 × 10^18 rows without overflow
    val h = conv(substring(contentHash(contentCols), 1, 16), 16, 10)
      .cast("decimal(38,0)")
    val folded = pmod(sum(h), two64)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        when(folded >= two63, folded - two64).otherwise(folded)
          .cast("long").as("content_checksum"))
  }
}
