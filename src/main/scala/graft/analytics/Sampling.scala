package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling — reimplements the reference's sampling family
  * (/root/reference/utils/sample.py:11-27 uniform n-sample,
  * /root/reference/utils.py:77-128 stratified-by-bin quotas,
  * /root/reference/fasttext/train.py:34-39 stratified train/val split)
  * with content-hash ordering instead of RNG state, so results are
  * identical at any parallelism (pandas `df.sample` is driver-RNG-bound
  * and unreproducible across partitionings).
  */
object Sampling {

  private def hashOrder(cols: Seq[Column], seed: Long): Column =
    xxhash64(cols :+ lit(seed): _*)

  /** Exact-n uniform sample: rank by seeded content hash, take n.
    * One shuffle (top-n), deterministic for a given seed.
    */
  def uniformN(df: DataFrame, n: Int, keyCols: Seq[String], seed: Long = 42L): DataFrame =
    df.orderBy(hashOrder(keyCols.map(col), seed), col(keyCols.head))
      .limit(n)

  /** Per-stratum quota sample (utils.py stratified semantics): `quota`
    * rows per distinct value of `stratumCol`, hash-ranked.
    */
  def stratifiedQuota(df: DataFrame, stratumCol: String, quota: Int,
                      keyCols: Seq[String], seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashOrder(keyCols.map(col), seed), col(keyCols.head))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= quota)
      .drop("_rn")
  }

  /** Stratified train/val split: within each stratum, the hash-rank
    * fraction below `trainFrac` goes to train. Returns (train, val).
    */
  def trainValSplit(df: DataFrame, stratumCol: String, trainFrac: Double,
                    keyCols: Seq[String], seed: Long = 42L): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashOrder(keyCols.map(col), seed), col(keyCols.head))
    val n = Window.partitionBy(col(stratumCol))
    val ranked = df
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(n))
      .withColumn("_train", col("_rn") <= (col("_n") * trainFrac).cast("int"))
    (ranked.filter(col("_train")).drop("_rn", "_n", "_train"),
      ranked.filter(!col("_train")).drop("_rn", "_n", "_train"))
  }

  /** Corpus balancing: cap documents per registrable domain (the
    * training-mix guard against a single crawl domain dominating the
    * corpus). A composition: derive eTLD+1, then [[stratifiedQuota]]
    * with the domain as the stratum — one window shuffle on the domain,
    * deterministic hash order.
    */
  def perDomainCap(df: DataFrame, urlCol: String, cap: Int,
                   keyCols: Seq[String], seed: Long = 42L): DataFrame = {
    val domUdf = udf((u: String) => graft.text.DomainOf.registrable(u))
    stratifiedQuota(df.withColumn("_domain", domUdf(col(urlCol))),
      "_domain", cap, keyCols, seed).drop("_domain")
  }

  /** Histogram-bin stratified sample over a numeric column (the pd.cut
    * path, utils.py:92-95): fixed-width bins become the strata.
    */
  def binQuota(df: DataFrame, numCol: String, binWidth: Double, quota: Int,
               keyCols: Seq[String], seed: Long = 42L): DataFrame = {
    val binned = df.withColumn("_bin",
      floor(col(numCol) / binWidth).cast("long"))
    stratifiedQuota(binned, "_bin", quota, keyCols, seed).drop("_bin")
  }
}
