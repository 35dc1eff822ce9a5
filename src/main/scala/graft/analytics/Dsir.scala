package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection — hashed n-gram importance resampling
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023, public method): score every raw document
  * by how much more likely its hashed unigram+bigram bag is under a
  * TARGET corpus (the data you want more of) than under the RAW corpus,
  * then resample the raw corpus by those importance weights. The
  * standard pretraining-mix tool for "make the crawl look like
  * Wikipedia/books" without training a classifier.
  *
  * Scale shape (100-TB plan):
  *  - `fit` is two aggregation passes (target, raw), each a map-side-
  *    combined explode→groupBy that collapses to `buckets` rows before
  *    the exchange — the shuffle is O(buckets) (default 65,536), not
  *    O(corpus grams). The smoothed log-ratio vector (8 B × buckets,
  *    ~512 KB) broadcasts.
  *  - `score` is one narrow scalar UDF pass: per doc, sum the broadcast
  *    ratio over its gram buckets. No shuffle, no explode.
  *  - `resample` is a deterministic Gumbel top-k (seeded hash → uniform
  *    → Gumbel perturbation, the paper's sampling-without-replacement
  *    trick) — one TakeOrderedAndProject, no global sort.
  *
  * Hashing: `portableHash = false` (default) buckets grams with Spark's
  * XXH64 (fast path); `true` uses the first 8 hex chars of md5 — slower
  * but bit-replayable in the DuckDB oracle. Both are fixed at `fit` time
  * and carried by the model so score/fit can never disagree.
  */
object Dsir {

  /** Fitted importance model: `logRatio(b) = ln p̂(b) − ln q̂(b)` over
    * Laplace-smoothed hashed-gram distributions.
    */
  case class Model(buckets: Int, portableHash: Boolean,
                   logRatio: Array[Double]) {
    require(logRatio.length == buckets)
  }

  /** Unigrams + bigrams over a single-space split (matches the SQL
    * oracle's `string_split(text, ' ')` exactly).
    */
  private[analytics] def grams(text: String): Array[String] = {
    val ws = (if (text == null) "" else text).split(' ')
    if (ws.length == 0) return Array.empty
    val out = new Array[String](ws.length + math.max(0, ws.length - 1))
    var i = 0
    while (i < ws.length) { out(i) = ws(i); i += 1 }
    var j = 0
    while (j < ws.length - 1) {
      out(ws.length + j) = ws(j) + " " + ws(j + 1)
      j += 1
    }
    out
  }

  // one digest per executor thread, reset per gram — getInstance per
  // call would dominate the portable path
  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[analytics] def bucketOf(gram: String, buckets: Int,
                                  portable: Boolean): Int =
    if (portable) {
      val d = Md5.get()
      d.reset()
      val hex = d.digest(gram.getBytes("UTF-8"))
      // first 8 hex chars == first 4 bytes, big-endian, as an unsigned int
      val v = ((hex(0) & 0xffL) << 24) | ((hex(1) & 0xffL) << 16) |
        ((hex(2) & 0xffL) << 8) | (hex(3) & 0xffL)
      (v % buckets).toInt
    } else {
      import org.apache.spark.sql.catalyst.expressions.XXH64
      import org.apache.spark.unsafe.Platform
      val bytes = gram.getBytes("UTF-8")
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L)
      val m = h % buckets
      (if (m < 0) m + buckets else m).toInt
    }

  /** Smoothed hashed-gram bucket distribution of one corpus, collected
    * as a dense ln-probability array (O(buckets) driver memory, bounded
    * by construction).
    */
  private def logDist(df: DataFrame, textCol: String, buckets: Int,
                      portable: Boolean, alpha: Double): Array[Double] = {
    val b = buckets
    val gramUdf = udf((t: String) => grams(t))
    val bucketUdf = udf((g: String) => bucketOf(g, b, portable))
    val counts = df.select(explode(gramUdf(col(textCol))).as("_g"))
      .select(bucketUdf(col("_g")).as("_b"))
      .groupBy("_b").agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val total = counts.valuesIterator.sum.toDouble + alpha * b
    Array.tabulate(b)(i =>
      math.log((counts.getOrElse(i, 0L) + alpha) / total))
  }

  /** Fit the importance model: `target` is the small high-quality
    * corpus, `raw` the corpus to be scored.
    */
  def fit(target: DataFrame, raw: DataFrame, textCol: String,
          buckets: Int = 1 << 16, alpha: Double = 1.0,
          portableHash: Boolean = false): Model = {
    require(buckets > 0 && alpha > 0)
    // the fit collects one count row per bucket and the model is an
    // 8 B × buckets broadcast; 2^24 (128 MB) is already generous —
    // beyond it the "O(buckets) driver memory" contract quietly breaks
    require(buckets <= (1 << 24),
      s"buckets=$buckets exceeds 2^24 — the per-bucket collect and the " +
        "broadcast log-ratio vector stop being small")
    val p = logDist(target, textCol, buckets, portableHash, alpha)
    val q = logDist(raw, textCol, buckets, portableHash, alpha)
    Model(buckets, portableHash, Array.tabulate(buckets)(i => p(i) - q(i)))
  }

  /** Adds `dsir_logweight`: the document's log importance weight (sum
    * of the broadcast log ratio over the doc's gram buckets; callers
    * wanting cross-engine-stable values should `round(…, 4)`).
    */
  def score(df: DataFrame, textCol: String, model: Model): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model.logRatio)
    val (b, portable) = (model.buckets, model.portableHash)
    val scoreUdf = udf(new (String => Double) with Serializable {
      @transient private lazy val w = bc.value
      def apply(t: String): Double = {
        val gs = grams(t)
        var s = 0.0
        var i = 0
        while (i < gs.length) { s += w(bucketOf(gs(i), b, portable)); i += 1 }
        s
      }
    })
    df.withColumn("dsir_logweight", scoreUdf(col(textCol)))
  }

  /** Gumbel top-k resample without replacement: perturb each log weight
    * with a Gumbel draw from a SEEDED per-row hash (deterministic,
    * partitioning-independent) and take the k largest. Equivalent to
    * sampling k docs without replacement with probability ∝ exp(logw)
    * (the Gumbel-max trick the DSIR paper uses).
    */
  def resample(df: DataFrame, textCol: String, model: Model, k: Int,
               keyCols: Seq[String], seed: Long = 42L): DataFrame = {
    val scored = score(df, textCol, model)
    // u ∈ (0,1) from the row hash; gumbel = −ln(−ln u)
    val u = (pmod(xxhash64(keyCols.map(col) :+ lit(seed): _*), lit(1L << 48))
      .cast("double") + lit(1.0)) / lit((1L << 48).toDouble + 2.0)
    val key = col("dsir_logweight") - log(-log(u))
    scored.orderBy(key.desc, col(keyCols.head)).limit(k)
  }
}
