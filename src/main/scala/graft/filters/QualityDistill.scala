package graft.filters

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-classifier distillation — the FineWeb-Edu recipe (public
  * method: score a sample with an expensive LLM judge, distill the
  * scores into a cheap fastText-style classifier, run the classifier
  * over the whole corpus): docs scoring ≥ `hi` become positives, ≤
  * `lo` negatives, the ambiguous middle band is DROPPED from training
  * (standard distillation hygiene), and the trained model scores every
  * document with `quality_prob` = P(high quality).
  *
  * Scale shape: training follows the [[FastTextTrainer]] pattern — a
  * DETERMINISTIC bounded sample (hash-ranked per-class cap via
  * `Sampling.stratifiedQuota`, so the same corpus trains the same model
  * at any parallelism) collects to the driver where SGD runs; inference
  * is the broadcast-model scalar-UDF pass the langid stage uses (no Row
  * round-trip, no shuffle).
  */
object QualityDistill {

  val HiLabel = "hi"
  val LoLabel = "lo"

  /** Train from judge scores. `scoreCol` is an integer judge score
    * (e.g. [[JudgeScorer]] 0–5 output).
    */
  def train(df: DataFrame, textCol: String, scoreCol: String,
            hi: Int = 4, lo: Int = 1,
            maxSamplesPerClass: Int = 50000,
            dim: Int = 32, epochs: Int = 5,
            wordNgrams: Int = 2, seed: Long = 42L): FastTextModel = {
    val labeled = df
      // null text must not reach the collected sample: the deterministic
      // sortBy and FastTextModel.features both dereference the string —
      // one null-text row with a qualifying score NPE'd the whole stage
      .filter(col(textCol).isNotNull &&
        (col(scoreCol) >= hi || col(scoreCol) <= lo))
      .withColumn("_qd_lbl",
        when(col(scoreCol) >= hi, lit(HiLabel)).otherwise(lit(LoLabel)))
    val capped = graft.analytics.Sampling.stratifiedQuota(
      labeled, "_qd_lbl", maxSamplesPerClass, Seq(textCol), seed)
    val samples = capped.select(col("_qd_lbl"), col(textCol))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .sortBy(identity).toIndexedSeq // deterministic SGD input order
    require(samples.exists(_._1 == HiLabel) && samples.exists(_._1 == LoLabel),
      s"need both classes to train: hi (score >= $hi) and lo (score <= $lo)")
    FastTextTrainer.train(samples, dim = dim, epochs = epochs,
      seed = seed, wordNgrams = wordNgrams)
  }

  /** Adds `quality_prob` = P(high quality) via one narrow broadcast-
    * model UDF pass.
    */
  def score(df: DataFrame, textCol: String, model: FastTextModel): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val hiIdx = model.labels.indexOf(HiLabel)
    require(hiIdx >= 0, s"model has no '$HiLabel' class: ${model.labels.toSeq}")
    val probUdf = udf(new (String => Double) with Serializable {
      @transient private lazy val m = bc.value
      def apply(t: String): Double = {
        val feats = m.features(if (t == null) "" else t)
        if (feats.isEmpty) 0.5 // no signal either way
        else m.softmax(m.hidden(feats))(hiIdx)
      }
    })
    df.withColumn("quality_prob", probUdf(col(textCol)))
  }

  /** Survivors: docs the distilled classifier rates STRICTLY above
    * `minProb`. Strict, not ≥: zero-signal docs (empty/whitespace text,
    * no extractable features) score exactly 0.5, and a quality filter's
    * default configuration must not keep precisely the documents with
    * no quality evidence at all.
    */
  def filter(df: DataFrame, textCol: String, model: FastTextModel,
             minProb: Double = 0.5): DataFrame =
    score(df, textCol, model)
      .filter(col("quality_prob") > minProb).drop("quality_prob")
}
