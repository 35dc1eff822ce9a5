package graft.filters

import scala.collection.mutable

/** Interpolated Kneser-Ney bigram language model for KenLM-style
  * perplexity scoring (north-rule extension — the reference repo itself
  * contains no perplexity code; its quality scoring is fastText + datatrove
  * heuristics, see SURVEY.md preamble).
  *
  * P_KN(w2|w1) = max(c(w1,w2) - d, 0)/c(w1) + d * N1+(w1,·)/c(w1) * Pcont(w2)
  * Pcont(w2)  = N1+(·,w2) / |distinct bigrams|
  *
  * The trained model is two open hash maps (unigram counts, bigram counts)
  * plus continuation tables — a few MB for the corpus-sample vocabularies we
  * train on, broadcast to executors and applied per document.
  */
class KneserNeyLM(
    val unigram: Map[String, Long],
    val bigram: Map[String, Long],       // key = w1 + "\u0001" + w2
    val contLeft: Map[String, Int],      // w1 -> N1+(w1,·)
    val contRight: Map[String, Int],     // w2 -> N1+(·,w2)
    val bigramTypes: Long,
    val discount: Double = 0.75
) extends Serializable {

  private val vocabFloor = 1.0 / math.max(bigramTypes, 1L)

  private def pCont(w: String): Double = {
    val c = contRight.getOrElse(w, 0)
    if (c == 0) vocabFloor else c.toDouble / bigramTypes
  }

  /** log2 P_KN(w2 | w1), with unknown-context backoff to Pcont. */
  def logProb(w1: String, w2: String): Double = {
    val c1 = unigram.getOrElse(w1, 0L)
    val p =
      if (c1 == 0L) pCont(w2)
      else {
        val c12 = bigram.getOrElse(w1 + "\u0001" + w2, 0L)
        val n1p = contLeft.getOrElse(w1, 0)
        math.max(c12 - discount, 0.0) / c1 +
          discount * n1p / c1 * pCont(w2)
      }
    math.log(math.max(p, 1e-12)) / math.log(2.0)
  }

  def tokenize(text: String): Array[String] =
    KneserNeyLM.TokPat.split(text.toLowerCase).filter(_.nonEmpty)

  /** Per-word perplexity 2^(-avg log2 P) over the document's bigrams. */
  def perplexity(text: String): Double = {
    val toks = "<s>" +: tokenize(text)
    if (toks.length < 2) return Double.MaxValue
    var lp = 0.0
    var i = 1
    while (i < toks.length) { lp += logProb(toks(i - 1), toks(i)); i += 1 }
    math.pow(2.0, -lp / (toks.length - 1))
  }
}

object KneserNeyLM {

  /** Precompiled tokenizer pattern — a per-call `String.split(regex)`
    * recompiles the Pattern per document, which serializes badly at high
    * executor-thread counts (see TextStats.WsPat note).
    */
  private[filters] val TokPat = java.util.regex.Pattern.compile("[^a-z0-9']+")

  /** Count-based training from an iterator of documents. Deterministic. */
  def train(docs: IterableOnce[String], discount: Double = 0.75): KneserNeyLM = {
    val uni = mutable.HashMap.empty[String, Long]
    val bi = mutable.HashMap.empty[String, Long]
    val tmp = new KneserNeyLM(Map.empty, Map.empty, Map.empty, Map.empty, 1L)
    docs.iterator.foreach { doc =>
      val toks = "<s>" +: tmp.tokenize(doc)
      var i = 0
      while (i < toks.length) {
        uni.update(toks(i), uni.getOrElse(toks(i), 0L) + 1L)
        if (i > 0) {
          val k = toks(i - 1) + "\u0001" + toks(i)
          bi.update(k, bi.getOrElse(k, 0L) + 1L)
        }
        i += 1
      }
    }
    val cl = mutable.HashMap.empty[String, Int]
    val cr = mutable.HashMap.empty[String, Int]
    bi.keysIterator.foreach { k =>
      val sep = k.indexOf('\u0001')
      val w1 = k.substring(0, sep)
      val w2 = k.substring(sep + 1)
      cl.update(w1, cl.getOrElse(w1, 0) + 1)
      cr.update(w2, cr.getOrElse(w2, 0) + 1)
    }
    new KneserNeyLM(uni.toMap, bi.toMap, cl.toMap, cr.toMap,
      math.max(bi.size.toLong, 1L), discount)
  }
}
