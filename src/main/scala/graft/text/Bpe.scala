package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer — learn merge rules from a
  * corpus (Sennrich et al. 2016, the public BPE algorithm every LLM
  * tokenizer descends from), then tokenize/count with them. Upgrades
  * the chars/4 BPE *estimate* (`TextAnalysis.bpeEstimate`) to real
  * learned-subword counts for token-budget accounting.
  *
  * Scale shape (the fastText-trainer pattern): the DISTRIBUTED part is
  * one map-side-combined word-count aggregation capped at `maxVocab`
  * word types (a TakeOrderedAndProject — bounded driver memory however
  * large the corpus); merge learning then runs on the driver over the
  * word-frequency table, O(vocab), independent of corpus size. The
  * learned model broadcasts and tokenization is a narrow per-row pass.
  *
  * Determinism: ties in pair frequency break lexicographically, so the
  * same corpus always learns the same merge sequence at any parallelism.
  */
object Bpe {

  /** `merges` in learned order; earlier = higher priority. */
  case class Model(merges: Vector[(String, String)]) {
    @transient private lazy val rank: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.toMap

    /** Greedy lowest-rank-first merge application (standard BPE encode).
      * Operates on the word's chars + "</w>" end marker, like training.
      */
    def encode(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      var parts = word.map(_.toString).toArray :+ EndOfWord
      var done = false
      while (!done && parts.length > 1) {
        var best = Int.MaxValue
        var bestAt = -1
        var i = 0
        while (i < parts.length - 1) {
          val r = rank.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
          if (r < best) { best = r; bestAt = i }
          i += 1
        }
        if (bestAt < 0) done = true
        else {
          val merged = new Array[String](parts.length - 1)
          System.arraycopy(parts, 0, merged, 0, bestAt)
          merged(bestAt) = parts(bestAt) + parts(bestAt + 1)
          System.arraycopy(parts, bestAt + 2, merged, bestAt + 1,
            parts.length - bestAt - 2)
          parts = merged
        }
      }
      parts
    }

    def tokenCount(text: String): Int = {
      val ws = TextStats.words(if (text == null) "" else text)
      var n = 0
      var i = 0
      while (i < ws.length) { n += encode(ws(i)).length; i += 1 }
      n
    }
  }

  val EndOfWord = "</w>"

  /** Driver-side merge learning over a word-frequency table (standard
    * BPE: repeatedly merge the globally most frequent adjacent symbol
    * pair). Incremental pair-count maintenance — each merge touches only
    * the words containing the merged pair.
    */
  private[text] def learn(vocab: Seq[(String, Long)],
                          numMerges: Int): Vector[(String, String)] = {
    // each word as a mutable symbol array
    val words = vocab.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndOfWord, c)
    }.toArray
    val pairCount = scala.collection.mutable.Map.empty[(String, String), Long]
    // pair → indexes of words containing it (occurrence lists; rebuilt
    // lazily per affected word on merge)
    val pairWords = scala.collection.mutable.Map
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def addWordPairs(wi: Int, sign: Long): Unit = {
      val (syms, c) = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val n = pairCount.getOrElse(p, 0L) + sign * c
        if (n == 0L) pairCount.remove(p) else pairCount(p) = n
        if (sign > 0)
          pairWords.getOrElseUpdate(p,
            scala.collection.mutable.Set.empty) += wi
        i += 1
      }
    }
    words.indices.foreach(addWordPairs(_, 1L))

    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    while (m < numMerges && pairCount.nonEmpty) {
      // most frequent pair; lexicographic tie-break for determinism
      var best: (String, String) = null
      var bestN = -1L
      pairCount.foreach { case (p, n) =>
        if (n > bestN || (n == bestN &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestN = n
        }
      }
      merges += best
      val affected = pairWords.getOrElse(best, Set.empty[Int]).toArray
      affected.foreach { wi =>
        val (syms, c) = words(wi)
        if (syms.sliding(2).exists(s =>
            s.length == 2 && (s(0), s(1)) == best)) {
          addWordPairs(wi, -1L)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          words(wi) = (out.toArray, c)
          addWordPairs(wi, 1L)
        }
      }
      pairCount.remove(best)
      pairWords.remove(best)
      m += 1
    }
    merges.result()
  }

  /** Fit on a corpus: one distributed word-count pass (top `maxVocab`
    * word types by count — bounded driver collect), then driver-side
    * merge learning.
    */
  def fit(df: DataFrame, textCol: String, numMerges: Int = 4000,
          maxVocab: Int = 50000): Model = {
    val wordsUdf = udf((t: String) => TextStats.words(if (t == null) "" else t))
    val vocab = df.select(explode(wordsUdf(col(textCol))).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("_w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Model(learn(vocab, numMerges))
  }

  /** Adds `bpe_tokens`: learned-subword token count per doc. */
  def tokenCounts(df: DataFrame, textCol: String, model: Model): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val cntUdf = udf(new (String => Int) with Serializable {
      @transient private lazy val m = bc.value
      def apply(t: String): Int = m.tokenCount(t)
    })
    df.withColumn("bpe_tokens", cntUdf(col(textCol)))
  }
}
