package graft.filters

import scala.util.Random

/** From-scratch fastText-style supervised classifier: hashed character
  * n-gram bag → mean-pooled embedding → linear → softmax.
  *
  * This is the engine's reimplementation of the model family behind the
  * reference's LanguageFilter (datatrove's lid.176 fastText model,
  * /root/reference/datatrove/1_local_language_and_filter.py:54) and its
  * domain classifier (dim 256, wordNgrams 3, lr 0.1, epoch 5 —
  * /root/reference/fasttext/train.py:56-83). Architecture matches fastText
  * supervised (Joulin et al. 2016): shared input embedding matrix averaged
  * over features, one linear output layer, softmax cross-entropy SGD with
  * linearly decaying learning rate. Fully deterministic (seeded, fixed
  * iteration order) so tests are reproducible.
  *
  * The model is broadcast-friendly (one flat float array per matrix,
  * ~`buckets*dim*4` bytes) and scored via `mapPartitions` batched inference
  * — one deserialize per executor, matching the reference's
  * per-process model load (/root/reference/fasttext/mult_infer.py:56-66).
  */
class FastTextModel(
    val dim: Int,
    val buckets: Int,
    val labels: Array[String],
    val emb: Array[Float],  // buckets x dim
    val out: Array[Float],  // labels x dim
    /** ≤1: lid-style hashed char 1..3-grams. >1: fastText-supervised-style
      * word unigrams + word n-grams up to this order — the reference's
      * domain-classifier shape (`wordNgrams=3`,
      * /root/reference/fasttext/train.py:60-79).
      */
    val wordNgrams: Int = 1
) extends Serializable {

  // power-of-two fast path: for b = 2^k, (h & (b-1)) equals the
  // mathematical mod ((h % b + b) % b) for every h (two's complement), so
  // the two 64-bit divisions per feature — ~3 features per char in the
  // lid shape — become one mask. Identical bucket values either way.
  private val bucketMask: Long =
    if (buckets > 0 && (buckets & (buckets - 1)) == 0) buckets - 1L else -1L

  @inline private def bucket(h: Long): Int =
    if (bucketMask >= 0) (h & bucketMask).toInt
    else ((h % buckets + buckets) % buckets).toInt

  /** Feature bag: char n-grams for the lid shape, word n-grams for the
    * classifier shape (see [[wordNgrams]]).
    */
  def features(text: String, maxChars: Int = 1000): Array[Int] =
    if (wordNgrams > 1) wordFeatures(text, maxChars)
    else charFeatures(text, maxChars)

  /** Hashed char n-grams (n = 1..3) over the first `maxChars` chars of the
    * lowercased text with boundary padding — the lid-style feature space.
    *
    * ASCII fast path (r6): when the first min(len, maxChars) chars are
    * all ASCII, the lowered prefix equals the per-char A–Z fold of that
    * prefix (ASCII chars lower context-free and 1:1; Java's only
    * contextual mapping, Greek final sigma, and every length-changing
    * mapping involve non-ASCII input chars), so the features are
    * computed over a VIRTUAL " " + folded + " " string — no lowercase
    * copy, no concat copy. Any non-ASCII char falls back to the exact
    * original construction.
    */
  private def charFeatures(text: String, maxChars: Int): Array[Int] = {
    val m = math.min(text.length, maxChars)
    var ascii = true
    var p = 0
    while (p < m && ascii) {
      if (text.charAt(p) >= 128) ascii = false
      p += 1
    }
    if (!ascii)
      return charFeaturesGeneral(text, maxChars)
    val len = m + 2 // virtual boundary spaces
    @inline def ch(pos: Int): Char =
      if (pos == 0 || pos == len - 1) ' '
      else {
        val c = text.charAt(pos - 1)
        if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      }
    // raw int array (an ArrayBuffer[Int] boxes every element — ~3 boxed
    // Integers per char adds up at 50k docs/s): exact capacity is ≤ 3L-3
    val buf = new Array[Int](len * 3)
    var k = 0
    var i = 0
    while (i < len) {
      var h1 = 1125899906842597L
      var n = 0
      while (n < 3 && i + n < len) {
        h1 = h1 * 31 + ch(i + n)
        buf(k) = bucket(h1); k += 1
        n += 1
      }
      i += 1
    }
    if (k == buf.length) buf else java.util.Arrays.copyOf(buf, k)
  }

  private def charFeaturesGeneral(text: String, maxChars: Int): Array[Int] = {
    val t = " " + text.toLowerCase(java.util.Locale.ROOT).take(maxChars) + " "
    val buf = new Array[Int](t.length * 3)
    var k = 0
    var i = 0
    while (i < t.length) {
      var h1 = 1125899906842597L
      var n = 0
      while (n < 3 && i + n < t.length) {
        h1 = h1 * 31 + t.charAt(i + n)
        buf(k) = bucket(h1); k += 1
        n += 1
      }
      i += 1
    }
    if (k == buf.length) buf else java.util.Arrays.copyOf(buf, k)
  }

  /** Word unigrams plus order-2..[[wordNgrams]] n-grams, hashed — the
    * fastText supervised feature space (word hash rolled into the n-gram
    * hash with a multiplicative combine, as in fastText's addWordNgrams).
    */
  private def wordFeatures(text: String, maxChars: Int): Array[Int] = {
    val t = text.toLowerCase(java.util.Locale.ROOT).take(maxChars)
    // split on whitespace without a regex (precompiled-Pattern trap at 32
    // executor threads — see KneserNeyLM.tokenize)
    val words = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = -1
    var i = 0
    while (i <= t.length) {
      val boundary = i == t.length || Character.isWhitespace(t.charAt(i))
      if (!boundary && start < 0) start = i
      else if (boundary && start >= 0) {
        var h = 1125899906842597L
        var j = start
        while (j < i) { h = h * 31 + t.charAt(j); j += 1 }
        words += h
        start = -1
      }
      i += 1
    }
    val w = words.length
    var total = 0
    var n = 1
    while (n <= wordNgrams) { total += math.max(0, w - n + 1); n += 1 }
    val buf = new Array[Int](total)
    var k = 0
    var a = 0
    while (a < w) {
      var combined = words(a)
      buf(k) = bucket(combined); k += 1
      var b = a + 1
      while (b < w && b - a < wordNgrams) {
        combined = combined * 116049371L + words(b)
        buf(k) = bucket(combined); k += 1
        b += 1
      }
      a += 1
    }
    if (k == buf.length) buf else java.util.Arrays.copyOf(buf, k)
  }

  /** Pooled hidden vector for a feature bag. fastText mean-pools; we use
    * 1/sqrt(n) normalization so the hidden magnitude is independent of the
    * (large, char-n-gram) bag size — same linear family, much faster SGD
    * convergence at small sample counts.
    */
  private[filters] def hidden(feats: Array[Int]): Array[Float] = {
    val h = new Array[Float](dim)
    if (feats.isEmpty) return h
    var i = 0
    while (i < feats.length) {
      val off = feats(i) * dim
      var d = 0
      while (d < dim) { h(d) += emb(off + d); d += 1 }
      i += 1
    }
    val inv = (1.0 / math.sqrt(feats.length.toDouble)).toFloat
    var d = 0
    while (d < dim) { h(d) *= inv; d += 1 }
    h
  }

  private[filters] def softmax(h: Array[Float]): Array[Double] = {
    val z = new Array[Double](labels.length)
    var l = 0
    while (l < labels.length) {
      var s = 0.0
      val off = l * dim
      var d = 0
      while (d < dim) { s += out(off + d) * h(d); d += 1 }
      z(l) = s
      l += 1
    }
    val m = z.max
    var tot = 0.0
    l = 0
    while (l < labels.length) { z(l) = math.exp(z(l) - m); tot += z(l); l += 1 }
    l = 0
    while (l < labels.length) { z(l) /= tot; l += 1 }
    z
  }

  /** The model's pooled hidden vector as a DOCUMENT EMBEDDING — the
    * deterministic, zero-new-model-state text embedding the semantic
    * stages (SemDeDup, semantic decontamination) consume: hashed char
    * 1..3-gram bag → 1/sqrt(n)-pooled `dim`-vector. Documents sharing
    * most of their character n-grams land close in cosine, which is the
    * fastText-style sentence-vector property SemDeDup needs; a learned
    * transformer embedding slots into the same `array<double>` column
    * when one is available. Empty/whitespace-only text yields the zero
    * vector (no direction — the semantic stages treat it as
    * incomparable and keep it).
    */
  def embed(text: String): Array[Double] = {
    // enforce the documented contract explicitly: charFeatures pads with
    // boundary spaces, so even "" produces 3 space-n-gram features and a
    // NONZERO pooled vector — and two empty docs would then pass the
    // semantic stages' zero-norm guards with cosine ~= 1 and dedup
    // against each other instead of being kept as incomparable
    if (text == null || text.trim.isEmpty)
      return new Array[Double](dim)
    val h = hidden(features(text))
    val out = new Array[Double](h.length)
    var i = 0
    while (i < h.length) { out(i) = h(i).toDouble; i += 1 }
    out
  }

  /** (label, probability) of the argmax class. */
  def predict(text: String): (String, Double) = {
    val p = softmax(hidden(features(text)))
    var best = 0
    var i = 1
    while (i < p.length) { if (p(i) > p(best)) best = i; i += 1 }
    (labels(best), p(best))
  }
}

object FastTextTrainer {

  /** Deterministic SGD training. `samples` are (label, text) pairs. */
  def train(
      samples: IndexedSeq[(String, String)],
      dim: Int = 32,
      buckets: Int = 1 << 15,
      epochs: Int = 5,
      lr: Double = 0.1,
      seed: Long = 42L,
      wordNgrams: Int = 1
  ): FastTextModel = {
    val labels = samples.map(_._1).distinct.sorted.toArray
    val labelIdx = labels.zipWithIndex.toMap
    val rng = new Random(seed)
    val emb = Array.fill(buckets * dim)(((rng.nextFloat() - 0.5f) / dim))
    val out = new Array[Float](labels.length * dim)
    val model = new FastTextModel(dim, buckets, labels, emb, out, wordNgrams)

    val featCache = samples.map { case (l, t) => (labelIdx(l), model.features(t)) }
    val order = featCache.indices.toArray
    val total = epochs.toLong * samples.length
    var step = 0L

    for (_ <- 0 until epochs) {
      // deterministic Fisher-Yates shuffle per epoch
      var i = order.length - 1
      while (i > 0) { val j = rng.nextInt(i + 1); val tmp = order(i); order(i) = order(j); order(j) = tmp; i -= 1 }
      order.foreach { idx =>
        val (y, feats) = featCache(idx)
        if (feats.nonEmpty) {
          val curLr = (lr * (1.0 - step.toDouble / total)).max(lr * 0.01)
          val h = model.hidden(feats)
          val p = model.softmax(h)
          // gradient wrt hidden from the PRE-update output weights,
          // then the output-layer update
          val gh = new Array[Float](dim)
          val g = new Array[Double](labels.length)
          var l = 0
          while (l < labels.length) {
            g(l) = (p(l) - (if (l == y) 1.0 else 0.0)) * curLr
            val off = l * dim
            var d = 0
            while (d < dim) { gh(d) += (g(l) * out(off + d)).toFloat; d += 1 }
            l += 1
          }
          l = 0
          while (l < labels.length) {
            val off = l * dim
            var d = 0
            while (d < dim) { out(off + d) -= (g(l) * h(d)).toFloat; d += 1 }
            l += 1
          }
          // input embedding update (matches the forward 1/sqrt(n) pooling)
          val inv = (1.0 / math.sqrt(feats.length.toDouble)).toFloat
          var fi = 0
          while (fi < feats.length) {
            val off = feats(fi) * dim
            var d = 0
            while (d < dim) { emb(off + d) -= gh(d) * inv; d += 1 }
            fi += 1
          }
        }
        step += 1
      }
    }
    model
  }
}
