package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perceptual image hashing for multimodal near-dup detection: a 64-bit
  * difference hash (dHash) over an 8×8 luminance grid, paired with the
  * shared salted Hamming-band join ([[NearDup.hamming64Pairs]]) — the
  * image-side twin of text SimHash. Training corpora dedup images the
  * same way they dedup documents: hash each payload once (narrow, no
  * shuffle), band the 64-bit hashes, verify candidates by exact Hamming
  * distance — never all-pairs.
  *
  * Kernel (one definition across all three paths): area-average the
  * grid to 8×8, then bit (r, c) = 1 iff g(r, c) < g(r, (c+1) mod 8).
  * The cyclic row adjacency keeps the hash exactly 64 bits from an 8×8
  * grid; classic dHash samples 9×8 non-cyclic — same gradient-sign
  * idea, one column narrower. The kernel exists as
  *   - [[dhash64]] on a JVM grid (the byte-payload path),
  *   - [[dhashColumn]] as a pure Column expression over a pre-resized
  *     row-major array column — 64 codegen'd comparisons, no UDF, and
  *     portable enough that a DuckDB oracle replays it term for term
  *     (q_phash_neardup).
  * The two are pinned bit-identical in PerceptualHashSpec.
  *
  * As with [[Multimodal]], the PIXEL DECODE is stubbed (no image codecs
  * in this environment): [[decodeGrayStub]] is a deterministic fake
  * producing a luminance grid from raw bytes; everything downstream of
  * the grid — resize, hash, banding, verify — is the real algorithm a
  * production decoder would feed.
  */
object PerceptualHash {

  /** Box-filter (area-average) resample of a row-major `w`×`h` grid to
    * `ow`×`oh`: every output cell averages its exact source rectangle,
    * with fractional edge pixels weighted by overlap — the standard
    * antialiasing reduction (OpenCV INTER_AREA) that makes the hash
    * robust to input resolution.
    */
  def areaResize(g: Array[Double], w: Int, h: Int,
                 ow: Int, oh: Int): Array[Double] = {
    require(w > 0 && h > 0 && ow > 0 && oh > 0,
      s"areaResize: non-positive dims ${w}x$h -> ${ow}x$oh")
    require(g.length == w * h,
      s"areaResize: grid length ${g.length} != ${w}x$h")
    if (w == ow && h == oh) return g.clone()
    val out = new Array[Double](ow * oh)
    val sx = w.toDouble / ow
    val sy = h.toDouble / oh
    var oy = 0
    while (oy < oh) {
      val y0 = oy * sy; val y1 = (oy + 1) * sy
      var ox = 0
      while (ox < ow) {
        val x0 = ox * sx; val x1 = (ox + 1) * sx
        var acc = 0.0; var area = 0.0
        var y = math.floor(y0).toInt
        while (y < y1 && y < h) {
          val wy = math.min(y + 1, y1) - math.max(y, y0)
          if (wy > 0) {
            var x = math.floor(x0).toInt
            while (x < x1 && x < w) {
              val wx = math.min(x + 1, x1) - math.max(x, x0)
              if (wx > 0) { acc += g(y * w + x) * wx * wy; area += wx * wy }
              x += 1
            }
          }
          y += 1
        }
        out(oy * ow + ox) = if (area > 0) acc / area else 0.0
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** The 64-bit cyclic dHash of an 8×8 row-major grid: bit (r*8 + c)
    * set iff grid(r, c) < grid(r, (c+1) mod 8). Strict '<' so a flat
    * grid hashes to 0 — ties never depend on float noise direction.
    */
  def dhash64(grid8: Array[Double]): Long = {
    require(grid8.length == 64, s"dhash64: need 64 cells, got ${grid8.length}")
    var sig = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid8(r * 8 + c) < grid8(r * 8 + ((c + 1) % 8)))
          sig |= (1L << (r * 8 + c))
        c += 1
      }
      r += 1
    }
    sig
  }

  /** Full JVM path: arbitrary-resolution luminance grid → 8×8 area
    * resize → [[dhash64]].
    */
  def dhashOfGray(g: Array[Double], w: Int, h: Int): Long =
    dhash64(areaResize(g, w, h, 8, 8))

  /** ===== STUB ===== Deterministic fake "decode" of raw payload bytes
    * to a `w`×`h` luminance grid (no image codecs ship in this
    * environment — swap for a real decoder without touching anything
    * downstream). Locality-preserving by construction: each cell reads
    * one byte region, so payloads differing in few bytes produce grids
    * differing in few cells — the property that makes the near-dup
    * plumbing exercisable end-to-end.
    */
  def decodeGrayStub(bytes: Array[Byte], w: Int = 32, h: Int = 32): Array[Double] = {
    val b = if (bytes == null) Array.empty[Byte] else bytes
    val out = new Array[Double](w * h)
    if (b.isEmpty) return out
    var i = 0
    while (i < out.length) {
      // long arithmetic: i * b.length overflows Int past ~2 MB payloads
      out(i) = (b((i.toLong * b.length / out.length).toInt) & 0xFF) / 255.0
      i += 1
    }
    out
  }

  /** [[dhash64]] as a pure Column expression over an array column
    * holding a PRE-RESIZED 8×8 row-major grid (float or double): the
    * sum of 64 disjoint power-of-two CASE terms — addition of disjoint
    * bits IS bitwise-or, and every term is a compile-time Long constant
    * (no runtime shift, so the sign bit needs no shift-overflow
    * special-casing in engines that trap `1 << 63`). One codegen'd
    * projection, no UDF, and the exact shape the DuckDB oracle replays.
    */
  def dhashColumn(vec: Column): Column =
    (0 until 64).map { bit =>
      val r = bit / 8; val c = bit % 8
      val i = r * 8 + c + 1              // element_at is 1-based
      val j = r * 8 + ((c + 1) % 8) + 1
      when(element_at(vec, i) < element_at(vec, j), lit(1L << bit))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Stamp a `dhash` column from a binary payload column (stub decode →
    * real kernel), keeping every input column. Narrow: one pass, no
    * shuffle.
    */
  def imageDhash(df: DataFrame, binCol: String,
                 decodeW: Int = 32, decodeH: Int = 32): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      dhashOfGray(decodeGrayStub(bytes, decodeW, decodeH), decodeW, decodeH)
    }
    df.withColumn("dhash", f(col(binCol)))
  }

  /** Image near-dup pairs over pre-resized 8×8 grid vectors: hash via
    * [[dhashColumn]], then the shared salted Hamming-band join. Returns
    * `(id_a, id_b, hamming)`.
    */
  def nearDups(df: DataFrame, idCol: String, vecCol: String,
               maxHamming: Int = 3, saltBuckets: Int = 8,
               hotKeyThreshold: Long = 4096L): DataFrame =
    NearDup.hamming64Pairs(
      df.select(col(idCol).as("id"), dhashColumn(col(vecCol)).as("sig")),
      maxHamming, saltBuckets, hotKeyThreshold)

  /** The `(id, sig)` snapshot table of a grid-vector corpus — compute
    * once per reference corpus, store as parquet, probe across incoming
    * batches (the [[markAgainst]] reference format; the image twin of
    * `MinHash.sigVectors`).
    */
  def dhashSigs(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), dhashColumn(col(vecCol)).as("sig"))

  /** Image DECONTAMINATION: flag every corpus grid whose dHash lands
    * within `maxHamming` of ANY reference signature (benchmark images,
    * eval-set figures, a previous crawl's kept images). The reference
    * rides as a stored [[dhashSigs]] snapshot — band-keyed probe, never
    * a re-scan. Appends `flagCol` (boolean) and `phash_hamming` (min
    * distance to the reference for hits, null otherwise).
    */
  def markAgainst(df: DataFrame, idCol: String, vecCol: String,
                  refSigs: DataFrame, maxHamming: Int = 3,
                  flagCol: String = "is_phash_dup"): DataFrame = {
    val hits = NearDup.hamming64Against(
      dhashSigs(df, idCol, vecCol), refSigs, maxHamming)
      .withColumnRenamed("hamming", "phash_hamming")
      .withColumnRenamed("id", "__ph_id")
    df.join(hits, col(idCol) === col("__ph_id"), "left")
      .withColumn(flagCol, col("phash_hamming").isNotNull)
      .drop("__ph_id")
  }

  /** The DuckDB form of [[dhashColumn]] over a 1-based list column
    * `vecExpr` — generated term for term from the same bit layout, so
    * the Spark query and its oracle can never drift. Bit 63's constant
    * is emitted as `(-9223372036854775807 - 1)`: the positive literal
    * 2^63 does not fit in BIGINT and engines that check shift overflow
    * trap `1 << 63`.
    */
  def dhashSqlExpr(vecExpr: String): String =
    (0 until 64).map { bit =>
      val r = bit / 8; val c = bit % 8
      val i = r * 8 + c + 1
      val j = r * 8 + ((c + 1) % 8) + 1
      val const =
        if (bit == 63) "(-9223372036854775807 - 1)" else (1L << bit).toString
      s"(CASE WHEN $vecExpr[$i] < $vecExpr[$j] THEN $const ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
