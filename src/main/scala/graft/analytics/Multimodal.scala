package graft.analytics

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode/feature-extract runs as
  * partition-batched functions over the bytes.
  *
  * The Spark-side plumbing (schema, batching, partition sizing, output
  * shape) is real and tested; the actual PIXEL-decode step is STUBBED with
  * a deterministic byte-level featurizer because no image/audio libraries
  * ship in this environment — swap `decodeStub` for a real decoder
  * (e.g. javacv / TwelveMonkeys) without touching the plumbing.
  * Header-level metadata needs no codec at all: [[MediaHeader]] parses
  * format + dimensions + bit depth straight from the byte layout (the
  * min-resolution gate a pipeline applies BEFORE paying for a decode).
  */
object Multimodal {

  /** Metadata struct carried beside every payload column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image|audio|video
    StructField("n_bytes", LongType),
    StructField("content_hash", StringType)
  ))

  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("header_hash", LongType),
    StructField("byte_entropy", DoubleType),
    StructField("feature_vec", ArrayType(FloatType))
  ))

  /** ===== STUB ===== Deterministic fake "decode + featurize" over raw
    * bytes: byte histogram entropy + a folded 16-dim feature vector. A
    * real implementation decodes the media and emits model features; the
    * signature and batch shape are what production code keeps.
    */
  def decodeStub(bytes: Array[Byte]): (Long, Long, Double, Array[Float]) = {
    val b = if (bytes == null) Array.empty[Byte] else bytes
    val hist = new Array[Long](256)
    var i = 0
    while (i < b.length) { hist(b(i) & 0xFF) += 1; i += 1 }
    var entropy = 0.0
    if (b.length > 0) {
      var k = 0
      while (k < 256) {
        if (hist(k) > 0) {
          val p = hist(k).toDouble / b.length
          entropy -= p * math.log(p) / math.log(2)
        }
        k += 1
      }
    }
    var headerHash = 0xcbf29ce484222325L
    i = 0
    while (i < math.min(64, b.length)) { headerHash ^= b(i); headerHash *= 0x100000001b3L; i += 1 }
    val vec = new Array[Float](16)
    var k = 0
    while (k < 256) { vec(k % 16) += hist(k).toFloat; k += 1 }
    if (b.length > 0) { var d = 0; while (d < 16) { vec(d) /= b.length; d += 1 } }
    (b.length.toLong, headerHash, entropy, vec)
  }

  /** Partition-batched feature extraction: one pass over each partition,
    * batches of `batchSize` (a real decoder amortizes model/codec init per
    * partition exactly like the reference's per-process model load,
    * /root/reference/fasttext/mult_infer.py:56-66). Appends the feature
    * struct columns to the input.
    */
  def extractFeatures(df: DataFrame, binCol: String,
                      batchSize: Int = 256): DataFrame = {
    val outSchema = df.schema
      .add("n_bytes", LongType).add("header_hash", LongType)
      .add("byte_entropy", DoubleType)
      .add("feature_vec", ArrayType(FloatType))
    val enc = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      // real impl: init decoder/codec once per partition here
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (n, hh, ent, vec) = decodeStub(r.getAs[Array[Byte]](idx))
          Row.fromSeq(r.toSeq ++ Seq(n, hh, ent, vec.toSeq))
        }
      }
    }(enc)
  }

  /** Frame-sampling plumbing for video-like payloads: split a payload into
    * `nFrames` deterministic byte slices ("frames") and explode — the
    * shape of real frame extraction without a codec.
    */
  def sampleFrames(df: DataFrame, binCol: String, nFrames: Int = 4): DataFrame = {
    val frameUdf = udf { (bytes: Array[Byte]) =>
      val b = if (bytes == null) Array.empty[Byte] else bytes
      if (b.isEmpty) Seq.empty[Array[Byte]]
      else {
        val step = math.max(b.length / nFrames, 1)
        (0 until math.min(nFrames, b.length)).map { f =>
          b.slice(f * step, math.min(f * step + step, b.length))
        }
      }
    }
    df.withColumn("_frames", frameUdf(col(binCol)))
      .select(col("*"), posexplode(col("_frames")).as(Seq("frame_id", "frame_bytes")))
      .drop("_frames")
  }
}
