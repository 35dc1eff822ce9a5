package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Real (non-stub) media header parsing over raw `binary` columns: container
  * format sniffing plus image dimensions/bit-depth decoded directly from the
  * byte layout of PNG / JPEG / GIF / BMP / WebP headers — no codec library
  * needed, so this runs as-is on executors at any scale. This is the part of
  * multimodal handling that genuinely does NOT need native image libraries;
  * the pixel-decode step stays stubbed in [[Multimodal.decodeStub]].
  *
  * Reference scope: the reference pipeline carries crawl payloads as opaque
  * bytes and routes on sniffed type (cf. format sniffing S14,
  * /root/reference/utils/data_util.py); header-level width/height is the
  * standard metadata a training-data pipeline filters on (min-resolution
  * gates) before paying for a real decode.
  *
  * All parsers are bounds-checked and return `unknown`/null dims on
  * truncated or hostile input rather than throwing — crawl bytes are
  * untrusted.
  */
object MediaHeader {

  /** Parsed header: format slug, image dims + bit depth where the container
    * carries them (null otherwise).
    */
  final case class MediaInfo(format: String, width: Option[Int],
                             height: Option[Int], bit_depth: Option[Int])

  private val Unknown = MediaInfo("unknown", None, None, None)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xFFFFFFFFL
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)) & 0xFFFFFFFFL
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean = {
    if (i + s.length > b.length) return false
    var k = 0
    while (k < s.length) { if ((b(i + k) & 0xFF) != s.charAt(k)) return false; k += 1 }
    true
  }

  /** PNG: 8-byte signature, then the IHDR chunk is required first —
    * width/height as big-endian u32 at offsets 16/20, bit depth at 24.
    */
  private def parsePng(b: Array[Byte]): MediaInfo = {
    if (b.length < 26 || !ascii(b, 12, "IHDR")) return MediaInfo("png", None, None, None)
    val w = be32(b, 16); val h = be32(b, 20)
    if (w == 0 || h == 0 || w > Int.MaxValue || h > Int.MaxValue)
      MediaInfo("png", None, None, None)
    else MediaInfo("png", Some(w.toInt), Some(h.toInt), Some(u8(b, 24)))
  }

  /** JPEG: walk the marker stream past APPn/DQT/etc. to the first SOFn
    * (C0–CF excluding C4/C8/CC); dims are big-endian u16 at +5/+7 of the
    * SOF payload, sample precision at +4. Stops at SOS/EOI or malformed
    * lengths.
    */
  private def parseJpeg(b: Array[Byte]): MediaInfo = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xFF) return MediaInfo("jpeg", None, None, None)
      var m = u8(b, i + 1)
      // fill bytes: any number of 0xFF before the marker id
      while (m == 0xFF && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) { i += 2 } // standalone
      else if (m == 0xD9 || m == 0xDA) return MediaInfo("jpeg", None, None, None)
      else {
        if (i + 3 >= b.length) return MediaInfo("jpeg", None, None, None)
        val segLen = be16(b, i + 2)
        if (segLen < 2) return MediaInfo("jpeg", None, None, None)
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (i + 8 >= b.length) return MediaInfo("jpeg", None, None, None)
          val h = be16(b, i + 5); val w = be16(b, i + 7)
          return MediaInfo("jpeg", Some(w), Some(h), Some(u8(b, i + 4)))
        }
        i += 2 + segLen
      }
    }
    MediaInfo("jpeg", None, None, None)
  }

  /** GIF87a/89a: logical-screen width/height as little-endian u16 at 6/8.
    * Zero dims (a zero-filled or truncated-then-padded header) return
    * null like the PNG/BMP paths — the file-wide parser contract.
    */
  private def parseGif(b: Array[Byte]): MediaInfo =
    if (b.length < 10) MediaInfo("gif", None, None, None)
    else {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w == 0 || h == 0) MediaInfo("gif", None, None, None)
      else MediaInfo("gif", Some(w), Some(h), None)
    }

  /** BMP: DIB header size at 14 selects the layout — BITMAPCOREHEADER (12)
    * carries u16 dims at 18/20; BITMAPINFOHEADER+ (>=40) carries i32 dims at
    * 18/22 (height may be negative = top-down, |h| is the pixel height) and
    * bpp at 28. Dims are validated like the PNG path: hostile/truncated
    * crawl bytes must yield null dims, never a non-positive or absurd
    * width — the file-wide parser contract. `h == Int.MinValue` has no
    * positive magnitude, so it fails the same check.
    */
  private def parseBmp(b: Array[Byte]): MediaInfo = {
    if (b.length < 26) return MediaInfo("bmp", None, None, None)
    val dib = le32(b, 14)
    if (dib == 12) {
      val w = le16(b, 18); val h = le16(b, 20)
      if (w == 0 || h == 0) MediaInfo("bmp", None, None, None)
      else MediaInfo("bmp", Some(w), Some(h), Some(le16(b, 24)))
    } else if (dib >= 40 && b.length >= 30) {
      val w = le32(b, 18).toInt; val h = math.abs(le32(b, 22).toInt)
      if (w <= 0 || h <= 0) MediaInfo("bmp", None, None, None)
      else MediaInfo("bmp", Some(w), Some(h), Some(le16(b, 28)))
    } else MediaInfo("bmp", None, None, None)
  }

  /** WebP: RIFF container; first chunk tag at 12 picks the bitstream —
    * VP8 (lossy: sync 9D 01 2A, 14-bit dims LE at +6/+8 of the frame tag),
    * VP8L (lossless: sig 2F, two 14-bit fields bit-packed LSB-first), or
    * VP8X (extended: 24-bit canvas minus-one dims at 24/27).
    */
  private def parseWebp(b: Array[Byte]): MediaInfo = {
    val none = MediaInfo("webp", None, None, None)
    if (b.length < 16) return none
    if (ascii(b, 12, "VP8 ")) {
      if (b.length < 30 || u8(b, 23) != 0x9D || u8(b, 24) != 0x01 || u8(b, 25) != 0x2A) none
      else {
        // zero 14-bit dims = hostile/zeroed frame header -> null dims
        // (VP8L/VP8X are minus-one coded and cannot encode zero)
        val w = le16(b, 26) & 0x3FFF; val h = le16(b, 28) & 0x3FFF
        if (w == 0 || h == 0) none
        else MediaInfo("webp", Some(w), Some(h), None)
      }
    } else if (ascii(b, 12, "VP8L")) {
      if (b.length < 25 || u8(b, 20) != 0x2F) none
      else {
        val bits = le32(b, 21)
        val w = (bits & 0x3FFF).toInt + 1
        val h = ((bits >> 14) & 0x3FFF).toInt + 1
        MediaInfo("webp", Some(w), Some(h), None)
      }
    } else if (ascii(b, 12, "VP8X")) {
      if (b.length < 30) none
      else {
        val w = (u8(b, 24) | (u8(b, 25) << 8) | (u8(b, 26) << 16)) + 1
        val h = (u8(b, 27) | (u8(b, 28) << 8) | (u8(b, 29) << 16)) + 1
        MediaInfo("webp", Some(w), Some(h), None)
      }
    } else none
  }

  /** Parsed WAV audio metadata: fmt-chunk fields plus duration derived
    * from the data-chunk byte count at the declared byte rate.
    */
  final case class AudioInfo(format: String, channels: Option[Int],
                             sample_rate: Option[Int], bits_per_sample: Option[Int],
                             duration_ms: Option[Long])

  private val AudioUnknown = AudioInfo("unknown", None, None, None, None)

  /** WAV (RIFF/WAVE): walk the chunk list for `fmt ` (channels u16 at +2,
    * sample rate u32 at +4, bits/sample u16 at +14 of the chunk body) and
    * `data` (payload byte count); duration = data bytes / byte rate.
    * Chunk sizes are untrusted — the walk is bounds-checked and stops on
    * nonsense instead of throwing.
    */
  def parseAudio(bytes: Array[Byte]): AudioInfo = {
    val b = bytes
    if (b == null || b.length < 12 || !ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE"))
      return AudioUnknown
    var i = 12
    var channels, rate, bits = -1
    var byteRate = -1L
    var dataBytes = -1L
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (ascii(b, i, "fmt ") && size >= 16 && i + 8 + 16 <= b.length) {
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        byteRate = le32(b, i + 16)
        bits = le16(b, i + 22)
      } else if (ascii(b, i, "data")) {
        dataBytes = size
      }
      // chunks are word-aligned; a lying size that overflows ends the walk
      val next = i.toLong + 8 + size + (size & 1)
      if (next <= i || next > Int.MaxValue) i = b.length
      else i = next.toInt
    }
    if (channels < 0) AudioInfo("wav", None, None, None, None)
    else {
      val dur =
        if (dataBytes >= 0 && byteRate > 0) Some(dataBytes * 1000L / byteRate)
        else None
      AudioInfo("wav", Some(channels), Some(rate), Some(bits), dur)
    }
  }

  val parseAudioUdf = udf((b: Array[Byte]) => parseAudio(b))

  /** Sniff + parse. Image formats return dimensions; recognized non-image
    * containers (wav/mp4/ogg/pdf/gzip/zstd/mp3) return format only — enough
    * to route payloads by type before any real decode.
    */
  def parse(bytes: Array[Byte]): MediaInfo = {
    val b = bytes
    if (b == null || b.length < 4) return Unknown
    if (b.length >= 8 && be32(b, 0) == 0x89504E47L && be32(b, 4) == 0x0D0A1A0AL) return parsePng(b)
    if (u8(b, 0) == 0xFF && u8(b, 1) == 0xD8 && u8(b, 2) == 0xFF) return parseJpeg(b)
    if (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")) return parseGif(b)
    if (ascii(b, 0, "BM") && b.length >= 18) return parseBmp(b)
    if (ascii(b, 0, "RIFF") && b.length >= 12) {
      if (ascii(b, 8, "WEBP")) return parseWebp(b)
      if (ascii(b, 8, "WAVE")) return MediaInfo("wav", None, None, None)
      return MediaInfo("riff", None, None, None)
    }
    if (b.length >= 12 && ascii(b, 4, "ftyp")) return MediaInfo("mp4", None, None, None)
    if (ascii(b, 0, "OggS")) return MediaInfo("ogg", None, None, None)
    if (ascii(b, 0, "%PDF")) return MediaInfo("pdf", None, None, None)
    if (u8(b, 0) == 0x1F && u8(b, 1) == 0x8B) return MediaInfo("gzip", None, None, None)
    if (le32(b, 0) == 0xFD2FB528L) return MediaInfo("zstd", None, None, None)
    if (ascii(b, 0, "ID3") || (u8(b, 0) == 0xFF && (u8(b, 1) & 0xE0) == 0xE0))
      return MediaInfo("mp3", None, None, None)
    Unknown
  }

  /** Column form: struct(format, width, height, bit_depth) parsed from a
    * binary column. Scalar, narrow, codegen-adjacent (single UDF call per
    * row over bytes already in the scan) — safe on the 100-TB path.
    */
  val parseUdf = udf((b: Array[Byte]) => parse(b))

  /** Append parsed header columns to `df` from binary column `binCol`. */
  def withHeader(df: DataFrame, binCol: String): DataFrame = {
    val info = parseUdf(col(binCol))
    df.withColumn("media_format", info("format"))
      .withColumn("media_width", info("width"))
      .withColumn("media_height", info("height"))
      .withColumn("media_bit_depth", info("bit_depth"))
  }

  // ===== deterministic test-vector synthesis ==============================
  // Real, spec-conformant header bytes built from planted dimensions, so an
  // oracle can verify parse(synth(id)) round-trips the plant arithmetically
  // (format = id%5, w = 1+id%1019, h = 1+id%761 — primes so w/h decorrelate).

  def synthDims(id: Long): (Int, Int) =
    ((1 + math.floorMod(id, 1019)).toInt, (1 + math.floorMod(id, 761)).toInt)

  /** Minimal valid header bytes for format `id % 5` with the planted dims.
    * CRCs/payloads are zeroed — header parsers (including this one) read
    * layout, not checksums.
    */
  def synthImageBytes(id: Long): Array[Byte] = {
    val (w, h) = synthDims(id)
    math.floorMod(id, 5).toInt match {
      case 0 => // PNG
        val out = new Array[Byte](33)
        val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        var i = 0; while (i < 8) { out(i) = sig(i).toByte; i += 1 }
        out(11) = 13 // IHDR length
        putAscii(out, 12, "IHDR")
        putBe32(out, 16, w); putBe32(out, 20, h)
        out(24) = 8 // bit depth
        out(25) = 6 // RGBA
        out
      case 1 => // JPEG: SOI + APP0(JFIF) + SOF0 + EOI
        val app0 = "JFIF".getBytes("ISO-8859-1") ++
          Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
        val out = new Array[Byte](2 + 2 + 2 + app0.length + 2 + 2 + 15 + 2)
        var i = 0
        out(i) = 0xFF.toByte; out(i + 1) = 0xD8.toByte; i += 2
        out(i) = 0xFF.toByte; out(i + 1) = 0xE0.toByte; i += 2
        out(i) = 0; out(i + 1) = (2 + app0.length).toByte; i += 2
        System.arraycopy(app0, 0, out, i, app0.length); i += app0.length
        out(i) = 0xFF.toByte; out(i + 1) = 0xC0.toByte; i += 2
        out(i) = 0; out(i + 1) = 17; i += 2 // 8 + 3*3
        out(i) = 8; i += 1 // precision
        out(i) = ((h >> 8) & 0xFF).toByte; out(i + 1) = (h & 0xFF).toByte; i += 2
        out(i) = ((w >> 8) & 0xFF).toByte; out(i + 1) = (w & 0xFF).toByte; i += 2
        out(i) = 3; i += 1 // components
        i += 9 // zeroed component specs
        out(i) = 0xFF.toByte; out(i + 1) = 0xD9.toByte
        out
      case 2 => // GIF89a
        val out = new Array[Byte](13)
        putAscii(out, 0, "GIF89a")
        out(6) = (w & 0xFF).toByte; out(7) = ((w >> 8) & 0xFF).toByte
        out(8) = (h & 0xFF).toByte; out(9) = ((h >> 8) & 0xFF).toByte
        out
      case 3 => // BMP, BITMAPINFOHEADER
        val out = new Array[Byte](54)
        putAscii(out, 0, "BM")
        putLe32(out, 2, 54); putLe32(out, 10, 54); putLe32(out, 14, 40)
        putLe32(out, 18, w); putLe32(out, 22, h)
        out(26) = 1 // planes
        out(28) = 24 // bpp
        out
      case _ => // WebP VP8L
        val out = new Array[Byte](25)
        putAscii(out, 0, "RIFF")
        putLe32(out, 4, 17) // riff payload size
        putAscii(out, 8, "WEBP")
        putAscii(out, 12, "VP8L")
        putLe32(out, 16, 5)
        out(20) = 0x2F
        val bits = ((w - 1) & 0x3FFF).toLong | (((h - 1) & 0x3FFF).toLong << 14)
        putLe32(out, 21, bits)
        out
    }
  }

  private def putAscii(b: Array[Byte], i: Int, s: String): Unit = {
    var k = 0
    while (k < s.length) { b(i + k) = s.charAt(k).toByte; k += 1 }
  }

  private val WavRates = Array(8000, 16000, 22050, 44100, 48000)

  /** Planted WAV parameters for id: (channels, sampleRate, nSamples). */
  def synthWavParams(id: Long): (Int, Int, Long) =
    ((1 + math.floorMod(id, 2)).toInt,
      WavRates(math.floorMod(id, 5).toInt),
      1000 + math.floorMod(id, 9000))

  /** Spec-conformant 44-byte RIFF/WAVE header (fmt + data chunk headers,
    * PCM16) with the planted parameters; the data payload itself is not
    * materialized — duration derives from the declared data size, which is
    * all a header parser reads.
    */
  def synthWavBytes(id: Long): Array[Byte] = {
    val (channels, rate, nSamples) = synthWavParams(id)
    val byteRate = rate.toLong * channels * 2
    val dataBytes = nSamples * channels * 2
    val out = new Array[Byte](44)
    putAscii(out, 0, "RIFF"); putLe32(out, 4, 36 + dataBytes)
    putAscii(out, 8, "WAVE")
    putAscii(out, 12, "fmt "); putLe32(out, 16, 16)
    out(20) = 1 // PCM
    out(22) = (channels & 0xFF).toByte
    putLe32(out, 24, rate)
    putLe32(out, 28, byteRate)
    out(32) = ((channels * 2) & 0xFF).toByte // block align
    out(34) = 16 // bits per sample
    putAscii(out, 36, "data"); putLe32(out, 40, dataBytes)
    out
  }

  val synthWavUdf = udf((id: Long) => synthWavBytes(id))

  /** Audio round-trip column for q_audio_header's arithmetic oracle. */
  def audioRoundTrip(idCol: Column): Column =
    parseAudioUdf(synthWavUdf(idCol.cast("long")))

  private def putBe32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = ((v >> 24) & 0xFF).toByte; b(i + 1) = ((v >> 16) & 0xFF).toByte
    b(i + 2) = ((v >> 8) & 0xFF).toByte; b(i + 3) = (v & 0xFF).toByte
  }
  private def putLe32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = (v & 0xFF).toByte; b(i + 1) = ((v >> 8) & 0xFF).toByte
    b(i + 2) = ((v >> 16) & 0xFF).toByte; b(i + 3) = ((v >> 24) & 0xFF).toByte
  }

  val synthUdf = udf((id: Long) => synthImageBytes(id))

  /** Round-trip column: header parse over bytes synthesized from `idCol` —
    * this is what q_media_header oracles against the arithmetic plant.
    */
  def roundTrip(idCol: Column): Column = parseUdf(synthUdf(idCol.cast("long")))
}
