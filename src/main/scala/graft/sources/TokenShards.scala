package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Last-mile training-shard export: tokenized sequences as GPT-style
  * binary shards — a `part-<s>.bin` of little-endian fixed-width token
  * ids plus a `part-<s>.idx` of (seq_id, length) records per shard,
  * and a `_manifest.json`. This is the handoff format a training
  * framework memory-maps; parquet of int arrays would force the
  * trainer through a columnar decoder on the hot input path.
  *
  * Scale/determinism design:
  *   - Shard assignment is `pmod(xxhash64(seq_id), numShards)` —
  *     content-keyed, so the byte layout of every shard is a pure
  *     function of the data, reproducible across runs and
  *     partitionings. (`repartitionByRange` would balance equally
  *     well but samples its boundaries at runtime — two runs could
  *     split shards differently, and the repo keys determinism on
  *     content everywhere.) The `orderCol` mode keeps that bar with
  *     EXACT integer range boundaries over a validated gapless
  *     position column — see [[write]].
  *   - One shuffle on the shard key, `sortWithinPartitions(shard,
  *     seq_id)`, then a single `mapPartitions` writes each shard
  *     streamingly — sequences are never buffered whole-shard in
  *     memory, and the imperative write is the documented
  *     last-resort mapPartitions case: a byte-exact binary sink has
  *     no declarative form.
  *   - Executors open the destination through the Hadoop FileSystem
  *     API with the SESSION's Hadoop configuration (shipped into the
  *     task closure as key/value pairs — Configuration itself is not
  *     serializable), so spark.hadoop.* settings like object-store
  *     credentials reach the shard writes exactly as they reach every
  *     other sink.
  *   - Token range is validated LOUDLY against the dtype width as it
  *     streams — a u16 overflow fails the task with the offending
  *     seq_id, never wraps silently.
  *
  * The paired [[read]] is the verification/audit path (round-trips
  * whole shard files through the binaryFile source); the intended
  * consumer of the bytes is the training framework itself.
  */
object TokenShards {

  val Magic = 0x47524654 // "GRFT"
  val Version = 1
  val MaxShards = 1000000

  private def width(dtype: String): Int = dtype match {
    case "u16" => 2
    case "u32" => 4
    case other =>
      throw new IllegalArgumentException(
        s"TokenShards: dtype '$other' not in {u16, u32}")
  }

  /** Per-shard write stats, also the manifest's payload. */
  case class ShardStat(shard: Long, sequences: Long, tokens: Long)

  /** Write `(idCol: long-castable, tokensCol: array<int>)` as binary
    * token shards under `dir`. Returns one [[ShardStat]] per non-empty
    * shard. Null token arrays are rejected loudly (an upstream bug,
    * not a representable sequence); empty arrays are legal.
    *
    * Tasks write destination files directly (overwrite-on-retry keeps
    * task RE-runs idempotent) — run this sink with speculative
    * execution off, like any direct-write sink outside Spark's commit
    * protocol. The `.idx` records are JVM DataOutput big-endian; only
    * the `.bin` token stream is little-endian (the memory-map side).
    *
    * Two shard-assignment modes, both fully content-deterministic:
    *  - default: `pmod(xxhash64(seq_id), numShards)` — layout is a pure
    *    function of the data, independent of any ordering.
    *  - `orderCol = Some(c)`: `c` must hold a GAPLESS 1-based position
    *    (e.g. graft.Run's `shuffle_pos` training permutation; validated
    *    by an exact max==count probe). Shard is the EXACT integer range
    *    `(pos-1)*numShards/total` — no runtime boundary sampling, so
    *    two runs over the same data cut identical shards — and
    *    sequences write in pos order within each shard: streaming
    *    part-0.bin, part-1.bin, … IS the training order, no trainer-side
    *    shuffle or sort. Shard sizes balance to ±1 sequence. */
  def write(df: DataFrame, idCol: String, tokensCol: String, dir: String,
            dtype: String = "u16", numShards: Int = 64,
            orderCol: Option[String] = None): Seq[ShardStat] = {
    val w = width(dtype)
    require(numShards >= 1 && numShards <= MaxShards,
      s"TokenShards: numShards=$numShards outside [1, $MaxShards]")
    // this sink writes destination files directly from tasks (no commit
    // protocol): a speculative duplicate attempt would interleave bytes
    // into the same part-N path while Spark discards only its STATS —
    // silent shard corruption. Enforce the documented precondition.
    require(!df.sparkSession.conf.get("spark.speculation", "false").toBoolean,
      "TokenShards.write is a direct-write sink outside Spark's commit " +
        "protocol — disable spark.speculation for this job")
    // u32 is capped at Int.MaxValue so ids survive the array<int>
    // round-trip unsigned-exactly; negative ints map above either cap
    // and fail the loud range check below
    val maxTok = if (w == 2) 65535L else 2147483647L

    val prepared = orderCol match {
      case None =>
        df.select(col(idCol).cast("long").as("seq_id"),
            col(tokensCol).cast("array<int>").as("toks"))
          .withColumn("shard", pmod(xxhash64(col("seq_id")), lit(numShards)))
          .repartition(numShards, col("shard"))
          .sortWithinPartitions("shard", "seq_id")
      case Some(oc) =>
        val base = df.select(col(idCol).cast("long").as("seq_id"),
          col(tokensCol).cast("array<int>").as("toks"),
          col(oc).cast("long").as("_pos"))
        // one narrow agg prices the total AND proves the gapless-
        // permutation contract the range formula depends on (a gap or
        // duplicate would silently skew every boundary after it)
        val probe = base.agg(
          count(lit(1)), countDistinct(col("_pos")),
          min(col("_pos")), max(col("_pos"))).head()
        val total = probe.getLong(0)
        if (total > 0) require(
          probe.getLong(1) == total && probe.getLong(2) == 1L &&
            probe.getLong(3) == total,
          s"TokenShards: orderCol '$oc' is not a gapless 1-based " +
            s"permutation (count=$total distinct=${probe.getLong(1)} " +
            s"min=${probe.getLong(2)} max=${probe.getLong(3)})")
        // integer `div`, not `/` (Spark's `/` on longs is DOUBLE division
        // — a 2^53+ numerator would round shard boundaries); the product
        // stays in Long up to ~9e18 / numShards positions
        base
          .withColumn("shard", expr(
            s"(_pos - 1L) * ${numShards}L div ${math.max(total, 1L)}L"))
          .repartition(numShards, col("shard"))
          .sortWithinPartitions("shard", "_pos")
          .select("seq_id", "toks", "shard")
    }

    // ship the SESSION's Hadoop conf to the write tasks as plain pairs
    // (Configuration is not serializable): a bare new Configuration()
    // on the executor would drop every spark.hadoop.* session setting —
    // object-store credentials/endpoints configured via SparkConf would
    // vanish for the shard writes while the driver-side manifest write
    // (which uses sparkContext.hadoopConfiguration) kept them
    val hadoopKv: Array[(String, String)] = {
      val it = df.sparkSession.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }

    val stats = prepared.queryExecution.toRdd.mapPartitions { rows =>
      // InternalRow iteration keeps the hot loop allocation-light
      val out = scala.collection.mutable.ArrayBuffer.empty[ShardStat]
      var fs: FileSystem = null
      var cur = -1L
      var bin: DataOutputStream = null
      var idxBuf = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      var nTok = 0L
      def closeShard(): Unit = if (cur >= 0) {
        bin.close()
        val idx = new DataOutputStream(
          fs.create(new Path(s"$dir/part-$cur.idx"), true))
        try {
          idx.writeInt(Magic); idx.writeInt(Version); idx.writeInt(w)
          idx.writeLong(idxBuf.length.toLong)
          idxBuf.foreach { case (id, n) => idx.writeLong(id); idx.writeInt(n) }
        } finally idx.close()
        out += ShardStat(cur, idxBuf.length.toLong, nTok)
        cur = -1L; idxBuf = scala.collection.mutable.ArrayBuffer.empty
        nTok = 0L
      }
      rows.foreach { r =>
        // a null id (or a non-numeric one the long cast nulled) would
        // read as 0 through InternalRow.getLong — a silent id collision
        require(!r.isNullAt(0),
          "TokenShards: null seq_id (id column null or not long-castable)")
        val seqId = r.getLong(0)
        require(!r.isNullAt(1),
          s"TokenShards: null token array at seq_id=$seqId")
        val toks = r.getArray(1)
        val shard = r.getLong(2)
        if (shard != cur) {
          closeShard()
          if (fs == null) {
            val conf = new Configuration(false)
            hadoopKv.foreach { case (k, v) => conf.set(k, v) }
            fs = new Path(dir).getFileSystem(conf)
          }
          bin = new DataOutputStream(new java.io.BufferedOutputStream(
            fs.create(new Path(s"$dir/part-$shard.bin"), true), 1 << 16))
          cur = shard
        }
        val n = toks.numElements()
        val bb = ByteBuffer.allocate(n * w).order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) {
          require(!toks.isNullAt(i),
            s"TokenShards: null token at seq_id=$seqId pos=$i")
          val t = toks.getInt(i).toLong & 0xffffffffL
          require(t <= maxTok,
            s"TokenShards: token $t at seq_id=$seqId exceeds $dtype " +
              s"range [0, $maxTok] — use dtype=u32 or fix the tokenizer")
          if (w == 2) bb.putShort(t.toShort) else bb.putInt(t.toInt)
          i += 1
        }
        bin.write(bb.array(), 0, n * w)
        idxBuf += ((seqId, n)); nTok += n
      }
      closeShard()
      out.iterator
    }.collect().toSeq.sortBy(_.shard)

    val fs = new Path(dir).getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val man = new DataOutputStream(fs.create(new Path(s"$dir/_manifest.json"), true))
    try man.write(
      (s"""{"format":"graft-token-shards","version":$Version,""" +
        s""""dtype":"$dtype","num_shards":$numShards,""" +
        s""""ordered":${orderCol.isDefined},""" +
        s""""shards_written":${stats.length},""" +
        s""""sequences":${stats.map(_.sequences).sum},""" +
        s""""tokens":${stats.map(_.tokens).sum}}""").getBytes("UTF-8"))
    finally man.close()
    stats
  }

  /** Read shards back as `(seq_id: long, tokens: array<int>)` — the
    * audit/round-trip path. Whole shard files flow through the
    * binaryFile source (one row per file, like the WARC reader), so
    * size shards for verification reads accordingly. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("seq_id", LongType),
      StructField("tokens", ArrayType(IntegerType, containsNull = false))))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasShards = fs.exists(new Path(dir)) &&
      Option(fs.globStatus(new Path(s"$dir/part-*.idx"))).exists(_.nonEmpty)
    if (!hasShards)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)

    val idx = spark.read.format("binaryFile").load(s"$dir/part-*.idx")
      .select(regexp_extract(col("path"), "part-(\\d+)\\.idx$", 1)
          .cast("long").as("shard"),
        col("content").as("idx_bytes"))
    val bin = spark.read.format("binaryFile").load(s"$dir/part-*.bin")
      .select(regexp_extract(col("path"), "part-(\\d+)\\.bin$", 1)
          .cast("long").as("shard"),
        col("content").as("bin_bytes"))
    // LEFT join: a shard holding only empty sequences has a 0-byte
    // .bin, which the binaryFile source omits from its file listing
    val joined = idx.join(bin, Seq("shard"), "left")
      .withColumn("bin_bytes",
        coalesce(col("bin_bytes"), lit(Array.emptyByteArray)))
    val parse = udf { (idxBytes: Array[Byte], binBytes: Array[Byte]) =>
      val in = new DataInputStream(new java.io.ByteArrayInputStream(idxBytes))
      val magic = in.readInt()
      if (magic != Magic)
        throw new IllegalArgumentException(
          f"TokenShards.read: bad magic 0x$magic%08x")
      val ver = in.readInt()
      if (ver != Version)
        throw new IllegalArgumentException(s"TokenShards.read: version $ver")
      val w = in.readInt()
      val nSeq = in.readLong()
      val bb = ByteBuffer.wrap(binBytes).order(ByteOrder.LITTLE_ENDIAN)
      try {
        (0L until nSeq).map { _ =>
          val id = in.readLong(); val n = in.readInt()
          val toks = new Array[Int](n)
          var i = 0
          while (i < n) {
            toks(i) =
              if (w == 2) bb.getShort() & 0xffff
              else bb.getInt()
            i += 1
          }
          (id, toks)
        }
      } catch {
        case _: EOFException | _: java.nio.BufferUnderflowException =>
          throw new IllegalArgumentException(
            "TokenShards.read: truncated shard (idx/bin disagree)")
      }
    }
    joined
      .select(explode(parse(col("idx_bytes"), col("bin_bytes"))).as("s"))
      .select(col("s._1").as("seq_id"), col("s._2").as("tokens"))
  }
}
