package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources & sinks for the corpus engine — SURVEY.md §2.1 (S1–S14).
  *
  * The reference reads directory trees of `*.jsonl.zst`/`*.jsonl.gz`
  * (datatrove JsonlReader, /root/reference/datatrove/findweb.py:75-88),
  * parquet, CSV (`pd.read_csv(..., on_bad_lines='skip')`,
  * /root/reference/utils/url_count.py:37) and dispatches the reader by
  * path keywords (/root/reference/datatrove/findweb.py:27-55). Writers are
  * jsonl.gz with language-templated paths (findweb.py:95-99), CSV/JSONL
  * append sinks, per-stage exclusion tees (findweb.py:95-113), and
  * round-robin sharded output rolled every `target_rows`
  * (/root/reference/utils/dedup_dataset.py:111-118,193-211).
  *
  * Spark-first mapping: one directory = one table; the reference's
  * file-per-task chunking IS Spark's partitioned scan; shard/roll sizing
  * maps to `repartition` + `maxRecordsPerFile`; exclusion tees become a
  * single scored write partitioned by verdict. Explicit schemas everywhere
  * — schema inference on jsonl would scan 100 TB twice.
  */
object CorpusIO {

  /** input_hint schema (BASELINE.json:15). */
  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)
  ))

  sealed trait Format { def name: String }
  case object Jsonl extends Format { val name = "jsonl" }
  case object Parquet extends Format { val name = "parquet" }
  case object Csv extends Format { val name = "csv" }
  case object Warc extends Format { val name = "warc" }

  /** Format sniffing by path keywords (findweb.py:27-55: jsonl wins over
    * parquet over warc over csv; default jsonl).
    */
  def sniffFormat(path: String): Format = {
    val p = path.toLowerCase(java.util.Locale.ROOT)
    if (p.contains("jsonl")) Jsonl
    else if (p.contains("parquet")) Parquet
    else if (p.contains("warc")) Warc
    else if (p.contains("csv")) Csv
    else Jsonl
  }

  /** S1: recursive jsonl scan with explicit schema; Spark's text codecs
    * handle `.gz`/`.zst`/plain transparently per file. Malformed lines are
    * dropped, not failed (the reference's readers skip bad docs).
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType = pageSchema): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.json*") // matches .json/.jsonl × gz/zst/plain
      .json(path)

  /** S2: columnar scan — predicate pushdown + column pruning land in the
    * parquet reader automatically.
    */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S4: CSV with header, explicit schema, malformed rows skipped
    * (`on_bad_lines='skip'` parity).
    */
  def readCsv(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .option("recursiveFileLookup", "true")
      .csv(path)

  /** S3: WARC ingestion surface. Upstream of the engine proper — the input
    * table already carries extracted text (input_hint) — but the plumbing
    * is real: whole-file binary scan + a record splitter. The splitter
    * handles uncompressed WARC/1.x response records deterministically; on
    * a cluster the binaryFile source distributes per-file.
    */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select(col("path"), col("content"))
    val outSchema = StructType(Seq(
      StructField("url", StringType),
      StructField("warc_ts", StringType),
      StructField("html", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    files.flatMap { r =>
      splitWarc(new String(r.getAs[Array[Byte]]("content"),
        java.nio.charset.StandardCharsets.ISO_8859_1))
        .map { case (u, ts, body) =>
          Row(u, ts, body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        }
    }(enc)
  }

  /** WARC/1.x record splitter: yields (target-uri, date, payload) for
    * each `WARC-Type: response` record. Advances record-by-record using
    * the Content-Length header to delimit payloads — a payload that
    * itself contains the bytes `WARC/1.` (an archived page quoting a WARC
    * file) neither truncates its record nor fabricates a spurious one.
    * Records missing a parseable Content-Length fall back to the
    * next-record-marker heuristic. Pure function, unit-tested.
    */
  private[sources] def splitWarc(content: String): Seq[(String, String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val n = content.length
    var pos = content.indexOf("WARC/1.")
    while (pos >= 0 && pos < n) {
      val headerEnd = content.indexOf("\r\n\r\n", pos)
      if (headerEnd < 0) pos = -1 // truncated trailing record
      else {
        val header = content.substring(pos, headerEnd)
        def field(k: String): Option[String] =
          header.linesIterator.find(_.toLowerCase(java.util.Locale.ROOT).startsWith(k.toLowerCase(java.util.Locale.ROOT) + ":"))
            .map(_.split(":", 2)(1).trim)
        val payloadStart = headerEnd + 4
        val contentLength = field("Content-Length").flatMap(_.toLongOption)
        val (payload, nextSearchFrom) = contentLength match {
          case Some(len) if payloadStart + len <= n =>
            val end = payloadStart + len.toInt
            (content.substring(payloadStart, end), end)
          case _ => // absent/corrupt length: heuristic lookahead split
            val nxt = content.indexOf("WARC/1.", payloadStart)
            val end = if (nxt < 0) n else nxt
            (content.substring(payloadStart, end).stripTrailing(), end)
        }
        if (field("WARC-Type").contains("response")) {
          for { url <- field("WARC-Target-URI"); ts <- field("WARC-Date") }
            out += ((url, ts, payload))
        }
        pos = content.indexOf("WARC/1.", nextSearchFrom)
      }
    }
    out.toSeq
  }

  /** S14: dispatching reader. */
  def read(spark: SparkSession, path: String,
           format: Option[Format] = None,
           schema: StructType = pageSchema): DataFrame =
    format.getOrElse(sniffFormat(path)) match {
      case Jsonl   => readJsonl(spark, path, schema)
      case Parquet => readParquet(spark, path)
      case Csv     => readCsv(spark, path, schema)
      case Warc    => readWarc(spark, path)
    }

  /** S7/S11/S12: corpus writer. `partitionByLang` reproduces the
    * `${language}/${rank}.jsonl.gz` templated layout (findweb.py:95-99);
    * `shards`+`targetRowsPerFile` reproduce round-robin sharding with
    * file rolling (dedup_dataset.py:111-118) without any driver-side loop.
    *
    * S9/S10: `mode = "append"` gives the reference's incremental CSV/JSONL
    * append sinks (utils/pd_util.py:67-92 `to_csv(mode='a')` with
    * header-on-create, fasttext/mult_infer.py:119-132): each append adds
    * part files to the directory-table; for CSV every part file carries
    * its own header, which a header-aware read of the directory
    * reassembles — the distributed equivalent of header-only-at-create on
    * a single file.
    */
  def writeCorpus(df: DataFrame, path: String,
                  format: Format = Jsonl,
                  partitionByLang: Option[String] = None,
                  shards: Int = 0,
                  targetRowsPerFile: Long = 0L,
                  compression: String = "gzip",
                  mode: String = "overwrite",
                  writerOptions: Map[String, String] = Map.empty): Unit = {
    val sharded = if (shards > 0) df.repartition(shards) else df
    var w: DataFrameWriter[Row] = sharded.write.mode(mode)
      .options(writerOptions)
    if (targetRowsPerFile > 0)
      w = w.option("maxRecordsPerFile", targetRowsPerFile)
    partitionByLang.foreach(c => w = w.partitionBy(c))
    format match {
      // an explicit codec in writerOptions (e.g. the CLI's
      // --out-compression) wins; the jsonl-oriented `compression`
      // default ("gzip") applies only when the caller set none —
      // a later option() call overrides an earlier options() map
      case Jsonl =>
        if (!writerOptions.contains("compression"))
          w = w.option("compression", compression)
        w.json(path)
      case Csv => w.option("header", "true").csv(path)
      // parquet compression only when explicitly requested via
      // writerOptions("compression") — the jsonl-oriented `compression`
      // default ("gzip") must not silently override Spark's parquet
      // codec default (snappy)
      case Parquet => w.parquet(path)
      case Warc =>
        throw new IllegalArgumentException("WARC is a source, not a sink")
    }
  }

  /** Bucketed-table writer — the co-located-join storage layout for hot
    * join/aggregation keys (the north rule's "explicit repartitioning" as
    * a persistent property). Two tables bucketed the same way
    * (same column, same bucket count) join and aggregate on that key with
    * ZERO exchanges: the bucket id IS the partitioning, recorded in the
    * catalog, so Catalyst plans the join shuffle-free (asserted in
    * CorpusIOSpec). At 100 TB this turns the repeated page⋈domain-stats
    * joins from per-query corpus shuffles into local merges. Bucketing
    * requires the table catalog (`saveAsTable`), not a bare path.
    */
  def writeBucketedTable(df: DataFrame, table: String,
                         bucketCol: String, nBuckets: Int,
                         sortCol: Option[String] = None): Unit = {
    var w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    sortCol.foreach(c => w = w.sortBy(c))
    w.saveAsTable(table)
  }

  /** Data-skipping parquet sink: range-sorted layout + per-column bloom
    * filters, so downstream point/range reads prune ROW GROUPS instead
    * of scanning the corpus.
    *
    * Two independent skip mechanisms, each targeting a read shape the
    * pipeline actually runs at scale:
    *   - `sortCol` range-repartitions and sorts in-file, making every
    *     row group's parquet min/max statistics a DISJOINT interval of
    *     the key. A downstream `WHERE key = x` / `BETWEEN` pushes down
    *     (PushedFilters) and the reader drops every non-matching row
    *     group from its footer alone — the mark/signature-table
    *     anti-join probes (`removed_ids`, `_semdedup_stage/marks`)
    *     become O(matching row groups), not O(table).
    *   - `bloomCols` writes parquet bloom filters (parquet-mr ≥ 1.12,
    *     on Spark's classpath) for point-lookup columns whose values
    *     are NOT clustered by the sort — url/doc-hash lookups hit every
    *     row group's min/max span, but the bloom filter rejects
    *     row groups that cannot contain the probed value: an absent key
    *     reads ZERO records (SkipIndexSpec pins both effects through
    *     task inputMetrics, with an unindexed control layout).
    *
    * 100-TB shape: the range repartition is one corpus shuffle paid at
    * WRITE time to make every subsequent lookup sub-linear — the same
    * trade `--sort-by-pos` makes for training order. `nFiles` sizes
    * output files; bloom space is ~1.2 MB per 10^6 NDV per row group
    * (parquet sizes the filter from `bloomNdv`), negligible against the
    * data. Row-group pruning needs no catalog and survives file moves —
    * unlike bucketing ([[writeBucketedTable]]) it is a property of the
    * FILES, which is what an object-store corpus actually has.
    */
  def writeSkipIndexed(df: DataFrame, path: String, sortCol: String,
                       bloomCols: Seq[String] = Nil,
                       nFiles: Int = 32,
                       bloomNdv: Long = 1L << 20,
                       mode: String = "overwrite"): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(mode)
      .options(bloomOptions(bloomCols, bloomNdv))
      .parquet(path)
  }

  /** Parquet bloom-filter writer options for `cols` at `ndv` expected
    * distinct values — the single source of the parquet-mr option-key
    * strings, shared by [[writeSkipIndexed]], [[compactParquet]] and
    * the CLI sink so a key or default change can never diverge them.
    */
  def bloomOptions(cols: Seq[String],
                   ndv: Long = 1L << 20): Map[String, String] = {
    require(ndv > 0, s"bloom ndv must be positive, got $ndv")
    cols.flatMap { c =>
      Seq(s"parquet.bloom.filter.enabled#$c" -> "true",
        s"parquet.bloom.filter.expected.ndv#$c" -> ndv.toString)
    }.toMap
  }

  /** Small-file compaction for a parquet directory — the maintenance
    * pass every long-running ingestion needs: streaming sinks,
    * incremental appends and over-parallel writes leave directories of
    * KB-scale files whose per-file open/footer cost dominates scans and
    * whose listing cost explodes the driver at 10^6+ files. Sizes the
    * output file count from the ACTUAL on-disk bytes (one Hadoop
    * ContentSummary call — no count() job over the data) and rewrites
    * with a round-robin repartition so output files land uniformly
    * target-sized. The row SET is preserved exactly (CorpusIOSpec pin +
    * the q_compact oracle round-trip); row ORDER is not a property a
    * parquet directory has — UNLESS the caller made it one: pass
    * `orderBy` to compact with a range repartition + in-file sort on
    * that column instead, preserving a `--sort-by-pos`-style
    * contiguous-files-in-name-order layout through the rewrite (a
    * round-robin here would silently scramble it). The same holds for
    * footer-level skip structures: a `--skip-index`/`--bloom` layout is
    * a file property the rewrite must re-establish — pass the sort key
    * as `orderBy` and the bloom options (see [[bloomOptions]]) as
    * `writerOptions`, else compaction would silently strip them.
    * Writes to a NEW directory — the atomic swap/rename is the
    * caller's deployment concern (object stores differ on rename
    * semantics). Returns the output file count.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytesPerFile: Long = 512L * 1024 * 1024,
                     orderBy: Option[String] = None,
                     writerOptions: Map[String, String] = Map.empty): Int = {
    require(targetBytesPerFile > 0,
      s"targetBytesPerFile must be positive, got $targetBytesPerFile")
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L,
      (bytes + targetBytesPerFile - 1) / targetBytesPerFile).toInt
    val df = spark.read.parquet(inDir)
    val reshaped = orderBy match {
      case Some(c) =>
        df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(c)
      case None => df.repartition(nFiles)
    }
    reshaped.write.mode("overwrite").options(writerOptions).parquet(outDir)
    nFiles
  }

  /** F10 filename sanitize (utils.py:22-25 `clean_filename`): keep
    * letters, digits, '.' and '_'; drop everything else. The reference
    * uses Python `str.isalnum`, which is Unicode-aware —
    * `Character.isLetterOrDigit` mirrors that (so 'café.txt' keeps the
    * é). Used when deriving sink file/dir names from user-supplied labels
    * or source paths.
    */
  def sanitizeFilename(name: String): String = {
    if (name == null) return ""
    val sb = new java.lang.StringBuilder(name.length)
    var i = 0
    while (i < name.length) {
      val c = name.charAt(i)
      if (Character.isLetterOrDigit(c) || c == '.' || c == '_') sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** S8: exclusion tee. One pass over a (persisted) scored frame:
    * kept rows → `path/kept`, dropped rows → `path/removed/<drop_stage>=…`
    * — the reference's per-stage exclusion dirs (findweb.py:95-113) as a
    * partitioned write instead of six sink objects.
    */
  /** `keptTransform` reshapes ONLY the kept side right before its write
    * (e.g. graft.Run's `--sort-by-pos` range-repartition into contiguous
    * training-order files); the removed audit side is layout-free — it
    * partitions by drop_stage regardless.
    */
  def writeWithExclusions(result: DataFrame, path: String,
                          format: Format = Jsonl,
                          keptTransform: DataFrame => DataFrame =
                            identity,
                          keptOptions: Map[String, String] =
                            Map.empty,
                          codec: Option[String] = None): Unit = {
    writeCorpus(keptTransform(result.filter(col("keep")).drop("keep")),
      s"$path/kept", format,
      writerOptions = keptOptions ++ codec.map("compression" -> _))
    val dropped = result.filter(!col("keep")).drop("keep")
    val w: DataFrameWriter[Row] =
      dropped.write.mode("overwrite").partitionBy("drop_stage")
    // one codec site per arm: jsonl keeps its gzip default for the
    // audit side, the others apply the codec only when requested
    format match {
      case Jsonl => w.option("compression", codec.getOrElse("gzip"))
        .json(s"$path/removed")
      case Csv => w.options(codec.map("compression" -> _).toMap)
        .option("header", "true").csv(s"$path/removed")
      case _ => w.options(codec.map("compression" -> _).toMap)
        .parquet(s"$path/removed")
    }
  }
}
