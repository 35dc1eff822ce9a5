package graft.sources

import java.io.InputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX reader — closes SURVEY §2 S5 (the reference's one-off
  * seed ingestion, /root/reference/process_data.py:19 `pd.read_excel`).
  *
  * Scope matches the reference's use exactly: ONE driver-side seed file,
  * first sheet, first row = header, every value read as a string (the
  * reference immediately `clean_text`s a single column). XLSX is a zip of
  * XML ("SpreadsheetML"), so the JDK's ZipInputStream + StAX parser cover
  * it without any dependency: `xl/sharedStrings.xml` (the shared-string
  * table most string cells reference) and the first `xl/worksheets/
  * sheet*.xml` (cells `<c r="B2" t="s|str|inlineStr|n"><v>…</v></c>`).
  *
  * NOT a general Excel engine, on purpose: no formula evaluation (cached
  * formula values are read), no styles/dates decoding (dates surface as
  * their raw serial-number strings), no multi-sheet — a seed list never
  * needs them. Files are driver-local seed lists by definition; corpus
  * data uses the parquet/jsonl/warc/csv readers.
  */
object ExcelIO {

  /** Read the first worksheet of an xlsx into a DataFrame of strings.
    * First row = column names (empty header cells become `_c<i>`);
    * missing cells are null.
    */
  def readXlsx(spark: SparkSession, path: String): DataFrame = {
    val rows = readRows(new java.io.FileInputStream(path))
    require(rows.nonEmpty, s"xlsx has no rows: $path")
    val width = rows.map(_.length).max
    val header = rows.head.padTo(width, null).zipWithIndex.map {
      case (h, i) => if (h == null || h.isEmpty) s"_c$i" else h
    }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val data = rows.tail.map(r => Row.fromSeq(r.padTo(width, null).toSeq))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq, 1), schema)
  }

  /** The reference's seed-ingest composition (process_data.py:13-24
    * `load_data`): read a csv or xlsx seed file, `clean_text` the chosen
    * field into `text`, drop null/empty rows, return the single-column
    * frame (the reference then writes it as a one-column csv —
    * `CorpusIO.writeCorpus(df, path, Csv)` here).
    */
  def loadSeed(spark: SparkSession, path: String, field: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw =
      if (path.toLowerCase(java.util.Locale.ROOT).endsWith(".csv"))
        spark.read.option("header", "true").csv(path)
      else readXlsx(spark, path)
    val cleanUdf = udf((s: String) => graft.text.CleanText(s))
    raw.withColumn("text", cleanUdf(col(field)))
      .filter(col("text").isNotNull && col("text") =!= "")
      .select("text")
  }

  /** Parse rows (as string cells) out of an xlsx stream. */
  private[sources] def readRows(in: InputStream): Vector[Array[String]] = {
    var shared: Vector[String] = Vector.empty
    var sheetRows: Vector[Array[String]] = Vector.empty
    var sheetName: Option[String] = None
    val zip = new ZipInputStream(in)
    try {
      // sharedStrings may appear before or after the sheet in the zip;
      // buffer both raw payloads, resolve after.
      var sheetBytes: Array[Byte] = null
      var entry = zip.getNextEntry
      while (entry != null) {
        val name = entry.getName
        if (name == "xl/sharedStrings.xml") shared = parseSharedStrings(readAll(zip))
        else if (name.startsWith("xl/worksheets/sheet") && name.endsWith(".xml")) {
          // first sheet by zip order (sheet1.xml in every real writer)
          if (sheetBytes == null || sheetName.exists(_ > name)) {
            sheetBytes = readAll(zip)
            sheetName = Some(name)
          }
        }
        entry = zip.getNextEntry
      }
      require(sheetBytes != null, "xlsx contains no worksheet")
      sheetRows = parseSheet(sheetBytes, shared)
    } finally zip.close()
    sheetRows
  }

  private def readAll(in: InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def xmlReader(bytes: Array[Byte]) = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    // seed files are untrusted input: no DTDs, no external entities
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes), "UTF-8")
  }

  /** `<si>` entries; rich-text runs (`<r><t>`) concatenate. */
  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val r = xmlReader(bytes)
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inT = false
    var depth = 0
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur.clear(); depth += 1
            case "t"  => inT = true
            case _    => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
          if (inT) cur.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += cur.toString; depth -= 1
            case "t"  => inT = false
            case _    => ()
          }
        case _ => ()
      }
    }
    r.close()
    out.toVector
  }

  /** Worksheet cells → dense rows (gaps null). Cell types handled:
    * `t="s"` shared-string index, `t="inlineStr"` inline `<is><t>`,
    * `t="str"`/`t="b"`/`t="e"`/absent (numeric) — the `<v>` text as-is.
    */
  private def parseSheet(bytes: Array[Byte],
                         shared: Vector[String]): Vector[Array[String]] = {
    val r = xmlReader(bytes)
    val rows = ArrayBuffer.empty[Array[String]]
    var row = ArrayBuffer.empty[(Int, String)]
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIs = false
    val v = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = ArrayBuffer.empty
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colIndexOf).getOrElse(row.size)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              v.clear()
            case "v" => inV = true
            case "is" => inIs = true
            case "t" => if (inIs) inV = true
            case _ => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
          if (inV) v.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              if (row.nonEmpty) {
                val width = row.map(_._1).max + 1
                val dense = Array.fill[String](width)(null)
                row.foreach { case (i, s) => dense(i) = s }
                rows += dense
              } else rows += Array.empty[String]
            case "c" =>
              val value = cellType match {
                case "s" =>
                  val i = v.toString.trim.toInt
                  if (i >= 0 && i < shared.length) shared(i) else null
                case _ => if (v.isEmpty) null else v.toString
              }
              if (value != null) row += ((cellCol, value))
            case "v" => inV = false
            case "is" => inIs = false
            case "t" => if (inIs) inV = false
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    rows.toVector
  }

  /** "B2" → 0-based column index (1 for B). */
  private[sources] def colIndexOf(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && Character.isLetter(ref.charAt(i))) {
      acc = acc * 26 + (Character.toUpperCase(ref.charAt(i)) - 'A' + 1)
      i += 1
    }
    math.max(acc - 1, 0)
  }
}
