package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

class ExcelIOSpec extends SparkSpec {

  /** Build a minimal real xlsx (zip of SpreadsheetML parts) in memory. */
  private def xlsxBytes(sharedStrings: Seq[String],
                        sheetXml: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(out)
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    if (sharedStrings.nonEmpty)
      put("xl/sharedStrings.xml",
        s"""<?xml version="1.0"?><sst count="${sharedStrings.size}" uniqueCount="${sharedStrings.size}">""" +
          sharedStrings.map(s => s"<si><t>$s</t></si>").mkString + "</sst>")
    put("xl/worksheets/sheet1.xml", sheetXml)
    zip.close()
    out.toByteArray
  }

  test("reads shared-string, inline and numeric cells with a header row") {
    val shared = Seq("Abstract", "Category", "deep learning survey", "nlp")
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>Score</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>4.5</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>graph databases</t></is></c><c r="C3"><v>3</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val rows = ExcelIO.readRows(new ByteArrayInputStream(xlsxBytes(shared, sheet)))
    assert(rows.size == 3)
    assert(rows(0).toSeq == Seq("Abstract", "Category", "Score"))
    assert(rows(1).toSeq == Seq("deep learning survey", "nlp", "4.5"))
    // missing B3 stays null (sparse row densified)
    assert(rows(2).toSeq == Seq("graph databases", null, "3"))
  }

  test("readXlsx produces a string DataFrame matching pd.read_excel shape") {
    val shared = Seq("text", "label")
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>first seed doc</t></is></c><c r="B2"><v>1</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>second seed doc</t></is></c><c r="B3"><v>0</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val f = java.nio.file.Files.createTempFile("seed", ".xlsx")
    java.nio.file.Files.write(f, xlsxBytes(shared, sheet))
    val df = ExcelIO.readXlsx(spark, f.toString)
    assert(df.columns.toSeq == Seq("text", "label"))
    assert(df.count() == 2)
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("first seed doc", "1"), ("second seed doc", "0")))
  }

  test("column reference letters convert to indices") {
    assert(ExcelIO.colIndexOf("A1") == 0)
    assert(ExcelIO.colIndexOf("B2") == 1)
    assert(ExcelIO.colIndexOf("Z9") == 25)
    assert(ExcelIO.colIndexOf("AA10") == 26)
    assert(ExcelIO.colIndexOf("AB1") == 27)
  }

  test("loadSeed reproduces process_data.load_data over an xlsx") {
    // field → clean_text → drop empty (≤4 words cleans to "") → text col
    val shared = Seq("Abstract", "Other")
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>The Quick Brown Fox Jumps Over Things!</t></is></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>too few words</t></is></c></row>
        |<row r="4"><c r="B4" t="inlineStr"><is><t>no abstract present</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val f = java.nio.file.Files.createTempFile("seed", ".xlsx")
    java.nio.file.Files.write(f, xlsxBytes(shared, sheet))
    val df = ExcelIO.loadSeed(spark, f.toString, "Abstract")
    val got = df.collect().map(_.getString(0)).toSeq
    // row 2 cleans + keeps; row 3 ≤4 words → dropped; row 4 null → dropped
    assert(got == Seq("the quick brown fox jumps over things!"))
  }

  test("sanitizeFilename mirrors the reference clean_filename") {
    // utils.py:22-25 — keep alnum, '.', '_'; drop spaces and symbols
    assert(CorpusIO.sanitizeFilename("my file (v2).csv") == "myfilev2.csv")
    assert(CorpusIO.sanitizeFilename("a/b\\c:d*e?.txt") == "abcde.txt")
    assert(CorpusIO.sanitizeFilename("under_score.keep") == "under_score.keep")
    // Python isalnum is unicode-aware; so is Character.isLetterOrDigit
    assert(CorpusIO.sanitizeFilename("café-menü.pdf") == "cafémenü.pdf")
    assert(CorpusIO.sanitizeFilename(null) == "")
  }
}
