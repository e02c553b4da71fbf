package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File, PrintWriter}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipFile, ZipInputStream}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Export

/** S12 Excel/ZIP export packaging (reference dashboard/utils.py:374-420,
  * 688-776; callbacks.py:1930-1967, 2546-2562). The workbook reader below is
  * independent of the writer: it unzips with java.util.zip and parses the
  * OOXML parts with the JDK DOM parser, so a green test certifies the
  * on-disk xlsx format, not a round-trip through shared code.
  */
class ExportSpec extends AnyFunSuite {

  // ------------------------------------------------- independent xlsx reader

  private def parseXml(bytes: Array[Byte]): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  /** sheet name -> rows of cell strings (numbers rendered verbatim). */
  private def readWorkbook(bytes: Array[Byte]): Seq[(String, Seq[Seq[String]])] = {
    val parts = mutable.LinkedHashMap.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    var e = zin.getNextEntry
    while (e != null) {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = zin.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
      parts(e.getName) = out.toByteArray
      e = zin.getNextEntry
    }
    val wb = parseXml(parts("xl/workbook.xml"))
    val sheetNodes = wb.getElementsByTagNameNS("*", "sheet")
    (0 until sheetNodes.getLength).map { i =>
      val el = sheetNodes.item(i).asInstanceOf[org.w3c.dom.Element]
      val name = el.getAttribute("name")
      val sheetId = el.getAttribute("sheetId")
      val doc = parseXml(parts(s"xl/worksheets/sheet$sheetId.xml"))
      val rowNodes = doc.getElementsByTagNameNS("*", "row")
      val rows = (0 until rowNodes.getLength).map { r =>
        val cells = rowNodes.item(r).asInstanceOf[org.w3c.dom.Element]
          .getElementsByTagNameNS("*", "c")
        (0 until cells.getLength).map { c =>
          cells.item(c).asInstanceOf[org.w3c.dom.Element].getTextContent
        }.toSeq
      }.toSeq
      (name, rows)
    }.toSeq
  }

  private def withTempDir[T](f: File => T): T = {
    val dir = Files.createTempDirectory("exportspec").toFile
    try f(dir)
    finally {
      def del(x: File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty[File]).foreach(del); x.delete()
      }
      del(dir)
    }
  }

  private def writeCsv(dir: File, name: String, lines: Seq[String]): File = {
    val f = new File(dir, name)
    val w = new PrintWriter(f, "UTF-8")
    try lines.foreach(w.println) finally w.close()
    f
  }

  // ------------------------------------------------------------------- tests

  test("makeExcel: one sheet per CSV, typed cells, stem-suffix names") {
    withTempDir { dir =>
      val sqa = writeCsv(dir, "subj1_SQA.csv", Seq(
        "Segment,N Detected,% Missing,Label",
        "1,59,0.5,ok",
        "2,61,1.25,\"has, comma\""))
      val out = new ByteArrayOutputStream()
      Export.makeExcel(Seq(sqa), out)
      val sheets = readWorkbook(out.toByteArray)
      assert(sheets.map(_._1) == Seq("SQA"))
      val rows = sheets.head._2
      assert(rows.head == Seq("Segment", "N Detected", "% Missing", "Label"))
      assert(rows(1) == Seq("1", "59", "0.5", "ok"))
      assert(rows(2) == Seq("2", "61", "1.25", "has, comma"))
    }
  }

  test("makeExcel: 1M-row chunking rule — numbered sheets, repeated header") {
    withTempDir { dir =>
      // 12 data rows at maxRows=5 -> ECG_1 (5), ECG_2 (5), ECG_3 (2)
      val ecg = writeCsv(dir, "subj1_ECG.csv",
        "Timestamp,Signal" +: (1 to 12).map(i => s"$i,${i * 0.5}"))
      val out = new ByteArrayOutputStream()
      Export.makeExcel(Seq(ecg), out, maxRows = 5)
      val sheets = readWorkbook(out.toByteArray)
      assert(sheets.map(_._1) == Seq("ECG_1", "ECG_2", "ECG_3"))
      assert(sheets.map(_._2.length) == Seq(6, 6, 3)) // header + data
      assert(sheets.forall(_._2.head == Seq("Timestamp", "Signal")))
      assert(sheets(2)._2.last == Seq("12", "6.0"))
      // exactly-full single chunk stays unnumbered
      val out2 = new ByteArrayOutputStream()
      Export.makeExcel(Seq(ecg), out2, maxRows = 12)
      assert(readWorkbook(out2.toByteArray).map(_._1) == Seq("ECG"))
    }
  }

  test("makeExcel: quality-summary txt becomes the Quality Summary sheet") {
    withTempDir { dir =>
      val txt = new File(dir, "subj1_quality_summary.txt")
      Export.writeQualitySummary(txt, "subj1", Seq(
        ("Average Number of Beats", "59.00"),
        ("% Invalid Data", "1.25%")))
      val csv = writeCsv(dir, "subj1_SQA.csv", Seq("Segment,N", "1,2"))
      val out = new ByteArrayOutputStream()
      Export.makeExcel(Seq(csv, txt), out)
      val sheets = readWorkbook(out.toByteArray)
      assert(sheets.map(_._1) == Seq("SQA", "Quality Summary"))
      val qs = sheets(1)._2
      assert(qs.head == Seq("Metric", "Value"))
      assert(qs(1) == Seq("File", "subj1"))
      assert(qs(2) == Seq("Average Number of Beats", "59.00"))
      assert(qs(3) == Seq("% Invalid Data", "1.25%"))
    }
  }

  test("makeExcel: cleaned-file naming, 31-char cap, empty CSV drops out") {
    withTempDir { dir =>
      val cleaned = writeCsv(dir, "subj1_ECG_cleaned.csv", Seq("A,B", "1,2"))
      val longName = writeCsv(dir,
        "subj1_" + "x" * 40 + ".csv", Seq("A", "1"))
      val empty = writeCsv(dir, "subj1_EMPTY.csv", Seq("A,B"))
      val out = new ByteArrayOutputStream()
      Export.makeExcel(Seq(cleaned, longName, empty), out)
      val names = readWorkbook(out.toByteArray).map(_._1)
      assert(names == Seq("ECG", "x" * 31))
    }
  }

  test("makeZip: deflated entries named by basename, bytes intact") {
    withTempDir { dir =>
      val a = writeCsv(dir, "subj1_SQA.csv", Seq("A,B", "1,2"))
      val b = writeCsv(dir, "subj1_IBI.csv", Seq("C", "3"))
      val dest = new File(dir, "bundle.zip")
      val out = new java.io.FileOutputStream(dest)
      try Export.makeZip(Seq(a, b), out) finally out.close()
      val zf = new ZipFile(dest)
      try {
        import scala.jdk.CollectionConverters._
        val entries = zf.entries.asScala.toSeq
        assert(entries.map(_.getName) == Seq("subj1_SQA.csv", "subj1_IBI.csv"))
        assert(entries.forall(_.getMethod == ZipEntry.DEFLATED))
        val got = new String(zf.getInputStream(entries.head).readAllBytes, "UTF-8")
        assert(got == Files.readString(a.toPath))
      } finally zf.close()
    }
  }

  test("exportSqa: per-modality file lists and bundle formats") {
    withTempDir { dir =>
      val temp = new File(dir, "temp"); temp.mkdirs()
      val downloads = new File(dir, "downloads")
      Seq("SQA", "BVP", "ACC", "IBI", "EDA", "ECG").foreach(m =>
        writeCsv(temp, s"subj1_$m.csv", Seq("A,B", s"$m,1")))

      // E4 zip: all five files, entry names keep the temp-dir prefix
      val z = Export.exportSqa(temp, "subj1", "E4", "zip", downloads)
      assert(z.getName == "subj1_sqa_summary.zip")
      val zf = new ZipFile(z)
      try {
        import scala.jdk.CollectionConverters._
        assert(zf.entries.asScala.map(_.getName).toSeq == Seq(
          "temp/subj1_SQA.csv", "temp/subj1_BVP.csv", "temp/subj1_ACC.csv",
          "temp/subj1_IBI.csv", "temp/subj1_EDA.csv"))
      } finally zf.close()

      // Actiwave excel: sheet per CSV named by FULL stem
      val x = Export.exportSqa(temp, "subj1", "Actiwave", "excel", downloads)
      assert(x.getName == "subj1_sqa_summary.xlsx")
      val sheets = readWorkbook(Files.readAllBytes(x.toPath))
      assert(sheets.map(_._1) == Seq(
        "subj1_SQA", "subj1_ECG", "subj1_ACC", "subj1_IBI"))
      assert(sheets.head._2(1) == Seq("SQA", "1"))

      // generic input: ACC included only when present
      val gen = Export.sqaFileList(temp, "subj1", "CSV").map(_.getName)
      assert(gen == Seq("subj1_SQA.csv", "subj1_ECG.csv", "subj1_IBI.csv",
        "subj1_ACC.csv"))
      new File(temp, "subj1_ACC.csv").delete()
      val gen2 = Export.sqaFileList(temp, "subj1", "CSV").map(_.getName)
      assert(gen2 == Seq("subj1_SQA.csv", "subj1_ECG.csv", "subj1_IBI.csv"))
    }
  }

  test("batchSqaZip: one workbook per subject, quality txt groups correctly") {
    withTempDir { dir =>
      val s1a = writeCsv(dir, "alpha_SQA.csv", Seq("A", "1"))
      val s1t = new File(dir, "alpha_quality_summary.txt")
      Export.writeQualitySummary(s1t, "alpha", Seq(("Beats", "42")))
      val s2a = writeCsv(dir, "beta_SQA.csv", Seq("A", "2"))
      val out = new ByteArrayOutputStream()
      Export.batchSqaZip(Seq(s1a, s1t, s2a), out)
      val zin = new ZipInputStream(new ByteArrayInputStream(out.toByteArray))
      val inner = mutable.LinkedHashMap.empty[String, Array[Byte]]
      var e = zin.getNextEntry
      while (e != null) {
        inner(e.getName) = zin.readAllBytes(); e = zin.getNextEntry
      }
      assert(inner.keySet.toSeq == Seq(
        "alpha_sqa_summary.xlsx", "beta_sqa_summary.xlsx"))
      val alpha = readWorkbook(inner("alpha_sqa_summary.xlsx"))
      assert(alpha.map(_._1) == Seq("SQA", "Quality Summary"))
      assert(alpha(1)._2.exists(_ == Seq("Beats", "42")))
      val beta = readWorkbook(inner("beta_sqa_summary.xlsx"))
      assert(beta.map(_._1) == Seq("SQA"))
      assert(beta.head._2(1) == Seq("2"))
    }
  }
}
