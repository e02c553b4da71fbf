package graft.io

import java.io.{BufferedReader, File, FileInputStream, FileOutputStream,
  InputStreamReader, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

/** S12: Excel/ZIP export packaging (reference `dashboard/utils.py:374-420`
  * `_export_sqa`, `:688-746` `_make_excel`, `:748-776` `_make_zip`, plus the
  * batch-zip assembly at `dashboard/callbacks.py:1930-1967,2546-2562` and the
  * quality-summary txt format at `callbacks.py:1435-1444`).
  *
  * Driver-side BY DESIGN (SURVEY §2.1): these package the engine's already-
  * written sink CSVs into user-facing bundles — filesystem work on files the
  * distributed plan produced, not a distributed computation. The xlsx writer
  * is a minimal OOXML (ECMA-376) serializer over `java.util.zip`: a workbook
  * is a zip of XML parts, worksheets use inline strings (no shared-strings
  * table), so no dependency beyond the JDK is needed, and sheet parts are
  * STREAMED — a multi-GB engine CSV never materializes in driver memory;
  * peak heap is one CSV line.
  */
object Export {

  /** Rows per sheet before chunking into `name_1, name_2, ...` sheets
    * (reference `_make_excel(max_rows = 1_000_000)`; the xlsx hard limit is
    * 1,048,576 rows including the header). */
  val DefaultMaxRows: Int = 1000000

  // ------------------------------------------------------------------ util

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** 0-based column index -> A1-style column letters. */
  private[io] def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Minimal quote-aware CSV split (RFC-4180 subset: `"` quoting with `""`
    * escapes) — covers everything the engine's own sinks emit and what
    * `pd.read_csv` would accept on them. */
  private[io] def splitCsvLine(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQ = false
        } else cur.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.toArray
  }

  /** A token is written as a numeric cell iff it parses as a finite double
    * (mirrors pandas' type inference landing numerics as numbers). */
  private def isNumericToken(s: String): Boolean =
    s.nonEmpty && {
      try { val d = s.toDouble; !d.isNaN && !d.isInfinite }
      catch { case _: NumberFormatException => false }
    }

  /** Sheet base name for a CSV (reference `_make_excel`): the stem's last
    * `_`-part, or second-to-last when the path mentions `cleaned`
    * (`subj1_ECG_cleaned.csv` -> `ECG`). */
  private[io] def sheetBaseName(f: File): String = {
    val stem = f.getName.replaceAll("\\.[^.]*$", "")
    val parts = stem.split('_')
    if (f.getPath.contains("cleaned") && parts.length >= 2) parts(parts.length - 2)
    else parts.last
  }

  /** Excel's 31-char sheet-name cap. The reference relies on it only in
    * `_make_excel`; we apply it everywhere because openpyxl would reject
    * longer names that `_export_sqa` happens never to produce. */
  private def capSheet(name: String): String = name.take(31)

  // --------------------------------------------------------- xlsx plumbing

  private final class XlsxWriter(out: OutputStream) {
    private val zip = new ZipOutputStream(out, StandardCharsets.UTF_8)
    private val sheets = scala.collection.mutable.ArrayBuffer.empty[String]
    private var rowN = 0

    private def write(s: String): Unit =
      zip.write(s.getBytes(StandardCharsets.UTF_8))

    /** Open a new sheet part; returns its index for [[renameSheet]]. */
    def startSheet(name: String): Int = {
      sheets += name
      rowN = 0
      zip.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${sheets.length}.xml"))
      write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      sheets.length - 1
    }

    /** Sheet names live only in workbook.xml (written at [[finish]]), so an
      * already-streamed sheet part can still be renamed — this is what lets
      * the CSV chunker stay single-pass: the first chunk is written under
      * the plain name and renamed to `base_1` the moment a second chunk
      * proves the file exceeds maxRows. */
    def renameSheet(idx: Int, name: String): Unit = sheets(idx) = name

    /** Append one row; empty tokens become blank (omitted) cells, matching
      * pandas' NaN rendering. */
    def row(cells: Seq[String]): Unit = {
      rowN += 1
      write(s"""<row r="$rowN">""")
      cells.zipWithIndex.foreach { case (v, i) =>
        if (v.nonEmpty) {
          val ref = colRef(i) + rowN
          if (isNumericToken(v)) write(s"""<c r="$ref"><v>$v</v></c>""")
          else write(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(v)}</t></is></c>""")
        }
      }
      write("</row>")
    }

    def endSheet(): Unit = { write("</sheetData></worksheet>"); zip.closeEntry() }

    /** Write workbook metadata (needs the final sheet list) and close.
      * Metadata entries land after the sheet parts; zip readers use the
      * central directory, so part order inside the archive is free. */
    def finish(): Unit = {
      zip.putNextEntry(new ZipEntry("[Content_Types].xml"))
      write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      write("""<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""")
      write("""<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""")
      write("""<Default Extension="xml" ContentType="application/xml"/>""")
      write("""<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""")
      sheets.indices.foreach { i =>
        write(s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
      }
      write("</Types>")
      zip.closeEntry()

      zip.putNextEntry(new ZipEntry("_rels/.rels"))
      write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      write("""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""")
      write("""<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""")
      write("</Relationships>")
      zip.closeEntry()

      zip.putNextEntry(new ZipEntry("xl/workbook.xml"))
      write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      write("""<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""")
      sheets.zipWithIndex.foreach { case (n, i) =>
        write(s"""<sheet name="${xmlEscape(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""")
      }
      write("</sheets></workbook>")
      zip.closeEntry()

      zip.putNextEntry(new ZipEntry("xl/_rels/workbook.xml.rels"))
      write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      write("""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""")
      sheets.indices.foreach { i =>
        write(s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""")
      }
      write("</Relationships>")
      zip.closeEntry()
      zip.finish()
    }
  }

  // ------------------------------------------------------------ _make_excel

  /** Build an xlsx workbook from engine output files (reference
    * `_make_excel`). `.txt` files become a `Quality Summary` sheet of
    * (Metric, Value) rows parsed from `key: value` lines; CSVs become
    * sheets named by [[sheetBaseName]], chunked into `name_1..name_k`
    * sheets at `maxRows` data rows (header repeated per chunk, as
    * `df.to_excel` does). Streaming: one CSV line in memory at a time. */
  def makeExcel(files: Seq[File], out: OutputStream,
      maxRows: Int = DefaultMaxRows): Unit = {
    val w = new XlsxWriter(out)
    files.foreach { f =>
      if (f.getName.endsWith(".txt")) {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try {
          w.startSheet("Quality Summary")
          w.row(Seq("Metric", "Value"))
          src.getLines().foreach { line =>
            val t = line.trim
            val i = t.indexOf(':')
            if (i >= 0) w.row(Seq(t.substring(0, i), t.substring(i + 1).trim))
          }
          w.endSheet()
        } finally src.close()
      } else {
        val base = sheetBaseName(f)
        val rd = new BufferedReader(new InputStreamReader(
          new FileInputStream(f), StandardCharsets.UTF_8))
        try {
          Option(rd.readLine()).map(splitCsvLine).foreach { hdr =>
            // An empty CSV (header, no data rows) contributes NO sheet —
            // the reference's `num_sheets = ceil(0 / max_rows) = 0`.
            var line = rd.readLine()
            var chunk = 0
            var firstIdx = -1
            while (line != null) {
              chunk += 1
              val idx = w.startSheet(
                capSheet(if (chunk == 1) base else s"${base}_$chunk"))
              if (chunk == 1) firstIdx = idx
              if (chunk == 2) w.renameSheet(firstIdx, capSheet(s"${base}_1"))
              w.row(hdr.toSeq)
              var inChunk = 0
              while (line != null && inChunk < maxRows) {
                w.row(splitCsvLine(line).toSeq)
                inChunk += 1
                line = rd.readLine()
              }
              w.endSheet()
            }
          }
        } finally rd.close()
      }
    }
    w.finish()
  }

  // ------------------------------------------------------------- _make_zip

  /** Deflated zip of the given files, entries named by basename (reference
    * `_make_zip`). Streaming copy, 64 KiB buffer. */
  def makeZip(files: Seq[File], out: OutputStream): Unit = {
    val zip = new ZipOutputStream(out, StandardCharsets.UTF_8)
    zip.setMethod(ZipOutputStream.DEFLATED)
    val buf = new Array[Byte](65536)
    files.foreach { f =>
      zip.putNextEntry(new ZipEntry(f.getName))
      val in = new FileInputStream(f)
      try {
        var n = in.read(buf)
        while (n >= 0) { zip.write(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      zip.closeEntry()
    }
    zip.finish()
  }

  // ------------------------------------------------------------ _export_sqa

  /** The per-modality file list `_export_sqa` bundles: the SQA summary CSV
    * plus the modality's signal CSVs (ACC optional for generic input). */
  def sqaFileList(tempDir: File, file: String, dataType: String): Seq[File] = {
    val base = Seq(new File(tempDir, s"${file}_SQA.csv"))
    val extra = dataType match {
      case "E4" => Seq("BVP", "ACC", "IBI", "EDA").map(m => new File(tempDir, s"${file}_$m.csv"))
      case "Actiwave" => Seq("ECG", "ACC", "IBI").map(m => new File(tempDir, s"${file}_$m.csv"))
      case _ =>
        val req = Seq("ECG", "IBI").map(m => new File(tempDir, s"${file}_$m.csv"))
        val acc = new File(tempDir, s"${file}_ACC.csv")
        if (acc.exists) req :+ acc else req
    }
    base ++ extra
  }

  /** `_export_sqa`: bundle one subject's SQA outputs as
    * `<file>_sqa_summary.zip` (entry names keep the temp-dir prefix, the
    * reference's `archive.write(csv)` behavior) or `.xlsx` (one sheet per
    * CSV named by the FULL stem — `_export_sqa` bypasses `_make_excel`'s
    * suffix naming). Returns the written bundle. */
  def exportSqa(tempDir: File, file: String, dataType: String, format: String,
      downloadsDir: File): File = {
    downloadsDir.mkdirs()
    val files = sqaFileList(tempDir, file, dataType)
    format match {
      case "zip" =>
        val dest = new File(downloadsDir, s"${file}_sqa_summary.zip")
        val out = new FileOutputStream(dest)
        try {
          val zip = new ZipOutputStream(out, StandardCharsets.UTF_8)
          val buf = new Array[Byte](65536)
          files.foreach { f =>
            zip.putNextEntry(new ZipEntry(s"${tempDir.getName}/${f.getName}"))
            val in = new FileInputStream(f)
            try {
              var n = in.read(buf)
              while (n >= 0) { zip.write(buf, 0, n); n = in.read(buf) }
            } finally in.close()
            zip.closeEntry()
          }
          zip.finish()
        } finally out.close()
        dest
      case "excel" =>
        val dest = new File(downloadsDir, s"${file}_sqa_summary.xlsx")
        val out = new FileOutputStream(dest)
        try {
          val w = new XlsxWriter(out)
          files.foreach { f =>
            val stem = f.getName.replaceAll("\\.[^.]*$", "")
            w.startSheet(capSheet(stem))
            val rd = new BufferedReader(new InputStreamReader(
              new FileInputStream(f), StandardCharsets.UTF_8))
            try {
              var line = rd.readLine()
              while (line != null) { w.row(splitCsvLine(line).toSeq); line = rd.readLine() }
            } finally rd.close()
            w.endSheet()
          }
          w.finish()
        } finally out.close()
        dest
      case other => throw new IllegalArgumentException(s"format must be zip|excel, got $other")
    }
  }

  // -------------------------------------------------- batch zip of workbooks

  /** Subject key for batch grouping (reference `callbacks.py:1939-1944`):
    * `X_quality_summary.txt` -> `X`, otherwise strip the last `_`-suffix. */
  private[io] def subjectOf(name: String): String =
    if (name.endsWith("_quality_summary.txt")) name.stripSuffix("_quality_summary.txt")
    else { val i = name.lastIndexOf('_'); if (i < 0) name else name.substring(0, i) }

  /** Batch export (reference `callbacks.py:1930-1967`): group files by
    * subject, build one xlsx per subject via [[makeExcel]], and bundle them
    * as `<subject>_sqa_summary.xlsx` entries in one deflated zip. Insertion
    * order of first appearance is preserved (Python dict semantics). */
  def batchSqaZip(files: Seq[File], out: OutputStream,
      maxRows: Int = DefaultMaxRows): Unit = {
    val groups = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[File]]
    files.foreach(f => groups.getOrElseUpdate(subjectOf(f.getName),
      scala.collection.mutable.ArrayBuffer.empty) += f)
    val zip = new ZipOutputStream(out, StandardCharsets.UTF_8)
    zip.setMethod(ZipOutputStream.DEFLATED)
    groups.foreach { case (subj, fs) =>
      zip.putNextEntry(new ZipEntry(s"${subj}_sqa_summary.xlsx"))
      // xlsx bytes must be a complete archive; buffer per subject (bounded
      // by one subject's summary outputs, not the corpus)
      val buf = new java.io.ByteArrayOutputStream()
      makeExcel(fs.toSeq, buf, maxRows)
      zip.write(buf.toByteArray)
      zip.closeEntry()
    }
    zip.finish()
  }

  /** Quality-summary txt (reference `callbacks.py:1435-1444`): first line
    * `File: <name>`, then `Label: value` per summary row. */
  def writeQualitySummary(dest: File, file: String,
      rows: Seq[(String, String)]): Unit = {
    val w = new java.io.PrintWriter(dest, "UTF-8")
    try {
      w.print(s"File: $file\n")
      rows.foreach { case (l, v) => w.print(s"$l: $v\n") }
    } finally w.close()
  }
}
