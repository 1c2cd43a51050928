package graft.federation

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** File-source reader with format sniffing — the reference's
  * FormatDetector (integrations/utilities/files/file_reader.py:85-223):
  * extension first, content sniff as fallback (CSV dialect sniffing
  * :299-327, JSON :361, TXT :329, Parquet :368).
  *
  * CSV/JSON/TXT/Parquet map to Spark's native distributed readers.
  * XLSX (:372) parses with the JDK alone: the file is a zip of XML parts
  * (shared strings + worksheet); one workbook is inherently a
  * driver-side parse — a 100 TB ingest is many files, parallelized by
  * reading per-file on executors, not by splitting one workbook.
  * PDF (:342) needs text-extraction native libs absent here; its entry
  * point keeps the contract and fails with a clear message.
  */
object FileSource {

  def detectFormat(path: String): String = {
    val ext = path.split('.').lastOption.map(_.toLowerCase).getOrElse("")
    ext match {
      case "csv" | "json" | "txt" | "parquet" | "xlsx" | "xls" | "pdf" => normalize(ext)
      case "tsv" => "csv"
      case _ => sniff(path)
    }
  }

  private def normalize(ext: String): String =
    if (ext == "xls") "xlsx" else ext

  /** Content sniff for extensionless paths: JSON if the first non-blank
    * byte opens an object/array, CSV if the first line has delimiters,
    * else plain text. Parquet by magic bytes. */
  private def sniff(path: String): String = {
    val p = Paths.get(path)
    if (Files.isDirectory(p)) return "parquet" // spark-written dataset dir
    val head = {
      val in = Files.newInputStream(p)
      try { val buf = new Array[Byte](4096); val n = in.read(buf); new String(buf, 0, math.max(n, 0), "ISO-8859-1") }
      finally in.close()
    }
    if (head.startsWith("PAR1")) "parquet"
    else {
      val t = head.dropWhile(_.isWhitespace)
      if (t.startsWith("{") || t.startsWith("[")) "json"
      else if (head.linesIterator.hasNext && head.linesIterator.next().contains(",")) "csv"
      else "txt"
    }
  }

  def read(spark: SparkSession, path: String): DataFrame = detectFormat(path) match {
    case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    case "json" => spark.read.json(path)
    case "txt" => spark.read.text(path)
    case "parquet" => spark.read.parquet(path)
    case "xlsx" =>
      // multipage workbook: the bare name lists its PAGES (reference
      // files handler; test_multipage) — address one as files.<f>.<page>
      val pages = xlsxSheets(path)
      if (pages.length > 1)
        spark.createDataFrame(
          spark.sparkContext.parallelize(pages.map(Row(_)), 1),
          StructType(Seq(StructField("page", StringType))))
      else readXlsx(spark, path)
    case "pdf" => readPdf(spark, path)
  }

  // ------------------------------------------------------------------- pdf

  /** Read a PDF's text layer (file_reader.py:342): extract text from the
    * content streams (FlateDecode via the JDK Inflater; BT/ET blocks,
    * Tj/TJ/quote show-text operators, Td/TD/T* line breaks), then chunk
    * it with the KB text splitter and return one `content` row per chunk
    * with source metadata — the reference's exact output contract
    * (content + file_format/source_file metadata). Covers the
    * simple-text PDFs the splitter pipeline consumes; image-based PDFs
    * need OCR, which is out of scope here as in the reference. */
  def readPdf(spark: SparkSession, path: String): DataFrame = {
    val text = extractPdfText(Files.readAllBytes(Paths.get(path)))
    val name = Paths.get(path).getFileName.toString
    val doc = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(0L, text)), 1),
      StructType(Seq(StructField("doc_id", org.apache.spark.sql.types.LongType),
        StructField("text", StringType))))
    graft.kb.Kb.chunk(doc)
      .orderBy(org.apache.spark.sql.functions.col("chunk_ix"))
      .select(
        org.apache.spark.sql.functions.col("content"),
        org.apache.spark.sql.functions.lit(name).as("source_file"),
        org.apache.spark.sql.functions.lit("pdf").as("file_format"))
  }

  /** All show-text payloads from every content stream, in order. */
  private def extractPdfText(bytes: Array[Byte]): String = {
    val raw = new String(bytes, "ISO-8859-1")
    val out = new StringBuilder
    var idx = 0
    while ({ idx = raw.indexOf("stream", idx); idx >= 0 }) {
      val dictStart = raw.lastIndexOf("<<", idx)
      val dict = if (dictStart >= 0) raw.substring(dictStart, idx) else ""
      var dataStart = idx + "stream".length
      if (raw.startsWith("\r\n", dataStart)) dataStart += 2
      else if (raw.startsWith("\n", dataStart)) dataStart += 1
      val end = raw.indexOf("endstream", dataStart)
      if (end < 0) { idx = dataStart } else {
        val data = bytes.slice(dataStart, end)
        val content =
          if (dict.contains("/FlateDecode")) inflate(data) else new String(data, "ISO-8859-1")
        if (content.contains("BT")) out.append(textOps(content))
        idx = end + "endstream".length
      }
    }
    out.toString
  }

  private def inflate(data: Array[Byte]): String = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    try {
      while (!inf.finished() && { val n = inf.inflate(buf); out.write(buf, 0, n); n > 0 }) ()
      new String(out.toByteArray, "ISO-8859-1")
    } catch {
      case _: java.util.zip.DataFormatException => "" // not a text stream
    } finally inf.end()
  }

  /** One pass over a content stream: collect string literals shown by
    * Tj / ' / " / TJ, emitting newlines at Td/TD/T* line moves. */
  private def textOps(content: String): String = {
    val out = new StringBuilder
    val pending = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var emitted = false
    def emit(): Unit = {
      pending.foreach { s => out.append(s); emitted = true }
      pending.clear()
    }
    while (i < content.length) {
      content.charAt(i) match {
        case '(' =>
          val (s, next) = pdfString(content, i)
          pending += s
          i = next
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          val j = {
            var k = i
            while (k < content.length && !content.charAt(k).isWhitespace &&
              content.charAt(k) != '(' && content.charAt(k) != '[' &&
              content.charAt(k) != ']') k += 1
            k
          }
          content.substring(i, j) match {
            case "Tj" | "'" | "\"" | "TJ" => emit()
            case "Td" | "TD" | "T*" => if (emitted) out.append('\n')
            case "ET" => pending.clear()
            case _ => ()
          }
          i = j
        case _ => i += 1
      }
    }
    out.toString
  }

  /** Parse a PDF string literal starting at `(`: backslash escapes,
    * octal codes, balanced nested parens. Returns (text, next index). */
  private def pdfString(s: String, start: Int): (String, Int) = {
    val out = new StringBuilder
    var i = start + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => out.append('\n'); i += 2
            case 'r' => out.append('\r'); i += 2
            case 't' => out.append('\t'); i += 2
            case d if d >= '0' && d <= '7' =>
              val oct = s.substring(i + 1, math.min(i + 4, s.length)).takeWhile(c => c >= '0' && c <= '7')
              out.append(Integer.parseInt(oct, 8).toChar)
              i += 1 + oct.length
            case other => out.append(other); i += 2
          }
        case '(' => depth += 1; out.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) out.append(')')
          i += 1
        case c => out.append(c); i += 1
      }
    }
    (out.toString, i)
  }

  /** Minimal one-page PDF writer (round-trip support): one Flate-encoded
    * content stream, one line of text per Tj. */
  def writePdf(path: String, lines: Seq[String]): Unit = {
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val body = lines.zipWithIndex.map { case (l, i) =>
      (if (i == 0) "BT /F1 12 Tf 72 720 Td " else "0 -14 Td ") + s"(${esc(l)}) Tj"
    }.mkString(" ") + " ET"
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(body.getBytes("ISO-8859-1")); deflater.finish()
    val cbuf = new Array[Byte](body.length * 2 + 64)
    val clen = deflater.deflate(cbuf); deflater.end()
    val compressed = cbuf.take(clen)
    val objs = Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
      s"4 0 obj << /Length $clen /Filter /FlateDecode >> stream\n",
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    w("%PDF-1.4\n")
    objs.zipWithIndex.foreach { case (o, i) =>
      offsets += out.size()
      w(o)
      if (i == 3) { out.write(compressed); w("\nendstream endobj\n") }
    }
    val xref = out.size()
    w(s"xref\n0 6\n0000000000 65535 f \n" +
      offsets.map(o => f"$o%010d 00000 n \n").mkString)
    w(s"trailer << /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    Files.write(Paths.get(path), out.toByteArray)
  }

  // ------------------------------------------------------------------ xlsx

  /** Read the first worksheet of an .xlsx workbook (file_reader.py:372):
    * row 1 is the header; columns whose every value parses numeric become
    * DOUBLE, the rest stay STRING (the reference delegates the same
    * inference to pandas.read_excel). Handles shared strings, inline
    * strings, booleans and blank cells. */
  def readXlsx(spark: SparkSession, path: String): DataFrame =
    readXlsx(spark, path, None)

  /** Sheet (page) names of a workbook, in workbook order — the
    * reference's multipage surface (`SELECT * FROM files.<f>` on a
    * multi-sheet workbook lists pages; file_reader.get_pages :255). */
  def xlsxSheets(path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val zf = new java.util.zip.ZipFile(path)
    try {
      Option(zf.getEntry("xl/workbook.xml")).map { e =>
        val els = dom(zf.getInputStream(e).readAllBytes())
          .getElementsByTagName("sheet")
        (0 until els.getLength).map(i =>
          els.item(i).asInstanceOf[org.w3c.dom.Element].getAttribute("name"))
      }.getOrElse {
        // no workbook part: fall back to worksheet entry names
        zf.entries().asScala.map(_.getName)
          .filter(n => n.startsWith("xl/worksheets/") && n.endsWith(".xml"))
          .toSeq.sorted.map(_.stripPrefix("xl/worksheets/").stripSuffix(".xml"))
      }
    } finally zf.close()
  }

  /** Multipage read: `sheet = Some(name)` reads that page
    * (file_reader.py:374-381 — pandas read_excel(sheet_name=...));
    * None reads the first page. */
  def readXlsx(spark: SparkSession, path: String, sheet: Option[String]): DataFrame = {
    val (header, cells) = parseXlsx(path, sheet)
    require(header.nonEmpty, s"empty worksheet in $path")
    val n = header.length
    val padded = cells.map(r => r.padTo(n, None).take(n))
    val numeric = (0 until n).map { i =>
      val vs = padded.flatMap(_(i))
      vs.nonEmpty && vs.forall(_.matches("""-?\d+(\.\d+)?([eE][+-]?\d+)?"""))
    }
    val schema = StructType(header.zipWithIndex.map { case (h, i) =>
      StructField(h, if (numeric(i)) DoubleType else StringType)
    })
    val rows = padded.map(r => Row.fromSeq(r.zipWithIndex.map {
      case (v, i) => if (numeric(i)) v.map(_.toDouble).orNull else v.orNull
    }))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** zip + XML parse → (header, data rows as Option[String] cells).
    * `sheetName` picks a page by its workbook name; None = first page. */
  private def parseXlsx(path: String, sheetName: Option[String] = None)
      : (Seq[String], Seq[Seq[Option[String]]]) = {
    import scala.jdk.CollectionConverters._
    val zf = new java.util.zip.ZipFile(path)
    try {
      def bytes(name: String): Option[Array[Byte]] =
        Option(zf.getEntry(name)).map(e => zf.getInputStream(e).readAllBytes())
      val shared: IndexedSeq[String] =
        bytes("xl/sharedStrings.xml").map { b =>
          val els = dom(b).getElementsByTagName("si")
          (0 until els.getLength).map(i => textOfTs(els.item(i)))
        }.getOrElse(IndexedSeq.empty)
      val entries = zf.entries().asScala.map(_.getName)
        .filter(e => e.startsWith("xl/worksheets/") && e.endsWith(".xml"))
        .toSeq.sorted
      val sheet = sheetName match {
        case None => entries.headOption
          .getOrElse(throw new IllegalArgumentException(s"no worksheet in $path"))
        case Some(want) =>
          // workbook.xml name → r:id, rels r:id → worksheet target
          val target = for {
            wb <- bytes("xl/workbook.xml")
            rid <- {
              val els = dom(wb).getElementsByTagName("sheet")
              (0 until els.getLength).map(_i =>
                els.item(_i).asInstanceOf[org.w3c.dom.Element])
                .find(_.getAttribute("name").equalsIgnoreCase(want))
                .map(e => Option(e.getAttribute("r:id")).filter(_.nonEmpty)
                  .getOrElse(e.getAttribute("id")))
            }
            rels <- bytes("xl/_rels/workbook.xml.rels")
            t <- {
              val els = dom(rels).getElementsByTagName("Relationship")
              (0 until els.getLength).map(_i =>
                els.item(_i).asInstanceOf[org.w3c.dom.Element])
                .find(_.getAttribute("Id") == rid)
                .map(_.getAttribute("Target").stripPrefix("/xl/").stripPrefix("./"))
            }
          } yield "xl/" + t
          target.orElse(
            // rels missing (minimal writers): match by entry order of the
            // workbook's sheet list
            bytes("xl/workbook.xml").flatMap { wb =>
              val els = dom(wb).getElementsByTagName("sheet")
              val names = (0 until els.getLength).map(_i =>
                els.item(_i).asInstanceOf[org.w3c.dom.Element].getAttribute("name"))
              val idx = names.indexWhere(_.equalsIgnoreCase(want))
              if (idx >= 0 && idx < entries.length) Some(entries(idx)) else None
            })
            .getOrElse(throw new IllegalArgumentException(
              s"no sheet '$want' in $path (pages: ${xlsxSheets(path).mkString(", ")})"))
      }
      val rowEls = dom(bytes(sheet).get).getElementsByTagName("row")
      val all = (0 until rowEls.getLength).map { i =>
        val row = rowEls.item(i).asInstanceOf[org.w3c.dom.Element]
        val cs = row.getElementsByTagName("c")
        val byCol = (0 until cs.getLength).flatMap { j =>
          val c = cs.item(j).asInstanceOf[org.w3c.dom.Element]
          cellValue(c, shared).map(v => colIndex(c.getAttribute("r")) -> v)
        }.toMap
        if (byCol.isEmpty) Seq.empty[Option[String]]
        else (0 to byCol.keys.max).map(byCol.get)
      }
      val header = all.headOption.getOrElse(Seq.empty).map(_.getOrElse(""))
      (header, all.drop(1))
    } finally zf.close()
  }

  private def dom(b: Array[Byte]): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    // untrusted input: no DTDs, no external entities
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(b))
  }

  /** concatenated text of all <t> descendants (rich-text runs split one
    * logical string across multiple <r><t> nodes). */
  private def textOfTs(n: org.w3c.dom.Node): String = {
    val ts = n.asInstanceOf[org.w3c.dom.Element].getElementsByTagName("t")
    (0 until ts.getLength).map(i => ts.item(i).getTextContent).mkString
  }

  /** decoded cell value per the cell's type attribute: s = shared-string
    * index, inlineStr = nested text, b = boolean, default = raw numeric/
    * formula value. */
  private def cellValue(c: org.w3c.dom.Element, shared: IndexedSeq[String]): Option[String] = {
    def v: Option[String] = {
      val vs = c.getElementsByTagName("v")
      if (vs.getLength == 0) None else Some(vs.item(0).getTextContent)
    }
    c.getAttribute("t") match {
      case "s" => v.map(i => shared(i.toInt))
      case "inlineStr" => Some(textOfTs(c)).filter(_.nonEmpty)
      case "b" => v.map(x => if (x == "1") "true" else "false")
      case _ => v
    }
  }

  /** A1-style reference → 0-based column index. */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1

  /** Minimal .xlsx writer (round-trip support for the reader): numbers as
    * numeric cells, everything else as inline strings. */
  def writeXlsx(path: String, header: Seq[String], rows: Seq[Seq[Any]]): Unit =
    writeXlsxPages(path, Seq(("Sheet1", header, rows)))

  /** Multipage writer: one (name, header, rows) per sheet — produces the
    * workbook.xml + rels mapping the multipage reader resolves. */
  def writeXlsxPages(path: String,
      pages: Seq[(String, Seq[String], Seq[Seq[Any]])]): Unit = {
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def cell(ref: String, v: Any): String = v match {
      case null => ""
      case n: Number => s"""<c r="$ref"><v>$n</v></c>"""
      case other => s"""<c r="$ref" t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>"""
    }
    def sheetXml(header: Seq[String], rows: Seq[Seq[Any]]): String = {
      val allRows = header +: rows
      val sb = new StringBuilder(
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      allRows.zipWithIndex.foreach { case (r, i) =>
        sb.append(s"""<row r="${i + 1}">""")
        r.zipWithIndex.foreach { case (v, j) => sb.append(cell(s"${colRef(j)}${i + 1}", v)) }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>").toString
    }
    val idx = pages.indices.map(_ + 1)
    val parts = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
         """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
         """<Default Extension="xml" ContentType="application/xml"/>""" +
         """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
         idx.map(i => s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
         """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
         """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
         "<sheets>" +
         pages.zip(idx).map { case ((nm, _, _), i) =>
           s"""<sheet name="${esc(nm)}" sheetId="$i" r:id="rId$i"/>"""
         }.mkString +
         "</sheets></workbook>"),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         idx.map(i => s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString +
         """</Relationships>""")) ++
      pages.zip(idx).map { case ((_, h, r), i) =>
        s"xl/worksheets/sheet$i.xml" -> sheetXml(h, r)
      }
    val out = new java.util.zip.ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
  }
}
