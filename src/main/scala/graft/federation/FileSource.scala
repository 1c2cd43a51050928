package graft.federation

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-source reader with format sniffing — the reference's
  * FormatDetector (integrations/utilities/files/file_reader.py:85-223):
  * extension first, content sniff as fallback (CSV dialect sniffing
  * :299-327, JSON :361, TXT :329, Parquet :368).
  *
  * CSV/JSON/TXT/Parquet map to Spark's native distributed readers.
  * XLSX and PDF (:372, :342) need binary-format libraries that are not
  * in this environment; their entry points exist with the same contract
  * and fail with a clear message — the detection and dispatch plumbing
  * is real.
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
    case "xlsx" => throw new UnsupportedOperationException(
      "xlsx reader requires a spreadsheet library not present in this environment " +
        "(reference: file_reader.py:372 openpyxl path)")
    case "pdf" => throw new UnsupportedOperationException(
      "pdf text extraction requires a PDF library not present in this environment " +
        "(reference: file_reader.py:342 pdfplumber path)")
  }
}
