package graft

import graft.ingest.{Pdf, Sources}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** PDF extraction (reference S4, index.py:275-295) against
  * self-generated PDFs — literal strings, TJ kerning arrays, escape
  * sequences, hex strings, FlateDecode streams, multi-page joins,
  * and the None-on-unextractable contract. */
class PdfSpec extends AnyFunSuite {

  private def latin1(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)

  /** Assemble a minimal PDF with the given raw content streams. */
  private def pdf(streams: Array[Byte]*): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(latin1("%PDF-1.4\n"))
    streams.zipWithIndex.foreach { case (body, i) =>
      buf.write(latin1(s"${i + 1} 0 obj << /Length ${body.length} >> stream\n"))
      buf.write(body)
      buf.write(latin1("\nendstream endobj\n"))
    }
    buf.write(latin1("%%EOF\n"))
    buf.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
    d.end()
    out.toByteArray
  }

  test("Tj shows, TJ kerning arrays, escapes, octal, hex strings") {
    val content = latin1(
      "BT /F1 12 Tf 72 712 Td (Hello) Tj ( ) Tj (world) Tj ET\n" +
        "BT [(Sp) -250 (ark)] TJ ET\n" +
        "BT (a\\(b\\)c \\101) Tj ET\n" +
        "BT <48656C6C6F> Tj ET")
    val txt = Pdf.extractText(pdf(content)).get
    assert(txt.contains("Hello world"))
    assert(txt.contains("Spark"))
    assert(txt.contains("a(b)c A"))
    assert(txt.linesIterator.contains("Hello"), "hex string decoded")
  }

  test("FlateDecode streams inflate; pages join with blank line") {
    val p1 = latin1("BT (page one text) Tj ET")
    val p2 = latin1("BT (page two text) Tj ET")
    val txt = Pdf.extractText(pdf(deflate(p1), deflate(p2))).get
    // blocks kept UNTRIMMED (reference strips only for the emptiness
    // test, index.py:287-291) — each block ends with the ET line
    // break, exactly like a pypdf page text ends with '\n'
    assert(txt == "page one text\n\n\npage two text\n")
  }

  test("None on non-PDF bytes and on PDFs with no extractable text") {
    assert(Pdf.extractText("just a text file".getBytes).isEmpty)
    assert(Pdf.extractText(pdf(latin1("0 0 0 RG 10 10 100 100 re f"))).isEmpty)
    assert(Pdf.extractText(Array[Byte]()).isEmpty)
  }

  test("extractText is total: never throws on arbitrary bytes") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte)
      Pdf.extractText(bytes)                            // garbage
      Pdf.extractText(latin1("%PDF-1.4\n") ++ bytes)    // header + garbage
      Pdf.extractText(latin1("%PDF-1.4\nstream\n") ++ bytes) // unterminated stream
    }
  }

  test("ingest dispatch: .pdf extracted by suffix, unextractable ones dropped") {
    val spark = SparkSpec.spark
    val root = Files.createTempDirectory("graft-pdf")
    Files.write(root.resolve("report.pdf"),
      pdf(deflate(latin1("BT (error budget exceeded) Tj ET"))))
    Files.write(root.resolve("scan.pdf"),
      pdf(latin1("0 0 0 RG 10 10 100 100 re f"))) // image-only → dropped
    Files.write(root.resolve("app.log"), latin1("plain log line"))
    val rows = Sources.readTextFiles(spark, root.toString).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.keySet === Set("report.pdf", "app.log"))
    assert(rows("report.pdf") == "error budget exceeded\n")
  }
}
