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

  /** Assemble a PDF whose streams carry explicit dict entries
    * (e.g. `/Filter /ASCII85Decode`). */
  private def pdfF(streams: (String, Array[Byte])*): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(latin1("%PDF-1.4\n"))
    streams.zipWithIndex.foreach { case ((dict, body), i) =>
      buf.write(latin1(s"${i + 1} 0 obj << /Length ${body.length} $dict >> stream\n"))
      buf.write(body)
      buf.write(latin1("\nendstream endobj\n"))
    }
    buf.write(latin1("%%EOF\n"))
    buf.toByteArray
  }

  private def a85(data: Array[Byte]): Array[Byte] = {
    val out = new StringBuilder
    data.grouped(4).foreach { g =>
      var t = 0L
      g.foreach(b => t = (t << 8) | (b & 0xFF))
      if (g.length < 4) t <<= 8 * (4 - g.length)
      if (t == 0 && g.length == 4) out += 'z'
      else {
        val cs = new Array[Char](5)
        var v = t
        (4 to 0 by -1).foreach { i => cs(i) = ('!' + (v % 85)).toChar; v /= 85 }
        out ++= new String(cs, 0, g.length + 1)
      }
    }
    out ++= "~>"
    latin1(out.result())
  }

  /** TIFF-style LZW encoder mirroring the decoder's early-change
    * width schedule (PDF 1.7 §7.4.4, EarlyChange=1). */
  private def lzw(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var bits = 0; var width = 9
    def emit(code: Int): Unit = {
      acc = (acc << width) | code; bits += width
      while (bits >= 8) { out.write(((acc >> (bits - 8)) & 0xFF).toInt); bits -= 8 }
    }
    val dict = scala.collection.mutable.HashMap[Seq[Byte], Int]()
    (0 until 256).foreach(i => dict(Seq(i.toByte)) = i)
    var next = 258
    emit(256) // clear
    var w = Seq.empty[Byte]
    data.foreach { b =>
      val wb = w :+ b
      if (dict.contains(wb)) w = wb
      else {
        emit(dict(w))
        dict(wb) = next; next += 1
        if (next >= (1 << width) && width < 12) width += 1
        w = Seq(b)
      }
    }
    if (w.nonEmpty) emit(dict(w))
    emit(257) // EOD
    if (bits > 0) out.write(((acc << (8 - bits)) & 0xFF).toInt)
    out.toByteArray
  }

  test("declared filters: ASCIIHex, ASCII85, LZW, and an A85+Flate chain") {
    val content = latin1("BT (filtered text payload) Tj ET")
    val hex = latin1(content.map(b => f"${b & 0xFF}%02X").mkString + ">")
    assert(Pdf.extractText(pdfF("/Filter /ASCIIHexDecode" -> hex))
      .get.contains("filtered text payload"))
    assert(Pdf.extractText(pdfF("/Filter /ASCII85Decode" -> a85(content)))
      .get.contains("filtered text payload"))
    assert(Pdf.extractText(pdfF("/Filter /LZWDecode" -> lzw(content)))
      .get.contains("filtered text payload"))
    // filter arrays apply in listed order: a85(deflate(x)) → [A85, Fl]
    assert(Pdf.extractText(pdfF(
      "/Filter [/ASCII85Decode /FlateDecode]" -> a85(deflate(content))))
      .get.contains("filtered text payload"))
  }

  test("LZW round-trips past the 9→10 bit width boundary and the KwKwK case") {
    val rnd = new scala.util.Random(7)
    // repetitive prefix forces KwKwK; random tail forces >254 codes
    // so the code width crosses 9→10 bits inside one stream
    val big = latin1("ababababab" * 3) ++ Array.fill(1500)(rnd.nextInt(256).toByte)
    val body = latin1("BT (wide dictionary survived) Tj ET")
    assert(Pdf.extractText(pdfF("/Filter /LZWDecode" -> lzw(body)))
      .get.contains("wide dictionary survived"))
    // the text operator sits AFTER >254 emitted codes, so decoding it
    // correctly requires surviving the 9→10-bit width switch
    val mixed = big ++ latin1(" BT (after wide codes) Tj ET")
    assert(Pdf.extractText(pdfF("/Filter /LZWDecode" -> lzw(mixed)))
      .get.contains("after wide codes"))
  }

  test("unknown/image filters degrade to no text, never throw") {
    val garbage = Array.fill(64)(0xEE.toByte)
    assert(Pdf.extractText(pdfF("/Filter /DCTDecode" -> garbage)).isEmpty)
    // undeclared-but-deflated still works via the try-inflate fallback
    val content = latin1("BT (fallback inflate) Tj ET")
    assert(Pdf.extractText(pdf(deflate(content))).get.contains("fallback inflate"))
  }

  /** A modern PDF 1.5-style file: an /ObjStm holding the catalog,
    * page-tree and page objects (ending in a string token that must
    * NOT leak into extracted text), a predictor-coded /XRef stream,
    * and a top-level Flate content stream — the layout pypdf handles
    * via its xref-stream reader (index.py:275-295's dependency). */
  private def modernPdf(content: Array[Byte], contentParms: String = ""): Array[Byte] = {
    val objStmBody = {
      val objs = Seq(
        "<< /Type /Catalog /Pages 2 0 R >>",
        "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        "<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Annots [(trailing string must not leak)] >>")
      val offsets = objs.scanLeft(0)(_ + _.length + 1).init
      val header = offsets.zipWithIndex.map { case (off, i) => s"${i + 1} $off" }.mkString(" ")
      latin1(header + "\n" + objs.mkString(" "))
    }
    val first = objStmBody.indexOf('\n'.toByte) + 1
    val objStm = deflate(objStmBody)
    val flateContent = deflate(content)
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(latin1("%PDF-1.5\n"))
    buf.write(latin1(s"5 0 obj << /Type /ObjStm /N 3 /First $first /Length ${objStm.length} /Filter /FlateDecode >> stream\n"))
    buf.write(objStm)
    buf.write(latin1("\nendstream endobj\n"))
    buf.write(latin1(s"4 0 obj << /Length ${flateContent.length} /Filter /FlateDecode $contentParms >> stream\n"))
    buf.write(flateContent)
    buf.write(latin1("\nendstream endobj\n"))
    // predictor-12-coded xref stream: decoded binary whose trailing
    // bytes would read as garbage tokens if it reached the text scan
    val xrefRaw = Array.tabulate[Byte](30)(i => (i * 7).toByte)
    val xref = deflate(pngUpEncode(xrefRaw, 5))
    buf.write(latin1(s"6 0 obj << /Type /XRef /W [1 2 2] /Size 7 /Root 1 0 R /Length ${xref.length} " +
      "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 5 >> >> stream\n"))
    buf.write(xref)
    buf.write(latin1("\nendstream endobj\nstartxref\n0\n%%EOF\n"))
    buf.toByteArray
  }

  /** Correct PNG-Up row encoder: filter byte 2 + (cur − prevRow). */
  private def pngUpEncode(data: Array[Byte], rowBytes: Int): Array[Byte] = {
    val pad = (rowBytes - data.length % rowBytes) % rowBytes
    val padded = data ++ Array.fill(pad)(' '.toByte)
    val out = new java.io.ByteArrayOutputStream()
    var r = 0
    while (r < padded.length) {
      out.write(2)
      var i = 0
      while (i < rowBytes) {
        val prev = if (r == 0) 0 else padded(r - rowBytes + i) & 0xFF
        out.write(((padded(r + i) & 0xFF) - prev) & 0xFF)
        i += 1
      }
      r += rowBytes
    }
    out.toByteArray
  }

  test("object-stream PDF: content extracts, ObjStm/XRef binary never leaks") {
    val txt = Pdf.extractText(modernPdf(latin1("BT (modern xref-stream pdf text) Tj ET"))).get
    assert(txt.contains("modern xref-stream pdf text"))
    assert(!txt.contains("trailing string must not leak"),
      "ObjStm payload classified out of the text scan")
    assert(txt == "modern xref-stream pdf text\n", s"no xref garbage, got: ${txt.take(80)}")
  }

  test("PNG-predictor-coded content stream decodes via /DecodeParms") {
    val content = latin1("BT (predictor coded content) Tj ET")
    val coded = deflate(pngUpEncode(content, 16))
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(latin1("%PDF-1.5\n"))
    buf.write(latin1(s"1 0 obj << /Length ${coded.length} /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 12 /Columns 16 >> >> stream\n"))
    buf.write(coded)
    buf.write(latin1("\nendstream endobj\n%%EOF\n"))
    assert(Pdf.extractText(buf.toByteArray).get.contains("predictor coded content"))
  }

  test("TIFF predictor 2 and DecodeParms arrays align with filter arrays") {
    val content = latin1("BT (tiff predictor text) Tj ET")
    // TIFF horizontal differencing at bpp=1: cur − prevByte per row
    val rowBytes = 8
    val pad = (rowBytes - content.length % rowBytes) % rowBytes
    val padded = content ++ Array.fill(pad)(' '.toByte)
    val coded = padded.clone()
    var r = 0
    while (r < coded.length) {
      var i = r + rowBytes - 1
      while (i > r) { coded(i) = (coded(i) - coded(i - 1)).toByte; i -= 1 }
      r += rowBytes
    }
    val body = deflate(coded)
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(latin1("%PDF-1.5\n"))
    buf.write(latin1(s"1 0 obj << /Length ${body.length} /Filter [/FlateDecode] " +
      s"/DecodeParms [<< /Predictor 2 /Columns $rowBytes >>] >> stream\n"))
    buf.write(body)
    buf.write(latin1("\nendstream endobj\n%%EOF\n"))
    assert(Pdf.extractText(buf.toByteArray).get.contains("tiff predictor text"))
  }

  test("objStmObjects parses the packed objects of an object stream") {
    val objs = Seq("<< /Type /Catalog >>", "(a string object)", "[1 2 3]")
    val offsets = objs.scanLeft(0)(_ + _.length + 1).init
    val header = offsets.zipWithIndex.map { case (off, i) => s"${i * 3 + 1} $off" }.mkString(" ") + "\n"
    val payload = latin1(header + objs.mkString(" ") + " ")
    val dict = s"<< /Type /ObjStm /N 3 /First ${header.length} >>"
    val parsed = Pdf.objStmObjects(dict, payload)
    assert(parsed.map(_._1) == Seq(1, 4, 7))
    assert(parsed.head._2.contains("/Type /Catalog"))
    assert(parsed(1)._2.contains("a string object"))
    // malformed headers degrade to empty, never throw
    assert(Pdf.objStmObjects("<< /Type /ObjStm /N 99 /First 4 >>", latin1("1 0\nx")).isEmpty)
    assert(Pdf.objStmObjects("<< >>", payload).isEmpty)
  }

  test("binary stream containing the literal 'endstream' bytes cannot desync the scan") {
    // an image stream whose compressed payload embeds "endstream":
    // with /Length-based extents the follow-on content stream still
    // extracts; a pure keyword scan would cut the image stream short
    // and mis-frame everything after it
    val evil = latin1("xxendstreamxx") ++ Array.fill(16)(0x99.toByte)
    val content = deflate(latin1("BT (after evil image) Tj ET"))
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(latin1("%PDF-1.5\n"))
    buf.write(latin1(s"1 0 obj << /Subtype /Image /Length ${evil.length} /Filter /DCTDecode >> stream\n"))
    buf.write(evil)
    buf.write(latin1("\nendstream endobj\n"))
    buf.write(latin1(s"2 0 obj << /Length ${content.length} /Filter /FlateDecode >> stream\n"))
    buf.write(content)
    buf.write(latin1("\nendstream endobj\n%%EOF\n"))
    assert(Pdf.extractText(buf.toByteArray).get.contains("after evil image"))
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
