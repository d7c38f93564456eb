package graft.ingest

import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/** Minimal, dependency-free text extraction for TEXT-BASED PDFs —
  * closes the reference's S4 operator (`extract_pdf_text`,
  * index.py:275-295) without a PDF jar (none exists in the offline
  * image): content streams are located by `stream…endstream` spans,
  * FlateDecode ones inflated with the JDK `Inflater`, and the text
  * operators (`Tj`, `TJ`, `'`, `"`) scanned with a small tokenizer
  * that understands PDF string literals (nested parens, escapes,
  * octal) and hex strings.
  *
  * Contract mirrors the reference: blocks kept UNTRIMMED, blank
  * blocks dropped (strip() is only the emptiness test,
  * index.py:287-291), blocks joined with "\n\n";
  * `None` when nothing extractable (image-only, CID-font-encoded, or
  * malformed input), which the ingest dispatcher treats as
  * skip-the-file (index.py:351-355). Coverage is deliberately the
  * simple-PDF subset — ASCII/WinAnsi-encoded literal strings — the
  * same class of log-dump PDFs the reference's pypdf path handles
  * without font CMaps. */
object Pdf {

  def extractText(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 5 || new String(bytes, 0, 5, "ISO-8859-1") != "%PDF-")
      return None
    val blocks = contentStreams(bytes).map(streamText).filter(_.trim.nonEmpty)
    if (blocks.isEmpty) None else Some(blocks.mkString("\n\n"))
  }

  /** All `stream…endstream` payloads, inflated when FlateDecode
    * applies (detected by trying — corrupt/uncompressed fall back to
    * the raw bytes). */
  private def contentStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = ArrayBuffer[Array[Byte]]()
    val hay = new String(bytes, "ISO-8859-1")
    var from = 0
    while (from < hay.length) {
      val s = hay.indexOf("stream", from)
      if (s < 0) { from = hay.length }
      else {
        var start = s + "stream".length
        if (start < hay.length && hay.charAt(start) == '\r') start += 1
        if (start < hay.length && hay.charAt(start) == '\n') start += 1
        val e = hay.indexOf("endstream", start)
        if (e < 0) { from = hay.length }
        else {
          out += inflateOrRaw(bytes.slice(start, e))
          from = e + "endstream".length
        }
      }
    }
    out.toSeq
  }

  private def inflateOrRaw(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = inf.inflate(chunk)
      while (n > 0) { buf.write(chunk, 0, n); n = inf.inflate(chunk) }
      if (buf.size() > 0) buf.toByteArray else data
    } catch {
      case _: Exception => data
    } finally inf.end()
  }

  /** Scan one content stream for text-showing operators. Strings
    * accumulate as pending; a show operator emits them, any other
    * operator discards them (they were operands of something else,
    * e.g. a name or dictionary). Text-positioning operators insert
    * line breaks, approximating pypdf's layout behavior. */
  private def streamText(stream: Array[Byte]): String = {
    val s = new String(stream, "ISO-8859-1")
    val out = new StringBuilder
    val pending = ArrayBuffer[String]()
    def emitAll(): Unit = { pending.foreach(out ++= _); pending.clear() }
    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out += '\n'
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' =>
          val (str, next) = parseLiteral(s, i + 1)
          pending += str; i = next
        case '<' if i + 1 < s.length && s.charAt(i + 1) != '<' =>
          val (str, next) = parseHex(s, i + 1)
          pending += str; i = next
        case '%' => // comment to end of line
          while (i < s.length && s.charAt(i) != '\n') i += 1
        case c if c.isLetter || c == '\'' || c == '"' =>
          val start = i
          if (c == '\'' || c == '"') i += 1
          else while (i < s.length && (s.charAt(i).isLetter || s.charAt(i) == '*')) i += 1
          s.substring(start, i) match {
            case "Tj" | "'" | "\"" | "TJ" => emitAll()
            case "Td" | "TD" | "T" | "T*" => pending.clear(); newline()
            case "ET" => pending.clear(); newline()
            case _ => pending.clear()
          }
        case _ => i += 1
      }
    }
    emitAll()
    out.result()
  }

  /** PDF literal string body starting after '(': nesting + escapes.
    * Returns (decoded, index after closing paren). */
  private def parseLiteral(s: String, from: Int): (String, Int) = {
    val out = new StringBuilder
    var depth = 1
    var i = from
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => out += '\n'; i += 2
            case 'r' => out += '\r'; i += 2
            case 't' => out += '\t'; i += 2
            case 'b' => out += '\b'; i += 2
            case 'f' => out += '\f'; i += 2
            case '\n' => i += 2 // line continuation
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0
              while (j < s.length && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1
              }
              out += v.toChar; i = j
            case other => out += other; i += 2
          }
        case '(' => depth += 1; out += '('; i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) out += ')'
          i += 1
        case c => out += c; i += 1
      }
    }
    (out.result(), i)
  }

  /** PDF hex string body starting after '<': pairs of hex digits,
    * odd length padded with 0. Returns (decoded, index after '>'). */
  private def parseHex(s: String, from: Int): (String, Int) = {
    val hex = new StringBuilder
    var i = from
    while (i < s.length && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (Character.digit(c, 16) >= 0) hex += c
      i += 1
    }
    if (hex.length % 2 == 1) hex += '0'
    val out = new StringBuilder
    var j = 0
    while (j + 1 < hex.length + 1 && j + 2 <= hex.length) {
      out += Integer.parseInt(hex.substring(j, j + 2), 16).toChar
      j += 2
    }
    (out.result(), i + 1)
  }
}
