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
  * without font CMaps.
  *
  * Modern (PDF 1.5+) files are first-class: stream extents use the
  * dict's direct `/Length` so binary payloads containing the literal
  * `endstream` bytes can't desync the scan, FlateDecode/LZWDecode
  * honor `/DecodeParms` PNG (10–15) and TIFF (2) predictors, and
  * structural streams — `/Type /XRef` cross-reference streams,
  * `/Type /ObjStm` object streams (whose payloads hold only
  * NON-stream objects, §7.5.7, so page content always stays
  * top-level where the scanner finds it), images, font programs,
  * metadata — are classified out of the text scan instead of leaking
  * decoded binary into the output. */
object Pdf {

  def extractText(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 5 || new String(bytes, 0, 5, "ISO-8859-1") != "%PDF-")
      return None
    val blocks = rawStreams(bytes).iterator
      .filterNot(r => isNonContent(r.dict))
      .map(r => streamText(decodeStream(r.data, r.dict)))
      .filter(_.trim.nonEmpty)
      .toSeq
    if (blocks.isEmpty) None else Some(blocks.mkString("\n\n"))
  }

  /** A located (still-encoded) stream with its preceding dict. */
  private final case class RawStream(dict: String, data: Array[Byte])

  private val NonContentType =
    """/Type\s*/(XRef|ObjStm|Metadata|EmbeddedFile|Font)\b""".r
  private val NonContentSubtype =
    """/Subtype\s*/(Image|XML|Type1C|CIDFontType0C|OpenType)\b""".r

  /** Structural streams (PDF 1.5 xref/object streams), images, font
    * programs and metadata carry no page text: pypdf never text-scans
    * them (it walks the page tree, index.py:282), and feeding their
    * decoded binary to the operator scanner can leak trailing string
    * tokens into the output. ObjStm payloads in particular hold only
    * NON-stream objects (PDF 32000-1 §7.5.7) — page dicts, not page
    * content — so the content streams of an xref-stream PDF still
    * appear top-level where the scanner finds them. */
  private def isNonContent(dict: String): Boolean =
    NonContentType.findFirstIn(dict).isDefined ||
      NonContentSubtype.findFirstIn(dict).isDefined

  /** `/Length` when declared as a DIRECT integer (an indirect
    * `12 0 R` reference is unresolvable without an xref walk). */
  private val DirectLenRe = """/Length\s+(\d+)(\s+\d+\s+R)?""".r

  /** All `stream…endstream` spans with their dicts. The extent is the
    * dict's direct `/Length` when it checks out (binary payloads —
    * flate, image, xref — can contain the literal bytes `endstream`,
    * which would desync a pure keyword scan); otherwise the next
    * `endstream` keyword, so malformed input degrades to the old
    * behavior instead of failing. */
  private def rawStreams(bytes: Array[Byte]): Seq[RawStream] = {
    val out = ArrayBuffer[RawStream]()
    val hay = new String(bytes, "ISO-8859-1")
    var from = 0
    while (from < hay.length) {
      val s = hay.indexOf("stream", from)
      if (s < 0) { from = hay.length }
      else if (s > 0 && hay.charAt(s - 1) == 'd') { from = s + 6 } // "endstream"
      else {
        var start = s + "stream".length
        if (start < hay.length && hay.charAt(start) == '\r') start += 1
        if (start < hay.length && hay.charAt(start) == '\n') start += 1
        val dict = streamDict(hay, s)
        val declared = DirectLenRe.findFirstMatchIn(dict) match {
          case Some(m) if m.group(2) == null =>
            val len = try m.group(1).toLong catch { case _: Exception => -1L }
            val end = start.toLong + len
            if (len >= 0 && end <= hay.length &&
              hay.indexOf("endstream", end.toInt) >= 0 &&
              hay.substring(end.toInt, hay.indexOf("endstream", end.toInt))
                .forall(_.isWhitespace)) Some(end.toInt)
            else None
          case _ => None
        }
        val e = declared.getOrElse(hay.indexOf("endstream", start))
        if (e < 0) { from = hay.length }
        else {
          out += RawStream(dict, bytes.slice(start, e))
          from = math.max(e, hay.indexOf("endstream", e)) + "endstream".length
        }
      }
    }
    out.toSeq
  }

  /** The non-stream objects packed in a decoded `/Type /ObjStm`
    * payload (PDF 1.5+, §7.5.7): `/N` pairs of `objnum offset` up to
    * `/First`, then the objects themselves. Returns
    * (objectNumber, objectSource) pairs; empty on any structural
    * mismatch. The extractor itself never needs these for text (see
    * [[isNonContent]]) — this is the structural reader for callers
    * that walk modern PDFs, and its parse doubles as validation in
    * PdfSpec. */
  private[graft] def objStmObjects(dict: String, decoded: Array[Byte]): Seq[(Int, String)] = {
    def intOf(name: String): Option[Int] =
      (name + """\s+(\d+)""").r.findFirstMatchIn(dict).map(_.group(1).toInt)
    val res = for {
      n <- intOf("/N")
      first <- intOf("/First")
      if first <= decoded.length && n >= 0
    } yield {
      val header = new String(decoded, 0, first, "ISO-8859-1")
      val nums = """\d+""".r.findAllIn(header).map(_.toInt).toArray
      if (nums.length < 2 * n) Seq.empty[(Int, String)]
      else {
        val body = new String(decoded, "ISO-8859-1")
        (0 until n).map { i =>
          val objNum = nums(2 * i)
          val off = first + nums(2 * i + 1)
          val end = if (i + 1 < n) first + nums(2 * i + 3) else body.length
          (objNum, body.substring(math.min(off, body.length), math.min(math.max(end, off), body.length)))
        }
      }
    }
    res.getOrElse(Seq.empty)
  }

  /** The `<<…>>` dict immediately preceding the `stream` keyword at
    * `streamKw`, balanced backwards over nesting; empty when absent. */
  private def streamDict(hay: String, streamKw: Int): String = {
    val close = hay.lastIndexOf(">>", streamKw)
    if (close < 0 || hay.substring(close + 2, streamKw).exists(c => !c.isWhitespace))
      return ""
    var depth = 1
    var i = close - 1
    while (i > 0 && depth > 0) {
      if (hay.charAt(i) == '>' && hay.charAt(i - 1) == '>') { depth += 1; i -= 2 }
      else if (hay.charAt(i) == '<' && hay.charAt(i - 1) == '<') { depth -= 1; i -= 2 }
      else i -= 1
    }
    if (depth == 0) hay.substring(i, close + 2) else ""
  }

  private val FilterRe =
    """/Filter\s*(?:\[([^\]]*)\]|/([A-Za-z0-9]+))""".r

  /** Filter names in application order from a stream dict. */
  private def filtersOf(dict: String): Seq[String] =
    FilterRe.findFirstMatchIn(dict) match {
      case None => Seq.empty
      case Some(m) =>
        if (m.group(2) != null) Seq(m.group(2))
        else """/([A-Za-z0-9]+)""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
    }

  private def decodeStream(data: Array[Byte], dict: String): Array[Byte] = {
    val filters = filtersOf(dict)
    if (filters.isEmpty) inflateOrRaw(data)
    else {
      val parms = parmsOf(dict, filters.length)
      try filters.zip(parms).foldLeft(data) { case (d, (f, p)) =>
        f match {
          case "FlateDecode" | "Fl" => unpredict(inflate(d), p)
          case "LZWDecode" | "LZW" => unpredict(lzwDecode(d), p)
          case "ASCIIHexDecode" | "AHx" => asciiHexDecode(d)
          case "ASCII85Decode" | "A85" => ascii85Decode(d)
          // image/crypt filters (DCT, JPX, CCITT, …) mark non-text
          // payloads — pass through; the text scanner finds nothing
          case _ => d
        }
      } catch { case _: Exception => inflateOrRaw(data) }
    }
  }

  /** Per-filter `/DecodeParms` (alias `/DP`) dict sources, positionally
    * aligned with the filter chain: a single dict applies to the first
    * filter; an array maps entry-for-entry (`null` = no parms), the
    * layout PDF 1.7 §7.4.1 defines. */
  private def parmsOf(dict: String, nFilters: Int): Seq[String] = {
    // name boundary: without it `/DP` matches the prefix of unrelated
    // names (`/DPI 300`); and take the first occurrence actually
    // followed by a dict/array value, so a decoy never shadows the
    // real key later in the dict
    val key = """/(?:DecodeParms|DP)(?![A-Za-z0-9])\s*""".r
      .findAllMatchIn(dict)
      .find { m =>
        val r = dict.substring(m.end)
        r.startsWith("<<") || r.startsWith("[")
      }
    val none = Seq.fill(nFilters)("")
    key match {
      case None => none
      case Some(m) =>
        val rest = dict.substring(m.end)
        if (rest.startsWith("<<")) {
          val d = balancedDict(rest)
          d +: Seq.fill(math.max(0, nFilters - 1))("")
        } else if (rest.startsWith("[")) {
          // array entries: each is a <<…>> dict or the `null` keyword
          var i = 1
          val items = ArrayBuffer[String]()
          while (i < rest.length && rest.charAt(i) != ']' && items.length < nFilters) {
            if (rest.startsWith("<<", i)) {
              val d = balancedDict(rest.substring(i))
              items += d
              i += math.max(d.length, 2)
            } else if (rest.startsWith("null", i)) { items += ""; i += 4 }
            else i += 1
          }
          (items.toSeq ++ Seq.fill(nFilters)("")).take(nFilters)
        } else none
    }
  }

  /** The balanced `<<…>>` dict at the start of `s` ("" if malformed). */
  private def balancedDict(s: String): String = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      if (s.startsWith("<<", i)) { depth += 1; i += 2 }
      else if (s.startsWith(">>", i)) {
        depth -= 1; i += 2
        if (depth == 0) return s.substring(0, i)
      } else i += 1
    }
    ""
  }

  private def parmInt(parms: String, name: String, dflt: Int): Int =
    (name + """\s+(\d+)""").r.findFirstMatchIn(parms)
      .map(_.group(1).toInt).getOrElse(dflt)

  /** Reverse the row predictor declared in a filter's DecodeParms —
    * PNG predictors 10–15 (each row = 1 filter byte + rowBytes,
    * PNG spec §9 / PDF 1.7 §7.4.4.4) and TIFF predictor 2. Predictor
    * ≤1 (or no parms) is the identity. Xref streams are almost always
    * predictor-12 coded, and content streams may be too. */
  private def unpredict(data: Array[Byte], parms: String): Array[Byte] = {
    if (parms.isEmpty) return data
    val predictor = parmInt(parms, "/Predictor", 1)
    if (predictor <= 1) return data
    val colors = parmInt(parms, "/Colors", 1)
    val bpc = parmInt(parms, "/BitsPerComponent", 8)
    val columns = parmInt(parms, "/Columns", 1)
    val bpp = math.max(1, colors * bpc / 8)
    val rowBytes = (columns * colors * bpc + 7) / 8
    if (predictor == 2) {
      // TIFF horizontal differencing (byte-aligned components only)
      if (bpc != 8) return data
      val out = data.clone()
      var r = 0
      while (r + rowBytes <= out.length) {
        var i = r + bpp
        while (i < r + rowBytes) { out(i) = (out(i) + out(i - bpp)).toByte; i += 1 }
        r += rowBytes
      }
      return out
    }
    // PNG predictors: per-row filter byte then filtered bytes
    val stride = rowBytes + 1
    val nRows = data.length / stride
    val out = new Array[Byte](nRows * rowBytes)
    var row = 0
    while (row < nRows) {
      val ft = data(row * stride) & 0xFF
      val src = row * stride + 1
      val dst = row * rowBytes
      var i = 0
      while (i < rowBytes) {
        val raw = data(src + i) & 0xFF
        val left = if (i >= bpp) out(dst + i - bpp) & 0xFF else 0
        val up = if (row > 0) out(dst - rowBytes + i) & 0xFF else 0
        val upLeft = if (row > 0 && i >= bpp) out(dst - rowBytes + i - bpp) & 0xFF else 0
        val rec = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 =>
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => raw
        }
        out(dst + i) = rec.toByte
        i += 1
      }
      row += 1
    }
    out
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = inf.inflate(chunk)
      while (n > 0) { buf.write(chunk, 0, n); n = inf.inflate(chunk) }
      if (buf.size() == 0) throw new java.util.zip.DataFormatException("empty")
      buf.toByteArray
    } finally inf.end()
  }

  /** PDF LZWDecode (TIFF-style LZW, 9→12-bit codes, clear=256,
    * EOD=257, code width grows ONE CODE EARLY — PDF 1.7 §7.4.4
    * default EarlyChange=1). */
  private def lzwDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dict = ArrayBuffer[Array[Byte]]()
    def reset(): Unit = {
      dict.clear()
      (0 until 256).foreach(i => dict += Array(i.toByte))
      dict += Array.emptyByteArray // 256 clear
      dict += Array.emptyByteArray // 257 EOD
    }
    reset()
    var width = 9
    var prev: Array[Byte] = null
    var acc = 0L
    var bits = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      acc = (acc << 8) | (data(i) & 0xFF)
      bits += 8
      i += 1
      while (bits >= width && !done) {
        val code = ((acc >> (bits - width)) & ((1 << width) - 1)).toInt
        bits -= width
        if (code == 256) { reset(); width = 9; prev = null }
        else if (code == 257) done = true
        else {
          val entry =
            if (code < dict.length) dict(code)
            else if (prev != null) prev :+ prev(0) // KwKwK case
            else throw new IllegalArgumentException("bad LZW code")
          out.write(entry)
          if (prev != null) dict += (prev :+ entry(0))
          prev = entry
          if (dict.length + 1 >= (1 << width) && width < 12) width += 1
        }
      }
    }
    out.toByteArray
  }

  private def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '>') done = true
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write((hi << 4) | d); hi = -1 }
        }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd final digit: low nibble 0
    out.toByteArray
  }

  private def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var tuple = 0L
    var n = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true // "~>" EOD
      else if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        n += 1
        if (n == 5) {
          out.write(((tuple >> 24) & 0xFF).toInt); out.write(((tuple >> 16) & 0xFF).toInt)
          out.write(((tuple >> 8) & 0xFF).toInt); out.write((tuple & 0xFF).toInt)
          tuple = 0L; n = 0
        }
      }
      i += 1
    }
    if (n > 1) {
      // partial group: pad with 'u', emit n-1 bytes
      var t = tuple
      (n until 5).foreach(_ => t = t * 85 + 84)
      val bs = Array(((t >> 24) & 0xFF).toByte, ((t >> 16) & 0xFF).toByte,
        ((t >> 8) & 0xFF).toByte, (t & 0xFF).toByte)
      out.write(bs, 0, n - 1)
    }
    out.toByteArray
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
