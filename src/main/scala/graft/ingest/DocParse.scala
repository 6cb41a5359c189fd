package graft.ingest

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Inflater, ZipInputStream}
import scala.collection.mutable.ArrayBuffer

/** Pure-JVM binary-document text extraction — the engine-side analog of the
  * reference's SimpleDirectoryReader delegation to pypdf and ebooklib
  * (pyproject.toml:8, vector_api.py:34). No external parser ships in this
  * environment, so both extractors are deliberately scoped:
  *
  *  - EPUB is a ZIP of XHTML (the format IS the spec): entries are read in
  *    archive order (authoring tools write spine order), each content
  *    document stripped with the same HTML-to-text rules as the HTML loader.
  *  - PDF extraction handles the text-showing operators (Tj/TJ/'/") of
  *    uncompressed and FlateDecode content streams with standard string
  *    encodings — the output of common simple generators. Object-stream
  *    cross-references, encryption, and CID/Type0 subset fonts are out of
  *    scope.
  *
  * Both return None when nothing extractable is found; callers surface the
  * governed `document_parse_unsupported` error rather than ingesting binary
  * bytes as text. All functions are executor-safe (no shared state).
  */
object DocParse {

  // ---------------------------------------------------------------- EPUB

  private val EpubContentExt = Set("xhtml", "html", "htm")

  /** Concatenated text of the EPUB's content documents, in archive order. */
  def epubToText(bytes: Array[Byte]): Option[String] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val parts = ArrayBuffer.empty[String]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName.toLowerCase
        val ext = name.substring(name.lastIndexOf('.') + 1)
        if (!e.isDirectory && EpubContentExt(ext)) {
          val html = new String(zin.readAllBytes(), StandardCharsets.UTF_8)
          val text = stripMarkup(html)
          if (text.nonEmpty) parts += text
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } catch {
      case _: Exception => return None // not a zip / truncated archive
    } finally zin.close()
    if (parts.isEmpty) None else Some(parts.mkString("\n\n"))
  }

  /** Driver/executor-side mirror of TextFunctions.htmlToText's rules:
    * drop script/style subtrees, newline on block-level closers, strip
    * remaining tags, decode the common entities, collapse blank runs.
    */
  private[ingest] def stripMarkup(html: String): String = {
    var s = html
    s = s.replaceAll("(?is)<(script|style)\\b.*?</\\1>", " ")
    s = s.replaceAll("(?i)</(p|div|h[1-6]|li|tr|table|section|article|blockquote)>", "\n")
    s = s.replaceAll("(?i)<br\\s*/?>", "\n")
    s = s.replaceAll("(?s)<[^>]*>", " ")
    s = s.replace("&nbsp;", " ").replace("&amp;", "&").replace("&lt;", "<")
      .replace("&gt;", ">").replace("&quot;", "\"").replace("&#39;", "'")
    s = s.replaceAll("[ \\t\\x0B\\f\\r]+", " ")
    s = s.replaceAll(" ?\\n ?", "\n").replaceAll("\\n{2,}", "\n")
    s.trim
  }

  // ----------------------------------------------------------------- PDF

  /** Extracted text of the PDF's content streams, or None when no text
    * operator is decodable (scanned, encrypted, or out-of-scope encoding).
    */
  def pdfToText(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 5 || new String(bytes, 0, 5, StandardCharsets.US_ASCII) != "%PDF-")
      return None
    val streams = contentStreams(bytes)
    val texts = streams.flatMap(textFromContentStream)
    val out = texts.mkString("\n").trim
    if (out.isEmpty) None else Some(out)
  }

  /** Every `stream ... endstream` payload, inflated when its object
    * dictionary names /FlateDecode. Latin-1 is the byte-faithful charset for
    * scanning binary PDF structure.
    */
  private def contentStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = ArrayBuffer.empty[Array[Byte]]
    var from = 0
    while (from < raw.length) {
      val s = raw.indexOf("stream", from)
      if (s < 0) return out.toSeq
      // payload starts after "stream" + EOL (spec: CRLF or LF)
      var p = s + "stream".length
      if (p < raw.length && raw.charAt(p) == '\r') p += 1
      if (p < raw.length && raw.charAt(p) == '\n') p += 1
      val e = raw.indexOf("endstream", p)
      if (e < 0) return out.toSeq
      // the nearest preceding dictionary tells us the filter
      val dictStart = raw.lastIndexOf("<<", s)
      val dict = if (dictStart >= 0) raw.substring(dictStart, s) else ""
      var payload = bytes.slice(p, e)
      // trim the EOL the writer placed before "endstream"
      if (payload.nonEmpty && payload.last == '\n') payload = payload.dropRight(1)
      if (payload.nonEmpty && payload.last == '\r') payload = payload.dropRight(1)
      if (dict.contains("/FlateDecode")) inflate(payload).foreach(out += _)
      else out += payload
      from = e + "endstream".length
    }
    out.toSeq
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    inf.setInput(data)
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return None // stuck: corrupt/dict-needed
        out.write(buf, 0, n)
      }
      Some(out.toByteArray)
    } catch {
      case _: Exception => None
    } finally inf.end()
  }

  /** Text-showing operators in a decoded content stream: `(s) Tj`,
    * `(s) '`/`"`, and `[ (a) -120 (b) ] TJ`; Td/TD/T* line moves become
    * newlines. Literal-string escapes per the spec; hex strings `<..>`
    * decoded as Latin-1 byte pairs.
    */
  private def textFromContentStream(stream: Array[Byte]): Option[String] = {
    val s = new String(stream, StandardCharsets.ISO_8859_1)
    if (!s.contains("BT")) return None
    val sb = new StringBuilder
    var i = 0
    var sawText = false
    while (i < s.length) {
      s.charAt(i) match {
        case '(' =>
          val (lit, next) = literalString(s, i)
          // a string is "shown" only if the next operator token shows text
          val op = nextToken(s, next)
          if (op == "Tj" || op == "'" || op == "\"") { sb ++= lit; sawText = true }
          else if (op == "TJ" || insideArray(s, i)) { sb ++= lit; sawText = true }
          i = next
        case '<' if i + 1 < s.length && s.charAt(i + 1) != '<' =>
          val end = s.indexOf('>', i)
          if (end < 0) i = s.length
          else {
            val hex = s.substring(i + 1, end).filterNot(_.isWhitespace)
            val op = nextToken(s, end + 1)
            if (op == "Tj" || op == "'" || op == "\"" || op == "TJ" || insideArray(s, i)) {
              val padded = if (hex.length % 2 == 1) hex + "0" else hex
              padded.grouped(2).foreach { h =>
                try sb += Integer.parseInt(h, 16).toChar catch { case _: Exception => () }
              }
              sawText = true
            }
            i = end + 1
          }
        case 'T' if i + 1 < s.length && (s.charAt(i + 1) == 'd' || s.charAt(i + 1) == 'D' || s.charAt(i + 1) == '*') =>
          if (sb.nonEmpty && !sb.endsWith("\n")) sb += '\n'
          i += 2
        case _ => i += 1
      }
    }
    val text = sb.toString.replaceAll("\\n{2,}", "\n").trim
    if (sawText && text.nonEmpty) Some(text) else None
  }

  /** Decode a PDF literal string starting at `(`; returns (text, index after
    * the closing paren). Handles nesting and backslash escapes.
    */
  private def literalString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 0
    var i = start
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb += '\n'; case 'r' => sb += '\r'; case 't' => sb += '\t'
            case 'b' => sb += '\b'; case 'f' => sb += '\f'
            case '(' => sb += '('; case ')' => sb += ')'; case '\\' => sb += '\\'
            case d if d.isDigit => // octal \ddd (1-3 digits)
              val digits = s.substring(i + 1, math.min(i + 4, s.length)).takeWhile(_.isDigit).take(3)
              sb += Integer.parseInt(digits, 8).toChar
              i += digits.length - 1
            case '\n' => () // line continuation
            case other => sb += other
          }
          i += 2
        case '(' =>
          depth += 1
          if (depth > 1) sb += '('
          i += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return (sb.toString, i + 1)
          sb += ')'
          i += 1
        case c => sb += c; i += 1
      }
    }
    (sb.toString, i)
  }

  /** The operator token following position `i` (skipping whitespace and
    * numbers — TJ arrays interleave kerning numbers with strings).
    */
  private def nextToken(s: String, from: Int): String = {
    var i = from
    while (i < s.length &&
      (s.charAt(i).isWhitespace || s.charAt(i) == '-' || s.charAt(i).isDigit ||
        s.charAt(i) == '.' || s.charAt(i) == ']')) i += 1
    val start = i
    while (i < s.length && !s.charAt(i).isWhitespace &&
      s.charAt(i) != '(' && s.charAt(i) != '<' && s.charAt(i) != '[') i += 1
    s.substring(start, math.min(i, s.length))
  }

  /** Whether position i sits inside a `[ ... ] TJ` array (scan back for an
    * unmatched `[` before any operator break).
    */
  private def insideArray(s: String, pos: Int): Boolean = {
    var i = pos - 1
    while (i >= 0) {
      val c = s.charAt(i)
      if (c == '[') return true
      if (c == ']' || c == ')' || c == 'j' || c == 'J') return false
      i -= 1
    }
    false
  }
}
