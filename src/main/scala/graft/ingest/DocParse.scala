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
  *  - EPUB is a ZIP of XHTML (the format IS the spec): content documents
  *    are read in the OPF `<spine>`'s reading order (container.xml →
  *    package document → manifest-resolved itemrefs), falling back to
  *    archive order when the manifest chain is absent; each content
  *    document is stripped with the same HTML-to-text rules as the HTML
  *    loader.
  *  - PDF extraction follows the cross-reference structure (classic `xref`
  *    tables AND PDF 1.5+ cross-reference streams with PNG predictors,
  *    /Prev chains, and /Type/ObjStm object streams) from /Root through the
  *    page tree to each page's /Contents, decoding FlateDecode streams and
  *    the text-showing operators (Tj/TJ/'/") with standard string
  *    encodings. CID/Type0 fonts are supported through their /ToUnicode
  *    CMaps (bfchar/bfrange incl. array form, codespacerange-derived code
  *    width, /Resources inheritance down the page tree) — the path
  *    post-2005 subset-font PDFs need; a Type0 font WITHOUT /ToUnicode
  *    under the predefined Identity-H/V encoding is honored as CID = code
  *    (2-byte codes, §9.7.5.2), and only the external-CMap-resource case
  *    degrades to byte decoding. When the xref is damaged extraction falls back to a linear
  *    scan of every `stream…endstream` blob (font-blind — resources can't
  *    be resolved without an xref). Encrypted documents openable WITHOUT a
  *    password (the common owner-password-only files) decrypt through
  *    [[PdfCrypt]] (RC4-40/128, AES-128 crypt filters, AES-256 R6);
  *    password-locked files fail governed, and an encrypted file with a
  *    damaged xref never falls through to the linear scan (its streams are
  *    ciphertext).
  *
  * Both return None when nothing extractable is found; callers surface the
  * governed `document_parse_unsupported` error rather than ingesting binary
  * bytes as text. Decompression is BOUNDED ([[MaxInflatedBytes]] per
  * stream/zip entry) so a crafted flate bomb inside the 512 MiB file policy
  * becomes the governed parse error, not an executor OOM. All functions are
  * executor-safe (no shared state).
  */
object DocParse {

  /** Per-stream / per-zip-entry decompression ceiling (64 MiB): more text
    * than any real document page set, small enough that a zip/flate bomb
    * cannot OOM an executor.
    */
  val MaxInflatedBytes: Int = 64 * 1024 * 1024

  // ---------------------------------------------------------------- EPUB

  private val EpubContentExt = Set("xhtml", "html", "htm")

  /** Concatenated text of the EPUB's content documents, in the
    * publication's READING order: META-INF/container.xml names the OPF
    * package document, whose `<spine>` itemrefs order the manifest's
    * content documents (OCF 3.3 §3.5.2.1 / Packages 3.3 §5.4 — the same
    * order ebooklib hands the reference). Archive order is only the
    * FALLBACK (no container/OPF/spine, or a spine whose hrefs resolve to
    * nothing — non-standard authoring tools): most tools write entries in
    * spine order, but nothing in the spec requires it, and a re-zipped
    * EPUB silently reorders. Spine-less content documents (nav.xhtml,
    * covers) are appended after the spine in archive order so no text is
    * lost relative to the archive-order fallback.
    */
  def epubToText(bytes: Array[Byte]): Option[String] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    // archive-ordered (name, bytes) of content docs + the two manifest files
    val content = ArrayBuffer.empty[(String, Array[Byte])]
    var container: Option[String] = None
    val opfs = scala.collection.mutable.Map.empty[String, String]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        val lower = name.toLowerCase
        val ext = lower.substring(lower.lastIndexOf('.') + 1)
        if (!e.isDirectory && (EpubContentExt(ext) || ext == "opf" ||
            name == "META-INF/container.xml")) {
          val entryBytes = readBounded(zin, MaxInflatedBytes) match {
            case Some(b) => b
            case None => return None // zip-bomb entry: governed failure
          }
          if (name == "META-INF/container.xml")
            container = Some(new String(entryBytes, StandardCharsets.UTF_8))
          else if (ext == "opf")
            opfs(name) = new String(entryBytes, StandardCharsets.UTF_8)
          else content += name -> entryBytes
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } catch {
      case _: Exception => return None // not a zip / truncated archive
    } finally zin.close()
    val byName = content.toMap
    val ordered: Seq[(String, Array[Byte])] = epubSpineOrder(container, opfs.toMap) match {
      case Some(paths) =>
        val inSpine = paths.flatMap(p => byName.get(p).map(p -> _))
        if (inSpine.isEmpty) content.toSeq
        else {
          val seen = inSpine.map(_._1).toSet
          inSpine ++ content.filterNot(c => seen(c._1))
        }
      case None => content.toSeq
    }
    val parts = ordered.flatMap { case (_, b) =>
      val text = stripMarkup(new String(b, StandardCharsets.UTF_8))
      if (text.nonEmpty) Some(text) else None
    }
    if (parts.isEmpty) None else Some(parts.mkString("\n\n"))
  }

  private val RootfileRe = "(?s)<rootfile\\b[^>]*>".r
  private val ItemRe = "(?s)<item\\b[^>]*>".r
  private val ItemrefRe = "(?s)<itemref\\b[^>]*>".r

  private def xmlAttr(tag: String, attr: String): Option[String] =
    ("""(?s)\b""" + attr + """\s*=\s*["']([^"']*)["']""").r
      .findFirstMatchIn(tag).map(_.group(1))

  /** Resolve the spine's reading order to archive entry paths: container
    * → OPF full-path → manifest (id → href) → spine idrefs, hrefs made
    * OPF-relative with `.`/`..` folded and %XX minimally decoded. None
    * when any link in that chain is absent — the caller's archive-order
    * fallback.
    */
  private[ingest] def epubSpineOrder(
      container: Option[String], opfs: Map[String, String]): Option[Seq[String]] = for {
    c <- container
    opfPath <- RootfileRe.findAllMatchIn(c).map(_.matched)
      .flatMap(xmlAttr(_, "full-path")).find(p => opfs.contains(p))
    opf = opfs(opfPath)
    manifest = ItemRe.findAllMatchIn(opf).map(_.matched)
      .flatMap(t => for (i <- xmlAttr(t, "id"); h <- xmlAttr(t, "href")) yield i -> h)
      .toMap
    idrefs = ItemrefRe.findAllMatchIn(opf).map(_.matched)
      .flatMap(xmlAttr(_, "idref")).toSeq
    if idrefs.nonEmpty
  } yield {
    val opfDir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i => opfPath.substring(0, i + 1)
    }
    idrefs.flatMap(manifest.get).map { href =>
      val noFrag = href.takeWhile(_ != '#')
      val decoded = try {
        java.net.URLDecoder.decode(noFrag, "UTF-8")
      } catch { case _: Exception => noFrag }
      normalizeZipPath(opfDir + decoded)
    }
  }

  /** Fold `.`/`..` segments the way zip readers resolve them. */
  private def normalizeZipPath(p: String): String = {
    val out = ArrayBuffer.empty[String]
    p.split('/').foreach {
      case "" | "." => ()
      case ".." => if (out.nonEmpty) out.remove(out.size - 1)
      case s => out += s
    }
    out.mkString("/")
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
    // &amp; decodes LAST so double-encoded "&amp;lt;" yields literal "&lt;",
    // not "<" — same order as TextFunctions.htmlToText
    s = s.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")
    s = s.replaceAll("[ \\t\\x0B\\f\\r]+", " ")
    s = s.replaceAll(" ?\\n ?", "\n").replaceAll("\\n{2,}", "\n")
    s.trim
  }

  // ---------------------------------------------------------------- DOCX

  /** DOCX text: the format is a ZIP whose `word/document.xml` holds the
    * body as WordprocessingML — text lives in `<w:t>` runs, paragraphs
    * end at `</w:p>`, explicit breaks/tabs are `<w:br/>`/`<w:tab/>`.
    * Same ZIP machinery (bounded reads) as EPUB; field instruction text
    * (`<w:instrText>`, e.g. TOC codes) is dropped like script subtrees
    * in HTML.
    */
  def docxToText(bytes: Array[Byte]): Option[String] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == "word/document.xml") {
          val xml = readBounded(zin, MaxInflatedBytes) match {
            case Some(b) => new String(b, StandardCharsets.UTF_8)
            case None => return None
          }
          val text = stripWordXml(xml)
          return if (text.isEmpty) None else Some(text)
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
      None
    } catch {
      case _: Exception => None // not a zip / truncated archive
    } finally zin.close()
  }

  private[ingest] def stripWordXml(xml: String): String = {
    var s = xml
    s = s.replaceAll("(?s)<w:instrText.*?</w:instrText>", " ")
    s = s.replaceAll("<w:tab\\s*/>", "\t")
    s = s.replaceAll("<w:br[^>]*/>", "\n")
    s = s.replaceAll("</w:p>", "\n")
    s = s.replaceAll("(?s)<[^>]*>", "")
    s = s.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")
    s = s.replaceAll("[ \\t\\x0B\\f\\r]+", " ")
    s = s.replaceAll(" ?\\n ?", "\n").replaceAll("\\n{2,}", "\n")
    s.trim
  }

  // ------------------------------------------------------------ Markdown

  /** Markdown → plain text: formatting stripped, content kept (the
    * MarkdownReader contract): fence markers, headers, blockquote/bullet
    * prefixes, emphasis, inline code ticks removed; links and images
    * reduce to their text/alt-text.
    */
  def markdownToText(md: String): String = {
    var s = md
    s = s.replaceAll("(?m)^```.*$", "")
    s = s.replaceAll("!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    s = s.replaceAll("\\[([^\\]]+)\\]\\([^)]*\\)", "$1")
    s = s.replaceAll("(?m)^#{1,6}\\s*", "")
    s = s.replaceAll("(?m)^>\\s?", "")
    s = s.replaceAll("(?m)^\\s*[-*+]\\s+", "")
    s = s.replaceAll("(?m)^\\s*\\d+\\.\\s+", "")
    s = s.replaceAll("\\*\\*([^*]+)\\*\\*", "$1").replaceAll("__([^_]+)__", "$1")
    s = s.replaceAll("\\*([^*\\n]+)\\*", "$1")
    s = s.replaceAll("(?<![A-Za-z0-9])_([^_\\n]+)_(?![A-Za-z0-9])", "$1")
    s = s.replace("`", "")
    s.replaceAll("\\n{3,}", "\n\n").trim
  }

  // ----------------------------------------------------------------- XML

  /** Generic XML → text: CDATA content survives (extracted BEFORE the tag
    * strip — the generic `<[^>]*>` regex would otherwise eat it up to the
    * first `>`), comments / processing instructions / DOCTYPE dropped,
    * tags → space, entities decoded with `&amp;` LAST (the htmlToText
    * decode-order rule: decoding it earlier would re-introduce entity
    * prefixes), whitespace collapsed.
    */
  def xmlToText(xml: String): String = {
    var s = xml
    // CDATA content is literal — entity-ENCODE it so the tag strip can't
    // eat embedded markup; the final decode pass restores it verbatim
    val cdata = java.util.regex.Pattern.compile("(?s)<!\\[CDATA\\[(.*?)\\]\\]>").matcher(s)
    val sb = new java.lang.StringBuilder
    while (cdata.find()) {
      val lit = cdata.group(1)
        .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      cdata.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(lit))
    }
    cdata.appendTail(sb)
    s = sb.toString
    s = s.replaceAll("(?s)<!--.*?-->", " ")
    s = s.replaceAll("(?s)<\\?.*?\\?>", " ")
    s = s.replaceAll("(?i)<!DOCTYPE[^>]*>", " ")
    s = s.replaceAll("(?s)<[^>]*>", " ")
    s = s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&#39;", "'").replace("&#34;", "\"")
      .replace("&amp;", "&")
    s.replaceAll("[ \\t\\x0B\\f\\r]+", " ").replaceAll("\\s*\\n\\s*", "\n").trim
  }

  // ----------------------------------------------------------------- RTF

  /** RTF → text via a small group-aware scanner (the pure-JVM standard of
    * the PDF/EPUB/DOCX extractors — no library): control words are
    * consumed with their optional numeric parameter and delimiter space
    * (`\par`/`\line` → newline, `\tab` → tab), `\'hh` hex escapes decode,
    * escaped `\\ \{ \}` literals pass through, and destination groups
    * that hold no document text (`{\fonttbl…}`, `{\colortbl…}`,
    * stylesheet/info/pict and every `{\*…}` group) are skipped by
    * tracking the brace depth where skipping began. Raw CR/LF inside RTF
    * are NOT content (the spec: line breaks come from `\par`). Returns
    * None (fail-closed, like [[docxToText]]) unless the payload starts
    * with `{\rtf` or nothing textual survives.
    */
  def rtfToText(rtf: String): Option[String] = {
    if (rtf == null || !rtf.startsWith("{\\rtf")) return None
    val skipDests = Set("fonttbl", "colortbl", "stylesheet", "info", "pict",
      "themedata", "generator", "xmlnstbl", "listtable", "listoverridetable")
    val out = new StringBuilder
    val n = rtf.length
    var i = 0
    var depth = 0
    var skipDepth = -1
    while (i < n) {
      rtf.charAt(i) match {
        case '{' =>
          depth += 1; i += 1
          if (skipDepth < 0 && i < n && rtf.charAt(i) == '\\') {
            var j = i + 1
            if (j < n && rtf.charAt(j) == '*') skipDepth = depth
            else {
              val start = j
              while (j < n && rtf.charAt(j).isLetter) j += 1
              if (skipDests.contains(rtf.substring(start, j))) skipDepth = depth
            }
          }
        case '}' =>
          if (skipDepth == depth) skipDepth = -1
          depth -= 1; i += 1
        case '\\' if i + 1 < n =>
          val c2 = rtf.charAt(i + 1)
          if (c2.isLetter) {
            var j = i + 1
            while (j < n && rtf.charAt(j).isLetter) j += 1
            val word = rtf.substring(i + 1, j)
            if (j < n && (rtf.charAt(j) == '-' || rtf.charAt(j).isDigit)) {
              j += 1
              while (j < n && rtf.charAt(j).isDigit) j += 1
            }
            if (j < n && rtf.charAt(j) == ' ') j += 1 // delimiter space is consumed
            if (skipDepth < 0) word match {
              case "par" | "line" => out += '\n'
              case "tab" => out += '\t'
              case _ => ()
            }
            i = j
          } else if (c2 == '\'' && i + 3 < n) {
            if (skipDepth < 0)
              try out += Integer.parseInt(rtf.substring(i + 2, i + 4), 16).toChar
              catch { case _: NumberFormatException => () }
            i += 4
          } else {
            if (skipDepth < 0) c2 match {
              case '\\' | '{' | '}' => out += c2
              case '~' => out += ' '
              case _ => ()
            }
            i += 2
          }
        case '\r' | '\n' => i += 1
        case ch =>
          if (skipDepth < 0) out += ch
          i += 1
      }
    }
    val t = out.toString.replaceAll("\\n{3,}", "\n\n").trim
    if (t.isEmpty) None else Some(t)
  }

  // ----------------------------------------------------------------- CSV

  /** CSV → one text document: rows rendered as `v1, v2, …` lines, in file
    * order, minimal RFC 4180 (quoted fields may carry commas/newlines/
    * doubled quotes). One document per FILE — the row→text rendering the
    * reference gets from its CSV reader.
    */
  def csvToText(csv: String): String = {
    val out = new StringBuilder
    val field = new StringBuilder
    val row = ArrayBuffer.empty[String]
    var inQuotes = false
    var i = 0
    def endField(): Unit = { row += field.toString; field.clear() }
    def endRow(): Unit = {
      endField()
      if (row.exists(_.nonEmpty)) {
        if (out.nonEmpty) out += '\n'
        out ++= row.mkString(", ")
      }
      row.clear()
    }
    while (i < csv.length) {
      val c = csv.charAt(i)
      if (inQuotes) {
        if (c == '"' && i + 1 < csv.length && csv.charAt(i + 1) == '"') {
          field += '"'; i += 1
        }
        else if (c == '"') inQuotes = false
        else field += c
      } else c match {
        case '"' => inQuotes = true
        case ',' => endField()
        case '\r' => () // CRLF: the \n handles the row end
        case '\n' => endRow()
        case other => field += other
      }
      i += 1
    }
    if (field.nonEmpty || row.nonEmpty) endRow()
    out.toString
  }

  // ----------------------------------------------------------------- PDF

  /** Extracted text of the PDF's content streams, or None when no text
    * operator is decodable (scanned, encrypted, or out-of-scope encoding).
    *
    * Primary path: follow the cross-reference structure (classic table or
    * PDF 1.5+ xref stream, /Prev chains, object streams) from /Root through
    * the page tree, extracting each page's /Contents in document order.
    * Fallback (damaged/absent xref): linear scan of every stream blob.
    */
  def pdfToText(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 5 || new String(bytes, 0, 5, StandardCharsets.US_ASCII) != "%PDF-")
      return None
    val viaXref =
      try xrefPagesText(bytes)
      catch { case _: Exception => None } // damaged xref → linear fallback
    viaXref.orElse {
      // an encrypted file whose xref path failed must NOT fall back to the
      // linear scan — its streams are ciphertext and any "BT…Tj" hit would
      // be garbage. /Encrypt lives in the trailer, i.e. near the file tail.
      val tail = new String(bytes, math.max(0, bytes.length - 2048),
        math.min(2048, bytes.length), StandardCharsets.ISO_8859_1)
      if (tail.contains("/Encrypt")) return None
      val texts = contentStreams(bytes).flatMap(textFromContentStream(_))
      val out = texts.mkString("\n").trim
      if (out.isEmpty) None else Some(out)
    }
  }

  // ------------------------------------------------- PDF xref-driven path

  /** Where an object lives: at a byte offset (xref type 1) or inside a
    * /Type/ObjStm compressed object stream (xref type 2).
    */
  private sealed trait Loc
  private final case class AtOffset(off: Int) extends Loc
  private final case class InObjStm(stm: Int, idx: Int) extends Loc

  private val RefRe = """(\d+)\s+\d+\s+R""".r

  private def refAfter(dict: String, key: String): Option[Int] =
    (java.util.regex.Pattern.quote(key) + """\s+(\d+)\s+\d+\s+R""").r
      .findFirstMatchIn(dict).map(_.group(1).toInt)

  private def intAfter(dict: String, key: String): Option[Int] =
    (java.util.regex.Pattern.quote(key) + """\s+(\d+)""").r
      .findFirstMatchIn(dict).map(_.group(1).toInt)

  /** Body of the first `[ ... ]` after `key` (flat arrays only). */
  private def arrayAfter(dict: String, key: String): Option[String] =
    (java.util.regex.Pattern.quote(key) + """\s*\[([^\]]*)\]""").r
      .findFirstMatchIn(dict).map(_.group(1))

  /** The balanced `<< ... >>` starting at/after `from`: (dict, end index). */
  private def balancedDict(s: String, from: Int): Option[(String, Int)] = {
    val start = s.indexOf("<<", from)
    if (start < 0) return None
    var i = start
    var depth = 0
    while (i < s.length - 1) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return Some((s.substring(start, i), i))
      }
      else i += 1
    }
    None
  }

  /** Parse the xref chain starting at `startxref`'s offset into
    * (objNum → Loc, latest trailer dict). Later (newer) sections win; /Prev
    * sections only fill absent keys — the incremental-update rule.
    */
  private def readXrefChain(
      raw: String, bytes: Array[Byte]): Option[(Map[Int, Loc], String)] = {
    val sx = raw.lastIndexOf("startxref")
    if (sx < 0) return None
    val offStr = raw.substring(sx + 9).trim.takeWhile(_.isDigit)
    if (offStr.isEmpty) return None
    val locs = scala.collection.mutable.Map.empty[Int, Loc]
    var trailer: String = null
    var next: Option[Int] = Some(offStr.toInt)
    val seen = scala.collection.mutable.Set.empty[Int]
    while (next.isDefined) {
      val off = next.get
      if (off < 0 || off >= raw.length || !seen.add(off)) return None
      var p = off
      while (p < raw.length && raw.charAt(p).isWhitespace) p += 1
      val dict: String =
        if (raw.startsWith("xref", p)) {
          // classic table: sections of "start count" + count entries
          p += 4
          var d: String = null
          val tok = new java.util.StringTokenizer(raw.substring(p, math.min(p + 4 * 1024 * 1024, raw.length)))
          var done = false
          while (!done && tok.hasMoreTokens) {
            val t = tok.nextToken()
            if (t == "trailer") {
              val at = raw.indexOf("trailer", p)
              d = balancedDict(raw, at).map(_._1).orNull
              done = true
            } else {
              val start = t.toInt
              val count = tok.nextToken().toInt
              var i = 0
              while (i < count) {
                val a = tok.nextToken(); val _gen = tok.nextToken(); val ty = tok.nextToken()
                if (ty == "n") locs.getOrElseUpdate(start + i, AtOffset(a.toInt))
                i += 1
              }
            }
          }
          if (d == null) return None
          d
        } else {
          // xref STREAM: an ordinary stream object whose payload encodes
          // the table ([W-widths] fields, optional PNG predictor)
          val (d, payloadOpt) = parseObjectAt(raw, bytes, p).getOrElse(return None)
          if (!d.contains("/XRef")) return None
          val data = decodeStream(d, payloadOpt.getOrElse(return None)).getOrElse(return None)
          val w = arrayAfter(d, "/W").map(_.trim.split("""\s+""").toSeq.map(_.toInt))
            .getOrElse(return None)
          if (w.length < 3) return None
          val size = intAfter(d, "/Size").getOrElse(return None)
          val index = arrayAfter(d, "/Index")
            .map(_.trim.split("""\s+""").toSeq.map(_.toInt))
            .getOrElse(Seq(0, size))
          val rowLen = w.sum
          var pos = 0
          index.grouped(2).foreach {
            case Seq(first, n) =>
              var i = 0
              while (i < n && pos + rowLen <= data.length) {
                def field(fi: Int): Long = {
                  val o = pos + w.take(fi).sum
                  var v = 0L
                  (0 until w(fi)).foreach(j => v = (v << 8) | (data(o + j) & 0xffL))
                  v
                }
                val ftype = if (w(0) == 0) 1L else field(0)
                if (ftype == 1L) locs.getOrElseUpdate(first + i, AtOffset(field(1).toInt))
                else if (ftype == 2L) locs.getOrElseUpdate(first + i, InObjStm(field(1).toInt, field(2).toInt))
                pos += rowLen
                i += 1
              }
            case _ => ()
          }
          d
        }
      if (trailer == null) trailer = dict
      next = intAfter(dict, "/Prev")
    }
    if (trailer == null) None else Some((locs.toMap, trailer))
  }

  /** Parse an indirect object at a byte offset: (dictionary, raw stream
    * payload if the object is a stream). /Length is honored when direct;
    * otherwise the payload ends at the next `endstream`.
    */
  private def parseObjectAt(
      raw: String, bytes: Array[Byte], off: Int): Option[(String, Option[Array[Byte]])] = {
    val objAt = raw.indexOf("obj", off)
    if (objAt < 0 || objAt > off + 64) return None
    val (dict, dictEnd) = balancedDict(raw, objAt) match {
      case Some(de) => de
      case None => // non-dict object (array/number): return its text as the "dict"
        val end = raw.indexOf("endobj", objAt)
        return if (end < 0) None else Some((raw.substring(objAt + 3, end), None))
    }
    var p = dictEnd
    while (p < raw.length && raw.charAt(p).isWhitespace) p += 1
    if (!raw.startsWith("stream", p)) return Some((dict, None))
    p += "stream".length
    if (p < raw.length && raw.charAt(p) == '\r') p += 1
    if (p < raw.length && raw.charAt(p) == '\n') p += 1
    // direct /Length only — an indirect length falls back to endstream scan
    val len = """(/Length)\s+(\d+)(?!\s+\d+\s+R)""".r
      .findFirstMatchIn(dict).map(_.group(2).toInt)
    val end = len match {
      case Some(l) if p + l <= bytes.length && raw.startsWith("endstream", skipEol(raw, p + l)) => p + l
      case _ =>
        val e = raw.indexOf("endstream", p)
        if (e < 0) return Some((dict, None))
        var q = e
        if (q > p && raw.charAt(q - 1) == '\n') q -= 1
        if (q > p && raw.charAt(q - 1) == '\r') q -= 1
        q
    }
    Some((dict, Some(bytes.slice(p, end))))
  }

  private def skipEol(raw: String, p: Int): Int = {
    var q = p
    if (q < raw.length && raw.charAt(q) == '\r') q += 1
    if (q < raw.length && raw.charAt(q) == '\n') q += 1
    q
  }

  /** Decode a stream payload per its dictionary: FlateDecode (bounded) and
    * the PNG predictors of /DecodeParms. Unfiltered payloads pass through.
    */
  private def decodeStream(dict: String, payload: Array[Byte]): Option[Array[Byte]] = {
    val inflated =
      if (dict.contains("/FlateDecode")) inflate(payload) match {
        case Some(b) => b
        case None => return None
      }
      else payload
    val predictor = intAfter(dict, "/Predictor").getOrElse(1)
    if (predictor < 10) Some(inflated)
    else { // PNG predictors: rows of (filter byte + columns), bpp = 1
      val columns = intAfter(dict, "/Columns").getOrElse(1)
      pngUnpredict(inflated, columns)
    }
  }

  /** Reverse PNG row filters (None/Sub/Up/Average/Paeth) at 1 byte/pixel —
    * the form xref streams use.
    */
  private def pngUnpredict(data: Array[Byte], columns: Int): Option[Array[Byte]] = {
    if (columns <= 0 || data.length % (columns + 1) != 0) return None
    val rows = data.length / (columns + 1)
    val out = new Array[Byte](rows * columns)
    var r = 0
    while (r < rows) {
      val ft = data(r * (columns + 1)) & 0xff
      var c = 0
      while (c < columns) {
        val x = data(r * (columns + 1) + 1 + c) & 0xff
        val left = if (c > 0) out(r * columns + c - 1) & 0xff else 0
        val up = if (r > 0) out((r - 1) * columns + c) & 0xff else 0
        val upLeft = if (r > 0 && c > 0) out((r - 1) * columns + c - 1) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 => // Paeth
            val pp = left + up - upLeft
            val pa = math.abs(pp - left); val pb = math.abs(pp - up); val pc = math.abs(pp - upLeft)
            x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => return None
        }
        out(r * columns + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    Some(out)
  }

  /** Generation number from the `N G obj` header at a byte offset (for the
    * per-object decryption key); 0 when unparsable.
    */
  private def genAt(raw: String, off: Int): Int = {
    val objAt = raw.indexOf("obj", off)
    if (objAt < 0 || objAt > off + 64) return 0
    raw.substring(off, objAt).trim.split("""\s+""") match {
      case Array(_, g) if g.forall(_.isDigit) => g.toInt
      case _ => 0
    }
  }

  /** Resolve objects by number, transparently opening /Type/ObjStm object
    * streams (header = /N (num, relOffset) pairs before /First). When `dec`
    * is set (encrypted document), stream payloads are decrypted with the
    * per-object key BEFORE filter decoding — except xref streams, which the
    * spec forbids encrypting. Objects inside an ObjStm are NOT separately
    * encrypted (the ObjStm's own stream was).
    */
  private final class Objects(raw: String, bytes: Array[Byte], locs: Map[Int, Loc],
      dec: Option[PdfCrypt.Decryptor] = None) {
    private val objStmCache = scala.collection.mutable.Map.empty[Int, Option[(String, Seq[(Int, Int)])]]

    private def decrypted(num: Int, off: Int, dict: String,
        payload: Array[Byte]): Option[Array[Byte]] = dec match {
      case Some(d) if !dict.contains("/XRef") => d.decrypt(num, genAt(raw, off), payload)
      case _ => Some(payload)
    }

    /** (dict-or-body text, decrypted-but-still-filtered stream payload). */
    def apply(num: Int): Option[(String, Option[Array[Byte]])] = locs.get(num).flatMap {
      case AtOffset(off) =>
        parseObjectAt(raw, bytes, off).flatMap { case (dict, payloadOpt) =>
          payloadOpt match {
            case None => Some((dict, None))
            case Some(p) => decrypted(num, off, dict, p).map(dp => (dict, Some(dp)))
          }
        }
      case InObjStm(stm, idx) =>
        objStm(stm).flatMap { case (content, pairs) =>
          if (idx >= pairs.length) None
          else {
            val first = pairs(idx)._2
            val until = if (idx + 1 < pairs.length) pairs(idx + 1)._2 else content.length
            Some((content.substring(first, math.min(until, content.length)), None))
          }
        }
    }

    /** Decoded content + (objNum, absolute offset) pairs of an ObjStm. */
    private def objStm(num: Int): Option[(String, Seq[(Int, Int)])] =
      objStmCache.getOrElseUpdate(num, locs.get(num) match {
        case Some(AtOffset(off)) =>
          for {
            (dict, payloadOpt) <- parseObjectAt(raw, bytes, off)
            payload <- payloadOpt
            plain <- decrypted(num, off, dict, payload)
            data <- decodeStream(dict, plain)
            n <- intAfter(dict, "/N")
            first <- intAfter(dict, "/First")
          } yield {
            val content = new String(data, StandardCharsets.ISO_8859_1)
            val header = content.substring(0, math.min(first, content.length))
            val nums = header.trim.split("""\s+""").filter(_.nonEmpty).map(_.toInt)
            val pairs = nums.grouped(2).take(n).collect {
              case Array(objNum, rel) => (objNum, first + rel)
            }.toSeq
            (content, pairs)
          }
        case _ => None // ObjStm inside an ObjStm is illegal per spec
      })
  }

  // ------------------------------------------- CID/Type0 font CMap support

  /** A parsed /ToUnicode CMap: fixed code width in bytes (from the first
    * codespacerange; 2 for the ubiquitous Identity-H layout) and the
    * code → Unicode-string map (multi-char targets carry ligatures).
    * Codes with no mapping are dropped — emitting the raw CID would
    * inject glyph-index garbage into the text — EXCEPT under
    * `identity = true`, the Type0-with-predefined-Identity-encoding
    * decoder (no /ToUnicode at all): there the spec's CID = code mapping
    * (PDF 32000 §9.7.5.2) is honored by emitting the 2-byte code as its
    * character (CID 0 = .notdef and C0 controls stay dropped).
    */
  private[ingest] final case class ToUnicodeCMap(
      codeBytes: Int, map: Map[Int, String], identity: Boolean = false) {
    def decode(bytes: Array[Byte]): String = {
      val sb = new StringBuilder
      var i = 0
      while (i + codeBytes <= bytes.length) {
        var code = 0
        var j = 0
        while (j < codeBytes) { code = (code << 8) | (bytes(i + j) & 0xff); j += 1 }
        map.get(code) match {
          case Some(dst) => sb ++= dst
          case None if identity && code >= 32 && code != 0xffff =>
            sb += code.toChar
          case None => ()
        }
        i += codeBytes
      }
      sb.toString
    }
  }

  private val HexTokRe = """<([0-9A-Fa-f]+)>""".r

  /** Hex string → UTF-16BE text (a bfchar/bfrange destination). */
  private def utf16be(hex: String): String = {
    val padded = if (hex.length % 4 == 0) hex else hex.reverse.padTo((hex.length + 3) / 4 * 4, '0').reverse.toString
    padded.grouped(4).map(h => Integer.parseInt(h, 16).toChar).mkString
  }

  /** Parse a decoded /ToUnicode CMap stream. Handles the operators real
    * writers emit: codespacerange (code width), bfchar pairs, bfrange in
    * both increment (`<lo> <hi> <dstStart>`) and array
    * (`<lo> <hi> [<d1> … <dN>]`) forms. Range spans are capped at 65536
    * codes so a crafted CMap cannot balloon the map.
    */
  private[ingest] def parseToUnicode(cmap: String): Option[ToUnicodeCMap] = {
    val codeBytes = {
      val cs = cmap.indexOf("begincodespacerange")
      if (cs < 0) 2
      else HexTokRe.findFirstMatchIn(cmap.substring(cs))
        .map(_.group(1).length / 2).filter(w => w >= 1 && w <= 2).getOrElse(2)
    }
    val entries = Map.newBuilder[Int, String]
    var any = false
    // ---- bfchar sections: <src> <dst> pairs
    sections(cmap, "beginbfchar", "endbfchar").foreach { body =>
      HexTokRe.findAllMatchIn(body).map(_.group(1)).grouped(2).foreach {
        case Seq(src, dst) =>
          entries += Integer.parseInt(src, 16) -> utf16be(dst)
          any = true
        case _ => ()
      }
    }
    // ---- bfrange sections: <lo> <hi> (<dstStart> | [<d1> … <dN>])
    sections(cmap, "beginbfrange", "endbfrange").foreach { body =>
      var i = 0
      def nextTok(): Option[String] = {
        while (i < body.length && body.charAt(i) != '<' && body.charAt(i) != '[') i += 1
        if (i >= body.length) None
        else if (body.charAt(i) == '[') {
          val end = body.indexOf(']', i)
          if (end < 0) { i = body.length; None }
          else { val t = body.substring(i, end + 1); i = end + 1; Some(t) }
        } else {
          val end = body.indexOf('>', i)
          if (end < 0) { i = body.length; None }
          else { val t = body.substring(i, end + 1); i = end + 1; Some(t) }
        }
      }
      var go = true
      while (go) {
        (nextTok(), nextTok(), nextTok()) match {
          case (Some(loT), Some(hiT), Some(dstT)) =>
            (HexTokRe.findFirstMatchIn(loT), HexTokRe.findFirstMatchIn(hiT)) match {
              case (Some(loM), Some(hiM)) =>
                val lo = Integer.parseInt(loM.group(1), 16)
                val hi = math.min(Integer.parseInt(hiM.group(1), 16), lo + 65535)
                if (dstT.startsWith("[")) {
                  val dsts = HexTokRe.findAllMatchIn(dstT).map(_.group(1)).toSeq
                  (lo to hi).zip(dsts).foreach { case (c, d) =>
                    entries += c -> utf16be(d); any = true
                  }
                } else HexTokRe.findFirstMatchIn(dstT).foreach { dM =>
                  // increment the LAST UTF-16 unit, per the CMap spec
                  val base = utf16be(dM.group(1))
                  var c = lo
                  while (c <= hi) {
                    val s =
                      if (base.isEmpty) ""
                      else base.dropRight(1) + (base.last + (c - lo)).toChar
                    entries += c -> s
                    any = true
                    c += 1
                  }
                }
              case _ => ()
            }
          case _ => go = false
        }
      }
    }
    if (any) Some(ToUnicodeCMap(codeBytes, entries.result())) else None
  }

  /** All `begin…end` section bodies of a CMap (writers may emit several). */
  private def sections(s: String, begin: String, end: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var from = 0
    while (from < s.length) {
      val b = s.indexOf(begin, from)
      if (b < 0) return out.toSeq
      val e = s.indexOf(end, b + begin.length)
      if (e < 0) return out.toSeq
      out += s.substring(b + begin.length, e)
      from = e + end.length
    }
    out.toSeq
  }

  /** A key's value that may be a direct nested dictionary or an indirect
    * reference (the two forms /Resources and /Font legally take).
    */
  private def dictValue(objects: Objects, container: String, key: String): Option[String] = {
    val kq = java.util.regex.Pattern.quote(key)
    (kq + """\s*<<""").r.findFirstMatchIn(container) match {
      case Some(m) => balancedDict(container, m.start).map(_._1)
      case None => refAfter(container, key).flatMap(objects(_)).map(_._1)
    }
  }

  private val FontEntryRe = """/([A-Za-z0-9.+_-]+)\s+(\d+)\s+\d+\s+R""".r

  /** The Type0 font's descendant CIDFont dictionary: /DescendantFonts is
    * a one-element array holding either an inline ref or a ref to an
    * array holding the ref (both legal forms).
    */
  private def descendantFont(objects: Objects, fd: String): Option[String] = {
    val inArray = arrayAfter(fd, "/DescendantFonts")
      .flatMap(a => RefRe.findFirstMatchIn(a).map(_.group(1).toInt))
    inArray.orElse(refAfter(fd, "/DescendantFonts").flatMap { n =>
      // ref to the array object: resolve, then take its first ref
      objects(n).map(_._1).flatMap(a => RefRe.findFirstMatchIn(a).map(_.group(1).toInt))
    }).flatMap(objects(_)).map(_._1)
  }

  /** Resolve a page's font resources to their /ToUnicode CMaps: resource
    * name (the `/F1` of `Tf`) → parsed CMap, for fonts that carry one.
    * `resources` is the page's own /Resources or the nearest inherited
    * one; `cmapCache` dedupes parse work across pages sharing fonts.
    */
  private def pageFonts(
      objects: Objects, resources: Option[String],
      cmapCache: scala.collection.mutable.Map[Int, Option[ToUnicodeCMap]]): Map[String, ToUnicodeCMap] =
    resources.flatMap(res => dictValue(objects, res, "/Font")) match {
      case None => Map.empty
      case Some(fontDict) =>
        FontEntryRe.findAllMatchIn(fontDict).flatMap { m =>
          val name = m.group(1)
          val fontRef = m.group(2).toInt
          val cmap = cmapCache.getOrElseUpdate(fontRef,
            objects(fontRef).map(_._1).flatMap { fd =>
              val viaToUnicode = for {
                tuRef <- refAfter(fd, "/ToUnicode")
                (td, payloadOpt) <- objects(tuRef)
                payload <- payloadOpt
                data <- decodeStream(td, payload)
                cm <- parseToUnicode(new String(data, StandardCharsets.ISO_8859_1))
              } yield cm
              // Type0 under the predefined Identity-H/V encoding with no
              // /ToUnicode: honor CID = code (2-byte codes) instead of
              // degrading to Latin-1 byte pairs — EXCEPT when the
              // descendant CIDFont carries an embedded font program
              // (/FontFile*): a subset-embedded CIDFontType2's CIDs are
              // glyph indices of the subset, not codepoints, so emitting
              // them injects mojibake into downstream dedup/tokenization.
              // There the codes are still consumed 2 bytes at a time but
              // dropped (lossy, predictable). Other predefined CMaps
              // (external CMap resources) still fall through to bytes.
              viaToUnicode.orElse {
                if (fd.contains("/Type0") &&
                    (fd.contains("/Identity-H") || fd.contains("/Identity-V"))) {
                  val embeddedSubset = descendantFont(objects, fd).exists { dd =>
                    dictValue(objects, dd, "/FontDescriptor")
                      .exists(_.contains("/FontFile"))
                  }
                  Some(ToUnicodeCMap(2, Map.empty, identity = !embeddedSubset))
                } else None
              }
            })
          cmap.map(name -> _)
        }.toMap
    }

  /** First element of the trailer's /ID array (hex or literal form) — input
    * to the R≤4 key derivation. Empty when absent (lenient: the spec
    * requires an ID on encrypted files, but damaged writers exist).
    */
  private def idFirst(trailer: String): Array[Byte] =
    """/ID\s*\[""".r.findFirstMatchIn(trailer) match {
      case None => Array.empty[Byte]
      case Some(m) =>
        PdfCrypt.firstString(trailer.substring(m.end)).getOrElse(Array.empty[Byte])
    }

  /** The xref-driven extraction: /Root → /Pages tree → each page's
    * /Contents, concatenated per page, in document order.
    */
  private def xrefPagesText(bytes: Array[Byte]): Option[String] = {
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    val (locs, trailer) = readXrefChain(raw, bytes).getOrElse(return None)
    // Encrypted document: build the empty-user-password decryptor from the
    // /Encrypt dictionary (resolved WITHOUT decryption — its own strings are
    // stored in the clear, §7.6.2). Failure (real password, unsupported
    // handler) is a governed None: never fall through to ciphertext.
    val dec: Option[PdfCrypt.Decryptor] = refAfter(trailer, "/Encrypt") match {
      case None => None
      case Some(encNum) =>
        val encDict = locs.get(encNum) match {
          case Some(AtOffset(off)) => parseObjectAt(raw, bytes, off).map(_._1)
          case _ => None // Encrypt dict may not live in an ObjStm
        }
        val id0 = idFirst(trailer)
        Some(encDict.flatMap(PdfCrypt.fromEncrypt(_, id0)).getOrElse(return None))
    }
    val objects = new Objects(raw, bytes, locs, dec)
    val rootNum = refAfter(trailer, "/Root").getOrElse(return None)
    val catalog = objects(rootNum).map(_._1).getOrElse(return None)
    val pagesRoot = refAfter(catalog, "/Pages").getOrElse(return None)
    // walk the page tree (cycle-guarded); leaves are /Type /Page.
    // /Resources inherit down the tree: a node's own dict wins, else the
    // nearest ancestor's (PDF 32000 §7.7.3.4)
    val pages = scala.collection.mutable.ArrayBuffer.empty[(String, Option[String])]
    val seen = scala.collection.mutable.Set.empty[Int]
    def walk(num: Int, inheritedRes: Option[String]): Unit = {
      if (!seen.add(num) || seen.size > 100000) return
      objects(num).map(_._1).foreach { d =>
        val res = dictValue(objects, d, "/Resources").orElse(inheritedRes)
        if (d.contains("/Page") && !d.contains("/Pages")) pages += ((d, res))
        else arrayAfter(d, "/Kids").toSeq
          .flatMap(body => RefRe.findAllMatchIn(body).map(_.group(1).toInt))
          .foreach(walk(_, res))
      }
    }
    walk(pagesRoot, None)
    if (pages.isEmpty) return None
    val cmapCache = scala.collection.mutable.Map.empty[Int, Option[ToUnicodeCMap]]
    val texts = pages.flatMap { case (page, res) =>
      val contentRefs = arrayAfter(page, "/Contents")
        .map(body => RefRe.findAllMatchIn(body).map(_.group(1).toInt).toSeq)
        .orElse(refAfter(page, "/Contents").map(Seq(_)))
        .getOrElse(Seq.empty)
      val decoded = contentRefs.flatMap { ref =>
        objects(ref).flatMap { case (d, payloadOpt) =>
          payloadOpt.flatMap(p => decodeStream(d, p))
        }
      }
      if (decoded.isEmpty) None
      else textFromContentStream(
        decoded.reduce((a, b) => a ++ "\n".getBytes(StandardCharsets.ISO_8859_1) ++ b),
        pageFonts(objects, res, cmapCache))
    }
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
        if (out.size() > MaxInflatedBytes) return None // flate bomb: governed, not OOM
      }
      Some(out.toByteArray)
    } catch {
      case _: Exception => None
    } finally inf.end()
  }

  /** Read a stream to completion, refusing past `cap` bytes (zip-bomb
    * guard for EPUB entries).
    */
  private def readBounded(in: java.io.InputStream, cap: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size() > cap) return None
      n = in.read(buf)
    }
    Some(out.toByteArray)
  }

  /** Text-showing operators in a decoded content stream: `(s) Tj`,
    * `(s) '`/`"`, and `[ (a) -120 (b) ] TJ`; Td/TD/T* line moves become
    * newlines. Literal-string escapes per the spec. `fonts` maps resource
    * names (tracked through `Tf` operators) to /ToUnicode CMaps: shown
    * strings under a CMap'd font decode as CID codes through the map;
    * otherwise hex strings decode as Latin-1 byte pairs and literal
    * strings as-is (the simple-font path).
    */
  private def textFromContentStream(
      stream: Array[Byte],
      fonts: Map[String, ToUnicodeCMap] = Map.empty): Option[String] = {
    val s = new String(stream, StandardCharsets.ISO_8859_1)
    if (!s.contains("BT")) return None
    val sb = new StringBuilder
    var i = 0
    var sawText = false
    var cur: Option[ToUnicodeCMap] = None
    while (i < s.length) {
      s.charAt(i) match {
        case '/' if fonts.nonEmpty =>
          // font selection: `/Name size Tf` — reset on any other name op
          var e = i + 1
          while (e < s.length && !s.charAt(e).isWhitespace &&
            "()<>[]{}/%".indexOf(s.charAt(e)) < 0) e += 1
          val name = s.substring(i + 1, e)
          if (nextToken(s, e) == "Tf") cur = fonts.get(name)
          i = e
        case '(' =>
          val (lit, next) = literalString(s, i)
          // a string is "shown" only if the next operator token shows text
          val op = nextToken(s, next)
          val shown = op == "Tj" || op == "'" || op == "\"" ||
            op == "TJ" || insideArray(s, i)
          if (shown) {
            cur match {
              case Some(cm) =>
                sb ++= cm.decode(lit.toCharArray.map(c => (c & 0xff).toByte))
              case None => sb ++= lit
            }
            sawText = true
          }
          i = next
        case '<' if i + 1 < s.length && s.charAt(i + 1) != '<' =>
          val end = s.indexOf('>', i)
          if (end < 0) i = s.length
          else {
            val hex = s.substring(i + 1, end).filterNot(_.isWhitespace)
            val op = nextToken(s, end + 1)
            if (op == "Tj" || op == "'" || op == "\"" || op == "TJ" || insideArray(s, i)) {
              val padded = if (hex.length % 2 == 1) hex + "0" else hex
              cur match {
                case Some(cm) =>
                  val bytes = padded.grouped(2).flatMap { h =>
                    try Some(Integer.parseInt(h, 16).toByte)
                    catch { case _: Exception => None }
                  }.toArray
                  sb ++= cm.decode(bytes)
                case None =>
                  padded.grouped(2).foreach { h =>
                    try sb += Integer.parseInt(h, 16).toChar catch { case _: Exception => () }
                  }
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
