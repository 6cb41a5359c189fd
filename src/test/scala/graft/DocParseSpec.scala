package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}
import graft.ingest.{DocParse, Loaders}
import graft.model.{ErrorCodes, GraftException}

/** Pure-JVM PDF/EPUB extraction: hand-authored fixture bytes (a minimal
  * uncompressed PDF, a FlateDecode PDF, a real zip EPUB) so the extractors
  * are tested against the actual binary formats, not mocks.
  */
class DocParseSpec extends SparkSpec {

  // ------------------------------------------------------------ fixtures

  /** A minimal single-page PDF whose content stream is `body`; when
    * `flate`, the stream is Deflater-compressed with /FlateDecode.
    */
  private def pdfBytes(body: String, flate: Boolean): Array[Byte] = {
    val content = body.getBytes(StandardCharsets.ISO_8859_1)
    val payload =
      if (!flate) content
      else {
        val d = new Deflater()
        d.setInput(content); d.finish()
        val buf = new Array[Byte](content.length * 2 + 64)
        val n = d.deflate(buf)
        d.end()
        buf.take(n)
      }
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${payload.length}$filter >> stream\n")
    out.write(payload)
    w("\nendstream endobj\n")
    w("%%EOF\n")
    out.toByteArray
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(b); d.finish()
    val buf = new Array[Byte](b.length * 2 + 64)
    val n = d.deflate(buf)
    d.end()
    buf.take(n)
  }

  /** A PDF 1.5 fixture exercising the modern xref machinery: the
    * catalog/pages/page dictionaries live inside a /Type/ObjStm object
    * stream, the content stream is top-level FlateDecode, and the
    * cross-reference is a STREAM (W [1 2 1]) — optionally PNG-Up predicted
    * (/Predictor 12), the layout every post-1.5 writer emits. There is no
    * classic `xref` table anywhere in the file.
    */
  private def pdf15Bytes(body: String, predictor: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    // obj 4: the page's content stream (top-level; streams cannot live in ObjStm)
    val content = deflate(body.getBytes(StandardCharsets.ISO_8859_1))
    val off4 = out.size()
    w(s"4 0 obj << /Length ${content.length} /Filter /FlateDecode >> stream\n")
    out.write(content); w("\nendstream endobj\n")
    // obj 5: ObjStm holding objects 1 (catalog), 2 (pages), 3 (page)
    val o1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val o2 = "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    val o3 = "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val header = s"1 0 2 ${o1.length + 1} 3 ${o1.length + o2.length + 2} "
    val stmPayload = deflate((header + o1 + " " + o2 + " " + o3).getBytes(StandardCharsets.ISO_8859_1))
    val off5 = out.size()
    w(s"5 0 obj << /Type /ObjStm /N 3 /First ${header.length} " +
      s"/Length ${stmPayload.length} /Filter /FlateDecode >> stream\n")
    out.write(stmPayload); w("\nendstream endobj\n")
    // obj 6: the xref stream itself (type/offset-hi-lo/extra rows)
    val off6 = out.size()
    def row(t: Int, f2: Int, f3: Int): Array[Int] =
      Array(t, (f2 >> 8) & 0xff, f2 & 0xff, f3)
    val rows = Seq(
      row(0, 0, 0),   // obj 0: free
      row(2, 5, 0),   // obj 1: ObjStm 5, index 0
      row(2, 5, 1),   // obj 2
      row(2, 5, 2),   // obj 3
      row(1, off4, 0),
      row(1, off5, 0),
      row(1, off6, 0))
    val table: Array[Byte] =
      if (!predictor) rows.flatten.map(_.toByte).toArray
      else { // PNG Up filter (type 2) per 4-byte row
        val b = Array.newBuilder[Byte]
        var prev = Array(0, 0, 0, 0)
        rows.foreach { r =>
          b += 2.toByte
          (0 until 4).foreach(c => b += ((r(c) - prev(c)) & 0xff).toByte)
          prev = r
        }
        b.result()
      }
    val tz = deflate(table)
    val parms = if (predictor) " /DecodeParms << /Predictor 12 /Columns 4 >>" else ""
    w(s"6 0 obj << /Type /XRef /Size 7 /W [1 2 1] /Root 1 0 R$parms " +
      s"/Length ${tz.length} /Filter /FlateDecode >> stream\n")
    out.write(tz); w("\nendstream endobj\n")
    w(s"startxref\n$off6\n%%EOF\n")
    out.toByteArray
  }

  /** A CID/Type0-font PDF with a classic xref table: the page shows text
    * as 2-byte CID hex strings under `/F1` (Identity-H style), and the
    * font's /ToUnicode CMap (FlateDecode stream) carries the CID→Unicode
    * map. `resourcesOnPages` moves /Resources up to the Pages node to
    * exercise inheritance. Extraction MUST go through the CMap — the CIDs
    * are arbitrary small integers, so byte decoding yields control chars,
    * not text.
    */
  private def pdfCidBytes(content: String, toUnicode: String,
      resourcesOnPages: Boolean, withToUnicode: Boolean = true,
      embeddedSubset: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    def obj(n: Int, body: String): Unit = {
      offsets(n) = out.size(); w(s"$n 0 obj $body endobj\n")
    }
    w("%PDF-1.4\n")
    val res = "/Resources << /Font << /F1 5 0 R >> >>"
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, s"<< /Type /Pages /Kids [3 0 R] /Count 1 ${if (resourcesOnPages) res else ""} >>")
    obj(3, s"<< /Type /Page /Parent 2 0 R /Contents 4 0 R ${if (!resourcesOnPages) res else ""} >>")
    offsets(4) = out.size()
    val c = content.getBytes(StandardCharsets.ISO_8859_1)
    w(s"4 0 obj << /Length ${c.length} >> stream\n"); out.write(c); w("\nendstream endobj\n")
    obj(5, "<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H " +
      "/Encoding /Identity-H " +
      (if (embeddedSubset) "/DescendantFonts [7 0 R] " else "") +
      (if (withToUnicode) "/ToUnicode 6 0 R " else "") + ">>")
    offsets(6) = out.size()
    val tz = deflate(toUnicode.getBytes(StandardCharsets.ISO_8859_1))
    w(s"6 0 obj << /Length ${tz.length} /Filter /FlateDecode >> stream\n")
    out.write(tz); w("\nendstream endobj\n")
    val last = if (embeddedSubset) {
      // subset-embedded CIDFontType2: the FontDescriptor carries a
      // /FontFile2 ref (the glyph program itself never resolves — the
      // gate only needs the descriptor to claim embedding)
      obj(7, "<< /Type /Font /Subtype /CIDFontType2 " +
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> " +
        "/FontDescriptor << /Type /FontDescriptor /FontFile2 8 0 R >> >>")
      7
    } else 6
    val xrefOff = out.size()
    w(s"xref\n0 ${last + 1}\n0000000000 65535 f \n")
    (1 to last).foreach(n => w(f"${offsets(n)}%010d 00000 n \n"))
    w(s"trailer << /Size ${last + 1} /Root 1 0 R >>\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  private val cidCMap =
    """/CIDInit /ProcSet findresource begin
      |12 dict begin
      |begincmap
      |1 begincodespacerange
      |<0000> <FFFF>
      |endcodespacerange
      |2 beginbfchar
      |<0001> <0048>
      |<0002> <0065>
      |endbfchar
      |3 beginbfrange
      |<0003> <0003> <006C>
      |<0005> <0006> [<0057> <00660069>]
      |<0008> <0009> <0031>
      |endbfrange
      |2 beginbfchar
      |<0004> <006F>
      |<0007> <0020>
      |endbfchar
      |endcmap
      |""".stripMargin

  /** A minimal EPUB: zip with mimetype + two XHTML chapters. */
  private def epubBytes(chapters: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("mimetype"))
    z.write("application/epub+zip".getBytes(StandardCharsets.US_ASCII))
    z.closeEntry()
    chapters.zipWithIndex.foreach { case (text, i) =>
      z.putNextEntry(new ZipEntry(s"OEBPS/chap$i.xhtml"))
      z.write(
        s"""<html><head><title>c$i</title><style>p{color:red}</style></head>
           |<body><p>$text</p></body></html>""".stripMargin
          .getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** An EPUB whose ARCHIVE order deliberately disagrees with the OPF
    * spine's reading order: chapB is written first in the zip, but the
    * spine says A then B. nav.xhtml is in the manifest but NOT the spine.
    */
  private def epubSpineFixture(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    entry("mimetype", "application/epub+zip")
    entry("META-INF/container.xml",
      """<?xml version="1.0"?>
        |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
        |  <rootfiles>
        |    <rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>
        |  </rootfiles>
        |</container>""".stripMargin)
    entry("OEBPS/chapB.xhtml", "<html><body><p>SECOND in spine.</p></body></html>")
    entry("OEBPS/nav.xhtml", "<html><body><p>nav landmarks text</p></body></html>")
    entry("OEBPS/chapA.xhtml", "<html><body><p>FIRST in spine.</p></body></html>")
    entry("OEBPS/content.opf",
      """<?xml version="1.0"?>
        |<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="uid">
        |  <manifest>
        |    <item id="nav" href="nav.xhtml" media-type="application/xhtml+xml" properties="nav"/>
        |    <item href="chapA.xhtml" id="a" media-type="application/xhtml+xml"/>
        |    <item id="b" href="chapB.xhtml" media-type="application/xhtml+xml"/>
        |  </manifest>
        |  <spine>
        |    <itemref idref="a"/>
        |    <itemref idref="b"/>
        |  </spine>
        |</package>""".stripMargin)
    z.close()
    bos.toByteArray
  }

  // --------------------------------------------------------------- tests

  test("pdf: uncompressed Tj text extracts") {
    val pdf = pdfBytes("BT /F1 12 Tf 72 720 Td (Hello graft PDF) Tj ET", flate = false)
    assert(DocParse.pdfToText(pdf).contains("Hello graft PDF"))
  }

  test("pdf: FlateDecode stream inflates and extracts; TJ arrays and escapes decode") {
    val body = "BT /F1 12 Tf 72 720 Td " +
      "[(kern) -120 (ed array)] TJ 0 -14 Td (line \\(two\\) with \\\\slash) Tj ET"
    val pdf = pdfBytes(body, flate = true)
    val got = DocParse.pdfToText(pdf).get
    assert(got.contains("kerned array"))
    assert(got.contains("line (two) with \\slash"))
    assert(got.indexOf("kerned array") < got.indexOf("line"), "Td break keeps order")
  }

  test("pdf: no text operators -> None (scanned/empty page)") {
    val pdf = pdfBytes("q 1 0 0 1 0 0 cm /Im0 Do Q", flate = false)
    assert(DocParse.pdfToText(pdf).isEmpty)
    assert(DocParse.pdfToText("not a pdf at all".getBytes).isEmpty)
  }

  test("pdf 1.5: object-stream + xref-stream layout extracts via the xref path") {
    val pdf = pdf15Bytes("BT /F1 12 Tf 72 720 Td (modern xref text) Tj ET", predictor = false)
    assert(DocParse.pdfToText(pdf).contains("modern xref text"))
  }

  test("pdf 1.5: PNG-Up predicted xref stream (Predictor 12) decodes") {
    val pdf = pdf15Bytes("BT (predicted xref works) Tj ET", predictor = true)
    assert(DocParse.pdfToText(pdf).contains("predicted xref works"))
  }

  test("pdf 1.5: extraction follows the page tree, not a blind stream scan") {
    // append an ORPHAN text-bearing stream (valid object, never referenced
    // by any page): the xref-driven path must exclude it, while a linear
    // stream scan would have included it — this discriminates the two.
    val base = pdf15Bytes("BT (page text only) Tj ET", predictor = false)
    val out = new ByteArrayOutputStream()
    out.write(base)
    val orphan = "BT (orphan stream text) Tj ET"
    out.write((s"9 0 obj << /Length ${orphan.length} >> stream\n" + orphan +
      "\nendstream endobj\n").getBytes(StandardCharsets.ISO_8859_1))
    val got = DocParse.pdfToText(out.toByteArray).get
    assert(got.contains("page text only"))
    assert(!got.contains("orphan stream text"),
      "xref path must extract only page /Contents")
  }

  test("pdf: CID/Type0 font decodes through its /ToUnicode CMap") {
    // CIDs are small integers — only the CMap can turn them into text.
    // Covers bfchar, single-dst bfrange, array bfrange (with the "fi"
    // ligature multi-char target), and an increment range (<0008>-><0009>
    // from <0031> = "1","2").
    val content = "BT /F1 12 Tf <0001000200030003000400070005000600080009> Tj ET"
    val got = DocParse.pdfToText(pdfCidBytes(content, cidCMap, resourcesOnPages = false))
    assert(got.contains("Hello Wfi12"), s"got $got")
  }

  test("pdf: /Resources inherit from the Pages node down to the page") {
    val content = "BT /F1 12 Tf <00010002000300030004> Tj ET"
    val got = DocParse.pdfToText(pdfCidBytes(content, cidCMap, resourcesOnPages = true))
    assert(got.contains("Hello"), s"got $got")
  }

  test("pdf: CID font switches off after Tf selects an unmapped font") {
    // /F2 is not in resources -> byte decoding resumes for its strings
    val content = "BT /F1 12 Tf <00010002000300030004> Tj /F2 10 Tf (plain) Tj ET"
    val got = DocParse.pdfToText(pdfCidBytes(content, cidCMap, resourcesOnPages = false))
    assert(got.exists(t => t.contains("Hello") && t.contains("plain")), s"got $got")
  }

  test("pdf: flate bomb is a governed None, not an OOM") {
    // ~256 KiB of zeros compresses to ~300 bytes; claim it's a content
    // stream and shrink the cap path by a direct call through pdfToText on
    // a crafted PDF whose stream inflates far past any text payload.
    // (The real 64 MiB cap is exercised with a 128 MiB expansion — still
    // only ~128 KiB compressed, so the fixture stays tiny.)
    val big = new Array[Byte](128 * 1024 * 1024) // inflates past MaxInflatedBytes
    val z = deflate(big)
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w(s"1 0 obj << /Length ${z.length} /Filter /FlateDecode >> stream\n")
    out.write(z)
    w("\nendstream endobj\n%%EOF\n")
    assert(DocParse.pdfToText(out.toByteArray).isEmpty)
  }

  test("epub: oversized entry (zip bomb) is a governed None") {
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    zip.putNextEntry(new ZipEntry("OEBPS/bomb.xhtml"))
    val chunk = new Array[Byte](1 * 1024 * 1024)
    java.util.Arrays.fill(chunk, 'a'.toByte)
    (0 until 70).foreach(_ => zip.write(chunk)) // 70 MiB of 'a' > 64 MiB cap
    zip.closeEntry()
    zip.close()
    assert(DocParse.epubToText(bos.toByteArray).isEmpty)
  }

  test("epub: archive-order xhtml extraction strips markup") {
    val epub = epubBytes(Seq("First chapter text.", "Second &amp; final.",
      "double-encoded &amp;lt;tag&amp;gt; stays literal"))
    val got = DocParse.epubToText(epub).get
    assert(got.contains("First chapter text."))
    assert(got.contains("Second & final."))
    // &amp; decodes LAST: "&amp;lt;" -> literal "&lt;", never "<"
    assert(got.contains("double-encoded &lt;tag&gt; stays literal"))
    assert(!got.contains("color:red"), "style subtree must be stripped")
    assert(got.indexOf("First") < got.indexOf("Second"))
    assert(DocParse.epubToText("junk".getBytes).isEmpty)
  }

  test("epub: OPF spine order wins over archive order; spine-less docs append") {
    val got = DocParse.epubToText(epubSpineFixture()).get
    assert(got.contains("FIRST in spine.") && got.contains("SECOND in spine."))
    assert(got.indexOf("FIRST in spine.") < got.indexOf("SECOND in spine."),
      s"spine order must override archive order; got:\n$got")
    // nav.xhtml is manifest-only: its text survives, after the spine docs
    assert(got.indexOf("SECOND in spine.") < got.indexOf("nav landmarks text"))
  }

  test("pdf: Type0 Identity-H without /ToUnicode honors CID = code") {
    // 2-byte codes decode as their own code points (<0000> = .notdef
    // drops); the old behavior was Latin-1 byte pairs — "Hi" would have
    // come out as " H i"
    val content = "BT /F1 12 Tf <00480069002000430049004400210000> Tj ET"
    val got = DocParse.pdfToText(
      pdfCidBytes(content, cidCMap, resourcesOnPages = false, withToUnicode = false))
    assert(got.contains("Hi CID!"), s"got $got")
  }

  test("pdf: subset-embedded Identity-H without /ToUnicode drops codes, no mojibake") {
    // the descendant CIDFontType2 carries /FontFile2: its CIDs are glyph
    // indices of the subset, so emitting code-as-char would inject
    // garbage — the codes must be consumed (2 bytes each) and dropped
    val content = "BT /F1 12 Tf <00480069002000430049004400210000> Tj ET"
    val got = DocParse.pdfToText(pdfCidBytes(
      content, cidCMap, resourcesOnPages = false,
      withToUnicode = false, embeddedSubset = true))
    assert(!got.contains("Hi CID!"), s"glyph indices leaked as text: $got")
    assert(!got.contains("Hi"), s"got $got")
  }

  /** Minimal DOCX: zip with word/document.xml in WordprocessingML. */
  private def docxBytes(paragraphs: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("[Content_Types].xml"))
    z.write("<Types/>".getBytes(StandardCharsets.UTF_8))
    z.closeEntry()
    z.putNextEntry(new ZipEntry("word/document.xml"))
    val body = paragraphs.map(p =>
      s"""<w:p><w:r><w:t>$p</w:t></w:r></w:p>""").mkString
    z.write(
      s"""<?xml version="1.0"?><w:document><w:body>$body</w:body></w:document>"""
        .getBytes(StandardCharsets.UTF_8))
    z.closeEntry()
    z.close()
    bos.toByteArray
  }

  test("docx: WordprocessingML paragraphs extract in order") {
    val docx = docxBytes(Seq("First paragraph here.", "Second &amp; final."))
    val got = DocParse.docxToText(docx).get
    assert(got.contains("First paragraph here."))
    assert(got.contains("Second & final."))
    assert(got.indexOf("First") < got.indexOf("Second"))
    // paragraphs separated by a newline, tags gone
    assert(!got.contains("<w:"))
    // a zip without word/document.xml (e.g. an EPUB) is None
    assert(DocParse.docxToText(epubBytes(Seq("not a docx"))).isEmpty)
    assert(DocParse.docxToText("junk".getBytes).isEmpty)
  }

  test("markdown: formatting strips, content and link text survive") {
    val md =
      """# Title
        |Some *emphasis* and **bold** plus `code`.
        |
        |- bullet one
        |1. ordered item
        |> quoted line
        |A [link text](https://example.com) and ![alt text](img.png).
        |```scala
        |val kept = "code body stays"
        |```
        |""".stripMargin
    val got = DocParse.markdownToText(md)
    assert(got.contains("Title") && !got.contains("# Title"))
    assert(got.contains("Some emphasis and bold plus code."))
    assert(got.contains("bullet one") && !got.contains("- bullet"))
    assert(got.contains("ordered item") && !got.contains("1. ordered"))
    assert(got.contains("quoted line") && !got.contains("> quoted"))
    assert(got.contains("A link text and alt text."))
    assert(!got.contains("https://example.com"))
    assert(got.contains("val kept = \"code body stays\""))
    assert(!got.contains("```"))
  }

  test("csv: rows render as comma-joined lines; quoting honored") {
    val csv = "name,role\n\"Smith, Jo\",admin\n\"multi\nline\",\"with \"\"quotes\"\"\"\n"
    val got = DocParse.csvToText(csv)
    val lines = got.split("\n")
    assert(lines(0) == "name, role")
    assert(lines(1) == "Smith, Jo, admin")
    // quoted newline stays inside the field
    assert(got.contains("multi\nline, with \"quotes\""))
  }

  test("xml: CDATA content survives the tag strip; entities amp-last; PIs dropped") {
    val xml =
      """<?xml version="1.0"?><!DOCTYPE note><root>
        |<title>Hello &amp;lt; World</title>
        |<!-- a comment -->
        |<body><![CDATA[kept <raw> & verbatim]]></body>
        |<a href="x">link &lt;text&gt;</a>
        |</root>""".stripMargin
    val got = DocParse.xmlToText(xml)
    assert(got.contains("Hello &lt; World"), "amp decodes LAST: &amp;lt; -> &lt;")
    assert(got.contains("kept <raw> & verbatim"), "CDATA content must survive")
    assert(got.contains("link <text>"))
    assert(!got.contains("<?xml") && !got.contains("a comment") && !got.contains("DOCTYPE"))
  }

  test("rtf: control words consumed, destinations skipped, escapes decode; fail-closed") {
    val rtf = """{\rtf1\ansi{\fonttbl{\f0 Calibri;}}{\*\generator Riched20;}
                |{\colortbl ;\red0\green0\blue255;}
                |\f0\fs22 Hello \b bold\b0  world\par
                |Second \'e9 line\tab tabbed \{lit\} 100\% done\par}""".stripMargin
    val got = DocParse.rtfToText(rtf)
    assert(got.isDefined)
    val t = got.get
    assert(t.contains("Hello bold world"))
    assert(t.contains("Second é line\ttabbed {lit}"))
    assert(!t.contains("Calibri") && !t.contains("Riched20") && !t.contains("red0"),
      "font/color/starred destination groups carry no document text")
    assert(t.split("\n").length >= 2, "\\par breaks lines")
    assert(DocParse.rtfToText("plain text, not rtf").isEmpty, "fail-closed")
    assert(DocParse.rtfToText("{\\rtf1{\\fonttbl{\\f0 X;}}}").isEmpty,
      "markup-only file yields nothing")
  }

  test("loaders: xml/rtf route through loadDirectoryAuto; bad rtf fails governed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docparse3")
    java.nio.file.Files.writeString(dir.resolve("a.xml"),
      "<doc><p>from xml file</p></doc>")
    java.nio.file.Files.writeString(dir.resolve("b.rtf"),
      "{\\rtf1\\ansi from rtf file\\par}")
    val contents = Loaders.loadDirectoryAuto(spark, dir)
      .collect().map(_.getString(0)).toSet
    assert(contents.exists(_.contains("from xml file")))
    assert(contents.exists(_.contains("from rtf file")))
    val bad = java.nio.file.Files.createTempDirectory("graft-docparse4")
    java.nio.file.Files.writeString(bad.resolve("x.rtf"), "not rtf at all")
    val e = intercept[graft.model.GraftException] {
      Loaders.loadDirectoryAuto(spark, bad).collect()
    }
    assert(e.code == graft.model.ErrorCodes.DocumentParseUnsupported)
  }

  test("loaders: md/csv/ipynb/docx route through loadDirectoryAuto") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docparse2")
    java.nio.file.Files.writeString(dir.resolve("a.md"), "# H\nfrom *markdown* file")
    java.nio.file.Files.writeString(dir.resolve("b.csv"), "x,y\n1,2\n")
    java.nio.file.Files.writeString(dir.resolve("c.ipynb"),
      """{"cells":[{"cell_type":"markdown","source":["from ","notebook"]},
        |{"cell_type":"code","source":["print(1)"]}]}""".stripMargin)
    java.nio.file.Files.writeString(dir.resolve("d.ipynb"),
      """{"cells":[{"cell_type":"code","source":"string source form"}]}""")
    java.nio.file.Files.write(dir.resolve("e.docx"), docxBytes(Seq("from docx")))
    val contents = Loaders.loadDirectoryAuto(spark, dir)
      .collect().map(_.getString(0)).toSet
    assert(contents.exists(_.contains("from markdown file")))
    assert(contents.exists(c => c.contains("x, y") && c.contains("1, 2")))
    assert(contents.exists(_.contains("from notebook")))
    assert(contents.exists(_.contains("print(1)")))
    assert(contents.exists(_.contains("string source form")))
    assert(contents.exists(_.contains("from docx")))
  }

  test("loaders: pdf/epub route through extraction; undecodable pdf fails governed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docparse")
    java.nio.file.Files.write(dir.resolve("a.pdf"),
      pdfBytes("BT (from pdf) Tj ET", flate = false))
    java.nio.file.Files.write(dir.resolve("b.epub"), epubBytes(Seq("from epub")))
    java.nio.file.Files.writeString(dir.resolve("c.txt"), "from text")
    val df = Loaders.loadDirectoryAuto(spark, dir)
    val contents = df.collect().map(_.getString(0)).toSet
    assert(contents.exists(_.contains("from pdf")))
    assert(contents.exists(_.contains("from epub")))
    assert(contents.exists(_.contains("from text")))
    // an image-only (no text operator) pdf fails the batch, governed
    java.nio.file.Files.write(dir.resolve("scan.pdf"),
      pdfBytes("q /Im0 Do Q", flate = false))
    val ex = intercept[GraftException](
      Loaders.loadPdfFiles(spark, Seq(dir.resolve("scan.pdf"))).collect())
    assert(ex.code == ErrorCodes.DocumentParseUnsupported)
  }
}
