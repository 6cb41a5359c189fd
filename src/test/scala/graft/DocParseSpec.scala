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

  test("epub: archive-order xhtml extraction strips markup") {
    val epub = epubBytes(Seq("First chapter text.", "Second &amp; final."))
    val got = DocParse.epubToText(epub).get
    assert(got.contains("First chapter text."))
    assert(got.contains("Second & final."))
    assert(!got.contains("color:red"), "style subtree must be stripped")
    assert(got.indexOf("First") < got.indexOf("Second"))
    assert(DocParse.epubToText("junk".getBytes).isEmpty)
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
