package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater
import graft.ingest.{DocParse, PdfCrypt}

/** Encrypted-PDF extraction: fixtures are REAL encrypted files — the
  * builders derive /O //U per the spec's algorithms and encrypt each
  * stream with its per-object key, so extraction only succeeds if the
  * standard-security-handler key derivation, /U validation, and per-object
  * RC4/AES decryption are all correct. Covers RC4-40 (R2), RC4-128 (R3),
  * AES-128 crypt filters (R4/AESV2, incl. the modern ObjStm + xref-stream
  * layout), AES-256 (R6 hardened hash), password-locked governed failure, and the
  * no-ciphertext-fallback guard.
  */
class PdfCryptSpec extends SparkSpec {

  private val Iso = StandardCharsets.ISO_8859_1
  private val id0: Array[Byte] = Array.tabulate(16)(i => (i * 7 + 3).toByte)
  private val fixedIv: Array[Byte] = Array.tabulate(16)(i => (0x40 + i).toByte)
  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(b); d.finish()
    val buf = new Array[Byte](b.length * 2 + 64)
    val n = d.deflate(buf)
    d.end()
    buf.take(n)
  }

  /** Classic-xref single-page PDF whose content stream (obj 4) is encrypted
    * under the standard security handler with an EMPTY user password (unless
    * `userPwd` is set — then the file is genuinely locked). mode ∈
    * {rc4_40, rc4_128, aes_128}.
    */
  private def encryptedPdf(body: String, mode: String,
      userPwd: Array[Byte] = Array.empty): Array[Byte] = {
    val (v, r, n, aes) = mode match {
      case "rc4_40"  => (1, 2, 5, false)
      case "rc4_128" => (2, 3, 16, false)
      case "aes_128" => (4, 4, 16, true)
    }
    val p = -3904
    val o = PdfCrypt.computeO(Array.empty, userPwd, r, n)
    val key = PdfCrypt.fileKeyR4(userPwd, o, p, id0, r, n, encryptMetadata = true)
    val u = PdfCrypt.computeU(key, id0, r)
    val enc = PdfCrypt.Decryptor(key, v, aes).encrypt(4, 0, fixedIv, body.getBytes(Iso))
    val cf = if (aes) "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF " else ""
    val lenEntry = if (v == 1) "" else s"/Length ${n * 8} "
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(Iso))
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    def obj(num: Int, bodyStr: String): Unit = {
      offsets(num) = out.size(); w(s"$num 0 obj $bodyStr endobj\n")
    }
    w("%PDF-1.6\n")
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    offsets(4) = out.size()
    w(s"4 0 obj << /Length ${enc.length} >> stream\n"); out.write(enc); w("\nendstream endobj\n")
    obj(5, s"<< /Filter /Standard /V $v /R $r $lenEntry$cf/O <${hex(o)}> /U <${hex(u)}> /P $p >>")
    val xrefOff = out.size()
    w("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(num => w(f"${offsets(num)}%010d 00000 n \n"))
    w(s"trailer << /Size 6 /Root 1 0 R /Encrypt 5 0 R /ID [<${hex(id0)}> <${hex(id0)}>] >>\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** AES-256 (V5 R6) fixture: /U carries the 2.B hash + salts, /UE wraps a
    * fixed file key, content stream AES-256-CBC encrypted with it directly
    * (no per-object derivation at V5).
    */
  private def aes256Pdf(body: String, wrongPassword: Boolean = false): Array[Byte] = {
    val fileKey = Array.tabulate(32)(i => (i * 11 + 5).toByte)
    val vSalt = Array.tabulate(8)(i => (i + 1).toByte)
    val kSalt = Array.tabulate(8)(i => (i + 9).toByte)
    val pwd = if (wrongPassword) "secret".getBytes(Iso) else Array.empty[Byte]
    val u = PdfCrypt.hash2B(pwd, vSalt, Array.empty) ++ vSalt ++ kSalt
    val ik = PdfCrypt.intermediateKeyV5(pwd, kSalt, 6)
    val ue = PdfCrypt.aesEncryptNoPad(ik, new Array[Byte](16), fileKey)
    val enc = PdfCrypt.Decryptor(fileKey, 5, aesStreams = true).encrypt(4, 0, fixedIv, body.getBytes(Iso))
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(Iso))
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    def obj(num: Int, bodyStr: String): Unit = {
      offsets(num) = out.size(); w(s"$num 0 obj $bodyStr endobj\n")
    }
    w("%PDF-2.0\n")
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    offsets(4) = out.size()
    w(s"4 0 obj << /Length ${enc.length} >> stream\n"); out.write(enc); w("\nendstream endobj\n")
    obj(5, "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
      "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
      s"/O <${hex(new Array[Byte](48))}> /U <${hex(u)}> /UE <${hex(ue)}> " +
      s"/OE <${hex(new Array[Byte](32))}> /P -3904 >>")
    val xrefOff = out.size()
    w("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(num => w(f"${offsets(num)}%010d 00000 n \n"))
    w(s"trailer << /Size 6 /Root 1 0 R /Encrypt 5 0 R /ID [<${hex(id0)}> <${hex(id0)}>] >>\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** The modern encrypted layout: catalog/pages/page inside an ENCRYPTED
    * /Type/ObjStm, content stream AES-encrypted, cross-reference STREAM
    * (never encrypted, per spec), /Encrypt + /ID in the xref stream dict.
    */
  private def encryptedPdf15(body: String): Array[Byte] = {
    val (v, r, n) = (4, 4, 16)
    val p = -3904
    val o = PdfCrypt.computeO(Array.empty, Array.empty, r, n)
    val key = PdfCrypt.fileKeyR4(Array.empty, o, p, id0, r, n, encryptMetadata = true)
    val u = PdfCrypt.computeU(key, id0, r)
    val dec = PdfCrypt.Decryptor(key, v, aesStreams = true)
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(Iso))
    w("%PDF-1.6\n")
    // obj 4: content stream — deflate, THEN encrypt (spec order)
    val content = dec.encrypt(4, 0, fixedIv, deflate(body.getBytes(Iso)))
    val off4 = out.size()
    w(s"4 0 obj << /Length ${content.length} /Filter /FlateDecode >> stream\n")
    out.write(content); w("\nendstream endobj\n")
    // obj 5: ObjStm with objects 1-3 — deflate, then encrypt with ITS key
    val o1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val o2 = "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    val o3 = "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val header = s"1 0 2 ${o1.length + 1} 3 ${o1.length + o2.length + 2} "
    val stmPayload = dec.encrypt(5, 0, fixedIv,
      deflate((header + o1 + " " + o2 + " " + o3).getBytes(Iso)))
    val off5 = out.size()
    w(s"5 0 obj << /Type /ObjStm /N 3 /First ${header.length} " +
      s"/Length ${stmPayload.length} /Filter /FlateDecode >> stream\n")
    out.write(stmPayload); w("\nendstream endobj\n")
    // obj 7: the encrypt dict (top-level, never in an ObjStm)
    val off7 = out.size()
    w(s"7 0 obj << /Filter /Standard /V $v /R $r /Length ${n * 8} " +
      "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF " +
      s"/O <${hex(o)}> /U <${hex(u)}> /P $p >> endobj\n")
    // obj 6: xref stream — spec forbids encrypting it
    val off6 = out.size()
    val rows = Seq(
      Array(0, 0, 0),
      Array(2, 5, 0), Array(2, 5, 1), Array(2, 5, 2),
      Array(1, off4, 0), Array(1, off5, 0), Array(1, off6, 0), Array(1, off7, 0))
    val table = rows.flatMap(rw => Array(rw(0).toByte, ((rw(1) >> 8) & 0xff).toByte,
      (rw(1) & 0xff).toByte, rw(2).toByte)).toArray
    val tz = deflate(table)
    w(s"6 0 obj << /Type /XRef /Size 8 /W [1 2 1] /Root 1 0 R /Encrypt 7 0 R " +
      s"/ID [<${hex(id0)}> <${hex(id0)}>] " +
      s"/Length ${tz.length} /Filter /FlateDecode >> stream\n")
    out.write(tz); w("\nendstream endobj\n")
    w(s"startxref\n$off6\n%%EOF\n")
    out.toByteArray
  }

  // --------------------------------------------------------------- tests

  test("rc4-40 (R2): empty-user-password file decrypts and extracts") {
    val pdf = encryptedPdf("BT /F1 12 Tf (rc4 forty bit secret) Tj ET", "rc4_40")
    assert(DocParse.pdfToText(pdf).contains("rc4 forty bit secret"))
  }

  test("rc4-128 (R3): empty-user-password file decrypts and extracts") {
    val pdf = encryptedPdf("BT (one twenty eight rc4) Tj ET", "rc4_128")
    assert(DocParse.pdfToText(pdf).contains("one twenty eight rc4"))
  }

  test("aes-128 (R4/AESV2 crypt filter): decrypts and extracts") {
    val pdf = encryptedPdf("BT (aes v2 crypt filter text) Tj ET", "aes_128")
    assert(DocParse.pdfToText(pdf).contains("aes v2 crypt filter text"))
  }

  test("aes-256 (R6 hardened hash): decrypts and extracts") {
    val pdf = aes256Pdf("BT (pdf two aes two five six) Tj ET")
    assert(DocParse.pdfToText(pdf).contains("pdf two aes two five six"))
  }

  test("modern layout: encrypted ObjStm + plain xref stream extracts") {
    val pdf = encryptedPdf15("BT (encrypted objstm layout) Tj ET")
    assert(DocParse.pdfToText(pdf).contains("encrypted objstm layout"))
  }

  test("a REAL user password locks the file: governed None, all revisions") {
    val locked = encryptedPdf("BT (locked) Tj ET", "rc4_128", userPwd = "secret".getBytes(Iso))
    assert(DocParse.pdfToText(locked).isEmpty)
    assert(DocParse.pdfToText(aes256Pdf("BT (locked) Tj ET", wrongPassword = true)).isEmpty)
  }

  test("encrypted file with a damaged xref never linear-scans ciphertext") {
    val pdf = encryptedPdf("BT (no garbage) Tj ET", "rc4_128")
    // corrupt the startxref offset: the xref path dies, and because the
    // trailer names /Encrypt the linear fallback must refuse too
    val raw = new String(pdf, Iso).replaceAll("startxref\n\\d+", "startxref\n999999")
    assert(DocParse.pdfToText(raw.getBytes(Iso)).isEmpty)
  }

  test("malformed encrypt dictionaries fail governed, never throw") {
    val good = encryptedPdf("BT (x) Tj ET", "rc4_128")
    val raw = new String(good, Iso)
    def mutate(f: String => String): Option[String] =
      DocParse.pdfToText(f(raw).getBytes(Iso))
    // truncated /U (16 bytes instead of 32): validation fails -> None
    assert(mutate(s => {
      val m = """/U <([0-9A-F]+)>""".r.findFirstMatchIn(s).get
      s.substring(0, m.start) + s"/U <${m.group(1).take(32)}>" + s.substring(m.end)
    }).isEmpty)
    // missing /O entirely -> None
    assert(mutate(_.replaceAll("""/O <[0-9A-F]+> """, "")).isEmpty)
    // unsupported security handler -> None
    assert(mutate(_.replace("/Filter /Standard", "/Filter /Custom")).isEmpty)
    // corrupted V5 /UE (wrong length) -> None
    val v5 = new String(aes256Pdf("BT (x) Tj ET"), Iso)
    val m = """/UE <([0-9A-F]+)>""".r.findFirstMatchIn(v5).get
    val broken = v5.substring(0, m.start) + s"/UE <${m.group(1).take(16)}>" + v5.substring(m.end)
    assert(DocParse.pdfToText(broken.getBytes(Iso)).isEmpty)
    // sanity: the unmutated files still extract
    assert(DocParse.pdfToText(good).nonEmpty)
  }

  test("round-trip primitives: rc4 is symmetric, aes pdf layout inverts") {
    val key = Array.tabulate(16)(i => (i * 3 + 1).toByte)
    val data = "the quick brown fox".getBytes(Iso)
    assert(PdfCrypt.rc4(key, PdfCrypt.rc4(key, data)).sameElements(data))
    val enc = PdfCrypt.aesEncryptPdf(key, fixedIv, data)
    assert(PdfCrypt.aesDecryptPdf(key, enc).get.sameElements(data))
    // malformed AES payloads (bad length) are governed None
    assert(PdfCrypt.aesDecryptPdf(key, enc.dropRight(3)).isEmpty)
  }
}
