package graft.ingest

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** PDF standard security handler (PDF 32000-1 §7.6): decrypt strings and
  * streams of encrypted documents that are openable WITHOUT a password —
  * i.e. the ubiquitous "owner-password-only" files (print/copy restrictions)
  * whose user password is empty. The reference reaches these through pypdf's
  * `decrypt("")` path (pyproject.toml:8); this is the pure-JVM equivalent,
  * built only on JDK crypto (MD5/SHA-2 via MessageDigest, AES-CBC via
  * javax.crypto, RC4 implemented inline — the JDK's RC4 cipher is not
  * guaranteed present).
  *
  * Supported revisions:
  *  - R2 (V1, RC4-40) and R3 (V2, RC4-128): Algorithm 2 file key
  *    (MD5 over padded password + /O + /P + /ID, 50× rehash for R3),
  *    Algorithm 4/5 /U validation, per-object RC4 keys.
  *  - R4 (V4): crypt filters — /CFM /V2 (RC4) or /AESV2 (AES-128-CBC,
  *    leading 16-byte IV, PKCS#7 padding); /EncryptMetadata honored in the
  *    key hash; /Identity stream filter passes through.
  *  - R5 (deprecated Adobe extension) and R6 (V5, PDF 2.0, AES-256):
  *    SHA-256 validation (R5) or the hardened Algorithm 2.B hash chain
  *    (R6), file key unwrapped from /UE with AES-256-CBC-NoPad.
  *
  * A non-empty user password fails validation → [[fromEncrypt]] returns
  * None and the caller surfaces the governed parse error (the document is
  * genuinely locked; guessing passwords is not this engine's job).
  */
object PdfCrypt {

  /** The 32-byte padding string of Algorithm 2 (PDF 32000-1 Table 21 note). */
  private[graft] val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  // ------------------------------------------------------------ primitives

  private def digest(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }
  private[graft] def md5(parts: Array[Byte]*): Array[Byte] = digest("MD5", parts: _*)
  private[graft] def sha256(parts: Array[Byte]*): Array[Byte] = digest("SHA-256", parts: _*)
  private def sha384(parts: Array[Byte]*): Array[Byte] = digest("SHA-384", parts: _*)
  private def sha512(parts: Array[Byte]*): Array[Byte] = digest("SHA-512", parts: _*)

  /** RC4 stream cipher (symmetric: encrypt == decrypt). */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def aes(mode: Int, key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  private[graft] def aesEncryptNoPad(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] =
    aes(Cipher.ENCRYPT_MODE, key, iv, data)

  private[graft] def aesDecryptNoPad(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] =
    aes(Cipher.DECRYPT_MODE, key, iv, data)

  /** AES-CBC payload as PDF stores it: 16-byte IV prefix, PKCS#7 padding.
    * Returns None on malformed length/padding (treated as governed failure).
    */
  private[graft] def aesDecryptPdf(key: Array[Byte], data: Array[Byte]): Option[Array[Byte]] = {
    if (data.length < 32 || (data.length - 16) % 16 != 0) return None
    val plain = aesDecryptNoPad(key, data.take(16), data.drop(16))
    val pad = plain.last & 0xff
    if (pad < 1 || pad > 16 || pad > plain.length) None
    else Some(plain.dropRight(pad))
  }

  /** AES-CBC encrypt in PDF layout (IV prefix + PKCS#7) — used by fixture
    * builders and any future write path; deterministic IV is the CALLER's
    * choice (tests pass a fixed one).
    */
  private[graft] def aesEncryptPdf(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val padLen = 16 - (data.length % 16)
    val padded = data ++ Array.fill(padLen)(padLen.toByte)
    iv ++ aesEncryptNoPad(key, iv, padded)
  }

  private def leInt(v: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * i)) & 0xff).toByte)

  private def pad32(pwd: Array[Byte]): Array[Byte] = (pwd ++ Pad).take(32)

  // ------------------------------------------ R2–R4 key derivation (Alg 2)

  /** Algorithm 2: the file encryption key for R ≤ 4. `n` = key bytes. */
  private[graft] def fileKeyR4(pwd: Array[Byte], o: Array[Byte], p: Int,
      id0: Array[Byte], r: Int, n: Int, encryptMetadata: Boolean): Array[Byte] = {
    val metaTail =
      if (r >= 4 && !encryptMetadata) Array(0xff, 0xff, 0xff, 0xff).map(_.toByte)
      else Array.empty[Byte]
    var key = md5(pad32(pwd), o.take(32), leInt(p, 4), id0, metaTail)
    if (r >= 3) (0 until 50).foreach(_ => key = md5(key.take(n)))
    key.take(n)
  }

  /** Algorithm 3: the /O value (used by fixture builders; an empty owner
    * password falls back to the user password per spec).
    */
  private[graft] def computeO(ownerPwd: Array[Byte], userPwd: Array[Byte], r: Int, n: Int): Array[Byte] = {
    var h = md5(pad32(if (ownerPwd.nonEmpty) ownerPwd else userPwd))
    if (r >= 3) (0 until 50).foreach(_ => h = md5(h))
    val rc4Key = h.take(n)
    var o = rc4(rc4Key, pad32(userPwd))
    if (r >= 3) (1 to 19).foreach { i =>
      o = rc4(rc4Key.map(b => (b ^ i).toByte), o)
    }
    o
  }

  /** Algorithm 4 (R2) / Algorithm 5 (R3+): the /U value from the file key. */
  private[graft] def computeU(fileKey: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(fileKey, Pad)
    else {
      var u = rc4(fileKey, md5(Pad, id0))
      (1 to 19).foreach(i => u = rc4(fileKey.map(b => (b ^ i).toByte), u))
      u ++ new Array[Byte](16) // arbitrary 16-byte tail per spec
    }

  // --------------------------------------------- R5/R6 (AES-256) machinery

  /** Algorithm 2.B (R6): the hardened password hash. `udata` is empty for
    * user-password computations. Mirrors the spec's post-round-64
    * stop rule: after round `count`, stop once count ≥ 64 and the last
    * byte of E ≤ count − 32.
    */
  private[graft] def hash2B(pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
    var k = sha256(pwd, salt, udata)
    var count = 0
    var done = false
    while (!done) {
      count += 1
      val k1 = pwd ++ k ++ udata
      val rep = new Array[Byte](k1.length * 64)
      (0 until 64).foreach(i => System.arraycopy(k1, 0, rep, i * k1.length, k1.length))
      val e = aesEncryptNoPad(k.take(16), k.slice(16, 32), rep)
      val mod = e.take(16).map(_ & 0xff).sum % 3
      k = mod match {
        case 0 => sha256(e)
        case 1 => sha384(e)
        case _ => sha512(e)
      }
      if (count >= 64 && (e.last & 0xff) <= count - 32) done = true
    }
    k.take(32)
  }

  /** R5/R6 user-password hash over the validation salt (U[32..39]). */
  private[graft] def userHashV5(pwd: Array[Byte], vSalt: Array[Byte], r: Int): Array[Byte] =
    if (r == 5) sha256(pwd, vSalt) else hash2B(pwd, vSalt, Array.empty)

  /** R5/R6 intermediate key over the key salt (U[40..47]) — decrypts /UE. */
  private[graft] def intermediateKeyV5(pwd: Array[Byte], kSalt: Array[Byte], r: Int): Array[Byte] =
    if (r == 5) sha256(pwd, kSalt) else hash2B(pwd, kSalt, Array.empty)

  // ------------------------------------------------------------- decryptor

  /** Per-document decryptor: `aesStreams` selects RC4 vs AES-CBC for
    * stream/string payloads; V5 uses the file key directly (no per-object
    * derivation, §7.6.2 note 3). `identityStreams` = V4 /StmF /Identity:
    * streams are NOT encrypted and pass through unchanged.
    */
  final case class Decryptor(fileKey: Array[Byte], v: Int, aesStreams: Boolean,
      identityStreams: Boolean = false) {

    private def objectKey(num: Int, gen: Int): Array[Byte] = {
      if (v >= 5) return fileKey
      val salt =
        if (aesStreams) Array(0x73, 0x41, 0x6C, 0x54).map(_.toByte) // "sAlT"
        else Array.empty[Byte]
      md5(fileKey, leInt(num, 3), leInt(gen, 2), salt)
        .take(math.min(fileKey.length + 5, 16))
    }

    /** Decrypt a stream (or string) payload belonging to object num/gen.
      * Returns None when an AES payload is malformed (wrong length/padding)
      * — the governed-failure signal.
      */
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Option[Array[Byte]] = {
      if (identityStreams) return Some(data)
      val key = objectKey(num, gen)
      if (aesStreams) aesDecryptPdf(key, data)
      else Some(rc4(key, data))
    }

    /** Encrypt (fixture builders / write path): inverse of [[decrypt]]. */
    private[graft] def encrypt(num: Int, gen: Int, iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val key = objectKey(num, gen)
      if (aesStreams) aesEncryptPdf(key, iv, data) else rc4(key, data)
    }
  }

  // ----------------------------------------------------- dict → decryptor

  private def intVal(dict: String, key: String): Option[Int] =
    (java.util.regex.Pattern.quote(key) + """\s+(-?\d+)""").r
      .findFirstMatchIn(dict).map(_.group(1).toInt)

  /** A PDF string value after `key`: hex `<...>` or literal `(...)` with
    * escapes — returned as raw bytes (Latin-1-faithful).
    */
  private[graft] def stringVal(dict: String, key: String): Option[Array[Byte]] = {
    val kq = java.util.regex.Pattern.quote(key)
    (kq + """\s*[<(]""").r.findFirstMatchIn(dict)
      .flatMap(m => firstString(dict.substring(m.end - 1)))
  }

  /** The first PDF string (hex or literal) at/after the start of `s`. */
  private[graft] def firstString(s: String): Option[Array[Byte]] = {
    var i = 0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length) None
    else if (s.charAt(i) == '<') {
      val end = s.indexOf('>', i)
      if (end < 0) None
      else {
        val hex = s.substring(i + 1, end).filterNot(_.isWhitespace)
        if (!hex.forall(c => c.isDigit || ('a' <= c.toLower && c.toLower <= 'f'))) None
        else {
          val padded = if (hex.length % 2 == 1) hex + "0" else hex
          Some(padded.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
        }
      }
    }
    else if (s.charAt(i) == '(') Some(decodeLiteral(s, i))
    else None
  }

  /** PDF literal string starting at `(` → raw bytes (same escape rules as
    * DocParse.literalString, byte-level).
    */
  private def decodeLiteral(s: String, start: Int): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    var depth = 0
    var i = start
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => out += '\n'.toByte; case 'r' => out += '\r'.toByte
            case 't' => out += '\t'.toByte; case 'b' => out += '\b'.toByte
            case 'f' => out += '\f'.toByte
            case '(' => out += '('.toByte; case ')' => out += ')'.toByte
            case '\\' => out += '\\'.toByte
            case d if d.isDigit =>
              val digits = s.substring(i + 1, math.min(i + 4, s.length)).takeWhile(_.isDigit).take(3)
              out += Integer.parseInt(digits, 8).toByte
              i += digits.length - 1
            case '\n' => ()
            case other => out += other.toByte
          }
          i += 2
        case '(' =>
          depth += 1
          if (depth > 1) out += '('.toByte
          i += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return out.toArray
          out += ')'.toByte
          i += 1
        case c => out += (c & 0xff).toByte; i += 1
      }
    }
    out.toArray
  }

  /** Build a [[Decryptor]] from the /Encrypt dictionary and the file /ID
    * first element, trying the EMPTY user password. None = unsupported
    * filter/revision OR a real (non-empty) user password — both surface as
    * the governed parse error.
    */
  def fromEncrypt(encDict: String, id0: Array[Byte]): Option[Decryptor] = {
    if (!encDict.contains("/Standard")) return None // custom handlers out of scope
    val v = intVal(encDict, "/V").getOrElse(0)
    val r = intVal(encDict, "/R").getOrElse(if (v == 1) 2 else 3)
    val o = stringVal(encDict, "/O").getOrElse(return None)
    val u = stringVal(encDict, "/U").getOrElse(return None)
    val empty = Array.empty[Byte]
    if (v == 5 || r >= 5) {
      // AES-256: validate empty user password, unwrap the file key from /UE
      if (u.length < 48) return None
      val vSalt = u.slice(32, 40)
      val kSalt = u.slice(40, 48)
      if (!java.util.Arrays.equals(userHashV5(empty, vSalt, r), u.take(32))) return None
      val ue = stringVal(encDict, "/UE").getOrElse(return None)
      if (ue.length < 32) return None
      val fileKey = aesDecryptNoPad(intermediateKeyV5(empty, kSalt, r), new Array[Byte](16), ue.take(32))
      Some(Decryptor(fileKey, v, aesStreams = true))
    } else {
      val p = intVal(encDict, "/P").getOrElse(-1)
      val encryptMetadata = !encDict.contains("/EncryptMetadata false")
      // AESV2 crypt filter (V4) vs plain RC4 (V1/V2, or V4 /CFM /V2)
      val aesStreams = v == 4 && encDict.contains("/AESV2")
      val identity = v == 4 && """/StmF\s*/Identity""".r.findFirstIn(encDict).isDefined
      val n =
        if (v == 1) 5
        else intVal(encDict, "/Length") match {
          case Some(bits) if bits >= 40 => bits / 8
          case Some(bytes) if bytes >= 5 => bytes // /CF /Length is in bytes
          case _ => if (v == 4) 16 else 5
        }
      val key = fileKeyR4(empty, o, p, id0, r, n, encryptMetadata)
      val uCheck = computeU(key, id0, r)
      val ok =
        if (r == 2) java.util.Arrays.equals(uCheck, u.take(32))
        else java.util.Arrays.equals(uCheck.take(16), u.take(16))
      if (!ok) None
      else Some(Decryptor(key, v, aesStreams, identityStreams = identity))
    }
  }
}
