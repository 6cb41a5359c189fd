package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / path sanitization column functions.
  *
  * Reproduces the locally-defined behaviors of the reference's sanitizer
  * (the external PiiSanitizer dependency is out of reproducible scope —
  * SURVEY §7.4):
  *
  *  - local-path redaction: `_LOCAL_PATH` regex -> "[REDACTED_PATH]"
  *    (reference: vector_mcp/vector_api.py:44-46, applied at :284-285);
  *  - private metadata keys dropped when matching
  *    `(?:^|_)(file|filename|filepath|path|directory|dirname|uri|url|source)(?:$|_)`
  *    case-insensitively (vector_api.py:40-43, applied :287-293);
  *  - applied to content, metadata keys/values, queries, and results on the
  *    way out (vector_api.py:368-386, :496, :516, :548, :566).
  *
  * All are codegen'd column expressions (regexp_replace / map_filter) — a
  * sanitize pass over 100 TB is one scan, no UDF.
  */
object Sanitize {

  /** Byte-identical port of _LOCAL_PATH (vector_api.py:44-46): windows
    * drive paths, unix multi-segment paths, UNC shares; preceded by
    * neither word-char nor ':'. Java regex supports the lookbehind as-is.
    */
  val LocalPathRegex: String =
    """(?<![\w:])(?:[A-Za-z]:[\\/][^\s<>"']+|/(?:[^/\s]+/)+[^\s<>"']*|\\\\[^\s\\]+\\[^\s]+)"""

  val Redacted = "[REDACTED_PATH]"

  /** Private-origin metadata key pattern (vector_api.py:40-43). */
  val PrivateMetadataRegex: String =
    "(?i)(?:^|_)(?:file|filename|filepath|path|directory|dirname|uri|url|source)(?:$|_)"

  /** Redact local filesystem paths in a string column. */
  def redactPaths(c: Column): Column =
    regexp_replace(c, LocalPathRegex, Redacted)

  /** Minimal PII entity pass — the reproducible slice of the reference's
    * external PiiSanitizer (vector_api.py:33): emails, US SSNs, and
    * NANP-style phone numbers. Patterns are deliberately RE2-safe (no
    * lookaround) so the DuckDB oracle replays them verbatim; conservative
    * by design — a governed false negative beats corrupting non-PII text.
    */
  val EmailRegex: String = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val SsnRegex: String = """\b\d{3}-\d{2}-\d{4}\b"""
  val PhoneRegex: String = """\b(?:\+?1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b"""

  val RedactedEmail = "[REDACTED_EMAIL]"
  val RedactedSsn = "[REDACTED_SSN]"
  val RedactedPhone = "[REDACTED_PHONE]"

  /** Redact PII entities (email -> ssn -> phone, in that order — ssn must
    * run before the phone pass sees its digit runs).
    */
  def redactEntities(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRegex, RedactedEmail),
        SsnRegex, RedactedSsn),
      PhoneRegex, RedactedPhone)

  // ---- extended entity pass (opt-in; beyond the reference's documented
  // slice, for pipelines with stricter PII posture) ----

  /** IPv4 literals, octet-range-exact (0-255 each) — RE2-safe. */
  val Ipv4Regex: String =
    """\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b"""

  /** Payment-card candidates: 13-19 digits with optional single space/dash
    * separators. Candidates only — a match redacts iff it passes the Luhn
    * check ([[luhnValid]]), so order numbers and timestamps survive.
    */
  val CcCandidateRegex: String = """\b\d(?:[ -]?\d){12,18}\b"""

  val RedactedIp = "[REDACTED_IP]"
  val RedactedCc = "[REDACTED_CC]"

  /** Redact IPv4 literals. */
  def redactIps(c: Column): Column =
    regexp_replace(c, Ipv4Regex, RedactedIp)

  /** Luhn check over a digits-only string column (ISO/IEC 7812): from the
    * rightmost digit, double every second one (subtracting 9 on overflow);
    * valid iff the sum is a multiple of 10 and the length is a plausible
    * PAN length (13-19). Pure higher-order-function arithmetic — stays in
    * codegen, and the DuckDB oracle replays the same fold.
    */
  def luhnValid(digits: Column): Column = {
    val chars = reverse(filter(split(digits, ""), ch => ch.between("0", "9")))
    val idx = sequence(lit(1), size(chars))
    val contrib = zip_with(chars, idx, (ch, i) => {
      val v = ascii(ch) - lit(48)
      when(i % 2 === 0, when(v * 2 > 9, v * 2 - 9).otherwise(v * 2)).otherwise(v)
    })
    size(chars).between(13, 19) &&
      aggregate(contrib, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** Redact Luhn-valid payment-card numbers. regexp_replace cannot
    * conditionally validate, so: extract candidates, Luhn-filter, fold the
    * survivors through replace(). Candidate lists are per-row tiny; the
    * whole pass is one codegen'd projection, no UDF.
    */
  def redactCreditCards(c: Column): Column = {
    val cands = regexp_extract_all(c, lit(CcCandidateRegex), lit(0))
    val valid = filter(cands, m => luhnValid(regexp_replace(m, "[^0-9]", "")))
    aggregate(valid, c, (acc, m) => replace(acc, m, lit(RedactedCc)))
  }

  /** Extended sanitize chain: payment cards, then IPs, then the standard
    * always-on pass. Cards redact FIRST — a spaced PAN's digit groups must
    * not be chewed into a phone-shaped fragment by the entity pass.
    */
  def sanitizeTextExtended(c: Column): Column =
    sanitizeText(redactIps(redactCreditCards(c)))

  /** Sanitize a text column — the engine's ALWAYS-ON default, matching the
    * reference's main path where every content/metadata/query/result string
    * passes the PII sanitizer (vector_api.py:284-301, :368-386): entity
    * redaction THEN path redaction (an email's domain must not first be
    * chewed by the path regex).
    */
  def sanitizeText(c: Column): Column = redactPaths(redactEntities(c))

  /** Alias of [[sanitizeText]] (the full chain became the default in r6;
    * kept for callers/specs that name the full pass explicitly).
    */
  def sanitizeTextFull(c: Column): Column = sanitizeText(c)

  /** Sanitize a MAP<STRING,STRING> metadata column: drop private keys,
    * sanitize surviving keys and values (vector_api.py:287-298).
    */
  def sanitizeMetadata(m: Column): Column =
    transform_values(
      transform_keys(
        map_filter(m, (k, _) => !k.rlike(PrivateMetadataRegex)),
        (k, _) => sanitizeText(k)),
      (_, v) => sanitizeText(v))

  /** Driver-side mirror of [[sanitizeText]] for query strings
    * (vector_api.py:548) — same entity-then-path order.
    */
  def sanitizeString(s: String): String =
    s.replaceAll(EmailRegex, java.util.regex.Matcher.quoteReplacement(RedactedEmail))
      .replaceAll(SsnRegex, java.util.regex.Matcher.quoteReplacement(RedactedSsn))
      .replaceAll(PhoneRegex, java.util.regex.Matcher.quoteReplacement(RedactedPhone))
      .replaceAll(LocalPathRegex, java.util.regex.Matcher.quoteReplacement(Redacted))
}
