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
