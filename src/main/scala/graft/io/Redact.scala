package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** F12 sensitive-data redaction + F13 key sanitization
  * (graph_extraction_agent.py:245-285, 705-712). The reference sanitizes at
  * its logging/S3 boundary; the Spark analog is the export surface — string
  * columns pass through a regexp_replace chain (whole-stage codegen'd, no
  * UDF) and output path components are sanitized before use.
  */
object Redact {

  /** The reference's SENSITIVE_PATTERNS (F12), applied case-insensitively
    * in order: email, SSN, credit card, credential assignments.
    */
  val patterns: Seq[String] = Seq(
    "\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}\\b",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "\\b\\d{4}[\\s-]?\\d{4}[\\s-]?\\d{4}[\\s-]?\\d{4}\\b",
    "\\b(?:password|pwd|secret|key|token)[\\s=:]+\\S+\\b")

  /** Column names that are fully masked (sanitize_dict's sensitive_keys). */
  val sensitiveKeys: Seq[String] =
    Seq("password", "secret", "key", "token", "credential", "auth")

  /** Redact one string column — a fold of codegen'd regexp_replace calls. */
  def redact(c: Column): Column =
    patterns.foldLeft(c)((acc, p) => regexp_replace(acc, "(?i)" + p, "[REDACTED]"))

  /** Scala-side twin for driver-side strings (log/summary hygiene). */
  def redactString(s: String): String =
    patterns.foldLeft(s)((acc, p) =>
      java.util.regex.Pattern.compile(p, java.util.regex.Pattern.CASE_INSENSITIVE)
        .matcher(acc).replaceAll("[REDACTED]"))

  /** F12 over a frame: string columns redacted; columns whose NAME contains
    * a sensitive key fully masked (the reference's sanitize_dict semantics).
    */
  def redactFrame(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      val lower = f.name.toLowerCase
      if (sensitiveKeys.exists(lower.contains)) lit("[REDACTED]").as(f.name)
      else if (f.dataType == StringType) redact(col(f.name)).as(f.name)
      else col(f.name)
    }.toSeq: _*)

  /** F13 — sanitize a path/key component exactly like the reference:
    * non [a-zA-Z0-9-_.] → '_', strip leading/trailing '_', cap at 50 chars,
    * 'unknown' when empty.
    */
  def sanitizeKeyComponent(component: String): String = {
    val replaced = component.replaceAll("[^a-zA-Z0-9\\-_.]", "_")
    val stripped = replaced.dropWhile(_ == '_').reverse.dropWhile(_ == '_').reverse
    val capped = stripped.take(50)
    if (capped.isEmpty) "unknown" else capped
  }
}
