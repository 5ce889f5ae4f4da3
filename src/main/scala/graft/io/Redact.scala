package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StringType, StructType}

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

  /** Redact string content anywhere inside a column's type: plain strings,
    * array<string> elements (e.g. edges.evidence sentences), struct fields,
    * and map keys/values, recursively. Fields whose NAME contains a
    * sensitive key are fully masked at any depth; map entries whose KEY
    * contains a sensitive key get their value masked (sanitize_dict over a
    * dynamic dict). Non-string leaves pass through.
    */
  def redactColumn(c: Column, dt: DataType, name: String = ""): Column = {
    val lower = name.toLowerCase
    if (sensitiveKeys.exists(lower.contains)) dt match {
      case StringType => lit("[REDACTED]")
      case _ => lit(null).cast(dt) // non-string sensitive field: drop value
    } else dt match {
      case StringType => redact(c)
      case ArrayType(et, _) => transform(c, x => redactColumn(x, et))
      case st: StructType =>
        // rebuild field-wise; guard null structs (struct() of nulls != null)
        val rebuilt = struct(st.fields.toSeq.map(f =>
          redactColumn(c.getField(f.name), f.dataType, f.name).as(f.name)): _*)
        when(c.isNull, lit(null).cast(st)).otherwise(rebuilt)
      case MapType(kt, vt, _) =>
        // dynamic dict: a string KEY naming a sensitive field masks its
        // value (sanitize_dict); other values recurse. Keys themselves are
        // left as-is — they are identifiers, and rewriting them could
        // collide two entries into a duplicate-key runtime error.
        (kt, vt) match {
          case (StringType, StringType) =>
            transform_values(c, (k, v) =>
              when(sensitiveKeys.map(s => org.apache.spark.sql.functions.lower(k).contains(s)).reduce(_ || _),
                lit("[REDACTED]")).otherwise(redact(v)))
          case (StringType, _) =>
            transform_values(c, (k, v) =>
              when(sensitiveKeys.map(s => org.apache.spark.sql.functions.lower(k).contains(s)).reduce(_ || _),
                lit(null).cast(vt)).otherwise(redactColumn(v, vt)))
          case _ => transform_values(c, (_, v) => redactColumn(v, vt))
        }
      case _ => c
    }
  }

  /** F12 over a frame: string content redacted recursively (strings,
    * array<string>, struct fields); columns whose NAME contains a sensitive
    * key fully masked (the reference's sanitize_dict semantics).
    */
  def redactFrame(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      redactColumn(col(f.name), f.dataType, f.name).as(f.name)
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
