package graft.text

import graft.model.Page

/** HTML→text extraction + front-matter handling (SURVEY §2.1 S1-S3).
  *
  * The reference loads a UTF-8 text file and strips a `---`-delimited JSON
  * front-matter block (interview_processing_agent.py:48-53,
  * enhanced_file_analyzer.py:61-78). Our input is an HTML wrapper around that
  * same file content (BASELINE.json input_hint: html BINARY); the corpus
  * generator embeds the raw file bytes HTML-escaped inside
  * `<pre data-graft="raw">…</pre>`, so extraction = locate the pre block,
  * unescape, then apply the reference's exact front-matter strip.
  *
  * Every function here is a pure, per-row function — used inside typed
  * `map`/`mapPartitions`, fully codegen-adjacent (no shuffle, no UDF
  * registration needed) and trivially unit-testable, which is what the
  * byte-identical-per-url invariant requires.
  */
object TextExtract {

  private val PreStart = "<pre data-graft=\"raw\">"
  private val PreEnd = "</pre>"

  def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def unescapeHtml(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  /** Wrap raw file content into the corpus HTML shape (corpus side). */
  def wrapHtml(raw: String, title: String): Array[Byte] =
    (s"<!DOCTYPE html><html><head><meta charset=\"utf-8\"/><title>${escapeHtml(title)}</title></head>" +
      s"<body>$PreStart${escapeHtml(raw)}$PreEnd</body></html>").getBytes("UTF-8")

  /** html BINARY → original raw file content (before front-matter strip). */
  def htmlToRaw(html: Array[Byte]): String = {
    val s = new String(html, "UTF-8")
    val i = s.indexOf(PreStart)
    if (i < 0) s // not our wrapper: treat whole payload as raw text
    else {
      val from = i + PreStart.length
      val j = s.indexOf(PreEnd, from)
      unescapeHtml(if (j < 0) s.substring(from) else s.substring(from, j))
    }
  }

  /** Front-matter strip — exact port of interview_processing_agent.py:48-53:
    * if content starts with "---", find the next "---" from index 3; if found
    * at >0, drop through it and Python-strip the remainder.
    */
  def frontMatterStrip(content: String): String = {
    if (content.startsWith("---")) {
      val endMarker = content.indexOf("---", 3)
      if (endMarker > 0) PyText.strip(content.substring(endMarker + 3))
      else content
    } else content
  }

  /** html → extracted text: THE byte-identical invariant (north rule). */
  def extractText(html: Array[Byte]): String = frontMatterStrip(htmlToRaw(html))

  /** Front-matter metadata parse — enhanced_file_analyzer.py:61-78.
    * JSON between the `---` markers; on any parse failure an empty map;
    * then setdefault content_type/language/domain. Note the example files
    * use "ContentType" (capitalized) which does NOT populate the lowercase
    * `content_type` key — the default therefore usually wins, exactly as in
    * the reference (quirk kept as spec).
    */
  def frontMatterParse(content: String): Map[String, String] = {
    val parsed: Map[String, String] =
      if (content.startsWith("---")) {
        val endMarker = content.indexOf("---", 3)
        if (endMarker > 0) {
          val metaText = PyText.strip(content.substring(3, endMarker))
          parseJsonFlat(metaText)
        } else Map.empty
      } else Map.empty
    var m = parsed
    if (!m.contains("content_type")) m += ("content_type" -> "interview_transcript")
    if (!m.contains("language")) m += ("language" -> "english")
    if (!m.contains("domain")) m += ("domain" -> "general")
    m
  }

  /** Parse a JSON object into a flat String→String map (scalars stringified,
    * nested values rendered as JSON). Uses Jackson (ships with Spark).
    * Returns empty on failure, mirroring the reference's bare `except: pass`.
    */
  def parseJsonFlat(jsonText: String): Map[String, String] = {
    try {
      val mapper = JacksonHolder.mapper
      val node = mapper.readTree(jsonText)
      if (node == null || !node.isObject) Map.empty
      else {
        val it = node.fields()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) {
          val e = it.next()
          val v = e.getValue
          b += (e.getKey -> (if (v.isTextual) v.asText() else v.toString))
        }
        b.result()
      }
    } catch { case _: Throwable => Map.empty }
  }

  /** Per-page convenience: (url, extractedText, metadata). */
  def extract(p: Page): (String, String, Map[String, String]) = {
    val raw = htmlToRaw(p.html)
    (p.url, frontMatterStrip(raw), frontMatterParse(raw))
  }
}

/** Jackson ObjectMapper is thread-safe for reads; one per JVM/executor. */
private[text] object JacksonHolder {
  lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
}
