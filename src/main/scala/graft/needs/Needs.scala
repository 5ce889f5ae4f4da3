package graft.needs

import graft.model._
import graft.text.PyText

/** 6-human-needs analysis (SURVEY §2 A8-A10, F17).
  *
  * The reference's LLM scoring path always degrades to deterministic
  * fallbacks offline (needs_analysis_agent.py:1086-1098, 1211-1292); this
  * object implements BOTH the keyword scorer (A8 — analyze_needs_keywords,
  * :267-291) and the content-aware fallback path (F17 — get_content_aware_*,
  * :1211-1292) which is the deterministic parity target. A pluggable model
  * stage can replace `llmScores` later (mapPartitions + broadcast state).
  */
object Needs {

  /** Canonical need order = HumanNeed enum declaration order
    * (needs_analysis_agent.py:146-153); ties in sorts resolve in this order
    * (Python sorted() is stable over dict insertion order).
    */
  val needOrder: Seq[String] =
    Seq("certainty", "variety", "significance", "connection", "growth", "contribution")

  /** Needs indicator dictionary (needs_analysis_agent.py:171-202). */
  val indicators: Map[String, (Seq[String], Seq[String], Seq[String])] = Map(
    "certainty" -> ((
      Seq("security", "stable", "predictable", "safe", "routine", "control", "plan", "structure"),
      Seq("need to know", "want certainty", "feel secure", "have control", "planned approach"),
      Seq("risk aversion", "detailed planning", "systematic approach"))),
    "variety" -> ((
      Seq("adventure", "new", "different", "change", "explore", "variety", "diverse", "exciting"),
      Seq("try new things", "love variety", "get bored easily", "need change", "different experiences"),
      Seq("career changes", "multiple interests", "travel experiences"))),
    "significance" -> ((
      Seq("important", "special", "unique", "recognition", "achievement", "success", "impact", "leader"),
      Seq("make a difference", "be recognized", "stand out", "achieve something", "be remembered"),
      Seq("leadership roles", "awards", "achievements", "public speaking"))),
    "connection" -> ((
      Seq("family", "friends", "team", "community", "relationship", "together", "belong", "love"),
      Seq("work with others", "part of team", "close relationships", "feel connected", "belong to"),
      Seq("team projects", "mentoring", "collaboration", "family mentions"))),
    "growth" -> ((
      Seq("learn", "develop", "grow", "improve", "progress", "evolve", "better", "skills"),
      Seq("keep learning", "personal growth", "develop skills", "get better", "continuous improvement"),
      Seq("education", "training", "skill development", "career progression"))),
    "contribution" -> ((
      Seq("help", "serve", "give", "contribute", "impact", "difference", "society", "world"),
      Seq("help others", "give back", "make impact", "serve community", "contribute to"),
      Seq("volunteering", "social causes", "mentoring others", "community service"))))

  /** Count non-overlapping occurrences (Python str.count). */
  def countOccurrences(haystack: String, needle: String): Int = {
    if (needle.isEmpty) return 0
    var count = 0
    var i = haystack.indexOf(needle)
    while (i >= 0) { count += 1; i = haystack.indexOf(needle, i + needle.length) }
    count
  }

  /** A8 — keyword-based needs scores (needs_analysis_agent.py:267-291). */
  def keywordScores(content: String): Map[String, Double] = {
    val lower = PyText.lower(content)
    val wordCount = PyText.wordCount(content)
    needOrder.map { need =>
      val (keywords, phrases, clues) = indicators(need)
      val kwMatches = keywords.map(countOccurrences(lower, _)).sum
      val kwScore = math.min(kwMatches / math.max(wordCount / 100.0, 1.0), 1.0) * 0.4
      val phMatches = phrases.count(lower.contains(_))
      val phScore = math.min(phMatches.toDouble / math.max(phrases.size, 1), 1.0) * 0.3
      val clMatches = clues.count(lower.contains(_))
      val clScore = math.min(clMatches.toDouble / math.max(clues.size, 1), 1.0) * 0.3
      need -> math.min(kwScore + phScore + clScore, 1.0)
    }.toMap
  }

  /** F17 — content-aware fallback scores (needs_analysis_agent.py:1237-1262):
    * base 0.4 per need; per-content-type overrides; theme adjustments; clamp.
    * The reference does this in Python Decimal arithmetic (DynamoDB artifact)
    * — ported with BigDecimal so adjusted scores are exact (0.7+0.2 == 0.9).
    */
  def contentAwareScores(contentType: String, themes: Seq[String]): Map[String, Double] = {
    import scala.collection.mutable.LinkedHashMap
    val s = LinkedHashMap(needOrder.map(_ -> BigDecimal("0.4")): _*)
    contentType match {
      case "financial_advice" =>
        s("certainty") = BigDecimal("0.8"); s("growth") = BigDecimal("0.6"); s("significance") = BigDecimal("0.5")
      case "interview_transcript" =>
        s("significance") = BigDecimal("0.8"); s("growth") = BigDecimal("0.7")
        s("connection") = BigDecimal("0.6"); s("variety") = BigDecimal("0.5")
      case _ => ()
    }
    for (theme <- themes) {
      val t = PyText.lower(theme)
      if (t.contains("leadership")) { s("significance") += BigDecimal("0.2"); s("connection") += BigDecimal("0.1") }
      else if (t.contains("innovation") || t.contains("technology")) { s("growth") += BigDecimal("0.2"); s("variety") += BigDecimal("0.1") }
      else if (t.contains("risk") || t.contains("security")) { s("certainty") += BigDecimal("0.2") }
    }
    val one = BigDecimal("1.0"); val zero = BigDecimal("0.0")
    s.map { case (k, v) => k -> (if (v < zero) zero else if (v > one) one else v).toDouble }.toMap
  }

  /** Static content-aware patterns/traits/themes (needs_analysis_agent.py:1264-1292). */
  def contentBehavioralPatterns(contentType: String): Seq[String] = contentType match {
    case "financial_advice" => Seq("Strategic planner", "Risk manager", "Client educator")
    case "interview_transcript" => Seq("Leadership-oriented", "Growth-focused", "Collaborative")
    case _ => Seq("Analytical thinker", "Goal-oriented", "Relationship-builder")
  }

  def contentPersonalityTraits(contentType: String): Seq[String] = contentType match {
    case "financial_advice" => Seq("Analytical", "Cautious", "Helpful")
    case "interview_transcript" => Seq("Confident", "Articulate", "Visionary")
    case _ => Seq("Thoughtful", "Practical", "Communicative")
  }

  def contentLifeThemes(contentType: String): Seq[String] = contentType match {
    case "financial_advice" => Seq("Financial security", "Professional expertise", "Client success")
    case "interview_transcript" => Seq("Career advancement", "Innovation", "Leadership impact")
    case _ => Seq("Personal growth", "Achievement", "Relationships")
  }

  /** W1 — top-3 dominant needs: stable sort desc by score, ties in canonical
    * need order (needs_analysis_agent.py:1089).
    */
  def dominantTop3(scores: Map[String, Double]): Seq[NeedScore] =
    needOrder.map(n => NeedScore(n, scores.getOrElse(n, 0.0)))
      .sortBy(ns => -ns.score) // scala sortBy is stable
      .take(3)

  /** A9 — 0.3·keyword + 0.7·llm score combination (:340-352). */
  def combineScores(keyword: Map[String, Double], llm: Map[String, Double]): Map[String, Double] =
    needOrder.map(n => n -> (0.3 * keyword.getOrElse(n, 0.0) + 0.7 * llm.getOrElse(n, 0.0))).toMap

  /** A10 — analysis confidence (needs_analysis_agent.py:478-500). */
  def confidenceScore(keyword: Map[String, Double], llm: Map[String, Double], content: String): Double = {
    val lengthFactor = math.min(PyText.wordCount(content) / 1000.0, 1.0) * 0.3
    val agreements = needOrder.map(n => 1.0 - math.abs(keyword.getOrElse(n, 0.0) - llm.getOrElse(n, 0.0)))
    val agreementFactor = agreements.sum / agreements.size * 0.4
    val clear = llm.values.count(_ > 0.6)
    val indicatorFactor = math.min(clear / 3.0, 1.0) * 0.3
    math.min(lengthFactor + agreementFactor + indicatorFactor, 1.0)
  }

  /** The deterministic needs profile — the reference's offline behavior
    * (analyze_human_needs exception path, needs_analysis_agent.py:1086-1098):
    * content-aware scores, static patterns/traits/themes, confidence 0.3.
    * The routed content type maps interview→interview_transcript,
    * financial→financial_advice, generic→unknown.
    */
  def deterministicProfile(url: String, routedPath: String, themes: Seq[String] = Nil): NeedsProfile = {
    val contentType = routedPath match {
      case "interview" => "interview_transcript"
      case "financial" => "financial_advice"
      case _ => "unknown"
    }
    val scores = contentAwareScores(contentType, themes)
    NeedsProfile(
      url = url,
      scores = scores,
      dominant = dominantTop3(scores),
      patterns = contentBehavioralPatterns(contentType),
      traits = contentPersonalityTraits(contentType),
      lifeThemes = contentLifeThemes(contentType),
      confidence = 0.3)
  }

  /** Themes pass-through mirrors the reference call chain (needs agent gets
    * content_data['themes'] = the doc's extracted main_themes,
    * needs_analysis_agent.py:895-905 → get_content_aware_scores theme
    * adjustments). The derivable theme values (professional_experience /
    * relationships, interview_processing_agent.py:186-192) never match the
    * adjustment keywords, so scores are unchanged on the deterministic path
    * — but the plumbing is live and parity-tracked should derivation change.
    */
  def profile(doc: DocAnalysis): NeedsProfile =
    deterministicProfile(doc.url, doc.routedPath, doc.insights.themes)
}
