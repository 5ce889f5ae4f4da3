package graft.kg

import org.scalatest.funsuite.AnyFunSuite

/** Targeted units for the v1-builder operators (J7/J9/U5); end-to-end
  * exactness vs the reference's own methods is gated in ParitySpec.
  */
class GraphBuildV1Spec extends AnyFunSuite {

  test("J7 eligibility truth table (v1:359-376)") {
    assert(GraphBuildV1.shouldCooccur("skill", "skill"))
    assert(GraphBuildV1.shouldCooccur("achievement", "achievement"))
    assert(!GraphBuildV1.shouldCooccur("person", "person"))
    assert(GraphBuildV1.shouldCooccur("person", "skill"))
    assert(GraphBuildV1.shouldCooccur("skill", "person")) // either orientation
    assert(GraphBuildV1.shouldCooccur("need", "goal"))
    assert(!GraphBuildV1.shouldCooccur("need", "skill"))
    assert(!GraphBuildV1.shouldCooccur("concept", "concept"))
  }

  test("J7 strength banding: substring-of-word positions, min cross distance (v1:378-404)") {
    val text = "Alice builds python daily " + Seq.fill(18)("x").mkString(" ") + " kubernetes"
    assert(GraphBuildV1.cooccurrenceStrength("Alice", "python", text) == 0.9) // dist 2
    assert(GraphBuildV1.cooccurrenceStrength("alice", "kubernetes", text) == 0.5) // dist 22 → ≤50 band
    assert(GraphBuildV1.cooccurrenceStrength("Alice", "missing", text) == 0.0)
    // multi-word content never matches a single word (reference quirk)
    assert(GraphBuildV1.cooccurrenceStrength("Alice Smith", "python", text) == 0.0)
    // substring-of-word: 'build' matches inside 'builds'
    assert(GraphBuildV1.cooccurrenceStrength("build", "python", text) == 0.9)
  }

  test("J9 smoothing: node pass first, edge pass uses UPDATED node confidences (v1:465-486)") {
    def node(id: String, c: Double) =
      graft.model.KgNode(id, id, "skill", c, "f", "s", "", 0.8)
    def edge(a: String, b: String, c: Double) =
      graft.model.KgEdge(s"e_${a}_$b", a, b, "relates_to", c, Nil, "")
    val nodes = Seq(node("n1", 0.8), node("n2", 0.4), node("n3", 0.6))
    val edges = Seq(edge("n1", "n2", 0.6), edge("n2", "n3", 1.0))
    val (ns, es) = GraphBuildV1.smoothConfidences(nodes, edges)
    val n1 = (0.8 + 0.6) / 2                  // one supporting edge
    val n2 = (0.4 + (0.6 + 1.0) / 2) / 2      // two supporting edges
    val n3 = (0.6 + 1.0) / 2
    assert(ns.map(_.confidence) == Seq(n1, n2, n3))
    assert(es(0).confidence == (0.6 + (n1 + n2) / 2) / 2) // UPDATED endpoint confidences
    assert(es(1).confidence == (1.0 + (n2 + n3) / 2) / 2)
    // isolated node untouched
    val (solo, _) = GraphBuildV1.smoothConfidences(Seq(node("x", 0.5)), Nil)
    assert(solo.head.confidence == 0.5)
  }

  test("U5 label-exclusion assembly (v1:857-915): cross-type, case-sensitive, index-preserving") {
    val out = GraphBuildV1.needsHypernodes(
      needsScores = Seq("certainty" -> 0.8, "variety" -> 0.45, "growth" -> 0.3),
      themes = Seq("Leadership drive", "Certainty", "", "Leadership drive"),
      patterns = Seq("Leadership drive", "Strategic planner"),
      traits = Seq("Strategic planner", "Analytical"))
    // need nodes always appended, titled, strength-banded
    assert(out.take(3).map(n => (n.id, n.label, n.meta)) == Seq(
      ("need_certainty", "Certainty", "high"),
      ("need_variety", "Variety", "medium"),
      ("need_growth", "Growth", "low")))
    // theme 'Certainty' excluded (need label collision, CROSS-type);
    // empty and duplicate themes excluded; index 0 preserved in id
    assert(out.filter(_.nodeType == "theme").map(n => (n.id, n.label, n.meta)) ==
      Seq(("theme_0", "Leadership drive", "professional")))
    // pattern 'Leadership drive' excluded by the earlier theme label;
    // trait 'Strategic planner' excluded by the pattern label
    assert(out.filter(_.nodeType == "behavioral_pattern").map(_.id) == Seq("pattern_1"))
    assert(out.filter(_.nodeType == "personality_trait").map(_.label) == Seq("Analytical"))
    // existing labels exclude too
    val out2 = GraphBuildV1.needsHypernodes(Nil, Seq("Known"), Nil, Nil,
      existingLabels = Seq("Known"))
    assert(out2.isEmpty)
  }

  test("temporal indexing (v1:448-461): every node/edge stamped, 'present', between co-occur and smoothing") {
    def node(id: String, c: Double) =
      graft.model.KgNode(id, id, "skill", c, "s", "x", "", 1.0)
    def edge(a: String, b: String, c: Double) =
      graft.model.KgEdge(s"e_${a}_$b", a, b, "relates_to", c, Nil, "")
    val (ns, es) = GraphBuildV1.applyTemporalIndexing(
      Seq(node("n1", 0.8), node("n2", 0.4)), Seq(edge("n1", "n2", 0.6)), "2026-08-17T00:00:00Z")
    assert(ns.forall(n => n.temporalIndex == "2026-08-17T00:00:00Z" && n.temporalCategory == "present"))
    assert(es.forall(e => e.temporalIndex == "2026-08-17T00:00:00Z" && e.temporalCategory == "present"))
    // confidences untouched by the stamp pass
    assert(ns.map(_.confidence) == Seq(0.8, 0.4) && es.head.confidence == 0.6)
    // buildV1 surfaces the stamps on every node and edge (incl. co-occurrence
    // edges, which are created BEFORE the stamp pass); v2 build leaves them empty
    val body = "Interviewer: Jane discusses leadership and strategy today.\n" +
      "Jane: I value growth and certainty in business planning."
    val page = graft.model.Page("https://x.org/customers/7_jane_doe/interview_a.html",
      new java.sql.Timestamp(0L), graft.text.TextExtract.wrapHtml(body, "a"), body, "en")
    val doc = graft.analyze.DocAnalyze.analyze(page)
    val needs = graft.needs.Needs.profile(doc)
    val v1g = GraphBuildV1.buildV1(doc, needs, temporalIndex = "TS")
    assert(v1g.nodes.nonEmpty && v1g.nodes.forall(n =>
      n.temporalIndex == "TS" && n.temporalCategory == "present"))
    assert(v1g.edges.forall(e => e.temporalIndex == "TS" && e.temporalCategory == "present"))
    val v2g = graft.kg.GraphBuild.build(doc, needs)
    assert(v2g.nodes.forall(n => n.temporalIndex == "" && n.temporalCategory == ""))
  }
}
