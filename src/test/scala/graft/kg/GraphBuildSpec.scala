package graft.kg

import graft.analyze.DocAnalyze
import graft.model._
import graft.needs.Needs
import org.scalatest.funsuite.AnyFunSuite

/** Per-operator unit tests for the rule families, incl. the documented golden
  * distributions (customer_graph_analysis.md:8-52 — 13 nodes / 4 edges for the
  * financial archetype, 14 / 5 for the interview archetype on minimal inputs).
  */
class GraphBuildSpec extends AnyFunSuite {

  private def minimalDoc(customer: String, path: String, routed: String): DocAnalysis =
    DocAnalysis(
      url = path, customerId = "cid", customerName = customer, filePath = path,
      contentType = "x", language = "english", domain = "general", routedPath = routed,
      complexity = 0.0, wordCount = 0, charCount = 0, text = "",
      entities = Nil, speakers = Nil, segments = Nil,
      insights = KeyInsights.empty, speakingDistribution = Map.empty,
      durationEstimateMin = 0.0)

  test("golden: financial archetype with minimal inputs → 13 nodes / 4 edges") {
    val doc = minimalDoc("Tim Wolff", "s3-test-file.txt", "financial")
    val needs = Needs.deterministicProfile(doc.url, "financial")
    val g = GraphBuild.build(doc, needs)
    assert(g.nodes.size == 13, s"nodes: ${g.nodes.map(n => (n.content, n.nodeType))}")
    assert(g.edges.size == 4, s"edges: ${g.edges.map(_.edgeType)}")
    val byType = g.nodes.groupBy(_.nodeType).view.mapValues(_.size).toMap
    assert(byType == Map("person" -> 1, "behavioral_pattern" -> 3,
      "personality_trait" -> 3, "need" -> 3, "concept" -> 3))
    val preds = g.edges.groupBy(_.edgeType).view.mapValues(_.size).toMap
    assert(preds == Map("demonstrates" -> 2, "influences" -> 2))
    // demonstrates targets: Certainty (0.8) and Growth (0.6), not Significance (0.5)
    val trip = GraphBuild.triples(g).filter(_.pred == "demonstrates").map(t => (t.obj, t.confidence)).toSet
    assert(trip == Set(("Certainty", 0.8), ("Growth", 0.6)))
  }

  test("golden: interview archetype with minimal inputs → 14 nodes / 5 edges") {
    // file path without 'interview' → standard relationship path (the
    // production runs behind customer_graph_analysis.md used s3-test-* keys)
    val doc = minimalDoc("Jon Fortt", "s3-test-file.txt", "interview")
    val needs = Needs.deterministicProfile(doc.url, "interview")
    val g = GraphBuild.build(doc, needs)
    assert(g.nodes.size == 14)
    assert(g.edges.size == 5)
    val byType = g.nodes.groupBy(_.nodeType).view.mapValues(_.size).toMap
    assert(byType == Map("person" -> 1, "behavioral_pattern" -> 3,
      "personality_trait" -> 3, "need" -> 4, "concept" -> 3))
    val preds = g.edges.groupBy(_.edgeType).view.mapValues(_.size).toMap
    assert(preds == Map("demonstrates" -> 3, "influences" -> 2))
  }

  test("golden: the reference's own test_hypergraph_v2 fixture → exact 28-node/31-edge graph") {
    // testing/experimental/test_hypergraph_v2.py:22-104 ported verbatim; the
    // expected sets below were produced by RUNNING the reference's
    // build_enhanced_hypergraph on this exact fixture (offline fallbacks).
    val doc = DocAnalysis(
      url = "high_customers/00_tim_wolff/Berater = Netzwerk, Know-how, Backup.txt",
      customerId = "00_tim_wolff", customerName = "Tim Wolff",
      filePath = "high_customers/00_tim_wolff/Berater = Netzwerk, Know-how, Backup.txt",
      contentType = "financial_advice", language = "german", domain = "financial",
      routedPath = "financial", complexity = 0.0, wordCount = 0, charCount = 0,
      text = "Tim Wolff ist ein erfahrener Finanzberater.",
      entities = Seq(
        RawEntity("Tim Wolff", "PERSON", 0.95, "Primary financial advisor"),
        RawEntity("Financial Planning", "BUSINESS_CONCEPT", 0.9, "Core service offering")),
      speakers = Nil, segments = Nil,
      insights = KeyInsights(
        skills = Seq("Financial advisory expertise", "Insurance specialization",
          "Investment planning", "Risk management", "Strategic planning"),
        achievements = Nil,
        goals = Seq("Long-term client relationships", "Comprehensive financial planning",
          "Risk mitigation strategies"),
        challenges = Nil,
        themes = Seq("Financial advisory", "Insurance consulting", "Investment strategies")),
      speakingDistribution = Map.empty, durationEstimateMin = 0.0)
    val needs = NeedsProfile(
      url = doc.url,
      scores = Map("certainty" -> 0.8, "growth" -> 0.6, "significance" -> 0.5,
        "connection" -> 0.4, "variety" -> 0.3, "contribution" -> 0.7),
      dominant = Seq(NeedScore("certainty", 0.8), NeedScore("contribution", 0.7),
        NeedScore("growth", 0.6)),
      patterns = Seq("Strategic planner", "Risk-averse advisor",
        "Client-focused consultant", "Analytical decision maker"),
      traits = Seq("Analytical", "Cautious", "Trustworthy", "Detail-oriented", "Client-focused"),
      lifeThemes = Seq("Professional expertise development", "Client relationship building",
        "Financial security focus"),
      confidence = 0.3)
    val g = GraphBuild.build(doc, needs)
    assert(g.nodes.size == 28 && g.edges.size == 31)
    val gotNodes = g.nodes.map(n => (n.content, n.nodeType, n.confidence)).toSet
    assert(gotNodes.count(_._2 == "skill") == 5)
    assert(gotNodes(("Tim Wolff", "person", 0.95)))
    assert(gotNodes(("Certainty", "need", 0.8)) && gotNodes(("Significance", "need", 0.5)))
    val trips = GraphBuild.triples(g).map(t => (t.subj, t.pred, t.obj, t.confidence)).toSet
    val byPred = trips.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byPred == Map("specializes_in" -> 5, "demonstrates" -> 3,
      "influences" -> 3, "relates_to" -> 20), s"got $byPred")
    assert(trips(("Tim Wolff", "demonstrates", "Contribution", 0.7)))
    assert(trips(("Certainty", "influences", "Risk-averse advisor", 0.8)))
    assert(trips(("Strategic planning", "relates_to", "Financial security focus", 0.7)))
    // Risk management has no financial-domain keyword → NO relates_to edges
    assert(!trips.exists(t => t._1 == "Risk management" && t._2 == "relates_to"))
    // reference quality thresholds (test_hypergraph_v2.py:192-232)
    assert(g.nodes.filter(_.nodeType == "person").forall(_.confidence > 0.8))
    assert(g.edges.count(_.confidence > 0.6).toDouble / g.edges.size >= 0.5)
    assert(g.nodes.map(_.nodeType).distinct.size >= 4)
    assert(g.edges.map(_.edgeType).distinct.size >= 2)
  }

  test("interview detection asymmetry (F14): dialog text triggers entity side only") {
    val doc = minimalDoc("Jon Fortt", "s3-key.txt", "interview")
      .copy(text = "Host: hello\nGuest: hi", insights = KeyInsights(Nil, Nil, Nil, Nil, Seq("professional_experience")))
    assert(GraphBuild.isInterviewFormatEntity(doc.filePath, doc.text))
    assert(!GraphBuild.isInterviewFormatRel(doc.filePath))
    val needs = Needs.deterministicProfile(doc.url, "interview")
    val g = GraphBuild.build(doc, needs)
    // entity side: interview path → theme becomes a topic-concept conf 0.8
    val topic = g.nodes.find(_.content == "Professional_experience")
    assert(topic.exists(n => n.nodeType == "concept" && n.confidence == 0.8))
    // relationship side: standard path → no 'discusses' edges despite topics
    assert(!g.edges.exists(_.edgeType == "discusses"))
  }

  test("strict-threshold quirks: keyword orgs (0.6) and regex persons (0.7) drop on standard path") {
    val raw = Seq(
      RawEntity("Google", "ORGANIZATION", 0.6, ""),
      RawEntity("Some Person", "PERSON", 0.7, ""))
    assert(GraphBuild.orgEntities(raw).isEmpty)
    assert(GraphBuild.personEntities("", raw).isEmpty)
    // interview path: persons at 0.7 > 0.6 pass as mentioned people
    assert(GraphBuild.interviewMentionedPeople("C", raw).map(_.text) == Seq("Some Person"))
    assert(GraphBuild.interviewOrgs(raw).isEmpty)
  }

  test("entity cleaning (F5) strips prefixes, collapses whitespace, capitalizes, drops short") {
    assert(GraphBuild.cleanEntityText("Mentioned skill") == "Skill")
    assert(GraphBuild.cleanEntityText("Discussed  led") == "Led")
    assert(GraphBuild.cleanEntityText("  multi   space  text ") == "Multi space text")
    assert(GraphBuild.cleanEntityText("ab") == "")
    assert(GraphBuild.cleanEntityText("Has x") == "")
  }

  test("dedup keeps max confidence, first on tie, first-occurrence order (A11)") {
    val e = (t: String, ty: String, c: Double) =>
      Entity(t, ty, c, s"ctx$c", "s", "", "", primary = false, 0.8)
    val out = GraphBuild.dedupEntities(Seq(
      e("Alpha", "skill", 0.5), e("alpha", "skill", 0.8),
      e("Beta", "skill", 0.7), e("beta", "skill", 0.7),
      e("Alpha", "concept", 0.4)))
    assert(out.map(x => (x.text, x.entityType, x.confidence)) == Seq(
      ("alpha", "skill", 0.8), ("Beta", "skill", 0.7), ("Alpha", "concept", 0.4)))
  }

  test("edge endpoint resolution: lookup last-wins, unresolved dropped (J1)") {
    val nodes = Seq(
      KgNode("skill_1", "Alpha", "skill", 0.8, "f", "s", "", 0.9),
      KgNode("concept_1", "alpha", "concept", 0.7, "f", "s", "", 0.8))
    val rels = Seq(
      Relationship("ALPHA", "alpha", "relates_to", 0.7, Nil, "", "s"),
      Relationship("Alpha", "Missing", "relates_to", 0.7, Nil, "", "s"))
    val edges = GraphBuild.buildEdges(rels, nodes)
    // both endpoints resolve to the LAST node with content 'alpha' (concept_1)
    assert(edges.map(e => (e.srcId, e.dstId)) == Seq(("concept_1", "concept_1")))
  }

  test("node ids are the reference's md5 scheme (F7)") {
    // md5("tim wolff") = c5b...; verify prefix form {type}_{md5[:8]}
    val id = GraphBuild.nodeId("Tim Wolff", "person")
    assert(id == "person_" + graft.text.PyText.md5Hex("tim wolff").substring(0, 8))
  }

  test("need-behavior keyword join (J5) strengths") {
    assert(GraphBuild.needBehaviorStrength("Certainty", "Strategic planner") == 0.8)
    assert(GraphBuild.needBehaviorStrength("Growth", "Strategic planner") == 0.3)
    assert(GraphBuild.needBehaviorStrength("Connection", "Collaborative") == 0.8)
  }

  test("skill-concept financial-domain join (J6)") {
    val s = Entity("Financial planning", "skill", 0.8, "", "s", "", "", primary = false, 0.9)
    val c = Entity("Wealth management", "concept", 0.7, "", "s", "", "", primary = false, 0.8)
    val n = Entity("Cooking", "concept", 0.7, "", "s", "", "", primary = false, 0.8)
    val rels = GraphBuild.skillConceptRels(Seq(s, c, n))
    assert(rels.map(r => (r.src, r.dst)) == Seq(("Financial planning", "Wealth management")))
  }

  test("participant roles: LAST matching person wins; interviewer never doubles as interviewee") {
    def person(t: String, role: String, primary: Boolean) =
      Entity(t, "person", 0.8, "", "file_analysis", role, "", primary, 0.8)
    // two interviewer-role persons → the reference's loop keeps the last one
    val rels = GraphBuild.participantRels(Seq(
      person("First Host", "interviewer", primary = false),
      person("Second Host", "interviewer", primary = false),
      person("Cust Omer", "interviewee", primary = true)))
    assert(rels.map(r => (r.src, r.dst)) == Seq(("Second Host", "Cust Omer")))
    // elif: a primary interviewer-role person is NOT selected as interviewee
    assert(GraphBuild.participantRels(Seq(
      person("Solo Host", "interviewer", primary = true))).isEmpty)
    // last-wins applies to interviewee too
    val rels2 = GraphBuild.participantRels(Seq(
      person("Host A", "interviewer", primary = false),
      person("Guest One", "interviewee", primary = false),
      person("Guest Two", "mentioned_person", primary = true)))
    assert(rels2.map(r => (r.src, r.dst)) == Seq(("Host A", "Guest Two")))
  }

  test("customer-name length guard: >3 words rejected on standard path (P6)") {
    assert(GraphBuild.personEntities("A Very Long Customer Name", Nil).isEmpty)
    // interview participant path has NO guard (v2:296-311)
    assert(GraphBuild.interviewParticipants("A Very Long Customer Name", Nil).size == 1)
  }
}

class NeedsSpec extends AnyFunSuite {
  test("content-aware scores (F17)") {
    val fin = Needs.contentAwareScores("financial_advice", Nil)
    assert(fin == Map("certainty" -> 0.8, "variety" -> 0.4, "significance" -> 0.5,
      "connection" -> 0.4, "growth" -> 0.6, "contribution" -> 0.4))
    val int = Needs.contentAwareScores("interview_transcript", Nil)
    assert(int("significance") == 0.8 && int("variety") == 0.5)
    val gen = Needs.contentAwareScores("unknown", Nil)
    assert(gen.values.forall(_ == 0.4))
  }

  test("theme adjustments clamp at 1.0") {
    val s = Needs.contentAwareScores("interview_transcript",
      Seq("Leadership impact", "innovation push", "risk talk"))
    assert(s("significance") == 1.0) // 0.8+0.2
    assert(s("growth") == 0.9 && s("variety") == 0.6 && s("certainty") == 0.6)
  }

  test("dominant top-3 is stable on ties in canonical need order (W1)") {
    val d = Needs.dominantTop3(Needs.needOrder.map(_ -> 0.4).toMap)
    assert(d.map(_.need) == Seq("certainty", "variety", "significance"))
  }

  test("keyword scorer (A8) hand-computed case") {
    // 100 words of filler + 2 'security' + 1 phrase 'have control' + 1 clue 'risk aversion'
    val filler = Seq.fill(96)("word").mkString(" ")
    val content = s"$filler security security have control risk aversion"
    val scores = Needs.keywordScores(content)
    val wc = graft.text.PyText.wordCount(content) // 103
    // keywords: security*2 + 'control'(in 'control')*1 + 'plan' 0 ... count occurrences:
    // security:2, control:1 → 3 matches; kwScore = min(3/max(wc/100,1),1)*0.4
    val kwScore = math.min(3.0 / math.max(wc / 100.0, 1.0), 1.0) * 0.4
    val expected = kwScore + math.min(1.0 / 5, 1.0) * 0.3 + math.min(1.0 / 3, 1.0) * 0.3
    assert(math.abs(scores("certainty") - math.min(expected, 1.0)) < 1e-12)
  }

  test("combine + confidence formulas (A9/A10)") {
    val kw = Needs.needOrder.map(_ -> 0.5).toMap
    val llm = Needs.needOrder.map(_ -> 0.7).toMap
    val c = Needs.combineScores(kw, llm)
    assert(math.abs(c("growth") - (0.3 * 0.5 + 0.7 * 0.7)) < 1e-12)
    val conf = Needs.confidenceScore(kw, llm, Seq.fill(500)("w").mkString(" "))
    // length 500/1000*0.3 + agreement (1-0.2)*0.4 + clear 6 needs>0.6 → min(6/3,1)*0.3
    assert(math.abs(conf - (0.15 + 0.8 * 0.4 + 0.3)) < 1e-12)
  }
}

class DocAnalyzeSpec extends AnyFunSuite {
  test("speaker parse (F1): fold semantics incl. continuation lines") {
    val text = "Jon Fortt: Welcome to the show.\nSome non speaker line\nPat Gelsinger: Thanks.\nIt is good to be here.\n\nJon Fortt: Question two?"
    val (speakers, segments) = DocAnalyze.parseStructure(text)
    assert(speakers == Seq("Jon Fortt", "Pat Gelsinger"))
    assert(segments.map(s => (s.speaker, s.text)) == Seq(
      ("Jon Fortt", "Welcome to the show. Some non speaker line"),
      ("Pat Gelsinger", "Thanks. It is good to be here."),
      ("Jon Fortt", "Question two?")))
    assert(segments.map(_.wordCount) == Seq(8, 7, 2))
  }

  test("name NER (F2): first-10-raw-matches cap then distinct") {
    val names = Seq("Alpha Ape", "Beta Bee", "Gamma Cow", "Delta Dog", "Echo Elk",
      "Fox Fin", "Golf Gnu", "Hotel Hen", "India Ibis", "Julia Jay", "Kilo Kit",
      "Lima Lark").mkString(". ")
    val ents = DocAnalyze.nameNer(names)
    assert(ents.size == 10 && ents.forall(e => e.entityType == "PERSON" && e.confidence == 0.7))
    assert(!ents.exists(e => e.text == "Kilo Kit" || e.text == "Lima Lark"))
    val dup = "Tim Wolff. " * 12 + "Jon Fortt"
    assert(DocAnalyze.nameNer(dup).map(_.text) == Seq("Tim Wolff")) // dups consumed the cap
  }

  test("org NER (F3) is case-sensitive substring") {
    assert(DocAnalyze.orgNer("We love Google and google").map(_.text) == Seq("Google"))
    assert(DocAnalyze.orgNer("Incredible").map(_.text) == Seq("Inc")) // substring quirk kept
  }

  test("speaking distribution sums to 100 (A7)") {
    val segs = Seq(Segment("A", "x", 30), Segment("B", "y", 70))
    val d = DocAnalyze.speakingDistribution(segs)
    assert(d == Map("A" -> 30.0, "B" -> 70.0))
  }

  test("complexity formula (F10)") {
    val content = "A: hello technology software\nB: engineering text\n\npara two"
    val c = DocAnalyze.complexity(content)
    val words = graft.text.PyText.wordCount(content) // 9
    val expected = math.min(words / 2000.0, 1.0) * 0.3 + math.min(2 / 5.0, 1.0) * 0.3 +
      math.min(2 / 20.0, 1.0) * 0.2 + (3.0 / 6) * 0.2
    assert(math.abs(c - expected) < 1e-12)
  }

  test("routing (Choice-state) precedence: folder rules beat content type") {
    assert(DocAnalyze.route("00_tim_wolff", "interview_transcript") == "financial")
    assert(DocAnalyze.route("zz_other", "interview_transcript") == "interview")
    assert(DocAnalyze.route("zz_other", "financial_advice") == "financial")
    assert(DocAnalyze.route("zz_other", "generic_note") == "generic")
  }
}
