package graft.model

/** Core data model of the KG-construction engine.
  *
  * Shapes mirror the reference's dataclasses (see /root/reference):
  *  - Page: input table per BASELINE.json input_hint
  *  - RawEntity: interview_processing_agent.py entity dicts (:100-127)
  *  - Segment: parse_interview_structure segments (:55-98)
  *  - DocAnalysis: enhanced_file_analyzer.analyze_file (:40-59) merged with
  *    interview_processing_agent.process_interview_transcript (:13-36)
  *  - NeedsProfile: needs_analysis_agent NeedsAnalysisResult (:155-162)
  *  - Entity / Relationship: enhanced_hypergraph_builder_agent_v2.py
  *    CleanEntity (:45-55) / CleanRelationship (:57-65)
  *  - KgNode / KgEdge: EnhancedHyperNode (:67-77) / EnhancedHyperEdge (:79-89)
  *  - NodeRow / EdgeRow: graph_extraction_agent.py ExtractedNode/Edge (:287-312)
  */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

final case class RawEntity(text: String, entityType: String, confidence: Double, context: String)

final case class Segment(speaker: String, text: String, wordCount: Int)

final case class KeyInsights(
    skills: Seq[String],
    achievements: Seq[String],
    goals: Seq[String],
    challenges: Seq[String],
    themes: Seq[String])

object KeyInsights { val empty: KeyInsights = KeyInsights(Nil, Nil, Nil, Nil, Nil) }

final case class DocAnalysis(
    url: String,
    customerId: String,
    customerName: String,
    filePath: String,
    contentType: String,   // front-matter content_type, default interview_transcript
    language: String,
    domain: String,
    routedPath: String,    // interview | financial | generic (Choice-state routing)
    complexity: Double,
    wordCount: Int,
    charCount: Int,
    text: String,          // extracted text (byte-identical invariant holder)
    entities: Seq[RawEntity],
    speakers: Seq[String],
    segments: Seq[Segment],
    insights: KeyInsights,
    speakingDistribution: Map[String, Double],
    durationEstimateMin: Double)

final case class NeedScore(need: String, score: Double)

final case class NeedsProfile(
    url: String,
    scores: Map[String, Double],
    dominant: Seq[NeedScore],
    patterns: Seq[String],
    traits: Seq[String],
    lifeThemes: Seq[String],
    confidence: Double)

final case class Entity(
    text: String,
    entityType: String,
    confidence: Double,
    context: String,
    source: String,
    role: String,
    category: String,
    primary: Boolean,
    domainRelevance: Double)

final case class Relationship(
    src: String,
    dst: String,
    relType: String,
    confidence: Double,
    evidence: Seq[String],
    reasoning: String,
    source: String)

final case class KgNode(
    id: String,
    content: String,
    nodeType: String,
    confidence: Double,
    source: String,
    extractionSource: String,
    context: String,
    domainRelevance: Double,
    // v1 temporal indexing (hypergraph_builder_agent.py:448-461): stamped by
    // GraphBuildV1.applyTemporalIndexing; write-time-only like F18, so both
    // are excluded from parity. Empty in v2 mode.
    temporalIndex: String = "",
    temporalCategory: String = "")

final case class KgEdge(
    id: String,
    srcId: String,
    dstId: String,
    edgeType: String,
    confidence: Double,
    evidence: Seq[String],
    reasoning: String,
    // see KgNode — v1 temporal stamps, parity-excluded
    temporalIndex: String = "",
    temporalCategory: String = "")

final case class DocGraph(
    url: String,
    customerId: String,
    routedPath: String,
    nodes: Seq[KgNode],
    edges: Seq[KgEdge])

final case class Triple(
    customer_id: String,
    url: String,
    subj: String,
    pred: String,
    obj: String,
    confidence: Double,
    evidence: Seq[String])

/** Persistence shape (graph_extraction_agent.py:287-312): sha256-keyed ids. */
final case class NodeRow(
    id: String,
    customer_id: String,
    label: String,
    node_type: String,
    confidence: Double,
    source_file: String,
    canonical_id: String)

final case class EdgeRow(
    id: String,
    customer_id: String,
    source_node_id: String,
    target_node_id: String,
    relationship_type: String,
    weight: Double,
    evidence: Seq[String],
    reasoning: String,
    source_file: String)

/** Node/edge type whitelists (graph_extraction_agent.py:329-338). */
object Types {
  val nodeTypes: Set[String] = Set(
    "person", "organization", "concept", "skill", "need",
    "behavioral_pattern", "personality_trait", "financial_instrument",
    "business_concept", "topic")
  val edgeTypes: Set[String] = Set(
    "demonstrates", "relates_to", "influences", "requires", "enables",
    "part_of", "similar_to", "works_with", "specializes_in", "interviews",
    "discusses", "affiliated_with", "uses")
  /** Coercion defaults (graph_extraction_agent.py:414-418, 471-475). */
  def coerceNodeType(t: String): String = { val l = t.toLowerCase; if (nodeTypes(l)) l else "concept" }
  def coerceEdgeType(t: String): String = { val l = t.toLowerCase; if (edgeTypes(l)) l else "relates_to" }
}
