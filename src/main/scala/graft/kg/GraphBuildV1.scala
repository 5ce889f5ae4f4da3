package graft.kg

import graft.model._
import graft.text.PyText

/** v1-builder operators as an opt-in pipeline mode (SURVEY §2.3 J7/J9):
  * co-occurrence proximity edges and confidence smoothing from
  * hypergraph_builder_agent.py (the v1 builder; v2 is the deployed default).
  * `buildV1` composes them onto the v2 graph: v2 build → J7 co-occurrence
  * edges → J9 smoothing, mirroring the v1 flow (edges → temporal →
  * calculate_confidence_scores).
  *
  * Parity: ParitySpec's v1 section compares against the reference's OWN
  * should_create_cooccurrence_edge / calculate_cooccurrence_strength /
  * calculate_confidence_scores driven by test-oracle/run_reference.py.
  */
object GraphBuildV1 {

  /** J7 eligibility (hypergraph_builder_agent.py:359-376): same type only if
    * skill/achievement; otherwise one of the related pairs, either
    * orientation.
    */
  val sameTypeCooccur: Set[String] = Set("skill", "achievement")
  val relatedPairs: Set[(String, String)] = Set(
    ("person", "skill"), ("person", "achievement"), ("skill", "achievement"),
    ("goal", "skill"), ("need", "goal"))

  def shouldCooccur(t1: String, t2: String): Boolean =
    if (t1 == t2) sameTypeCooccur(t1)
    else relatedPairs((t1, t2)) || relatedPairs((t2, t1))

  /** J7 strength (hypergraph_builder_agent.py:378-404): positions are word
    * indices of lower(raw).split() where the lowered entity content is a
    * SUBSTRING of the word (multi-word contents therefore never match — a
    * reference quirk kept as spec); min cross-pair distance banded to
    * 0.9 / 0.7 / 0.5 / 0.3, or 0.0 when either side has no position.
    */
  def cooccurrenceStrength(c1: String, c2: String, rawText: String): Double = {
    val words = PyText.split(PyText.lower(rawText))
    val n1 = PyText.lower(c1); val n2 = PyText.lower(c2)
    val pos1 = words.indices.filter(i => words(i).contains(n1))
    val pos2 = words.indices.filter(i => words(i).contains(n2))
    if (pos1.isEmpty || pos2.isEmpty) 0.0
    else {
      var min = Int.MaxValue
      for (p1 <- pos1; p2 <- pos2) { val d = math.abs(p1 - p2); if (d < min) min = d }
      if (min <= 5) 0.9 else if (min <= 20) 0.7 else if (min <= 50) 0.5 else 0.3
    }
  }

  /** J7 — co-occurrence edges over node pairs in list order, strength > 0.4
    * (hypergraph_builder_agent.py:267-285).
    */
  def cooccurrenceEdges(nodes: Seq[KgNode], rawText: String): Seq[KgEdge] =
    for {
      i <- nodes.indices
      j <- (i + 1) until nodes.size
      n1 = nodes(i); n2 = nodes(j)
      if shouldCooccur(n1.nodeType, n2.nodeType)
      strength = cooccurrenceStrength(n1.content, n2.content, rawText)
      if strength > 0.4
    } yield KgEdge(s"edge_${n1.id}_${n2.id}_co_occurrence", n1.id, n2.id,
      "co_occurrence", strength, Nil, "Co-occurrence proximity (v1)")

  /** Temporal indexing (hypergraph_builder_agent.py:448-461): stamp every
    * node and edge with `temporal_index` = its creation timestamp and
    * `temporal_category` = the constant 'present' ("for now, use creation
    * timestamp" — the reference's placeholder for future content-derived
    * temporality). Runs between the co-occurrence edge pass and J9
    * smoothing, mirroring the v1 flow. The timestamp is write-time-only and
    * excluded from parity like F18; the category is static.
    */
  def applyTemporalIndexing(nodes: Seq[KgNode], edges: Seq[KgEdge],
                            timestamp: String): (Seq[KgNode], Seq[KgEdge]) = (
    nodes.map(_.copy(temporalIndex = timestamp, temporalCategory = "present")),
    edges.map(_.copy(temporalIndex = timestamp, temporalCategory = "present")))

  /** J9 — confidence smoothing (hypergraph_builder_agent.py:465-486): every
    * node's confidence is averaged with the mean confidence of its
    * supporting edges, THEN every edge's confidence is averaged with the
    * mean of its (already-updated) endpoint confidences — the reference
    * mutates nodes in place before the edge pass, so order matters.
    */
  def smoothConfidences(nodes: Seq[KgNode], edges: Seq[KgEdge]): (Seq[KgNode], Seq[KgEdge]) = {
    val newNodes = nodes.map { n =>
      val supporting = edges.filter(e => e.srcId == n.id || e.dstId == n.id)
      if (supporting.isEmpty) n
      else n.copy(confidence =
        (n.confidence + supporting.map(_.confidence).sum / supporting.size) / 2)
    }
    val newEdges = edges.map { e =>
      val endpoints = newNodes.filter(n => n.id == e.srcId || n.id == e.dstId)
      if (endpoints.isEmpty) e
      else e.copy(confidence =
        (e.confidence + endpoints.map(_.confidence).sum / endpoints.size) / 2)
    }
    (newNodes, newEdges)
  }

  final case class V1Node(id: String, nodeType: String, label: String, meta: String)

  /** U5 — label-exclusion node assembly (v1 build_hypergraph fallback,
    * hypergraph_builder_agent.py:857-915): need nodes append
    * unconditionally (need_{name}, Title label, score-banded strength);
    * theme / behavioral-pattern / personality-trait nodes append only when
    * the label is not already present among ALL prior labels —
    * case-sensitive, CROSS-type (unlike v2's (text,type)-keyed dedup),
    * insertion order, ids numbered by the source index even when skipped.
    */
  def needsHypernodes(needsScores: Seq[(String, Double)], themes: Seq[String],
                      patterns: Seq[String], traits: Seq[String],
                      existingLabels: Seq[String] = Nil): Seq[V1Node] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[V1Node]
    val labels = scala.collection.mutable.ArrayBuffer(existingLabels: _*)
    def add(n: V1Node): Unit = { out += n; labels += n.label }
    for ((name, score) <- needsScores)
      add(V1Node(s"need_$name", "need", PyText.title(name),
        if (score > 0.6) "high" else if (score > 0.4) "medium" else "low"))
    for ((theme, i) <- themes.zipWithIndex if theme.nonEmpty && !labels.contains(theme))
      add(V1Node(s"theme_$i", "theme", theme,
        if (Seq("business", "leadership", "strategy").exists(PyText.lower(theme).contains(_)))
          "professional" else "personal"))
    for ((p, i) <- patterns.zipWithIndex if p.nonEmpty && !labels.contains(p))
      add(V1Node(s"pattern_$i", "behavioral_pattern", p, "high"))
    for ((t, i) <- traits.zipWithIndex if t.nonEmpty && !labels.contains(t))
      add(V1Node(s"trait_$i", "personality_trait", t, "stable"))
    out.toSeq
  }

  /** The opt-in v1 composition over a document: v2 build → J7 co-occurrence
    * edges → temporal stamps → J9 smoothing. `temporalIndex` is the run's
    * write-time string (empty → fields stay blank-index/'present'-category).
    */
  def buildV1(doc: DocAnalysis, needs: NeedsProfile, temporalIndex: String = ""): DocGraph = {
    val g = GraphBuild.build(doc, needs)
    val withCo = g.edges ++ cooccurrenceEdges(g.nodes, doc.text)
    val (nodes1, edges1) = applyTemporalIndexing(g.nodes, withCo, temporalIndex)
    val (nodes2, edges2) = smoothConfidences(nodes1, edges1)
    g.copy(nodes = nodes2, edges = edges2)
  }
}
