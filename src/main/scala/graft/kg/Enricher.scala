package graft.kg

import graft.model._

/** §2.9 LLM-enrichment seam. The reference's builder runs an LLM pass after
  * the deterministic extractors — extra entities
  * (enhanced_hypergraph_builder_agent_v2.py:444-516) and semantic
  * relationships (:1017-1090) are appended to the rule-based lists BEFORE
  * dedup; offline the pass degrades to nothing. This trait is the pluggable
  * Spark equivalent: implementations are serialized into the fused narrow
  * stage, `open()` runs once per partition (amortized model/client init —
  * the mapPartitions analog of the Lambda's warm container), and broadcast
  * state (keyword maps, alias dictionaries, model handles) should be held as
  * `Broadcast[_]` fields. The default `NoopEnricher` returns nothing, so the
  * deterministic parity contract holds byte-for-byte unless a caller opts
  * in.
  */
trait Enricher extends Serializable {
  /** Once per partition, before the first document (client/model init). */
  def open(): Unit = ()
  /** Extra entities appended to the rule-based list before A11 dedup
    * (v2:_extract_entities_with_llm).
    */
  def enrichEntities(doc: DocAnalysis, base: Seq[Entity]): Seq[Entity] = Nil
  /** Extra relationships appended before A12 dedup
    * (v2:_extract_semantic_relationships_with_llm).
    */
  def enrichRelationships(doc: DocAnalysis, entities: Seq[Entity],
                          base: Seq[Relationship]): Seq[Relationship] = Nil
  /** Once per partition at task completion (close clients). */
  def close(): Unit = ()
}

/** The deterministic default — identical output to no enrichment stage. */
object NoopEnricher extends Enricher
