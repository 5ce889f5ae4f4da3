#!/usr/bin/env python3
"""Reference-oracle harness (test tooling, not product code).

Runs the ACTUAL reference implementation (/root/reference/lambda-functions)
on the synthetic corpus dumped by graft.tools.DumpCorpus, with boto3 stubbed
so every LLM/S3/DynamoDB call fails -> the reference's own deterministic
fallback paths execute (SURVEY.md section 2.9). The emitted per-document
node/edge/triple sets are written as golden fixtures consumed by the
ScalaTest P/R parity suite.

Usage: python3 run_reference.py <corpus.jsonl> <expected.jsonl>
"""
import base64
import json
import sys
import types

# ---- boto3 stub: every AWS call raises -> deterministic fallbacks
class _FailingClient:
    def __getattr__(self, name):
        def fail(*a, **k):
            raise RuntimeError("offline: no AWS in oracle harness")
        return fail

class _Table:
    def put_item(self, **k):
        return {}

_boto3 = types.ModuleType('boto3')
_boto3.client = lambda *a, **k: _FailingClient()
_boto3.resource = lambda *a, **k: types.SimpleNamespace(Table=lambda name: _Table())
sys.modules['boto3'] = _boto3

sys.path.insert(0, '/root/reference/lambda-functions')

import enhanced_file_analyzer as efa            # noqa: E402
import interview_processing_agent as ipa        # noqa: E402
import needs_analysis_agent as naa              # noqa: E402
import enhanced_hypergraph_builder_agent_v2 as hb2  # noqa: E402
import hypergraph_builder_agent as hb1          # noqa: E402  (v1: J7/J9)

FOLDER_RULES = {"01_jon_fortt": "interview", "00_tim_wolff": "financial"}


def strip_front(content):
    # interview_processing_agent.py:48-53
    if content.startswith('---'):
        end_marker = content.find('---', 3)
        if end_marker > 0:
            content = content[end_marker + 3:].strip()
    return content


def route(customer_id, content_type):
    if customer_id in FOLDER_RULES:
        return FOLDER_RULES[customer_id]
    return {"interview_transcript": "interview",
            "financial_advice": "financial"}.get(content_type, "generic")


class _UnknownType:
    """Sentinel for node types absent from the v1 NodeType enum: equal only
    to the same type string, never to a real enum member."""
    def __init__(self, v): self.v = v
    def __eq__(self, o): return isinstance(o, _UnknownType) and o.v == self.v
    def __hash__(self): return hash(self.v)


def v1_augment(result, text):
    """Apply the v1 builder's J7 (co-occurrence edges) and J9 (confidence
    smoothing) to the v2 graph using the reference's OWN methods
    (hypergraph_builder_agent.py:267-285, 359-404, 465-486)."""
    b1 = hb1.NeptuneHyperGraphBuilder()

    def nt(s):
        try:
            return hb1.NodeType(s)
        except ValueError:
            return _UnknownType(s)

    nodes = [types.SimpleNamespace(id=n['id'], content=n['content'],
                                   type_str=n['node_type'],
                                   node_type=nt(n['node_type']),
                                   confidence=float(n['confidence']))
             for n in result['hypernodes']]
    edges = [types.SimpleNamespace(nodes=[e['source_node_id'], e['target_node_id']],
                                   edge_type=e['edge_type'],
                                   confidence=float(e['confidence']))
             for e in result['hyperedges']]
    for i, n1 in enumerate(nodes):
        for n2 in nodes[i + 1:]:
            if b1.should_create_cooccurrence_edge(n1, n2):
                s = float(b1.calculate_cooccurrence_strength(n1, n2, {'raw_text': text}))
                if s > 0.4:
                    edges.append(types.SimpleNamespace(
                        nodes=[n1.id, n2.id], edge_type='co_occurrence', confidence=s))
    b1.calculate_confidence_scores({'nodes': nodes, 'edges': edges})
    id2content = {n.id: n.content for n in nodes}
    v1_nodes = [{'content': n.content, 'node_type': n.type_str,
                 'confidence': n.confidence} for n in nodes]
    v1_triples = [{'subj': id2content.get(e.nodes[0], ''), 'pred': e.edge_type,
                   'obj': id2content.get(e.nodes[1], ''), 'confidence': e.confidence}
                  for e in edges]
    return v1_nodes, v1_triples


def process_doc(url, customer_id, customer_name, raw):
    analyzer = efa.FileAnalyzer()
    metadata = analyzer.extract_metadata_from_content(raw)
    content_type = metadata.get('content_type', 'interview_transcript')
    routed = route(customer_id, content_type)

    text = strip_front(raw)
    proc = ipa.InterviewTranscriptProcessor()
    structure = proc.parse_interview_structure(text)
    entities = proc.extract_interview_entities(text, structure)
    dynamics = proc.analyze_conversation_dynamics(text, structure)
    insights = proc.extract_key_insights(text, entities, dynamics)

    needs_ct = {"interview": "interview_transcript",
                "financial": "financial_advice"}.get(routed, "unknown")
    # themes pass-through mirrors the deployed call chain (content_data
    # ['themes'] = key_insights main_themes, needs_analysis_agent.py:895-905)
    needs = naa.analyze_human_needs(text, needs_ct,
                                    insights.get('main_themes', []), entities)

    analysis_data = {
        'processing_config': {
            'customer_name': customer_name,
            'customer_folder': customer_id,
            'file_path': url,
            'raw_text': text,
            'entities': entities,
            'key_insights': insights,
            'needs_analysis': {k: v for k, v in needs.items()},
        }
    }
    builder = hb2.EnhancedHypergraphBuilderV2()
    result = builder.build_enhanced_hypergraph(analysis_data)

    id2content = {n['id']: n['content'] for n in result['hypernodes']}
    nodes = [{'content': n['content'], 'node_type': n['node_type'],
              'confidence': float(n['confidence'])} for n in result['hypernodes']]
    triples = [{'subj': id2content.get(e['source_node_id'], ''),
                'pred': e['edge_type'],
                'obj': id2content.get(e['target_node_id'], ''),
                'confidence': float(e['confidence'])}
               for e in result['hyperedges']]
    v1_nodes, v1_triples = v1_augment(result, text)
    return {'url': url, 'customer_id': customer_id, 'routed': routed,
            'extracted_text_sha': __import__('hashlib').sha256(text.encode()).hexdigest(),
            'nodes': nodes, 'triples': triples,
            'v1_nodes': v1_nodes, 'v1_triples': v1_triples}


def main():
    src, dst = sys.argv[1], sys.argv[2]
    out = []
    with open(src, encoding='utf-8') as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            raw = base64.b64decode(row['raw_b64']).decode('utf-8')
            out.append(process_doc(row['url'], row['customer_id'],
                                   row['customer_name'], raw))
    with open(dst, 'w', encoding='utf-8') as f:
        for r in out:
            f.write(json.dumps(r, ensure_ascii=True) + '\n')
    n_nodes = sum(len(r['nodes']) for r in out)
    n_triples = sum(len(r['triples']) for r in out)
    print(f"oracle: {len(out)} docs, {n_nodes} nodes, {n_triples} triples")


if __name__ == '__main__':
    main()
