package graft.kg

import graft.SparkSpec
import graft.corpus.Corpus
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Triple-parity harness (north rule: P/R ≥ 0.95 vs the reference).
  *
  * The golden fixtures in test-oracle/expected_500.jsonl were produced by
  * running the reference's OWN Python code (offline, deterministic fallbacks)
  * over the identical synthetic corpus — see test-oracle/run_reference.py.
  * Comparison normalizes (lower(subj), pred, lower(obj)) and excludes
  * timestamps (SURVEY F18).
  */
class ParitySpec extends SparkSpec {

  private case class Expected(
      url: String, routed: String, textSha: String,
      nodes: Set[(String, String, Double)],
      triples: Set[(String, String, String, Double)])

  private def loadExpected(): Map[String, Expected] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    Files.readAllLines(Paths.get("test-oracle/expected_500.jsonl")).asScala
      .filter(_.nonEmpty).map { line =>
        val n = mapper.readTree(line)
        val nodes = n.get("nodes").elements().asScala.map { x =>
          (x.get("content").asText(), x.get("node_type").asText(),
            math.rint(x.get("confidence").asDouble() * 1e6) / 1e6)
        }.toSet
        val triples = n.get("triples").elements().asScala.map { x =>
          (x.get("subj").asText().toLowerCase, x.get("pred").asText(),
            x.get("obj").asText().toLowerCase,
            math.rint(x.get("confidence").asDouble() * 1e6) / 1e6)
        }.toSet
        val url = n.get("url").asText()
        url -> Expected(url, n.get("routed").asText(),
          n.get("extracted_text_sha").asText(), nodes, triples)
      }.toMap
  }

  test("byte-identical extraction + triple P/R == 1.0 vs reference on 500 docs") {
    val expected = loadExpected()
    assert(expected.size == 500)

    val results = (0L until 500L).map { i =>
      val p = Corpus.genPage(i, 42L)
      val doc = graft.analyze.DocAnalyze.analyze(p)
      val needs = graft.needs.Needs.profile(doc)
      val g = GraphBuild.build(doc, needs)
      (p.url, doc, g)
    }

    var tp = 0L; var fp = 0L; var fn = 0L
    var nodeMismatch = 0
    for ((url, doc, g) <- results) {
      val exp = expected(url)
      // 1. byte-identical invariant: sha256 of extracted text
      val sha = graft.text.PyText.sha256Hex(doc.text)
      assert(sha == exp.textSha, s"extracted text differs for $url")
      // 2. routing parity
      assert(doc.routedPath == exp.routed, s"routing differs for $url")
      // 3. node set parity
      val gotNodes = g.nodes.map(n => (n.content, n.nodeType, math.rint(n.confidence * 1e6) / 1e6)).toSet
      if (gotNodes != exp.nodes) {
        nodeMismatch += 1
        if (nodeMismatch <= 3)
          info(s"node diff @$url\n only-ours: ${gotNodes -- exp.nodes}\n only-ref: ${exp.nodes -- gotNodes}")
      }
      // 4. triple P/R accumulation
      val got = GraphBuild.triples(g)
        .map(t => (t.subj.toLowerCase, t.pred, t.obj.toLowerCase, math.rint(t.confidence * 1e6) / 1e6)).toSet
      tp += (got intersect exp.triples).size
      fp += (got -- exp.triples).size
      fn += (exp.triples -- got).size
      if ((got -- exp.triples).nonEmpty || (exp.triples -- got).nonEmpty) {
        if (fp + fn < 20)
          info(s"triple diff @$url\n only-ours: ${got -- exp.triples}\n only-ref: ${exp.triples -- got}")
      }
    }
    val precision = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    val recall = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    info(f"triples: tp=$tp fp=$fp fn=$fn precision=$precision%.4f recall=$recall%.4f nodeMismatch=$nodeMismatch")
    assert(precision >= 0.95, f"precision $precision%.4f < 0.95")
    assert(recall >= 0.95, f"recall $recall%.4f < 0.95")
    assert(nodeMismatch == 0, s"$nodeMismatch docs with node-set differences")
    assert(precision == 1.0 && recall == 1.0, "expected exact parity on deterministic path")
  }

  test("v1 mode (J7 co-occurrence + J9 smoothing) matches the reference's own v1 methods on 500 docs") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val expected = Files.readAllLines(Paths.get("test-oracle/expected_500.jsonl")).asScala
      .filter(_.nonEmpty).map { line =>
        val n = mapper.readTree(line)
        def tset(field: String) = n.get(field).elements().asScala.map { x =>
          (x.get("subj").asText().toLowerCase, x.get("pred").asText(),
            x.get("obj").asText().toLowerCase,
            math.rint(x.get("confidence").asDouble() * 1e6) / 1e6)
        }.toSet
        val nodes = n.get("v1_nodes").elements().asScala.map { x =>
          (x.get("content").asText(), x.get("node_type").asText(),
            math.rint(x.get("confidence").asDouble() * 1e6) / 1e6)
        }.toSet
        n.get("url").asText() -> (nodes, tset("v1_triples"))
      }.toMap
    assert(expected.size == 500)

    var tp = 0L; var fp = 0L; var fn = 0L; var nodeMismatch = 0; var nCo = 0
    for (i <- 0L until 500L) {
      val p = Corpus.genPage(i, 42L)
      val doc = graft.analyze.DocAnalyze.analyze(p)
      val g = GraphBuildV1.buildV1(doc, graft.needs.Needs.profile(doc))
      val (expNodes, expTriples) = expected(p.url)
      val gotNodes = g.nodes.map(n => (n.content, n.nodeType, math.rint(n.confidence * 1e6) / 1e6)).toSet
      if (gotNodes != expNodes) {
        nodeMismatch += 1
        if (nodeMismatch <= 3)
          info(s"v1 node diff @${p.url}\n only-ours: ${gotNodes -- expNodes}\n only-ref: ${expNodes -- gotNodes}")
      }
      val got = GraphBuild.triples(g)
        .map(t => (t.subj.toLowerCase, t.pred, t.obj.toLowerCase, math.rint(t.confidence * 1e6) / 1e6)).toSet
      nCo += got.count(_._2 == "co_occurrence")
      tp += (got intersect expTriples).size
      fp += (got -- expTriples).size
      fn += (expTriples -- got).size
      if ((got -- expTriples).nonEmpty && fp < 20)
        info(s"v1 triple diff @${p.url}\n only-ours: ${got -- expTriples}\n only-ref: ${expTriples -- got}")
    }
    info(s"v1: tp=$tp fp=$fp fn=$fn co_occurrence=$nCo nodeMismatch=$nodeMismatch")
    assert(nCo > 0, "corpus should produce some co-occurrence edges")
    assert(fp == 0 && fn == 0 && nodeMismatch == 0, "expected exact v1 parity on deterministic path")
  }

  test("pipeline on Spark produces identical triples at different parallelism (determinism)") {
    import spark.implicits._
    val t1 = Pipeline.docGraphs(spark, Corpus.pages(spark, 100, partitions = 2))
      .flatMap(GraphBuild.triples(_)).collect()
      .map(t => (t.url, t.subj, t.pred, t.obj, t.confidence)).sorted.toSeq
    val t2 = Pipeline.docGraphs(spark, Corpus.pages(spark, 100, partitions = 7))
      .flatMap(GraphBuild.triples(_)).collect()
      .map(t => (t.url, t.subj, t.pred, t.obj, t.confidence)).sorted.toSeq
    assert(t1 == t2 && t1.nonEmpty)
  }
}
