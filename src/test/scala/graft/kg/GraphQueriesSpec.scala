package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphQueriesSpec extends SparkSpec {

  private def fixture() = {
    import spark.implicits._
    val nodes = Seq(
      ("n1", "c1", "Alice", "person", 0.9),
      ("n2", "c1", "Growth", "need", 0.7),
      ("n3", "c1", "Planner", "behavioral_pattern", 0.8),
      ("n4", "c2", "Bob", "person", 0.6))
      .toDF("node_id", "customer_id", "content", "node_type", "confidence")
    val edges = Seq(
      ("e1", "c1", "n1", "n2", "demonstrates", 0.7),
      ("e2", "c1", "n2", "n3", "influences", 0.8),
      ("e3", "c2", "n4", "n1", "relates_to", 0.5)) // n1 belongs to c1 → dropped by semi-join
      .toDF("edge_id", "customer_id", "source_node_id", "target_node_id", "relationship_type", "weight")
    (nodes, edges)
  }

  test("customer edges require BOTH endpoints in the customer subgraph (J8)") {
    val (n, e) = fixture()
    assert(GraphQueries.customerEdges(n, e, "c1").count() == 2)
    assert(GraphQueries.customerEdges(n, e, "c2").count() == 0) // n1 is c1's
  }

  test("latest extraction per customer (W3): newest wins, deterministic tie-break, semi-join prune") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val extractions = Seq(
      ("c1", "ex1", ts("2026-01-01 10:00:00")),
      ("c1", "ex2", ts("2026-02-01 10:00:00")),
      ("c1", "ex0", ts("2026-02-01 10:00:00")), // tie on ts → max extraction_id wins
      ("c2", "exA", ts("2026-01-15 09:00:00")))
      .toDF("customer_id", "extraction_id", "ts")
    val latest = GraphQueries.latestExtractionPerCustomer(extractions)
      .select("customer_id", "extraction_id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(latest == Set(("c1", "ex2"), ("c2", "exA")))

    val nodes = Seq(
      ("c1", "ex1", "n-old"), ("c1", "ex2", "n-new1"), ("c1", "ex2", "n-new2"), ("c2", "exA", "n-a"))
      .toDF("customer_id", "extraction_id", "node_id")
    val got = GraphQueries.latestCustomerNodes(nodes, extractions, "c1")
      .select("node_id").as[String].collect().toSet
    assert(got == Set("n-new1", "n-new2"))
  }

  test("graph metrics: density, quality score (A3/A4), W7 quirk") {
    val (n, e) = fixture()
    val m = GraphQueries.graphMetrics(n, e).where(col("customer_id") === "c1").collect()(0)
    assert(m.getAs[Long]("total_nodes") == 3)
    assert(m.getAs[Long]("total_edges") == 2)
    val avgNode = (0.9 + 0.7 + 0.8) / 3
    val avgEdge = (0.7 + 0.8) / 2
    assert(math.abs(m.getAs[Double]("avg_node_confidence") - avgNode) < 1e-9)
    assert(math.abs(m.getAs[Double]("graph_density") - 2.0 / (3 * 2)) < 1e-9)
    // W7: lexicographic max of {demonstrates, influences} = influences
    assert(m.getAs[String]("most_common_relationship") == "influences")
    val quality = 0.3 * avgNode + 0.3 * avgEdge + 0.2 * math.min(3 / 6.0, 1.0) + 0.2 * math.min(2 / 5.0, 1.0)
    assert(math.abs(m.getAs[Double]("quality_score") - quality) < 1e-9)
  }

  test("central entities: degree ranking with deterministic ties (W2/A5)") {
    val (n, e) = fixture()
    val top = GraphQueries.centralEntities(n, e, 2).collect()
      .map(r => (r.getAs[String]("node_id"), r.getAs[Long]("degree")))
    // degrees: n1=2 (e1 src, e3 dst), n2=2, n3=1, n4=1 → tie broken by node_id
    assert(top.toSeq == Seq(("n1", 2L), ("n2", 2L)))
  }

  test("integrity audit: six checks count planted violations; clean graph is all-zero") {
    import spark.implicits._
    val nodes = Seq(
      ("n1", "t", "alpha"), ("n2", "t", "beta"), ("n2", "t", "beta-dup"), // dup node_id
      ("n3", "t", ""), ("n4", "t", null.asInstanceOf[String]))            // empty + null content
      .toDF("node_id", "node_type", "content")
    val edges = Seq(
      ("e1", "n1", "n2", "r"),
      ("e1", "n1", "n2", "r"),          // duplicate edge_id
      ("e2", "n1", "ghost", "r"),       // dangling dst
      ("e3", "ghost2", "n2", "r"),      // dangling src
      ("e4", "n3", "n3", "r"))          // self-loop
      .toDF("edge_id", "src_id", "dst_id", "rel")
    val audit = GraphQueries.integrityAudit(nodes, edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit == Map(
      "dangling_src" -> 1L, "dangling_dst" -> 1L,
      "duplicate_edge_id" -> 1L, "duplicate_node_id" -> 1L,
      "self_loop" -> 1L, "empty_content" -> 2L))

    val cleanNodes = Seq(("n1", "t", "a"), ("n2", "t", "b")).toDF("node_id", "node_type", "content")
    val cleanEdges = Seq(("e1", "n1", "n2", "r")).toDF("edge_id", "src_id", "dst_id", "rel")
    val clean = GraphQueries.integrityAudit(cleanNodes, cleanEdges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.size == 6 && clean.values.forall(_ == 0L)) // explicit 6-row certificate
  }
}
