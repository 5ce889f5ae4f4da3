package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {

  test("comentionEdges: same-doc distinct pairs, canonical order, corpus distinct") {
    import spark.implicits._
    val mentions = Seq(
      (1L, "Y"), (1L, "X"), (1L, "Z"), (1L, "Y"), // dup mention collapses
      (2L, "X"), (2L, "Y"),                        // repeats the X-Y edge
      (3L, "Solo")                                 // single mention → no pair
    ).toDF("doc_id", "surface")
    val edges = Triangles.comentionEdges(mentions).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges == Set(("X", "Y"), ("X", "Z"), ("Y", "Z")))
  }

  test("triangleStats: square + diagonal — counts, degrees, clustering") {
    import spark.implicits._
    // a-b-c-d-a plus diagonal a-c: triangles abc and acd
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("a", "c"))
      .toDF("a", "b")
    val out = Triangles.triangleStats(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a") == ((3L, 2L, 0.666667))) // 2·2/(3·2) rounded 6dp
    assert(out("b") == ((2L, 1L, 1.0)))
    assert(out("c") == ((3L, 2L, 0.666667)))
    assert(out("d") == ((2L, 1L, 1.0)))
  }

  test("triangleStats: hub star has zero triangles, leaves get clustering 0") {
    import spark.implicits._
    val edges = (1 to 6).map(i => ("hub", s"leaf$i")).toDF("a", "b")
    val out = Triangles.triangleStats(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("hub") == ((6L, 0L, 0.0)))
    assert(out("leaf3") == ((1L, 0L, 0.0))) // degree 1 → coefficient defined as 0
  }
}
