package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShortestPathSpec extends SparkSpec {

  private def edges(rows: (String, String, Long)*) = {
    import spark.implicits._
    rows.toDF("src", "dst", "w")
  }

  private def run(e: org.apache.spark.sql.DataFrame, seed: String, rounds: Int,
                  directed: Boolean = false): Map[String, Long] =
    ShortestPath.ssspBounded(spark, e, lit(seed), rounds, directed = directed)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("weighted min beats hop-min: longer path with smaller total weight wins") {
    // a -10-> d  direct, but a -1-> b -1-> c -1-> d total 3
    val e = edges(("a", "d", 10L), ("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L))
    val d = run(e, "a", rounds = 4)
    assert(d == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
    // with only 1 round, just the direct relaxations apply
    assert(run(e, "a", rounds = 1) == Map("a" -> 0L, "b" -> 1L, "d" -> 10L))
    // 2 rounds: c reached via b; d still cheapest via the direct edge so far
    assert(run(e, "a", rounds = 2) == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 10L))
    // 3 rounds: the 3-edge path relaxes d from 10 to 3
    assert(run(e, "a", rounds = 3)("d") == 3L)
  }

  test("round bound caps the path space; unreachable nodes absent") {
    val chain = edges(("a", "b", 2L), ("b", "c", 2L), ("c", "d", 2L),
      ("d", "e", 2L), ("x", "y", 1L))
    val d = run(chain, "a", rounds = 2)
    assert(d == Map("a" -> 0L, "b" -> 2L, "c" -> 4L))
    assert(!d.contains("x") && !d.contains("y"))
  }

  test("undirected symmetrization: reverse edges usable; directed mode is not") {
    val e = edges(("b", "a", 5L))
    assert(run(e, "a", rounds = 3) == Map("a" -> 0L, "b" -> 5L))
    assert(run(e, "a", rounds = 3, directed = true) == Map("a" -> 0L))
  }

  test("parallel edges: minimum weight wins") {
    val e = edges(("a", "b", 7L), ("a", "b", 3L))
    assert(run(e, "a", rounds = 1)("b") == 3L)
  }

  test("early exit on convergence does not change the result") {
    val e = edges(("a", "b", 1L), ("b", "c", 1L))
    // rounds far beyond the diameter: loop must exit when nothing improves
    assert(run(e, "a", rounds = 50) == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }
}
