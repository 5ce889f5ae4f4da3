package graft.tools

import graft.canon.Canonicalize
import org.apache.spark.sql.SparkSession

/** Canonicalization CC at scale: a deterministic synthetic edge list with a
  * heavy hub star (~30% of all edges on one node), random mass, and
  * bounded-diameter chains (hash-min label propagation converges in
  * O(diameter) rounds — entity-alias graphs are shallow, so chains are
  * capped at 16 hops). Reports wall time, component stats, and the live
  * cached-RDD count (the round-3 snapshot-freeing fix holds it at <=2
  * label snapshots regardless of iteration count).
  * Usage: runMain graft.tools.CanonScale [nEdges]
  */
object CanonScale {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val m = math.max(n / 10, 1L)
    val edges = spark.range(n).map { i =>
      (i % 10) match {
        case k if k < 6 => (s"v${(i * 2654435761L) % m}", s"v${(i * 40503L + 7) % m}")
        case k if k < 9 => ("hub", s"v${i % m}") // ~30% of edges on one node
        case _ => (s"c${i / 160}_${(i % 160) / 10}", s"c${i / 160}_${(i % 160) / 10 + 1}")
      }
    }.toDF("src", "dst").localCheckpoint()
    println(s"edges=${edges.count()}")

    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val t0 = System.nanoTime()
    val cc = Canonicalize.connectedComponents(spark, edges)
    val nComp = cc.select("component").distinct().count()
    val nNodes = cc.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val live = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    println(f"cc: $nNodes%d nodes, $nComp%d components in $secs%.1f s; live cached RDDs added: ${live.size}")
    spark.stop()
  }
}
