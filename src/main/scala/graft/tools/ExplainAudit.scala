package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the headline queries — the plan-shape
  * audit (pushdown, pruning, broadcast, partial agg, codegen spans).
  * Usage: runMain graft.tools.ExplainAudit <sfDir> [query...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_agg", "q02_region_revenue", "q04_customers_with_open_orders",
        "q11_doc_stats", "q15_minhash", "q17_lsh_candidates", "q23_ann_cosine_topk")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      println(s"\n########## $n ##########")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
