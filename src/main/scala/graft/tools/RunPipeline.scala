package graft.tools

import graft.corpus.Corpus
import graft.kg.{GraphQueries, Pipeline}
import org.apache.spark.sql.SparkSession

/** CLI entry point: run the full KG pipeline over the synthetic corpus and
  * materialize nodes/edges/triples/metrics/lineage tables.
  *
  * Usage: runMain graft.tools.RunPipeline <nDocs> <outDir> [cores] [resume] [v1]
  * (`v1` opts into the v1-builder mode: co-occurrence edges, temporal
  * stamps, confidence smoothing. spark-submit --class
  * graft.tools.RunPipeline on a cluster.)
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val outDir = args(1)
    val cores = if (args.length > 2) args(2) else "4"
    val resume = args.contains("resume")
    val v1 = args.contains("v1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cores]"))
      .appName("graft-kg-pipeline")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val pages = Corpus.pages(spark, n, partitions = cores.toInt * 4)
    // fresh runId per ATTEMPT (the commit protocol refuses reuse — resume
    // dedup rides on the lineage table, not on the run id)
    val runId = s"run_${n}_${System.currentTimeMillis()}"
    val result = Pipeline.run(spark, pages, runId = runId, outDir = outDir, resume = resume, v1 = v1)
    val secs = (System.nanoTime() - t0) / 1e9

    val nodes = spark.read.parquet(s"$outDir/nodes")
    val edges = spark.read.parquet(s"$outDir/edges")
    val triples = spark.read.parquet(s"$outDir/triples")
    println(s"=== pipeline done in ${f"$secs%.1f"}s: " +
      s"${nodes.count()} nodes, ${edges.count()} edges, ${triples.count()} triples from $n pages ===")
    println("--- node_type histogram ---")
    nodes.groupBy("node_type").count().orderBy("node_type").show(20, truncate = false)
    println("--- predicate histogram ---")
    triples.groupBy("pred").count().orderBy("pred").show(20, truncate = false)
    println("--- sample triples ---")
    triples.select("customer_id", "subj", "pred", "obj", "confidence").show(10, truncate = false)
    val someCustomer = nodes.select("customer_id").limit(1).collect()(0).getString(0)
    println(s"--- customer summary: $someCustomer ---")
    val (nh, eh) = GraphQueries.customerSummary(
      nodes.withColumnRenamed("node_id", "node_id"), edges, someCustomer)
    nh.show(12, truncate = false)
    eh.show(12, truncate = false)
    if (v1) {
      println("--- temporal stamps (v1, F19) ---")
      nodes.groupBy("temporal_category").count().show(5, truncate = false)
      println(s"distinct temporal_index values: " +
        nodes.select("temporal_index").distinct().count())
    }
    println("--- per-partition metrics (lineage/north rule) ---")
    spark.read.parquet(s"$outDir/metrics").orderBy("partition_id").show(8, truncate = false)
    spark.stop()
  }
}
