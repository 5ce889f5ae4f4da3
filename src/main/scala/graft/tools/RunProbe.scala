package graft.tools

import graft.corpus.Corpus
import graft.kg.{GraphBuild, Pipeline}
import org.apache.spark.sql.SparkSession

/** Phase-level timing of Pipeline.run internals (perf bisection). */
object RunProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s   ($r)")
    }
    val pages = Corpus.pages(spark, n, partitions = 128)
    time("docGraphs.count") {
      Pipeline.docGraphs(spark, pages).flatMap(g => GraphBuild.triples(g)).count()
    }
    time("docGraphsWithPartition.cnt") {
      Pipeline.docGraphsWithPartition(spark, pages).count()
    }
    val graphs = Pipeline.docGraphsWithPartition(spark, pages)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist materialize") { graphs.count() }
    val nodeRows = graphs.flatMap { case (o, _, _) =>
      val g = o.graph
      g.nodes.map(nd => (g.customerId, g.url, nd.id, nd.content, nd.nodeType, nd.confidence, nd.source))
    }.toDF("customer_id", "url", "node_id", "content", "node_type", "confidence", "source_file")
    time("nodeRows.count") { nodeRows.count() }
    val keyed = nodeRows.withColumn("key", org.apache.spark.sql.functions.lower($"content"))
    val canon = keyed.select($"key").distinct()
      .select($"key", $"key".as("canonical_key"))
    time("canon.count") { canon.count() }
    val dir = java.nio.file.Files.createTempDirectory("runprobe").toString
    time("nodes write (partitioned)") {
      keyed.join(org.apache.spark.sql.functions.broadcast(canon), Seq("key"))
        .drop("key", "canonical_key")
        .write.partitionBy("node_type").parquet(s"$dir/nodes")
    }
    time("triples write") {
      graphs.flatMap { case (o, _, _) => GraphBuild.triples(o.graph) }.toDF()
        .write.parquet(s"$dir/triples")
    }
    time("full Pipeline.run") {
      Pipeline.run(spark, pages, "probe", s"$dir/full")
    }
    spark.stop()
  }
}
