package graft.io

import graft.SparkSpec
import graft.corpus.Corpus
import graft.kg.Pipeline

class TableIOSpec extends SparkSpec {

  test("ParquetTableIO round-trips partitioned appends") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tio").toString
    val tio = new ParquetTableIO(dir)
    assert(!tio.exists("t"))
    tio.append(Seq((1, "a"), (2, "b")).toDF("id", "k"), "t", Seq("k"))
    tio.append(Seq((3, "a")).toDF("id", "k"), "t", Seq("k"))
    assert(tio.exists("t"))
    val back = tio.read(spark, "t")
    assert(back.count() == 3)
    assert(back.where($"k" === "a").count() == 2)
  }

  test("exports: json + csv + text summary (S11)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-exp").toString
    val res = Pipeline.run(spark, Corpus.pages(spark, 60, partitions = 2), "erun", "")
    val cid = res.nodes.select("customer_id").limit(1).collect()(0).getString(0)
    Exports.exportCustomer(res.nodes, res.edges, cid, s"$dir/j", "json")
    Exports.exportCustomer(res.nodes, res.edges, cid, s"$dir/c", "csv")
    assert(spark.read.json(s"$dir/j/nodes_json").count() > 0)
    assert(spark.read.option("header", "true").csv(s"$dir/c/edges_csv").columns.contains("evidence"))
    val s = Exports.summary(res.nodes, res.edges, cid)
    assert(s.contains("nodes:") && s.contains("edges:") && s.contains(cid))
  }
}
