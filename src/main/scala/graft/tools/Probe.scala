package graft.tools

import graft.ops.NearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-cost probe for the near-dup pipeline (perf work scratchpad). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s min=${ts.min}%6.2fs  rows=${f}%d")
    }

    time("tokens")(docs.select(explode(graft.ops.TextOps.tokens(col("text")))).count())
    time("shingles")(docs.select(explode(NearDup.shingleArr(graft.ops.TextOps.tokens(col("text"))))).count())
    time("shingles+md5x1")(docs.select(md5(explode(NearDup.shingleArr(graft.ops.TextOps.tokens(col("text")))).cast("string"))).count())
    time("shingles x8 rows")(docs
      .select(col("doc_id"), explode(NearDup.shingleArr(graft.ops.TextOps.tokens(col("text")))).as("sh"))
      .select(col("doc_id"), col("sh"), explode(sequence(lit(0L), lit(7L))).as("seed")).count())
    time("x8 + md5")(docs
      .select(col("doc_id"), explode(NearDup.shingleArr(graft.ops.TextOps.tokens(col("text")))).as("sh"))
      .select(col("doc_id"), explode(sequence(lit(0L), lit(7L))).as("seed"), col("sh"))
      .select(md5(concat(col("sh"), lit(":"), col("seed").cast("string")))).count())
    time("full minhash")(NearDup.minhashSignatures(docs).count())
    spark.stop()
  }
}
