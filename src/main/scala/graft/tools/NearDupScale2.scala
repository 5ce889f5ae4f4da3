package graft.tools

import graft.corpus.Corpus
import graft.ops.{NearDup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Near-dup at scale with the production discipline: exact dedup FIRST
  * (identical texts collapse to one canonical doc), then LSH near-dup over
  * canonical docs only. Usage: runMain graft.tools.NearDupScale2 [nDocs]
  */
object NearDupScale2 {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(50000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = Corpus.pages(spark, n, partitions = 128)
      .select(monotonically_increasing_id().as("doc_id"), $"text")
      .localCheckpoint()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$r")
    }
    val canonical = TextOps.exactDedup(docs)
      .where(!col("is_duplicate")).select(col("doc_id"))
      .join(docs, Seq("doc_id")).localCheckpoint()
    println(s"docs=$n canonical=${canonical.count()}")
    time("exact+lsh_candidates")(NearDup.lshCandidates(
      NearDup.lshBands(NearDup.minhashSignatures(canonical))).count())
    time("exact+lsh_verified")(NearDup.lshVerifiedPairs(canonical, 0.8).count())
    spark.stop()
  }
}
