package graft.tools

import graft.ops.NearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown for q62 (verified pairs → CC → keeper): times the pair
  * chain, connected components over a pre-built pair table, and the full
  * resolve, so optimization effort lands where the seconds are.
  * Usage: runMain graft.tools.DedupStageProbe [sfDir] [repeats]
  */
object DedupStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repeats = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to repeats).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-24s min=${ts.map(_._1).min}%7.3f s  rows=${ts.head._2}  all=${ts.map(t => f"${t._1}%.3f").mkString(",")}")
    }

    time("lshVerifiedPairs") { NearDup.lshVerifiedPairs(docs, 0.8).count() }
    val pairs = NearDup.lshVerifiedPairs(docs, 0.8).localCheckpoint()
    time("cc(pairs)") {
      graft.canon.Canonicalize.connectedComponents(spark,
        pairs.select(col("d1").cast("string").as("src"), col("d2").cast("string").as("dst"))).count()
    }
    time("resolve(pairs)") { NearDup.resolveClusters(spark, docs, pairs).count() }
    time("q62_full") {
      NearDup.resolveClusters(spark, docs, NearDup.lshVerifiedPairs(docs, 0.8)).count()
    }
    spark.stop()
  }
}
