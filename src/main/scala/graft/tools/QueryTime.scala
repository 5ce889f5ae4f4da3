package graft.tools

import org.apache.spark.sql.SparkSession

/** Times individual SparkEntry queries (N repeats after a warmup) — the
  * iteration loop for plan/perf work without the full Bench harness.
  * Usage: runMain graft.tools.QueryTime <sfDir> <repeats> <query...>
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val repeats = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q15_minhash", "q17_lsh_candidates", "q34_neardup_lsh_verified")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.count() // warm
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        df.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-28s min=${times.min}%6.2fs  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
