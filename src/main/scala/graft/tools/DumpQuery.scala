package graft.tools

import org.apache.spark.sql.SparkSession

/** Incremental-dev subset of [[graft.Verify]]: dump only the NAMED
  * SparkEntry queries to parquet (same session config as Verify) so a new
  * query can be DuckDB-cross-checked without re-running the full matrix.
  *
  * usage: runMain graft.tools.DumpQuery <sfDir> <outDir> <query...>
  */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[dump] $name -> $outDir/$name")
    }
    spark.stop()
  }
}
