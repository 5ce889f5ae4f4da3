package graft.tools

import graft.corpus.Corpus
import graft.kg.{GraphBuild, Pipeline}
import org.apache.spark.sql.SparkSession

/** Times the scaling job (synthetic-corpus KG pipeline) at one parallelism
  * level, min of N repeats — isolates per-doc-pipeline regressions from the
  * bench harness. Usage: runMain graft.tools.ScaleProbe <cores> <docs> <reps>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(4)
    val docs = args.lift(1).map(_.toLong).getOrElse(400000L)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    def run(n: Long): Double = {
      val t0 = System.nanoTime()
      val c = Pipeline.docGraphs(s, Corpus.pages(s, n, partitions = cores * 8))
        .flatMap(g => GraphBuild.triples(g)).count()
      require(c > 0)
      (System.nanoTime() - t0) / 1e9
    }
    run(5000) // warm
    val ts = (1 to reps).map(_ => run(docs))
    println(f"local[$cores] docs=$docs min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")} docs_per_sec=${docs / ts.min}%.0f")
    s.stop()
  }
}
