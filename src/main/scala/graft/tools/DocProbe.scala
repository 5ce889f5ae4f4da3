package graft.tools

import graft.corpus.Corpus
import graft.kg.Pipeline

/** Single-threaded per-doc transform cost (no Spark): docs/sec over the
  * synthetic corpus, min of N repeats. Isolates rule/regex cost from
  * cluster/steal effects. Usage: runMain graft.tools.DocProbe <docs> <reps>
  */
object DocProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(10000)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    def once(): Double = {
      val t0 = System.nanoTime()
      var i = 0
      var acc = 0L
      while (i < n) {
        val g = Pipeline.buildDoc(Corpus.genPage(i.toLong))
        acc += g.nodes.size + g.edges.size
        i += 1
      }
      require(acc > 0)
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm
    val ts = (1 to reps).map(_ => once())
    println(f"docs=$n single-thread min=${ts.min}%.2f s  docs_per_sec=${n / ts.min}%.0f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
  }
}
