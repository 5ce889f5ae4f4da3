package graft.tools

import java.util.concurrent.Executors

/** Spark-free scaling probe: run the per-doc transform (genPage → buildDoc)
  * on a fixed work set with N threads. Isolates JVM-level scalability of the
  * transform (locks, allocation, GC) from Spark scheduling.
  * Usage: runMain graft.tools.ThreadBench <docs> <threads...>
  */
object ThreadBench {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val threadCounts = args.drop(1).map(_.toInt)
    // warmup
    (0 until 2000).foreach(i => graft.kg.Pipeline.buildDoc(graft.corpus.Corpus.genPage(i.toLong)))
    for (tc <- threadCounts) {
      val pool = Executors.newFixedThreadPool(tc)
      val t0 = System.nanoTime()
      val chunk = n / tc
      val futures = (0 until tc).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = t * chunk
            val end = i + chunk
            var acc = 0L
            while (i < end) {
              acc += graft.kg.Pipeline.buildDoc(graft.corpus.Corpus.genPage(i.toLong)).nodes.size
              i += 1
            }
            if (acc == -1) println("impossible")
          }
        })
      }
      futures.foreach(_.get())
      val secs = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      println(f"threads=$tc%2d docs=$n secs=$secs%.2f docs_per_sec=${n / secs}%.0f per_core=${n / secs / tc}%.0f")
    }
  }
}
