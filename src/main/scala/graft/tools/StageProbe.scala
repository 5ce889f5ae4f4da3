package graft.tools

import graft.corpus.Corpus

/** Per-stage cost breakdown of the per-doc transform (single-threaded). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(10000)
    val pages = (0 until n).map(i => Corpus.genPage(i.toLong)).toArray
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"$name%-12s min=${ts.min}%6.3f s")
    }
    val docs = pages.map(graft.analyze.DocAnalyze.analyze)
    val needs = docs.map(graft.needs.Needs.profile)
    time("analyze") { pages.foreach(graft.analyze.DocAnalyze.analyze) }
    time("needs") { docs.foreach(graft.needs.Needs.profile) }
    time("build") { docs.zip(needs).foreach { case (d, np) => graft.kg.GraphBuild.build(d, np) } }
    // analyze sub-stages
    val texts = pages.map(p => graft.text.TextExtract.frontMatterStrip(graft.text.TextExtract.htmlToRaw(p.html)))
    time("extract") { pages.foreach(p => graft.text.TextExtract.frontMatterStrip(graft.text.TextExtract.htmlToRaw(p.html))) }
    time("parseStruct") { texts.foreach(graft.analyze.DocAnalyze.parseStructure) }
    time("nameNer") { texts.foreach(graft.analyze.DocAnalyze.nameNer) }
    time("orgNer") { texts.foreach(graft.analyze.DocAnalyze.orgNer) }
    time("complexity") { texts.foreach(graft.analyze.DocAnalyze.complexity) }
  }
}
