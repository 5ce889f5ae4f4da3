package graft.tools

import graft.corpus.Corpus
import java.nio.file.{Files, Paths}
import java.util.Base64

/** Dumps the synthetic corpus as JSONL (url, customer_id, customer_name,
  * raw base64) so the reference-oracle harness (test/oracle/run_reference.py)
  * can run the reference's own Python code on identical inputs.
  * Usage: runMain graft.tools.DumpCorpus <n> <outFile> [seed]
  */
object DumpCorpus {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val out = args(1)
    val seed = if (args.length > 2) args(2).toLong else 42L
    val sb = new StringBuilder
    var i = 0L
    while (i < n) {
      val p = Corpus.genPage(i, seed)
      val doc = graft.analyze.DocAnalyze.analyze(p)
      val raw = graft.text.TextExtract.htmlToRaw(p.html)
      val b64 = Base64.getEncoder.encodeToString(raw.getBytes("UTF-8"))
      def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      sb.append(s"""{"url": ${q(p.url)}, "customer_id": ${q(doc.customerId)}, "customer_name": ${q(doc.customerName)}, "raw_b64": ${q(b64)}}""")
      sb.append('\n')
      i += 1
    }
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $n docs to $out")
  }
}
