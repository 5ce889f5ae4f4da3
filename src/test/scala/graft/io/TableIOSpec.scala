package graft.io

import graft.SparkSpec
import graft.corpus.Corpus
import graft.kg.Pipeline

class TableIOSpec extends SparkSpec {

  test("ParquetTableIO round-trips partitioned appends") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tio").toString
    val tio = new ParquetTableIO(dir)
    assert(!tio.exists("t"))
    tio.append(Seq((1, "a"), (2, "b")).toDF("id", "k"), "t", Seq("k"))
    tio.append(Seq((3, "a")).toDF("id", "k"), "t", Seq("k"))
    assert(tio.exists("t"))
    val back = tio.read(spark, "t")
    assert(back.count() == 3)
    assert(back.where($"k" === "a").count() == 2)
  }

  test("exports: json + csv + text summary (S11), customer-scoped sanitized prefix (F13)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-exp").toString
    val res = Pipeline.run(spark, Corpus.pages(spark, 60, partitions = 2), "erun", "")
    val cid = res.nodes.select("customer_id").limit(1).collect()(0).getString(0)
    val safe = Redact.sanitizeKeyComponent(cid)
    Exports.exportCustomer(res.nodes, res.edges, cid, s"$dir/j", "json")
    Exports.exportCustomer(res.nodes, res.edges, cid, s"$dir/c", "csv")
    assert(spark.read.json(s"$dir/j/$safe/nodes_json").count() > 0)
    assert(spark.read.option("header", "true").csv(s"$dir/c/$safe/edges_csv").columns.contains("evidence"))
    val s = Exports.summary(res.nodes, res.edges, cid)
    assert(s.contains("nodes:") && s.contains("edges:") && s.contains(cid))
  }

  test("redaction (F12) masks emails/SSNs/cards/credentials; sanitization (F13) matches reference") {
    import spark.implicits._
    // string redaction — Column and Scala twins agree
    val dirty = Seq(
      "mail me at john.doe@example.com now",
      "ssn 123-45-6789 on file",
      "card 4111 1111 1111 1111 ok",
      "the password: hunter2 leaked",
      "nothing sensitive here").toDF("s")
    val out = dirty.select(Redact.redact($"s").as("s")).as[String].collect()
    assert(out(0) == "mail me at [REDACTED] now")
    assert(out(1) == "ssn [REDACTED] on file")
    assert(out(2) == "card [REDACTED] ok")
    assert(out(3) == "the [REDACTED] leaked")
    assert(out(4) == "nothing sensitive here")
    dirty.as[String].collect().zip(out).foreach { case (in, expect) =>
      assert(Redact.redactString(in) == expect)
    }
    // frame-level: sensitive column NAMES fully masked, others redacted
    val f = Seq(("secret1", "x@y.com", 5)).toDF("api_token", "note", "n")
    val r = Redact.redactFrame(f).collect()(0)
    assert(r.getString(0) == "[REDACTED]" && r.getString(1) == "[REDACTED]" && r.getInt(2) == 5)
    // F13 — reference semantics: unsafe → '_', strip, cap 50, fallback
    assert(Redact.sanitizeKeyComponent("cust/42 id") == "cust_42_id")
    assert(Redact.sanitizeKeyComponent("__x__") == "x")
    assert(Redact.sanitizeKeyComponent("///") == "unknown")
    assert(Redact.sanitizeKeyComponent("a" * 80) == "a" * 50)
  }
}
