package graft.expr

import graft.SparkSpec
import graft.corpus.Corpus
import graft.text.TextExtract
import org.apache.spark.sql.functions._

/** Custom Catalyst expressions: eval + codegen parity with the Scala
  * functions, SQL registration, and codegen-span check.
  */
class GraftExpressionsSpec extends SparkSpec {

  test("extract_text expression matches the Scala function on all fixture variants") {
    import spark.implicits._
    val pages = (0L until 100L).map(Corpus.genPage(_)).toDS()
    val viaExpr = pages.select($"url", GraftExpressions.extract_text($"html").as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val viaFn = (0L until 100L).map { i =>
      val p = Corpus.genPage(i); p.url -> TextExtract.extractText(p.html)
    }.toMap
    assert(viaExpr == viaFn)
  }

  test("SQL registration: graft_extract_text usable from spark.sql") {
    import spark.implicits._
    GraftExpressions.register(spark)
    (0L until 10L).map(Corpus.genPage(_)).toDS().createOrReplaceTempView("pages_v")
    val out = spark.sql(
      "SELECT url, graft_extract_text(html) AS text, graft_front_matter_strip(text) AS t2 FROM pages_v")
      .collect()
    assert(out.length == 10)
    assert(out.forall(r => r.getString(1) == r.getString(2))) // html path ≡ text-column path
  }

  test("expression participates in whole-stage codegen (no CodegenFallback)") {
    import spark.implicits._
    val df = Corpus.pages(spark, 5, partitions = 1)
      .select(GraftExpressions.extract_text($"html").as("t"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l => l.contains("graft_extract_text") && l.trim.startsWith("*(")),
      s"expression not inside a codegen stage:\n$plan")
    // force evaluation through the codegen path
    assert(df.where(length($"t") >= 0).count() == 5)
  }

  test("graft_dot: bit-identical to the HOF fold, codegen'd, SQL-registered") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1), Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = df.select($"id",
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expr = df.select($"id", GraftExpressions.dot_product($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(expr == hof) // exact double equality: same addition order
    // inside whole-stage codegen: Range source (a local Seq constant-folds to
    // LocalTableScan) and CreateArray inputs (a transform() HOF in the SAME
    // projection would force the whole Project out of codegen — which is
    // exactly why graft_dot exists)
    val arr = array((0 until 8).map(i => ($"id" + i).cast("double")): _*)
    val plan = spark.range(10)
      .select(GraftExpressions.dot_product(arr, arr).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("graft_dot") && l.trim.startsWith("*(")),
      s"graft_dot not inside a codegen stage:\n$plan")
    // SQL registration
    GraftExpressions.register(spark)
    df.createOrReplaceTempView("vecs_v")
    val viaSql = spark.sql("SELECT id, graft_dot(a, b) AS d FROM vecs_v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == hof)
    // null rows propagate null
    val withNull = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), a) AS d FROM vecs_v LIMIT 1").collect()
    assert(withNull.head.isNullAt(0))
  }

  test("graft_nfc: matches java.text.Normalizer, composes marks, keeps ligatures, codegen'd") {
    import spark.implicits._
    val fixtures = Seq(
      "cafe\u0301",             // e + combining acute -> \u00e9
      "A\u030Angstro\u0308m",   // ring + diaeresis compose
      "\uFB01nal",              // fi ligature: NFC must NOT decompose (NFKC would)
      "caf\u00e9",              // already composed: unchanged
      "plain ascii", "")
    val df = fixtures.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = df.select($"id", GraftExpressions.nfc_normalize($"s").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    fixtures.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    assert(got(0L) == "caf\u00e9" && got(0L).length == 4)
    assert(got(1L) == "\u00c5ngstr\u00f6m")
    assert(got(2L) == "\uFB01nal") // unchanged
    // composed and decomposed inputs now hash identically (the dedup motivation)
    val k = df.select(md5(GraftExpressions.nfc_normalize($"s")).as("h"), $"id")
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(k(0L) == k(3L))
    // inside whole-stage codegen + SQL registration
    GraftExpressions.register(spark)
    df.createOrReplaceTempView("nfc_v")
    assert(spark.sql("SELECT graft_nfc(s) AS n FROM nfc_v WHERE id = 0").collect()(0).getString(0) == "caf\u00e9")
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(GraftExpressions.nfc_normalize($"text").as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("graft_nfc") && l.trim.startsWith("*(")),
      s"graft_nfc not inside a codegen stage:\n$plan")
  }

  test("type checking rejects wrong input types") {
    import spark.implicits._
    val df = Seq(1, 2).toDF("x")
    val err = intercept[Exception] {
      df.select(GraftExpressions.extract_text($"x")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("binary") ||
      err.getMessage.contains("graft_extract_text"))
  }
}
