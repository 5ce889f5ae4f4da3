package graft

/** Driver-contract smoke: entry() must return rows on sf0.001, and every
  * declared oracle key must have a matching query.
  */
class EntrySpec extends SparkSpec {

  test("entry(spark) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("NER-oracle assumptions hold on the driver corpus: orgNer never fires, regex anchors agree") {
    import org.apache.spark.sql.functions.col
    // the q25/q33/q37/q38/q39 oracles replay ONLY the person-NER regex; they
    // are silently wrong the day the corpus vocabulary grows a title-cased
    // org keyword ("Company", "Inc", …) or a token the anchored and
    // unanchored regexes split on — fail loudly here instead
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val bodies = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("text")).collect().map(r =>
          graft.corpus.Corpus.derivedBody(r.getString(0)))
      val orgHits = bodies.flatMap(b => graft.analyze.DocAnalyze.orgNer(b))
      assert(orgHits.isEmpty,
        s"orgNer fired on $sf (${orgHits.take(3).toSeq}) — the NER oracles must add ORGANIZATION rows")
      // engine regex (\b + UNICODE_CHARACTER_CLASS) ≡ the oracle's RE2
      // '\b...\b' on this corpus: every extracted surface is pure-alpha and
      // space-separated, so the two boundary dialects cannot diverge
      val surfaces = bodies.flatMap(b => graft.analyze.DocAnalyze.nameNer(b)).map(_.text)
      assert(surfaces.nonEmpty)
      assert(surfaces.forall(_.matches("[A-Za-z ]+")),
        s"non-alpha NER surface on $sf: ${surfaces.filterNot(_.matches("[A-Za-z ]+")).take(3).toSeq}")
    }
  }

  test("q67 JSON parsing: malformed props -> null k, skipped by avg but counted by n") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val props = Seq("""{"k": 10}""", "not json", """{"k": 20}""", """{"other": 1}""")
      .toDF("props")
    val parsed = props.select(
      org.apache.spark.sql.functions.from_json(col("props"),
        StructType(Seq(StructField("k", LongType)))).getField("k").as("k"))
    val agg = parsed.agg(count(lit(1)).as("n"), count(col("k")).as("nk"),
      sum(col("k")).as("s")).collect()(0)
    assert((agg.getLong(0), agg.getLong(1), agg.getLong(2)) == ((4L, 2L, 30L)))
  }

  test("every oracleSql key has a queries entry; all queries run on sf0.001") {
    val qs = SparkEntry.queries
    val missing = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(missing.isEmpty, s"oracle keys without queries: $missing")
    for ((name, fn) <- qs) {
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, s"$name failed")
    }
  }
}
