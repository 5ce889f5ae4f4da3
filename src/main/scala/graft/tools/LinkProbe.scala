package graft.tools

import graft.corpus.Corpus
import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: q38 stage-by-stage timing. */
object LinkProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def mentions = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val body = Corpus.derivedBody(text)
        graft.analyze.DocAnalyze.extractEntities(body).zipWithIndex.map {
          case (e, i) => (s"$id#${i + 1}", id, e.text, body)
        }
      }.toDF("mention_id", "doc_id", "surface", "context")
    def kb = docs.select(explode(TextOps.tokens(col("text"))).as("tok")).distinct()
      .select(col("tok").as("entity_id"),
        concat(upper(substring(col("tok"), 1, 1)), substring(col("tok"), 2, 1000)).as("canonical_name"),
        array(col("tok")).as("aliases"),
        col("tok").as("profile"),
        round(lit(0.3) + (length(col("tok")) % 5) * lit(0.1), 1).as("prior"))
    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"$name%-22s min=${ts.min}%6.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    mentions.count(); kb.count() // warm
    time("mentions")(mentions.count())
    time("kb")(kb.count())
    time("candidates")(graft.link.EntityLink.candidates(mentions, kb).count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("mention_id")).orderBy(col("link_score").desc, col("entity_id").asc)
    time("best (window rn=1)")(graft.link.EntityLink.candidates(mentions, kb)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1).count())
    time("best w/o ctx cols")(graft.link.EntityLink.candidates(mentions, kb)
      .select(col("mention_id"), col("entity_id"), col("link_score"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1).count())
    time("best via min_by agg")(graft.link.EntityLink.candidates(mentions, kb)
      .groupBy(col("mention_id"))
      .agg(min_by(
        struct(col("entity_id"), col("canonical_name"), col("ctx_sim"), col("link_score")),
        struct(negate(col("link_score")), col("entity_id"))).as("b"))
      .count())
    println("rows: mentions=" + mentions.count() +
      " candidates=" + graft.link.EntityLink.candidates(mentions, kb).count())
    time("link")(graft.link.EntityLink.link(mentions, kb).count())
    spark.stop()
  }
}
