package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off probe: minhash/LSH-candidate plan variants on the sf0.1 documents
  * table — duplicates-kept vs distinct-first vs checkpointed-distinct scan.
  * Usage: runMain graft.tools.MinhashProbe [sfDir] [repeats]
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def shingleRows(distinctRows: Boolean): DataFrame = {
      val rows = docs
        .select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), explode(graft.ops.NearDup.shingleArr(col("toks"))).as("shingle"))
      if (distinctRows) rows.distinct() else rows
    }
    def mh(rows: DataFrame, k: Int = 8): DataFrame = rows
      .select(col("doc_id"), col("shingle"), explode(sequence(lit(0L), lit(k - 1L))).as("seed"))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("shingle"), lit(":"), col("seed").cast("string")))).as("minhash"))
    def cands(sig: DataFrame): DataFrame =
      graft.ops.NearDup.lshCandidates(graft.ops.NearDup.lshBands(sig))

    def time(name: String)(f: => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-34s min=${times.min}%6.2f  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    // narrow per-doc dedup: array_distinct before the explode — distinct
    // (doc_id, shingle) rows with NO shuffle
    def shingleRowsArr: DataFrame = docs
      .select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(graft.ops.NearDup.shingleArr(col("toks")))).as("shingle"))

    // warm
    mh(shingleRows(true)).count()
    mh(shingleRowsArr).count()

    time("mh dup-kept")(mh(shingleRows(false)))
    time("mh distinct")(mh(shingleRows(true)))
    time("mh array_distinct")(mh(shingleRowsArr))
    time("cands dup-kept")(cands(mh(shingleRows(false))))
    time("cands distinct")(cands(mh(shingleRows(true))))
    time("cands array_distinct")(cands(mh(shingleRowsArr)))
    time("cands arr_distinct+checkpoint") { cands(mh(shingleRowsArr.localCheckpoint())) }
    spark.stop()
  }
}
