package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {

  test("topK aggregator equals the window formulation, across forced partial merges") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i % 13, rng.nextInt(50).toDouble, i))
      .toDF("key", "value", "id")
      .repartition(16) // force many map-side partials + merges
    val topk = udaf(TopKAggregator.TopK(4))
    val got = rows.groupBy(col("key")).agg(topk(col("value"), col("id")).as("tk"))
      .select(col("key"), posexplode(col("tk.items")))
      .select(col("key"), (col("pos") + 1).as("rnk"), col("col.v"), col("col.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("value").desc, col("id").asc)
    val exp = rows.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 4)
      .select(col("key"), col("rnk"), col("value"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == exp)
    assert(got.size == 13 * 4) // every key filled its budget on this data
  }

  test("topK aggregator: duplicate values tie-broken by id; groups smaller than k kept whole") {
    import spark.implicits._
    val rows = Seq((1L, 5.0, 10L), (1L, 5.0, 3L), (1L, 5.0, 7L), (2L, 1.0, 1L))
      .toDF("key", "value", "id")
    val topk = udaf(TopKAggregator.TopK(2))
    val got = rows.groupBy(col("key")).agg(topk(col("value"), col("id")).as("tk"))
      .select(col("key"), col("tk.items.id").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(3L, 7L)) // smallest ids win the all-tied group
    assert(got(2L) == Seq(1L))     // |group| < k
  }
}
