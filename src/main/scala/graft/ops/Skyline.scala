package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) per group — "the best trade-offs", the
  * multi-criteria top-k: a row survives iff NO other row of its group is
  * >= on both dimensions and > on at least one. The classic sort-based
  * reduction: collapse to the per-x maximum y, order by x descending, and
  * keep the points whose y exceeds the running maximum of everything with
  * strictly larger x — equal points are mutually non-dominating and all
  * survive (the join-back preserves multiplicity).
  *
  * 100 TB shape: one (group, x) max aggregation collapses the input to
  * the distinct-x grain BEFORE any window (the window then sorts the
  * collapsed table, which is orders of magnitude smaller than the input),
  * then one semi-join back. Exact comparisons only — no arithmetic at
  * all, so nothing can diverge across engines.
  */
object Skyline {

  /** Rows on the maximize-(xCol, yCol) Pareto frontier of each group. */
  def paretoFrontier(rows: DataFrame, groupCol: String,
                     xCol: String, yCol: String): DataFrame = {
    val m = rows.groupBy(col(groupCol), col(xCol)).agg(max(col(yCol)).as("_ymax"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = m.withColumn("_prev", max(col("_ymax")).over(w))
      .where(col("_prev").isNull || col("_ymax") > col("_prev"))
      .select(col(groupCol), col(xCol), col("_ymax").as(yCol))
    rows.join(sky, Seq(groupCol, xCol, yCol), "left_semi")
  }
}
