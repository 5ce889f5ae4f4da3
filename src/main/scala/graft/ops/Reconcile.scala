package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the "what changed between these two table
  * versions" diff every ingestion/migration job runs before promoting a
  * batch (and the tool you reach for when two pipelines disagree).
  *
  * 100 TB shape: ONE full-outer hash join on the key; payload equality is
  * md5 over the concatenated payload columns computed on each side BEFORE
  * the join (narrow), so the join carries one 32-char digest per side
  * instead of wide payloads. Unchanged rows are dropped pre-aggregation —
  * the output is proportional to the CHANGE volume, not the table.
  */
object Reconcile {

  /** Row-level diff of `newer` vs `older` keyed by `keyCol`: one row per
    * differing key with status 'added' (key only in newer), 'removed'
    * (only in older) or 'changed' (both, payload digests differ).
    * Output: (keyCol, status).
    */
  def tableDiff(older: DataFrame, newer: DataFrame, keyCol: String,
                payloadCols: Seq[String]): DataFrame = {
    // null-safe digest: '|' separator + explicit sentinel (concat_ws
    // silently SKIPS nulls, which would make ('a', null) collide with 'a')
    def digested(df: DataFrame, tag: String): DataFrame =
      df.select(col(keyCol).as(s"${tag}_k"),
        md5(concat_ws("|",
          payloadCols.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*))
          .as(s"${tag}_h"))
    digested(older, "o")
      .join(digested(newer, "n"), col("o_k") === col("n_k"), "full_outer")
      .select(coalesce(col("n_k"), col("o_k")).as(keyCol),
        when(col("o_k").isNull, "added")
          .when(col("n_k").isNull, "removed")
          .when(col("o_h") =!= col("n_h"), "changed")
          .otherwise("unchanged").as("status"))
      .where(col("status") =!= "unchanged")
  }
}
