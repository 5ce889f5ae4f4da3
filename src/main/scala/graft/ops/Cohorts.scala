package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the other classic product-analytics matrix next to
  * the funnel (TimeJoin.funnel): group users by their FIRST-activity week
  * (the cohort), then count how many of each cohort are still active k
  * weeks later. All time arithmetic is integer (week-truncated dates,
  * day-diffs that are exact multiples of 7), so the matrix is
  * engine-exact.
  *
  * 100 TB shape: one aggregate to (user, week) activity grain, one
  * min-aggregate for the cohort assignment, one broadcast-or-shuffled
  * join back on the user key (shared partitioning with the activity
  * aggregate), one final count-distinct at the (cohort, offset) grain —
  * which is weeks², tiny. No windows, no event-level buffering.
  */
object Cohorts {

  /** Output: (cohort_week, week_offset, n_users) — distinct users of the
    * cohort active in that offset week (offset 0 = the cohort week
    * itself, so every cohort's offset-0 row is its size).
    */
  def weeklyRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val activity = events
      .select(col(userCol).as("u"), date_trunc("week", col(tsCol)).as("week"))
      .distinct()
    val cohorts = activity.groupBy(col("u")).agg(min(col("week")).as("cohort_week"))
    activity.join(cohorts, Seq("u"))
      .select(col("u"), col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
  }
}
