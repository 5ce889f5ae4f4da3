package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins: point-in-time (as-of) join and
  * a bucketed bounded-range join — both expressed as single-shuffle plans
  * instead of the quadratic theta-join Catalyst would otherwise produce
  * (a BroadcastNestedLoopJoin on `l.ts > r.ts` is a scale-killer).
  */
object TimeJoin {

  /** As-of join: for every left row, the single latest right row of the
    * same key with right.ts < left.ts (strict, the default) or <= left.ts.
    * Matches DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts > r.ts`.
    *
    * Implementation is the union-tag + running-last window: both sides are
    * tagged and unioned, sorted per key by (ts, tag) — at equal ts the tag
    * places the right row AFTER the left row when strict (excluded from the
    * running window) or BEFORE it when inclusive — and the latest right row
    * is carried forward with last(_, ignoreNulls) over rows UNBOUNDED
    * PRECEDING..CURRENT. Left rows are then filtered back out.
    *
    * 100 TB shape: ONE shuffle (the window's partitionBy on the join key) —
    * no range cross-product, no broadcast requirement on either side; skew
    * follows the per-key row counts exactly like any keyed window. Output
    * columns: every left column, then `asof_ts` (matched right timestamp,
    * null when no match) and `asof_<v>` for each requested right value.
    *
    * Contract: (key, ts) should be unique on the right side — with
    * duplicate right timestamps the surviving row is tie-arbitrary (same
    * caveat as engine-native ASOF joins).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, leftTsCol: String, rightTsCol: String,
               rightVals: Seq[String], strict: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(left(_)): _*)
    val rStruct = struct((col(rightTsCol).as("ts") +:
      rightVals.map(v => col(v).as(v))): _*)
    val lSchema = left.select(lStruct.as("s")).schema("s").dataType
    val rSchema = right.select(rStruct.as("s")).schema("s").dataType

    val (lTag, rTag) = if (strict) (0, 1) else (1, 0)
    val l = left.select(col(keyCol).as("_k"), col(leftTsCol).as("_ts"),
      lit(lTag).as("_tag"), lStruct.as("_lrow"), lit(null).cast(rSchema).as("_rrow"))
    val r = right.select(col(keyCol).as("_k"), col(rightTsCol).as("_ts"),
      lit(rTag).as("_tag"), lit(null).cast(lSchema).as("_lrow"), rStruct.as("_rrow"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("_m", last(col("_rrow"), ignoreNulls = true).over(w))
      .where(col("_lrow").isNotNull)
    matched.select(
      leftCols.map(c => col(s"_lrow.$c").as(c)) ++
        (col("_m.ts").as("asof_ts") +:
          rightVals.map(v => col(s"_m.$v").as(s"asof_$v"))): _*)
  }

  /** Bounded-range (band) join: all (left, right) pairs of the same key
    * with 0 < right.ts - left.ts <= windowSec ("right events within W
    * seconds AFTER left"). Equivalent to the SQL theta-join
    * `r.ts > l.ts AND r.ts <= l.ts + W` — which Catalyst can only run as a
    * nested-loop; here it becomes ONE equi-join on (key, time-bucket).
    *
    * Bucketing: with bucket width = windowSec, a right row at most
    * windowSec after a left row lands in the left row's bucket b or b+1, so
    * the left side is duplicated into exactly those two candidate buckets
    * (2× left, never data-dependent blow-up) and the exact predicate is
    * re-applied post-join. Each qualifying pair matches in EXACTLY one
    * bucket (the right row's own), so no dedup pass is needed.
    *
    * Output: left columns, then `r_ts` and `r_<v>` per right value column,
    * one row per qualifying pair (left rows with no partner emit nothing —
    * aggregate with a left join back if zero-groups are needed).
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
                keyCol: String, leftTsCol: String, rightTsCol: String,
                rightVals: Seq[String], windowSec: Long): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val leftCols = left.columns.toSeq
    // cast: parquet TIMESTAMP_NTZ is rejected by unix_micros; the session
    // timezone is pinned UTC so the NTZ→LTZ cast is deterministic
    def us(ts: Column): Column = unix_micros(ts.cast("timestamp"))
    def bucket(ts: Column): Column = floor(us(ts) / lit(windowSec * 1000000L))
    val l = left.select(
      col("*"), explode(array(bucket(col(leftTsCol)), bucket(col(leftTsCol)) + 1)).as("_b"))
      .withColumnRenamed(keyCol, "_k")
    val r = right.select(col(keyCol).as("_k"), bucket(col(rightTsCol)).as("_b"),
      col(rightTsCol).as("_rts"), struct(rightVals.map(col): _*).as("_rv"))
    val dtUs = us(col("_rts")) - us(col(leftTsCol))
    l.join(r, Seq("_k", "_b"))
      .where(dtUs > 0 && dtUs <= windowSec * 1000000L)
      .select((col("_k").as(keyCol) +:
        leftCols.filterNot(_ == keyCol).map(col)) ++
        (col("_rts").as("r_ts") +: rightVals.map(v => col(s"_rv.$v").as(s"r_$v"))): _*)
  }

  /** Ordered-funnel analysis (the product-analytics conversion query):
    * per key, the FIRST time each step fired STRICTLY AFTER the previous
    * step's time — step i counts only if it happens after step i-1, so a
    * purchase before the first view does not convert. Output: one row per
    * key with t_<step> timestamps (null once the chain breaks) and `stage`
    * = number of completed steps.
    *
    * 100 TB shape: one conditional min-aggregate per step, each keyed on
    * the same `keyCol` — the shuffles share one partitioning, so AQE/
    * exchange-reuse keeps it one physical repartition; no window sort, no
    * per-key event collection (the classic collect_list-then-scan funnel
    * implementation buffers whole users; this never does).
    */
  def funnel(events: DataFrame, keyCol: String, typeCol: String, tsCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val keys = events.select(col(keyCol).as("k")).distinct()
    val first = steps.head
    var acc = keys.join(
      events.where(col(typeCol) === first)
        .groupBy(col(keyCol).as("k")).agg(min(col(tsCol)).as(s"t_$first")),
      Seq("k"), "left")
    for ((prev, step) <- steps.zip(steps.tail)) {
      val nxt = events.where(col(typeCol) === step)
        .select(col(keyCol).as("k"), col(tsCol).as("_ts"))
        .join(acc.select(col("k"), col(s"t_$prev")), Seq("k"))
        .where(col(s"t_$prev").isNotNull && col("_ts") > col(s"t_$prev"))
        .groupBy(col("k")).agg(min(col("_ts")).as(s"t_$step"))
      acc = acc.join(nxt, Seq("k"), "left")
    }
    val stage = steps.map(s => when(col(s"t_$s").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    acc.select((col("k").as(keyCol) +: steps.map(s => col(s"t_$s"))) :+
      stage.as("stage"): _*)
  }

  /** Interval coalescing (merge overlapping/touching intervals per key) —
    * the classic gaps-and-islands operator behind session stitching,
    * availability windows, and on-call coverage. A new island starts when
    * an interval's start exceeds the running max end of everything before
    * it; islands are numbered by a running sum of those flags and
    * aggregated to (min start, max end, member count).
    *
    * All comparisons on the raw (integer/timestamp) columns — exact. One
    * window sort per key + one hash aggregate; nothing buffers whole keys.
    * Touching intervals (next.start == prev.end) MERGE (start > maxEnd
    * strictly starts a new island); half-open semantics.
    * Output: (key, island_start, island_end, n_intervals).
    */
  def mergeIntervals(rows: DataFrame, keyCol: String,
                     startCol: String, endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy(col(keyCol)).orderBy(col(startCol).asc, col(endCol).asc)
    val prevMax = max(col(endCol)).over(order.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = rows
      .withColumn("_new", when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new")).over(
        order.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col(keyCol), col("_island"))
      .agg(min(col(startCol)).as("island_start"), max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .select(col(keyCol), col("island_start"), col("island_end"), col("n_intervals"))
  }

  /** SCD2 / CDC validity intervals from an append-only event log: per key,
    * each event becomes a row valid from its timestamp until the NEXT
    * event's timestamp (null = still current). The standard
    * slowly-changing-dimension-type-2 snapshot builder.
    *
    * 100 TB shape: one window (lead) per key ordered by (ts, tieCol) — a
    * single hash-partitioned sort, which is the lower bound for interval
    * construction; deterministic under timestamp ties via `tieCol`.
    */
  def scd2Intervals(events: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("valid_from").asc, col(tieCol).asc)
    events.select((Seq(col(keyCol), col(tieCol), col(tsCol).as("valid_from")) ++
        valueCols.map(col)): _*)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
