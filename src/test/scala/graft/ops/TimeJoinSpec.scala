package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeJoinSpec extends SparkSpec {

  private def df(rows: Seq[(String, Long, Double)], cols: (String, String, String)) = {
    import spark.implicits._
    rows.toDF("_k", "_s", "_v")
      .select(col("_k").as(cols._1), timestamp_seconds(col("_s")).as(cols._2), col("_v").as(cols._3))
  }

  test("asofJoin: strict excludes equal ts, latest earlier row wins, no-match yields nulls") {
    val left = df(Seq(("A", 10L, 100.0), ("A", 13L, 101.0), ("B", 20L, 102.0)),
      ("k", "ts", "lval"))
    val right = df(Seq(("A", 5L, 1.0), ("A", 10L, 2.0), ("A", 12L, 3.0)),
      ("k", "ts", "rval"))

    val strictRows = TimeJoin.asofJoin(left, right, "k", "ts", "ts", Seq("rval")).collect()
      .map(r => (r.getString(0), r.getDouble(2),
        Option(r.getTimestamp(3)).map(_.getTime / 1000), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .sortBy(_._2)
    // left A@10: right@10 is equal ts -> excluded; match right@5
    assert(strictRows(0) == (("A", 100.0, Some(5L), Some(1.0))))
    assert(strictRows(1) == (("A", 101.0, Some(12L), Some(3.0))))
    assert(strictRows(2) == (("B", 102.0, None, None)))

    val incl = TimeJoin.asofJoin(left, right, "k", "ts", "ts", Seq("rval"), strict = false)
      .collect().map(r => (r.getDouble(2), Option(r.getTimestamp(3)).map(_.getTime / 1000)))
      .sortBy(_._1)
    assert(incl(0) == ((100.0, Some(10L)))) // equal ts now matches
  }

  test("asofJoin: matches DuckDB-semantics replay on a generated fixture") {
    // 3 keys x interleaved lefts/rights; replay with a per-key sorted scan
    val ls = for (k <- Seq("x", "y", "z"); i <- 1 to 7) yield (k, (i * 13 + k.hashCode.abs % 7).toLong, i.toDouble)
    val rs = for (k <- Seq("x", "y"); i <- 1 to 11) yield (k, (i * 8 + 1).toLong, i * 10.0)
    val got = TimeJoin.asofJoin(df(ls, ("k", "ts", "lv")), df(rs, ("k", "ts", "rv")),
      "k", "ts", "ts", Seq("rv")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000) ->
        Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    val exp = ls.map { case (k, t, _) =>
      (k, t) -> rs.filter(r => r._1 == k && r._2 < t).sortBy(_._2).lastOption.map(_._3)
    }.toMap
    assert(got == exp)
  }

  test("rangeJoin: window boundaries exact, cross-bucket matches found, pairs unique") {
    val left = df(Seq(("A", 1000L, 1.0), ("B", 595L, 2.0)), ("k", "ts", "lv"))
    val right = df(Seq(
      ("A", 1000L, 10.0),  // dt=0 -> excluded
      ("A", 1001L, 11.0),  // dt=1 -> in
      ("A", 1600L, 12.0),  // dt=600 -> in (inclusive upper bound)
      ("A", 1601L, 13.0),  // dt=601 -> out
      ("B", 601L, 14.0)),  // dt=6, crosses the 600s bucket edge (595->601)
      ("k", "ts", "rv"))
    val got = TimeJoin.rangeJoin(left, right, "k", "ts", "ts", Seq("rv"), 600L).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getTimestamp(3).getTime / 1000, r.getDouble(4)))
      .sortBy(_._3)
    assert(got.toSeq == Seq(
      ("B", 2.0, 601L, 14.0), ("A", 1.0, 1001L, 11.0), ("A", 1.0, 1600L, 12.0)))
    // exactly-once: no pair appears twice even though the left side is
    // exploded into two candidate buckets
    assert(got.distinct.length == got.length)
  }

  test("funnel: strictly-after chaining — out-of-order steps do not convert") {
    import spark.implicits._
    val e = Seq(
      // u1 completes the whole funnel in order
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2: purchase BEFORE its first click → stage 2 (the purchase at 15
      // precedes the click at 25; no purchase after 25)
      (2L, "view", 5L), (2L, "purchase", 15L), (2L, "click", 25L),
      // u3: click only, no view → stage 0 (chain never starts... view missing)
      (3L, "click", 10L),
      // u4: equal timestamps — strict > means click at the SAME ts as view
      // does not count
      (4L, "view", 50L), (4L, "click", 50L))
      .toDF("user_id", "event_type", "_s")
      .select(col("user_id"), col("event_type"), timestamp_seconds(col("_s")).as("ts"))
    val out = TimeJoin.funnel(e, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).collect()
      .map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)).map(_.getTime / 1000),
        Option(r.getTimestamp(2)).map(_.getTime / 1000),
        Option(r.getTimestamp(3)).map(_.getTime / 1000), r.getLong(4)))).toMap
    assert(out(1L) == ((Some(10L), Some(20L), Some(30L), 3L)))
    assert(out(2L) == ((Some(5L), Some(25L), None, 2L)))
    assert(out(3L) == ((None, None, None, 0L)))
    assert(out(4L) == ((Some(50L), None, None, 1L)))
    assert(out.size == 4) // every key gets a row, converted or not
  }

  test("scd2Intervals: intervals chain per key, ties broken by tieCol, last row current") {
    import spark.implicits._
    val e = Seq(
      (1L, 100L, 10L, 1.0), (1L, 101L, 20L, 2.0), (1L, 102L, 20L, 3.0), // tie at ts=20
      (2L, 200L, 5L, 9.0))
      .toDF("user_id", "event_id", "_s", "value")
      .select(col("user_id"), col("event_id"), timestamp_seconds(col("_s")).as("ts"), col("value"))
    val out = TimeJoin.scd2Intervals(e, "user_id", "ts", "event_id", Seq("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime / 1000,
        Option(r.getTimestamp(4)).map(_.getTime / 1000), r.getBoolean(5)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, 100L, 10L, Some(20L), false),
      (1L, 101L, 20L, Some(20L), false),   // tie: 101 precedes 102 by event_id
      (1L, 102L, 20L, None, true),
      (2L, 200L, 5L, None, true)))
  }
}
