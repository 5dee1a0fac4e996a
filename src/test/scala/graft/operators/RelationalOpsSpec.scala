package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalOpsSpec extends SparkSpec {

  test("ohlc picks open/close by time (tiebreak by id), high/low by value") {
    import spark.implicits._
    val t0 = 1704067200L
    val df = Seq(
      // one bucket, out-of-order arrival: open is the EARLIEST sec
      ("a", t0 + 50, 1L, 5.0), ("a", t0 + 10, 2L, 3.0),
      ("a", t0 + 90, 3L, 9.0), ("a", t0 + 70, 4L, 1.0),
      // tie on sec → id decides open/close
      ("b", t0 + 5, 10L, 2.0), ("b", t0 + 5, 11L, 7.0))
      .toDF("k", "sec", "id", "v")
    val out = Ohlc.resample(df, Seq("k"), "sec", "id", "v", 3600L)
      .orderBy("k").collect()
    assert(out(0).getDouble(2) == 3.0)  // open: sec=t0+10
    assert(out(0).getDouble(3) == 9.0)  // high
    assert(out(0).getDouble(4) == 1.0)  // low
    assert(out(0).getDouble(5) == 9.0)  // close: sec=t0+90
    assert(out(1).getDouble(2) == 2.0)  // open: id 10 wins the sec tie
    assert(out(1).getDouble(5) == 7.0)  // close: id 11
  }

  test("window suite: lead/lag by time, ntile/ranks by value") {
    import spark.implicits._
    val df = Seq(
      ("g", 1L, 1L, 10.0), ("g", 2L, 2L, 30.0),
      ("g", 3L, 3L, 20.0), ("g", 4L, 4L, 30.0))
      .toDF("k", "sec", "id", "v")
    val out = WindowSuite.navigate(df, Seq("k"), "sec", "id", "v")
      .orderBy("sec").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("lag_v")))
    assert(out(0).getDouble(out(0).fieldIndex("lead_v")) == 30.0)
    // value order: 10, 20, 30, 30 → ranks 1,2,3,3; dense 1,2,3,3
    val byId = out.map(r => r.getLong(2) ->
      (r.getInt(r.fieldIndex("rnk")), r.getInt(r.fieldIndex("drnk")))).toMap
    assert(byId(1L) == ((1, 1)))
    assert(byId(3L) == ((2, 2)))
    assert(byId(2L) == ((3, 3)) && byId(4L) == ((3, 3)))
    // percent_rank = (rank-1)/(n-1): 0, 1/3, 2/3, 2/3
    val pr = out.map(r => r.getLong(2) ->
      r.getDouble(r.fieldIndex("pct_rank"))).toMap
    assert(pr(1L) == 0.0 && pr(3L) == 1.0 / 3 && pr(2L) == 2.0 / 3)
  }

  test("interval overlap join finds exactly the intersecting pairs") {
    import spark.implicits._
    val a = Seq((1L, 100L, 200L), (2L, 300L, 400L), (3L, 1000L, 5000L))
      .toDF("a_id", "s", "e")
    val b = Seq((10L, 150L, 160L),  // inside a1
                (11L, 200L, 300L),  // touches a1 end AND a2 start (closed)
                (12L, 401L, 999L),  // between a2 and a3: no overlap
                (13L, 4999L, 9999L) // overlaps a3 despite many buckets
      ).toDF("b_id", "bs", "be")
    val out = IntervalJoin.overlapPairs(a, col("s"), col("e"),
        b, col("bs"), col("be"), bucketWidth = 128L)
      .select("a_id", "b_id").orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 10L), (1L, 11L), (2L, 11L), (3L, 13L)))
  }
}
