package graft.read

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rolling time-window stats, delta/rate, interpolation, gap audit. */
class RollingGapSpec extends SparkSpec {

  test("timeWindowMean averages the trailing range frame only") {
    import spark.implicits._
    val df = Seq(("s", 0L, 10.0), ("s", 100L, 20.0), ("s", 1900L, 30.0))
      .toDF("k", "sec", "v")
    val out = Rolling.timeWindowMean(df, Seq("k"), "sec", "v", 1800L)
      .orderBy("sec").collect()
    assert(out(0).getAs[Long]("v_rn") == 1L)
    assert(out(0).getAs[Double]("v_rmean") == 10.0)
    assert(out(1).getAs[Long]("v_rn") == 2L)
    assert(out(1).getAs[Double]("v_rmean") == 15.0)
    // t=1900: frame [100, 1900] — t=0 fell out, t=100 stays
    assert(out(2).getAs[Long]("v_rn") == 2L)
    assert(out(2).getAs[Double]("v_rmean") == 25.0)
  }

  test("ewma folds the trailing-k frame with α=1/2 and restarts per series") {
    import spark.implicits._
    val df = Seq(("a", 0L, 1L, 2.0), ("a", 10L, 2L, 4.0), ("a", 20L, 3L, 8.0),
      ("b", 0L, 4L, 6.0))
      .toDF("k", "sec", "oid", "v")
    val out = Rolling.ewma(df, Seq("k"), "sec", "oid", "v", k = 3)
      .orderBy("k", "sec").collect()
    // a: e1=2; e2=2*.5+4*.5=3; e3=3*.5+8*.5=5.5
    assert(out(0).getAs[Double]("v_ewma") == 2.0)
    assert(out(1).getAs[Double]("v_ewma") == 3.0)
    assert(out(2).getAs[Double]("v_ewma") == 5.5)
    // b restarts at its own first value
    assert(out(3).getAs[Double]("v_ewma") == 6.0)
  }

  test("ewma with k=1 degenerates to the value itself") {
    import spark.implicits._
    val df = Seq(("k", 1L, 1L, 7.0), ("k", 2L, 2L, 9.0))
      .toDF("k", "sec", "oid", "v")
    val out = Rolling.ewma(df, Seq("k"), "sec", "oid", "v", k = 1)
      .orderBy("sec").collect()
    assert(out(0).getAs[Double]("v_ewma") == 7.0)
    assert(out(1).getAs[Double]("v_ewma") == 9.0)
  }

  test("ewma trailing window drops points beyond k rows") {
    import spark.implicits._
    val df = (1L to 5L).map(i => ("k", i, i, 100.0 * i))
      .toDF("k", "sec", "oid", "v")
    val out = Rolling.ewma(df, Seq("k"), "sec", "oid", "v", k = 2)
      .orderBy("sec").collect()
    // row 5: frame = [400, 500] → fold restarts at 400: 400*.5+500*.5
    assert(out(4).getAs[Double]("v_ewma") == 450.0)
  }

  test("rolling moments survive a wild out-of-range value (no ANSI crash)") {
    import spark.implicits._
    // 5e22 exceeds BOTH guards (mean: DECIMAL(28,6) range 1e22;
    // zscore: DECIMAL(18,6) range 1e12)
    val df = Seq(("k", 0L, 1.0), ("k", 60L, 5.0e22), ("k", 120L, 3.0))
      .toDF("k", "sec", "v")
    // the wild point is nulled out of count AND sums together
    val m = Rolling.timeWindowMean(df, Seq("k"), "sec", "v", 1800L)
      .orderBy("sec").collect()
    assert(m(1).getLong(m(1).fieldIndex("v_rn")) == 1L)
    assert(m(2).getDouble(m(2).fieldIndex("v_rmean")) == 2.0)
    val z = Rolling.timeWindowZscore(df, Seq("k"), "sec", "v", 1800L)
      .orderBy("sec").collect() // must not throw
    assert(z(2).getLong(z(2).fieldIndex("rn")) == 2L)
  }

  test("errorBurnRate alerts only when BOTH windows exceed thresholds") {
    import spark.implicits._
    // errors at 100, 160, 220; ok at 0, 400
    val df = Seq(
      ("k", 0L, "ok"), ("k", 100L, "error"), ("k", 160L, "error"),
      ("k", 220L, "error"), ("k", 400L, "ok")).toDF("k", "sec", "et")
    val out = Rolling.errorBurnRate(df, Seq("k"), "sec",
        col("et") === "error", shortSec = 100L, longSec = 1000L,
        shortThreshold = 0.6, longThreshold = 0.5)
      .orderBy("sec").collect()
    // at sec=220: short window [120,220] = 2 errors / 2 rows = 1.0;
    // long window = 3/4 = 0.75 → both over → alert
    val at220 = out(3)
    assert(at220.getDouble(at220.fieldIndex("err_rate_short")) == 1.0)
    assert(at220.getBoolean(at220.fieldIndex("alert")))
    // at sec=400: short [300,400] = 0/1 → no alert though long is warm
    val at400 = out(4)
    assert(at400.getDouble(at400.fieldIndex("err_rate_short")) == 0.0)
    assert(!at400.getBoolean(at400.fieldIndex("alert")))
  }

  test("timeWindowZscore flags the spike, nulls degenerate windows") {
    import spark.implicits._
    val df = Seq(
      ("s", 0L, 10.0), ("s", 60L, 10.0), ("s", 120L, 10.0),
      ("s", 180L, 100.0), // spike vs a zero-variance prefix
      ("t", 0L, 5.0))     // single point → n<2 → null
      .toDF("k", "sec", "v")
    val out = Rolling.timeWindowZscore(df, Seq("k"), "sec", "v", 1800L)
      .orderBy("k", "sec").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("zscore"))) // n=1
    assert(out(1).isNullAt(out(1).fieldIndex("zscore"))) // σ=0
    assert(out(2).isNullAt(out(2).fieldIndex("zscore"))) // σ=0
    val z = out(3).getDouble(out(3).fieldIndex("zscore"))
    // mean=32.5, σ=sqrt(((100-32.5)²+3·22.5²)/4)=38.97...; z≈1.732050
    assert(math.abs(z - 1.732050) < 1e-6, s"z=$z")
    assert(out(4).isNullAt(out(4).fieldIndex("zscore"))) // other series, n=1
  }

  test("deltaRate computes difference and per-second rate, null on firsts") {
    import spark.implicits._
    val df = Seq(("s", 0L, 1L, 100.0), ("s", 10L, 2L, 160.0),
      ("t", 5L, 3L, 7.0)).toDF("k", "sec", "id", "v")
    val out = Rolling.deltaRate(df, Seq("k"), "sec", "v", Seq("id"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(4) && out(0).isNullAt(6)) // series first row
    assert(out(1).getAs[Double]("delta") == 60.0)
    assert(out(1).getAs[Long]("dt") == 10L)
    assert(out(1).getAs[Double]("rate") == 6.0)
    assert(out(2).isNullAt(4)) // other series unaffected
  }

  test("linearInterpolate fills interior nulls proportionally, LOCF/NOCB at edges") {
    import spark.implicits._
    val df = Seq(
      ("u", 0L, None: Option[Double]),   // before first obs → NOCB 10
      ("u", 10L, Some(10.0)),
      ("u", 20L, None),                  // 10 + (40-10)*(20-10)/(40-10)=20
      ("u", 30L, None),                  // 30
      ("u", 40L, Some(40.0)),
      ("u", 50L, None))                  // after last obs → LOCF 40
      .toDF("k", "slot", "v")
    val out = GapFill.linearInterpolate(df, Seq("k"), "slot", Seq("v"))
      .orderBy("slot").collect().map(_.getAs[Double]("v_interp"))
    assert(out.toSeq == Seq(10.0, 10.0, 20.0, 30.0, 40.0, 40.0))
  }

  test("missingSlots emits exactly the absent grid points per series") {
    import spark.implicits._
    val df = Seq(("a", 0L), ("a", 600L), ("b", 300L)).toDF("k", "slot")
    val out = GapFill.missingSlots(df, Seq("k"), "slot", 0L, 600L, 300L)
      .orderBy("k", "slot").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 300L), ("b", 0L), ("b", 600L)))
  }
}
