package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** As-of join, bucketed range join, rank-selection quantiles. */
class OperatorsSpec extends SparkSpec {

  test("asof join carries the latest right value at-or-before each left ts") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"), (3L, 5L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 1.0), (1L, 15L, 2.0), (1L, 20L, 3.0), (2L, 30L, 9.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.lastAtOrBefore(left, right, Seq("k"), "t", "t", Seq("v"))
      .orderBy("k", "t").collect()
    // k=1 t=10 → right t=5; k=1 t=20 → right t=20 (at-or-before inclusive)
    assert(out(0).getDouble(3) == 1.0 && out(0).getLong(4) == 5L)
    assert(out(1).getDouble(3) == 3.0 && out(1).getLong(4) == 20L)
    // k=2 t=15: only right row is at t=30 (future) → null
    assert(out(2).isNullAt(3) && out(2).isNullAt(4))
    // k=3: no right rows at all → null
    assert(out(3).isNullAt(3) && out(3).isNullAt(4))
  }

  test("nearest asof picks the closer side, ties to before") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 19L), (1L, 25L), (2L, 5L)).toDF("k", "t")
    val right = Seq((1L, 4L, 1.0), (1L, 30L, 2.0)).toDF("k", "t", "v")
    val out = AsofJoin.nearestInTime(left, right, Seq("k"), "t", "t", Seq("v"))
      .orderBy("k", "t").collect()
    // t=10: before 4 (dist 6) vs after 30 (dist 20) → before
    assert(out(0).getDouble(2) == 1.0 && out(0).getLong(3) == 4L)
    // t=19: dist 15 vs 11 → after
    assert(out(1).getDouble(2) == 2.0 && out(1).getLong(3) == 30L)
    // t=25: dist 21 vs 5 → after
    assert(out(2).getDouble(2) == 2.0)
    // k=2: no right rows → null
    assert(out(3).isNullAt(2) && out(3).isNullAt(3))
  }

  test("nearest asof: exact tie and tolerance behave as documented") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 5L, 1.0), (1L, 15L, 2.0)).toDF("k", "t", "v")
    val out = AsofJoin.nearestInTime(left, right, Seq("k"), "t", "t",
      Seq("v"), tolerance = Some(20L)).orderBy("t").collect()
    // t=10: dist 5 both sides → tie goes to the BEFORE row
    assert(out(0).getDouble(2) == 1.0 && out(0).getLong(3) == 5L)
    // t=100: nearest is 15 at dist 85 > tolerance 20 → nulled
    assert(out(1).isNullAt(2) && out(1).isNullAt(3))
  }

  test("asof join tolerance nulls out stale matches") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 200L)).toDF("k", "t")
    val right = Seq((1L, 90L, 7.0)).toDF("k", "t", "v")
    val out = AsofJoin.lastAtOrBefore(left, right, Seq("k"), "t", "t",
      Seq("v"), tolerance = Some(50L)).orderBy("t").collect()
    assert(out(0).getDouble(2) == 7.0)  // 100-90=10 ≤ 50
    assert(out(1).isNullAt(2))          // 200-90=110 > 50 → stale
  }

  test("asof join right ties at the same ts resolve by rightOrder (last wins)") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1.0, 100L), (1L, 10L, 2.0, 200L))
      .toDF("k", "t", "v", "seq")
    val out = AsofJoin.lastAtOrBefore(left, right, Seq("k"), "t", "t",
      Seq("v"), rightOrder = Some("seq")).collect()
    assert(out(0).getDouble(2) == 2.0)
  }

  test("range join matches points to every covering interval, no dups") {
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 25L), (3L, 105L)).toDF("pid", "t")
    // i1 covers [0,30] (spans buckets 0-3 at W=10), i2 covers [20,26]
    val intervals = Seq((10L, 0L, 30L), (20L, 20L, 26L)).toDF("iid", "s", "e")
    val out = RangeJoin.pointsInIntervals(points, col("t"), intervals,
      col("s"), col("e"), bucketWidth = 10L)
      .select("pid", "iid").orderBy("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 10L), (2L, 10L), (2L, 20L)))
  }

  test("range join boundary inclusivity at interval start and end") {
    import spark.implicits._
    val points = Seq((1L, 20L), (2L, 26L), (3L, 19L), (4L, 27L)).toDF("pid", "t")
    val intervals = Seq((9L, 20L, 26L)).toDF("iid", "s", "e")
    val out = RangeJoin.pointsInIntervals(points, col("t"), intervals,
      col("s"), col("e"), bucketWidth = 100L)
      .select("pid").orderBy("pid").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 2L)) // start and end inclusive; outside drops
  }

  test("exact quantiles select real data values at rank ceil(p*n)") {
    import spark.implicits._
    // group g: values 1..10 → q50 = 5th value = 5.0, q90 = 9th = 9.0
    val df = (1 to 10).map(i => ("g", i.toDouble, i.toLong)).toDF("k", "v", "ord")
    val out = Quantiles.exactByRank(df, Seq("k"), "v", "ord",
      Seq(50, 90, 99)).collect()(0)
    assert(out.getDouble(1) == 5.0)
    assert(out.getDouble(2) == 9.0)
    assert(out.getDouble(3) == 10.0) // ceil(0.99*10)=10
  }

  test("exact quantile ranks are integer-exact where double ceil is off by one") {
    import spark.implicits._
    // n=300: double 0.99*300 = 297.00000000000006 → ceil 298 (wrong);
    // integer (99*300 + 99) div 100 = 297 (right)
    val df = (1 to 300).map(i => ("g", i.toDouble, i.toLong)).toDF("k", "v", "ord")
    val out = Quantiles.exactByRank(df, Seq("k"), "v", "ord", Seq(99))
      .collect()(0)
    assert(out.getDouble(1) == 297.0)
  }

  test("interpolated quantiles match percentile_cont (type-7) semantics") {
    import spark.implicits._
    // values 1..5, n=5: h(25) = 4*0.25 = 1 → exactly v[2] = 2.0;
    // h(90) = 4*0.9 = 3.6 → 4.0 + 0.6*(5.0-4.0) = 4.6
    val df = (1 to 5).map(i => ("g", i.toDouble, i.toLong)).toDF("k", "v", "ord")
    val out = Quantiles.interpByRank(df, Seq("k"), "v", "ord", Seq(25, 90))
      .collect()(0)
    assert(out.getDouble(1) == 2.0)
    assert(math.abs(out.getDouble(2) - 4.6) < 1e-12)
  }

  test("interpolated quantiles: p=1 on a big group interpolates near the min") {
    import spark.implicits._
    // n=101: h(1) = 100*1/100 = 1 exactly → v[2] = 2.0, frac 0
    val df = (1 to 101).map(i => ("g", i.toDouble, i.toLong)).toDF("k", "v", "ord")
    val out = Quantiles.interpByRank(df, Seq("k"), "v", "ord", Seq(1))
      .collect()(0)
    assert(out.getDouble(1) == 2.0)
  }

  test("interpolated quantiles: p=100 and single-row groups need no upper bracket") {
    import spark.implicits._
    val df = Seq(("g", 7.0, 1L)).toDF("k", "v", "ord")
    val out = Quantiles.interpByRank(df, Seq("k"), "v", "ord", Seq(50, 100))
      .collect()(0)
    assert(out.getDouble(1) == 7.0) // n=1 → frac 0, hi bracket null → lo
    assert(out.getDouble(2) == 7.0)
  }

  test("exact quantiles break value ties deterministically by order col") {
    import spark.implicits._
    val df = Seq(("g", 1.0, 1L), ("g", 1.0, 2L), ("g", 2.0, 3L), ("g", 2.0, 4L))
      .toDF("k", "v", "ord")
    val out = Quantiles.exactByRank(df, Seq("k"), "v", "ord", Seq(50)).collect()(0)
    assert(out.getDouble(1) == 1.0) // rank ceil(0.5*4)=2 → second 1.0
  }

  test("pearson: perfect / inverse / degenerate correlations") {
    import spark.implicits._
    val df = Seq(
      ("up", 1.0, 2.0), ("up", 2.0, 4.0), ("up", 3.0, 6.0),     // r = 1
      ("dn", 1.0, 3.0), ("dn", 2.0, 2.0), ("dn", 3.0, 1.0),     // r = -1
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0), ("flat", 3.0, 5.0)) // var=0
      .toDF("k", "x", "y")
    val out = Stats.pearson(df, Seq("k"), "x", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out("up").contains(1.0))
    assert(out("dn").contains(-1.0))
    assert(out("flat").isEmpty) // zero variance → null, not NaN
  }

  test("pearson survives a wild out-of-decimal-range value (no ANSI crash)") {
    import spark.implicits._
    // |v| >= 1e12 overflows DECIMAL(18,6): pre-guard must EXCLUDE the
    // row, not let the cast throw CAST_OVERFLOW and kill the query
    val df = Seq(
      ("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0),
      ("g", 5.0e12, 1.0)).toDF("k", "x", "y")
    val out = Stats.pearson(df, Seq("k"), "x", "y").collect()(0)
    assert(out.getLong(1) == 3L) // wild row excluded from the moments
    assert(out.getDouble(2) == 1.0)
  }

  test("pearson is invariant under repartitioning (decimal moments)") {
    import spark.implicits._
    val df = (0 until 1000).map(i =>
      ("g", (i * 37 % 101).toDouble, ((i * 53 + 7) % 97).toDouble))
      .toDF("k", "x", "y")
    val a = Stats.pearson(df, Seq("k"), "x", "y").collect()(0).getDouble(2)
    val b = Stats.pearson(df.repartition(13), Seq("k"), "x", "y")
      .collect()(0).getDouble(2)
    assert(a == b) // bit-identical, not approximately equal
  }

  test("pearsonGram ≡ pearson bit-identically on integer-valued input " +
    "(r12 ask #7: the Gram aggregate as a reusable surface), incl. " +
    "degenerate groups, the range guard, and repartition invariance") {
    import spark.implicits._
    val df = ((0 until 500).map(i =>
        (s"g${i % 7}", (i * 37 % 101).toDouble, ((i * 53 + 7) % 97).toDouble)) ++
      Seq(("flat", 1.0, 5.0), ("flat", 2.0, 5.0),        // zero variance
          ("wild", 1.0, 2.0), ("wild", 2.0, 4.0), ("wild", 3.0, 6.0),
          ("wild", 5.0e12, 1.0)))                        // range-guarded row
      .toDF("k", "x", "y")
    val a = Stats.pearson(df, Seq("k"), "x", "y")
      .orderBy("k").collect().map(_.toString)
    val b = Stats.pearsonGram(df, Seq("k"), "x", "y")
      .orderBy("k").collect().map(_.toString)
    assert(a.sameElements(b),
      s"gram route diverged:\n${a.mkString("\n")}\nvs\n${b.mkString("\n")}")
    val c = Stats.pearsonGram(df.repartition(13), Seq("k"), "x", "y")
      .orderBy("k").collect().map(_.toString)
    assert(b.sameElements(c), "pearsonGram not partition-invariant")
  }

  test("histogram buckets by floor(value/width), skips null and NaN") {
    import spark.implicits._
    val df = Seq(("a", 5.0), ("a", 9.9), ("a", 10.0), ("a", -0.1),
      ("a", Double.NaN), ("b", 25.0)).toDF("k", "v")
    val out = Stats.histogram(df, Seq("k"), "v", 10.0)
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", -1L, 1L), ("a", 0L, 2L), ("a", 1L, 1L),
      ("b", 2L, 1L)))
  }

  test("ohlc open/close survive huge bucketSec, order ids ≥ 1e10 and negative") {
    import spark.implicits._
    // bucketSec 2e9 > the ~9.2e8 int64-overflow bound of the old packed
    // key, and order ids beyond 1e10 / below 0 corrupted its ordering —
    // the struct order key has no such invariant (ADVICE r3/r4).
    val df = Seq(
      (1500000000L, 20000000000L, 20.0), // offset 1.5e9, order 2e10
      (1500000000L, -5L, 40.0),          // same sec, NEGATIVE order → opens tie
      (1000000000L, 99L, 30.0),          // earliest sec → open
      (1600000000L, 1L, 10.0))           // latest sec → close
      .toDF("sec", "event_id", "v").withColumn("g", lit("a"))
    val out = Ohlc.resample(df, Seq("g"), "sec", "event_id", "v",
      bucketSec = 2000000000L).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getDouble(2) == 30.0, s"open: $r")   // min (offset, order)
    assert(r.getDouble(3) == 40.0)                // high
    assert(r.getDouble(4) == 10.0)                // low
    assert(r.getDouble(5) == 10.0, s"close: $r")  // max (offset, order)
    // ties on sec resolve by order: -5 before 2e10 → close of the tie
    // pair is the 2e10 row, checked via a bucket with only those two
    val tie = Ohlc.resample(df.filter(col("sec") === 1500000000L),
      Seq("g"), "sec", "event_id", "v", 2000000000L).collect()(0)
    assert(tie.getDouble(2) == 40.0 && tie.getDouble(5) == 20.0)
  }

  test("bucketedPrefixSum equals the plain global window cumsum, " +
    "including ties and edge-bucket clamps") {
    import spark.implicits._
    val df = (1 to 500).map { i =>
      // values collide (i % 40) so tie-break matters; sums land in
      // many buckets plus both clamp edges via the narrow range below
      (i.toLong, (i % 40).toDouble, BigDecimal(i).setScale(6))
    }.toDF("id", "v", "x")
      .withColumn("x",
        col("x").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
    val got = Quantiles.bucketedPrefixSum(df, "v", "x", "id",
      range = (5.0, 30.0), nBuckets = 16)
      .select(col("id"), col("__cumsum").cast("string"),
        col("__total").cast("string"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val want = df
      .withColumn("c", sum(col("x")).over(w))
      .select(col("id"), col("c").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val total = (1 to 500).sum
    (1 to 500).foreach { i =>
      val (c, t) = got(i.toLong)
      assert(BigDecimal(c) == BigDecimal(want(i.toLong)),
        s"id $i: cumsum $c != window ${want(i.toLong)}")
      assert(BigDecimal(t) == BigDecimal(total), s"total $t")
    }
  }
}
