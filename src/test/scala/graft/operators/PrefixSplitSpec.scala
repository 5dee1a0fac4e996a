package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Slice-edge exactness of the two-pass range-subsplit prefix max:
  * the composed plan must equal the single-window running max
  * BIT-FOR-BIT on every row — in particular on the first row of every
  * slice, where the carry-in join supplies the history the local
  * window cannot see.
  */
class PrefixSplitSpec extends SparkSpec {
  import spark.implicits._

  test("runningMaxSubsplit equals the single-window running max on " +
    "every row, including slice edges") {
    // deterministic pseudo-random series: values wiggle so maxima land
    // both inside slices and exactly on slice boundaries
    val df = (0 until 3).flatMap { s =>
      (0 until 1000).map { i =>
        (s.toString, i.toLong,
          math.sin(i * 0.37 + s) * 100 + (i % 97) - (i % 13) * 7.0)
      }
    }.toDF("series", "slot", "v")
    val wRef = Window.partitionBy("series").orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ref = df.withColumn("__ref", max(col("v")).over(wRef))
    // nSlices values that do AND do not divide the series length, so
    // edge rows land at varying offsets
    Seq(7, 16, 100).foreach { n =>
      val got = PrefixSplit.runningMaxSubsplit(df, Seq("series"),
        "slot", "v", nSlices = n)
      val joined = ref.join(got, Seq("series", "slot", "v"))
      val mismatch = joined.filter(col("__ref") =!= col("__runmax")).count()
      assert(mismatch == 0L,
        s"nSlices=$n: $mismatch rows diverge from the single window")
      assert(joined.count() == 3000L, s"nSlices=$n: join lost rows")
    }
  }

  test("the subsplit plan's windows are all slice- or bounded-table " +
    "partitioned — no whole-series sort task") {
    val df = (0 until 200).map(i => ("a", i.toLong, i * 1.0))
      .toDF("series", "slot", "v")
    val p = PrefixSplit.runningMaxSubsplit(df, Seq("series"), "slot", "v")
      .queryExecution.executedPlan.toString
    // pass-1 window must partition on (series, __slice); the only
    // window NOT slice-partitioned is the carry window over the
    // bounded per-slice table
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty)
    assert(winLines.exists(_.contains("__slice")),
      s"no slice-partitioned window in:\n$p")
  }

  test("runningAggSubsplit: min and sum equal their single-window " +
    "references on every row (dyadic values — exact under " +
    "reassociation)") {
    // values are multiples of 1/8 so the sum path is bit-exact in any
    // accumulation order (the DETERMINISM.md dyadic rule)
    val df = (0 until 2).flatMap { s =>
      (0 until 600).map { i =>
        (s.toString, i.toLong, ((i * 37 + s * 11) % 400 - 200) / 8.0)
      }
    }.toDF("series", "slot", "v")
    for (agg <- Seq("min", "sum")) {
      val fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        if (agg == "min") min(_) else sum(_)
      val wRef = Window.partitionBy("series").orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, 0)
      val ref = df.withColumn("__ref", fn(col("v")).over(wRef))
      val got = PrefixSplit.runningAggSubsplit(df, Seq("series"),
        "slot", "v", agg, nSlices = 13)
      val bad = ref.join(got, Seq("series", "slot", "v"))
        .filter(col("__ref") =!= col("__run")).count()
      assert(bad == 0L, s"$agg subsplit diverges from the single window")
    }
  }

  test("runningAggSubsplit sum: null-skipping matches the window — " +
    "including an ALL-NULL slice between non-null slices") {
    // slice width ≈ 1000/10 = 100 slots: slots 100-299 are all null, so
    // at least one whole slice has a null local prefix and must pass
    // the carry through (the r11 review fix)
    val rows = (0 until 1000).map { i =>
      val v: java.lang.Double =
        if (i >= 100 && i < 300) null else java.lang.Double.valueOf((i % 64) / 8.0)
      ("a", i.toLong, v)
    }
    val df = rows.toDF("series", "slot", "v")
    val wRef = Window.partitionBy("series").orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ref = df.withColumn("__ref", sum(col("v")).over(wRef))
    val got = PrefixSplit.runningAggSubsplit(df, Seq("series"), "slot",
      "v", "sum", nSlices = 10)
    val joined = ref.join(got, Seq("series", "slot"))
    assert(joined.filter(!(col("__ref") <=> col("__run"))).count() == 0,
      "sum subsplit diverges on null-bearing series")
    assert(joined.count() == 1000)
  }

  test("runningAggSubsplit rejects a non-associative aggregate name") {
    val df = Seq(("a", 0L, 1.0)).toDF("series", "slot", "v")
    intercept[IllegalArgumentException] {
      PrefixSplit.runningAggSubsplit(df, Seq("series"), "slot", "v", "avg")
    }
  }

  test("gatedRunningMax: single window under the threshold, subsplit " +
    "over it, identical values either way") {
    val df = (0 until 2).flatMap { s =>
      (0 until 500).map { i =>
        (s.toString, i.toLong, math.cos(i * 0.53 + s) * 50 + (i % 41))
      }
    }.toDF("series", "slot", "v").localCheckpoint(false)
    // under the gate: plan is the plain single-series window
    val under = PrefixSplit.gatedRunningMax(df, Seq("series"), "slot",
      "v", "peak", maxRowsSingleWindow = 1000000L)
    val pUnder = under.queryExecution.executedPlan.toString
    assert(!pUnder.contains("__slice"),
      s"under-threshold frame took the subsplit path:\n$pUnder")
    // over the gate (threshold 0): plan is the subsplit composition
    val over = PrefixSplit.gatedRunningMax(df, Seq("series"), "slot",
      "v", "peak", maxRowsSingleWindow = 0L)
    val pOver = over.queryExecution.executedPlan.toString
    assert(pOver.contains("__slice"),
      s"over-threshold frame kept the single window:\n$pOver")
    // strategy cannot change values: bit-equal rows on both paths
    val diff = under.join(over.withColumnRenamed("peak", "peak2"),
      Seq("series", "slot", "v"))
      .filter(col("peak") =!= col("peak2")).count()
    assert(diff == 0L, s"$diff rows diverge between gate paths")
  }
}
