package graft.read

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding time-window statistics and counter derivatives — the
  * monitoring-query staples (moving average, PromQL-style delta/rate)
  * the reference's first-per-bucket downsample cannot express.
  *
  * All one-shuffle shapes: partition by series, order by time, RANGE
  * frames for the time windows. The rolling SUM is routed through
  * DECIMAL: sliding-frame engines recompute window sums in
  * engine-specific orders (Spark slides incrementally, DuckDB uses a
  * segment tree) — with double accumulation the same query returns
  * different last bits on different engines/partitionings; decimal
  * addition is exact and associative, so the result is unique.
  */
object Rolling {

  /** `<valueCol>_rmean`/`_rn`: mean and count of the trailing
    * `windowSec` seconds (inclusive range frame) per series.
    */
  def timeWindowMean(df: DataFrame, partCols: Seq[String], secCol: String,
                     valueCol: String, windowSec: Long): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(secCol))
      .rangeBetween(-windowSec, Window.currentRow)
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    // values beyond DECIMAL(28,6)'s range (|v| >= 1e22) would make the
    // ANSI cast throw — guard them to null so they drop out of both the
    // sum AND the count (n stays consistent with the summed set)
    val guarded = when(abs(col(valueCol)) < lit(1e22), col(valueCol))
    // ONE select with both window expressions: chained withColumns
    // interleave Projects that block CollapseWindow, planning two
    // Window passes; a single projection gives one Window operator
    // over one exchange+sort
    df.select(col("*"),
      count(guarded).over(w).as(s"${valueCol}_rn"),
      (sum(guarded.cast(dec)).over(w).cast("double") /
        count(guarded).over(w)).as(s"${valueCol}_rmean"))
  }

  /** Rolling z-score anomaly detection: how many trailing-window
    * standard deviations the current value sits from the trailing-
    * window mean. Moments (n, Σx, Σx²) accumulate through DECIMAL in
    * ONE Window operator; the closed form runs in double — the same
    * expression tree as the oracle, so results are bit-portable.
    * Population σ; z is null when the window has fewer than `minN`
    * points or zero variance.
    */
  def timeWindowZscore(df: DataFrame, partCols: Seq[String], secCol: String,
                       valueCol: String, windowSec: Long,
                       minN: Long = 2L): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(secCol))
      .rangeBetween(-windowSec, Window.currentRow)
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    // |v| >= 1e12 exceeds DECIMAL(18,6) — null it out of the moments
    // (count AND sums together) instead of letting the ANSI cast kill
    // the query on one wild data point (ADVICE r2; same guard in the
    // oracle)
    val guarded = when(abs(col(valueCol)) < lit(1e12), col(valueCol))
    val x = guarded.cast(dec)
    val scored = df.select(col("*"),
      count(guarded).over(w).as("rn"),
      sum(x).over(w).cast("double").as("sx"),
      sum(x * x).over(w).cast("double").as("sxx"))
    val n = col("rn").cast("double")
    val mean = col("sx") / n
    val variance = greatest(
      (col("sxx") - col("sx") * col("sx") / n) / n, lit(0d))
    scored
      .withColumn("rmean", mean)
      .withColumn("rstd", sqrt(variance))
      .withColumn("zscore",
        when(col("rn") >= minN && sqrt(variance) > 0,
          graft.ext.TextStats.trunc6(
            (col(valueCol) - mean) / sqrt(variance))))
      .drop("sx", "sxx")
  }

  /** Multi-window error burn rate (the SRE-workbook alert shape, public
    * Google SRE Workbook ch.5): per series, the error fraction over a
    * SHORT and a LONG trailing window; the alert fires only when BOTH
    * exceed their thresholds — the short window gives fast detection,
    * the long window suppresses blips. Rates are count/count integer
    * ratios (exact IEEE division of the same ints on every engine — no
    * decimal routing needed). Both frames share one exchange + one sort
    * on the series key.
    */
  def errorBurnRate(df: DataFrame, partCols: Seq[String], secCol: String,
                    isErrorCol: Column,
                    shortSec: Long, longSec: Long,
                    shortThreshold: Double, longThreshold: Double)
      : DataFrame = {
    // RANGE frames need no tie-break: all rows at equal secCol fall
    // inside the frame together, so counts are tie-order invariant.
    def w(sec: Long) = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(secCol))
      .rangeBetween(-sec, Window.currentRow)
    val err = when(isErrorCol, 1L)
    val scored = df.select(col("*"),
      (count(err).over(w(shortSec)) / count(lit(1)).over(w(shortSec)))
        .as("err_rate_short"),
      (count(err).over(w(longSec)) / count(lit(1)).over(w(longSec)))
        .as("err_rate_long"))
    scored.withColumn("alert",
      col("err_rate_short") > shortThreshold &&
        col("err_rate_long") > longThreshold)
  }

  /** `delta`/`dt`/`rate`: difference to the previous observation per
    * series and its per-second rate (null on each series' first row and
    * where dt = 0).
    */
  def deltaRate(df: DataFrame, partCols: Seq[String], secCol: String,
                valueCol: String, orderCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy((secCol +: orderCols).map(col): _*)
    val d = col(valueCol) - lag(col(valueCol), 1).over(w)
    val dt = col(secCol) - lag(col(secCol), 1).over(w)
    df.withColumn("delta", d)
      .withColumn("dt", dt)
      .withColumn("rate", when(dt > 0, d / dt))
  }

  /** `<valueCol>_ewma`: exponentially weighted moving average with
    * α = 1/2 over the trailing `k` ROWS per series (the smoothing
    * staple the plain rolling mean isn't).
    *
    * Bit-portability without decimal routing: the window list is
    * gathered in frame order and folded LEFT-TO-RIGHT with
    * `acc' = acc·0.5 + x·0.5`, seeded by the window's oldest value.
    * Multiplying by 0.5 is an exact IEEE scaling (power of two), so
    * each step performs exactly ONE rounded addition in an order fixed
    * by the frame — any engine that folds the same list produces the
    * same bits. An α that is not a dyadic rational (0.9, 0.1, …) would
    * reintroduce per-step multiply rounding; still deterministic, but
    * the dyadic choice keeps the only float noise in the additions.
    *
    * One Window exchange+sort; the fold is a codegen'd `aggregate`
    * over a bounded k-element array — state per row is O(k), not the
    * unbounded full-history recursion of textbook EWMA (which no
    * engine's window frame can express without a UDAF). Callers
    * pre-filter nulls/NaNs: `collect_list` drops nulls (DuckDB's
    * `list()` keeps them), so null handling must happen upstream for
    * the oracle to agree.
    */
  def ewma(df: DataFrame, partCols: Seq[String], secCol: String,
           orderCol: String, valueCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(secCol), col(orderCol))
      .rowsBetween(-(k - 1), Window.currentRow)
    val l = collect_list(col(valueCol).cast("double")).over(w)
    df.withColumn("__l", l)
      .withColumn(s"${valueCol}_ewma",
        aggregate(slice(col("__l"), lit(2), size(col("__l")) - 1),
          element_at(col("__l"), 1),
          (acc, x) => acc * lit(0.5) + x * lit(0.5)))
      .drop("__l")
  }
}
