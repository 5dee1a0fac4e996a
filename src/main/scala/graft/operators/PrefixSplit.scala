package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Range-subsplit composition for PREFIX (running) aggregates.
  *
  * A running aggregate over one series is normally a single window
  * partition — one sorted task per series. That is the right default
  * while a series fits a task (the `ts_level_shift` discipline), but a
  * single multi-year series at a 1-second grid is hundreds of millions
  * of rows; this operator is the escape hatch: it computes the same
  * running max with the series RANGE-SUBSPLIT into `nSlices`
  * contiguous slices, so no task ever sorts more than ~1/nSlices of
  * the series.
  *
  * Two-pass shape (the [[Quantiles.bucketedRank]] pattern applied to
  * an associative prefix aggregate):
  *   1. slice each row onto a fixed order grid (per-series min/max of
  *      the order column, one tiny aggregate broadcast back), then a
  *      window PER (series, slice) computes the local running max —
  *      partition count = |series|·nSlices, each sorting a slice;
  *   2. the per-slice totals form a ≤ |series|·nSlices bounded table;
  *      an EXCLUSIVE prefix max over it (window over the bounded
  *      table only) yields each slice's carry-in, broadcast-joined
  *      back: running = max(carry_in, local_running).
  *
  * Exactness at slice edges is not approximate: max is associative,
  * so prefix_max(row) = max(max over all earlier slices, local prefix
  * within the row's slice) — proven bit-equal to the single-window
  * plan by PrefixSplitSpec, including every first-row-of-slice edge.
  * The same composition carries any associative+commutative prefix
  * aggregate ([[runningAggSubsplit]]: max | min | sum; a running count
  * is the sum of a not-null indicator); bounded ±k frames (Bollinger, the STL
  * trend MA) subsplit even more simply with k-row halos because their
  * frame never reaches back past k rows (SCALE.md).
  */
object PrefixSplit {

  /** Running max of `valueCol` over (`partCols` order by `orderCol`),
    * computed with the series subsplit into `nSlices` — result column
    * `__runmax` equals `max(valueCol) OVER (PARTITION BY partCols
    * ORDER BY orderCol ROWS UNBOUNDED PRECEDING)` exactly. `orderCol`
    * must be numeric and unique per series (a slot/sec grid).
    */
  def runningMaxSubsplit(df: DataFrame, partCols: Seq[String],
                         orderCol: String, valueCol: String,
                         nSlices: Int = 256): DataFrame =
    runningAggSubsplit(df, partCols, orderCol, valueCol, "max", nSlices)
      .withColumnRenamed("__run", "__runmax")

  /** The subsplit composition for ANY associative+commutative prefix
    * aggregate — `agg` ∈ max | min | sum. Result column `__run`
    * equals `AGG(valueCol) OVER (PARTITION BY partCols ORDER BY
    * orderCol ROWS UNBOUNDED PRECEDING)`.
    *
    * Exactness: max/min are bit-exact for any values. `sum` is
    * bit-exact when the values are exact under reassociation
    * (integers, decimals, dyadic doubles — the DETERMINISM.md rule);
    * for general doubles the subsplit reassociates the additions, the
    * same caveat as any distributed float sum.
    */
  def runningAggSubsplit(df: DataFrame, partCols: Seq[String],
                         orderCol: String, valueCol: String,
                         agg: String, nSlices: Int = 256): DataFrame = {
    def aggFn(c: Column): Column = agg match {
      case "max" => max(c)
      case "min" => min(c)
      case "sum" => sum(c)
      case other => throw new IllegalArgumentException(
        s"runningAggSubsplit supports max|min|sum, got $other")
    }
    def combine(local: Column, carry: Column): Column = agg match {
      case "max" => greatest(local, coalesce(carry, local))
      case "min" => least(local, coalesce(carry, local))
      // window SUM skips nulls: an all-null local prefix must pass the
      // carry through (and vice versa), like greatest/least do above
      case "sum" => when(local.isNull, carry)
        .when(carry.isNull, local).otherwise(local + carry)
    }
    val pc = partCols.map(col)
    val o = col(orderCol).cast("double")
    // per-series order range: one tiny aggregate, broadcast back
    val rng = df.groupBy(pc: _*)
      .agg(min(o).as("__omin"), max(o).as("__omax"))
    val width = greatest((col("__omax") - col("__omin")) / nSlices,
      lit(1e-9))
    val sliced = df.join(broadcast(rng), partCols)
      .withColumn("__slice",
        least(greatest(floor((o - col("__omin")) / width), lit(0)),
          lit(nSlices - 1)).cast("int"))
      .drop("__omin", "__omax")
    // pass 1: local running aggregate within each (series, slice)
    val wLocal = Window.partitionBy((pc :+ col("__slice")): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = sliced.withColumn("__l", aggFn(col(valueCol)).over(wLocal))
    // pass 2: exclusive prefix over the bounded per-slice totals
    val wCarry = Window.partitionBy(pc: _*).orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = sliced.groupBy((pc :+ col("__slice")): _*)
      .agg(aggFn(col(valueCol)).as("__s"))
      .withColumn("__carry", aggFn(col("__s")).over(wCarry))
      .drop("__s")
    local.join(broadcast(carry), partCols :+ "__slice")
      .withColumn("__run", combine(col("__l"), col("__carry")))
      .drop("__slice", "__l", "__carry")
  }

  /** Size-GATED running max (the [[graft.ext.TextStats.gatedBroadcast]]
    * pattern applied to window strategy): a single per-series window
    * while the frame's MEASURED row count stays under
    * `maxRowsSingleWindow` — the right default when every series fits
    * a task — else the [[runningMaxSubsplit]] escape hatch, so one
    * multi-year 1-second-grid series can never pin a whole stage on a
    * single sorting task. The caller must pass an already-checkpointed
    * frame: the gate's count() materializes it once and every consumer
    * reuses it. Values are identical either way (PrefixSplitSpec
    * proves bit-equality including slice edges) — the gate changes the
    * execution strategy, never the result.
    */
  def gatedRunningMax(df: DataFrame, partCols: Seq[String],
                      orderCol: String, valueCol: String, outCol: String,
                      maxRowsSingleWindow: Long = 4000000L,
                      nSlices: Int = 256): DataFrame =
    if (df.count() <= maxRowsSingleWindow) {
      val w = Window.partitionBy(partCols.map(col): _*)
        .orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, 0)
      df.withColumn(outCol, max(col(valueCol)).over(w))
    } else
      runningMaxSubsplit(df, partCols, orderCol, valueCol, nSlices)
        .withColumnRenamed("__runmax", outCol)
}
