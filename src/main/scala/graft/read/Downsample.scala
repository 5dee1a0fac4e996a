package graft.read

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grafana-style downsampling (reference B-9/B-10).
  *
  * `/{db}/{sensor}/query` computes `spread = (end - start + 1) /
  * maxDataPoints` and emits, per metric, the FIRST non-NaN value at or
  * after each spread boundary (`server.py:424-459`); the reference
  * additionally skips whole chunks when the spread exceeds a chunk
  * (`database.py:682`).
  *
  * Spark shape: one hash aggregation over the pruned scan —
  * `min_by(value, order)` per bucket. That is a single shuffle with
  * map-side partial aggregation; the chunk-skip micro-optimisation is
  * subsumed by only ever reading the time-pruned range and aggregating
  * (O(rows-in-range), no per-boundary seek loop).
  */
object Downsample {

  /** Bucket index for an epoch-seconds column. `spread` in seconds —
    * fractional: the reference computes it in float (`server.py` grafana
    * query), and a sub-1.0 spread (short range, many maxDataPoints) must
    * not collapse to 0 (ANSI divide-by-zero) or shift boundaries.
    */
  def bucket(sec: Column, startSec: Long, spread: Double): Column =
    floor((sec - lit(startSec)) / lit(spread)).cast("long")

  /** Float spread like the reference; guarded against a degenerate 0.
    * Public so callers composing their own aggregation (e.g. the mean
    * dashboard read's raw fallback) bucket on the SAME relative grid.
    */
  def spreadOf(startSec: Long, endSec: Long, maxDataPoints: Int): Double = {
    val s = (endSec - startSec + 1).toDouble / maxDataPoints
    if (s > 0) s else 1.0
  }

  /** First value per (series, bucket): `orderCol` must be a unique
    * arrival/time order (ties on the boundary resolve by it).
    */
  def firstPerBucket(df: DataFrame, seriesCols: Seq[String], sec: Column,
                     valueCol: String, orderCol: String, startSec: Long,
                     endSec: Long, maxDataPoints: Int): DataFrame = {
    val spread = spreadOf(startSec, endSec, maxDataPoints)
    df.filter(sec >= startSec && sec <= endSec && col(valueCol).isNotNull)
      .withColumn("bucket", bucket(sec, startSec, spread))
      .groupBy((seriesCols.map(col) :+ col("bucket")): _*)
      .agg(
        min_by(col(valueCol), col(orderCol)).as("first_value"),
        min_by(sec, col(orderCol)).as("first_ts"))
  }

  /** M4 downsample (Jugel et al., VLDB 2014): per (series, pixel
    * bucket) the min, max, FIRST and LAST values — the four rows that
    * make a width-limited line chart render pixel-identically to the
    * full series. ONE map-side-combinable hash aggregate: min/max are
    * selection-exact, first/last are min_by/max_by on a composite
    * (sec, arrival) time key — so 100 TB of points behind a 1000-px
    * chart costs one aggregation, no sort, no window. The reference
    * renders first-of-bucket only (`server.py:444-459`); M4 keeps the
    * extremes LTTB only approximates.
    */
  def m4PerBucket(df: DataFrame, seriesCols: Seq[String], sec: Column,
                  valueCol: String, orderCol: String, startSec: Long,
                  endSec: Long, maxDataPoints: Int): DataFrame = {
    val spread = spreadOf(startSec, endSec, maxDataPoints)
    // composite (sec, arrival) time key as a STRUCT — lexicographic
    // struct ordering is exact for any orderCol domain (an arithmetic
    // sec*K+order packing silently breaks once ids reach K)
    val tkey = struct(sec.as("s"), col(orderCol).as("o"))
    df.filter(sec >= startSec && sec <= endSec && col(valueCol).isNotNull)
      .withColumn("bucket", bucket(sec, startSec, spread))
      .groupBy((seriesCols.map(col) :+ col("bucket")): _*)
      .agg(
        min(col(valueCol)).as("v_min"),
        max(col(valueCol)).as("v_max"),
        min_by(col(valueCol), tkey).as("v_first"),
        max_by(col(valueCol), tkey).as("v_last"))
  }

  /** Mean-per-bucket consolidation — the training-pipeline variant of
    * B-9 (the reference only emits first-of-bucket). The sum is routed
    * through DECIMAL so partial-aggregation order can never change the
    * mean; the single final division happens in double.
    */
  def meanPerBucket(df: DataFrame, seriesCols: Seq[String], sec: Column,
                    valueCol: String, startSec: Long, endSec: Long,
                    maxDataPoints: Int): DataFrame = {
    val spread = spreadOf(startSec, endSec, maxDataPoints)
    df.filter(sec >= startSec && sec <= endSec && col(valueCol).isNotNull)
      .withColumn("bucket", bucket(sec, startSec, spread))
      .groupBy((seriesCols.map(col) :+ col("bucket")): _*)
      .agg(
        (sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double") / count(lit(1))).as("mean_value"),
        count(lit(1)).as("n"))
  }

  /** LTTB-style VISUAL downsample (Steinarsson's Largest-Triangle-
    * Three-Buckets, the de-facto dashboard decimation algorithm), in
    * its bucket-parallel form: per (series, bucket) keep the point
    * with the largest triangle area against the PREVIOUS and NEXT
    * bucket AVERAGES. True LTTB anchors on the previously SELECTED
    * point — an inherently sequential recursion no engine's window
    * frame expresses; anchoring on the neighbor averages is the
    * standard parallelization (each bucket decides independently) and
    * preserves the visual property that spikes/extremes survive where
    * first-/mean-per-bucket flatten them.
    *
    * Shape: one aggregation for bucket (time, value) means (decimal-
    * routed, order-free), two self-joins on (series, bucket±1) — both
    * sides bucket-scale, not point-scale — then one argmax aggregation
    * over the points. Edge buckets (missing a neighbor) keep their
    * first point by `orderCol`. Ties in area break by `orderCol` —
    * the area expression has one fixed shape, so the float compare is
    * engine-portable.
    */
  def lttbPerBucket(df: DataFrame, seriesCols: Seq[String], sec: Column,
                    valueCol: String, orderCol: String, startSec: Long,
                    endSec: Long, maxDataPoints: Int): DataFrame = {
    val spread = spreadOf(startSec, endSec, maxDataPoints)
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val pts = df.filter(sec >= startSec && sec <= endSec &&
        col(valueCol).isNotNull && !isnan(col(valueCol)))
      .withColumn("bucket", bucket(sec, startSec, spread))
      .withColumn("__sec", sec)
    val avgs = pts
      .groupBy((seriesCols.map(col) :+ col("bucket")): _*)
      .agg(
        (sum(col("__sec").cast(dec)).cast("double") / count(lit(1)))
          .as("ax"),
        (sum(col(valueCol).cast(dec)).cast("double") / count(lit(1)))
          .as("ay"))
    val prev = avgs.select((seriesCols.map(col) :+
      (col("bucket") + 1).as("bucket") :+ col("ax").as("px") :+
      col("ay").as("py")): _*)
    val next = avgs.select((seriesCols.map(col) :+
      (col("bucket") - 1).as("bucket") :+ col("ax").as("nx") :+
      col("ay").as("ny")): _*)
    val joined = pts
      .join(prev, seriesCols :+ "bucket", "left")
      .join(next, seriesCols :+ "bucket", "left")
    // twice the triangle area — the /2 cannot change the argmax
    val area = abs(
      (col("px") - col("nx")) * (col(valueCol) - col("py")) -
        (col("px") - col("__sec")) * (col("ny") - col("py")))
    val keyed = joined.withColumn("__area",
      when(col("px").isNotNull && col("nx").isNotNull, area))
    keyed
      .groupBy((seriesCols.map(col) :+ col("bucket")): _*)
      .agg(
        when(max(col("__area")).isNotNull,
          max_by(struct(col("__sec").as("sec"), col(valueCol).as("value"),
            col(orderCol).as("oid")),
            struct(col("__area"), (-col(orderCol)).as("no"))))
          .otherwise(
            min_by(struct(col("__sec").as("sec"), col(valueCol).as("value"),
              col(orderCol).as("oid")), col(orderCol)))
          .as("pick"))
      .select((seriesCols.map(col) :+ col("bucket") :+
        col("pick.sec").as("sec") :+ col("pick.value").as("value") :+
        col("pick.oid").as("picked_id")): _*)
  }

  /** B-10 long output: `(metric, value, ts_ms)` rows, NaN/null cells
    * dropped (`server.py:453-455`).
    */
  def longFormat(df: DataFrame, keys: Seq[String], metrics: Seq[String],
                 slotSecCol: String): DataFrame =
    graft.ingest.Pivot.wideToLong(df, keys, metrics)
      .withColumn("ts_ms", col(slotSecCol) * 1000)
}
