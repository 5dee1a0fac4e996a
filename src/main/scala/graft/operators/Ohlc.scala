package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Grid

/** OHLC (open/high/low/close) bucket resampling — the candlestick
  * downsample every TSDB dashboard wants next after first-per-bucket
  * (reference B-9 gives only "first"; this is the 4-aggregate
  * generalization).
  *
  * ONE map-side-combinable hash aggregation: open/close are
  * `min_by`/`max_by` over a composite in-bucket order key — no window,
  * no sort, no second shuffle. The order key packs
  * `(sec - bucket) * 10^10 + order` into one int64 (in-bucket offset
  * bounded by bucketSec ≤ ~10^8 and the tiebreak id below 10^10 — far
  * above any per-bucket row count), so the argmin/argmax is totally
  * ordered and deterministic even when timestamps tie.
  */
object Ohlc {

  def resample(df: DataFrame, groupCols: Seq[String], secCol: String,
               orderCol: String, valueCol: String,
               bucketSec: Long): DataFrame = {
    val bucket = Grid.snapSeconds(col(secCol), bucketSec)
    val okey = (col(secCol) - bucket) * lit(10000000000L) + col(orderCol)
    df.filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .withColumn("bucket", bucket)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(
        min_by(col(valueCol), okey).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), okey).as("close"),
        count(lit(1)).as("n"))
  }
}
