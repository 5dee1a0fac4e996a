package graft.read

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Read-side operators B-1..B-8 of the reference, as declarative
  * DataFrame transforms so Catalyst pushes the time-range predicate and
  * the metric projection into the parquet scan (the reference always
  * reads whole chunks and projects after the fact,
  * `database.py:787`/`client.py:569-570` — Catalyst is strictly better
  * here).
  */
object Reader {

  /** B-1/B-2 time-range scan: `[from, to)` on the raw timestamp column.
    * Literals are cast to the column's own type so the comparison stays
    * a pushable parquet filter (works for TIMESTAMP and TIMESTAMP_NTZ
    * sources alike).
    *
    * When the frame carries a raw `<tsCol>_ns` long (nano-precision
    * sources, see Tables.load), the bounds are applied to IT instead:
    * the normalized column is an expression, which no format can push
    * down, while the long column gets parquet row-group min/max
    * skipping. For whole-second bounds the rewrite is exact:
    * floor(ns/1000) ≥ s·10⁶ ⟺ ns ≥ s·10⁹.
    */
  def scanRange(df: DataFrame, tsCol: String, fromTs: String,
                toTs: String): DataFrame = {
    val nsCol = s"${tsCol}_ns"
    if (df.columns.contains(nsCol)) {
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
      def ns(s: String): Long = java.time.LocalDateTime.parse(s, fmt)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
      df.filter(col(nsCol) >= ns(fromTs) && col(nsCol) < ns(toTs))
    } else {
      val t = df.schema(tsCol).dataType
      df.filter(col(tsCol) >= lit(fromTs).cast(t) && col(tsCol) < lit(toTs).cast(t))
    }
  }

  /** B-4 metric projection. */
  def projectMetrics(df: DataFrame, keys: Seq[String],
                     metrics: Seq[String]): DataFrame =
    df.select((keys ++ metrics).map(col): _*)

  /** B-3 checksum-validation filter: recompute nansum over `metrics`
    * and keep rows whose stored checksum is close (drops corrupt rows,
    * `database.py:770-786`). Rows with a NULL stored checksum are
    * dropped, like the reference's unwritten (`position == 0`) rows.
    */
  def checksumFilter(df: DataFrame, metrics: Seq[String],
                     storedCol: String, atol: Double = 1e-3): DataFrame = {
    import graft.expr.RowChecksum
    val recomputed = RowChecksum.nansum(metrics.map(col))
    df.filter(RowChecksum.isClose(recomputed, col(storedCol), rtol = 0d, atol = atol))
  }

  /** B-8 last timestamp per series: plain max aggregation. */
  def lastTimestamp(df: DataFrame, seriesCols: Seq[String],
                    tsSecCol: Column): DataFrame =
    df.groupBy(seriesCols.map(col): _*).agg(max(tsSecCol).as("last_ts"))

  /** B-7 timezone conversion at the presentation edge. Storage/compute
    * stay in UTC epoch (the reference also works in epoch seconds
    * internally, `chunker.py:52-54`); only the returned frame is
    * shifted. `tz` may be a region id ("Europe/Madrid") or a fixed
    * offset ("+05:30").
    */
  def tzConvert(df: DataFrame, tsCol: String, tz: String,
                outCol: String): DataFrame =
    df.withColumn(outCol,
      date_format(from_utc_timestamp(col(tsCol).cast(TimestampType), tz),
        "yyyy-MM-dd HH:mm:ss"))
}
