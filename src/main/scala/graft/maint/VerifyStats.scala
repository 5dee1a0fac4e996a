package graft.maint

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Maintenance scan statistics (reference D-1, `fileutils.py:378-399` +
  * the verify walk at `:429-524`): per chunk — total rows, used rows
  * (`position != 0`), used ratio, min/max written index. One grouped
  * aggregation over the scan; corruption detection is a filter, not an
  * abort (the reference collects corrupt chunks and keeps scanning).
  */
object VerifyStats {

  /** `chunkCol`: chunk identity (e.g. snapped chunk-start seconds);
    * `slotCol`: tick slot within the chunk; `valueCols`: metric columns
    * whose non-nullness marks a used row.
    */
  def stats(df: DataFrame, seriesCols: Seq[String], chunkCol: Column,
            slotIdxCol: Column, usedPredicate: Column): DataFrame =
    df.groupBy((seriesCols.map(col) :+ chunkCol.as("chunk")): _*)
      .agg(
        count(lit(1)).as("rows_total"),
        count(when(usedPredicate, 1)).as("rows_used"),
        min(when(usedPredicate, slotIdxCol)).as("min_idx"),
        max(when(usedPredicate, slotIdxCol)).as("max_idx"))
}
