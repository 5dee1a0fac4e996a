package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row checksum and its tolerance check (reference C-1/C-2).
  *
  * The reference appends `checksum = nansum(metric_cols)` to every row
  * (`database.py:484-485`) and on read drops rows where the recomputed
  * sum is not `isclose` to the stored one (`database.py:770-786`; the
  * repair path uses `atol=1e-3`, `fileutils.py:643`). `nansum` semantics:
  * NaN/null cells count as 0, but an all-missing row has checksum NULL
  * (the repair/migrate masked-array variant skips all-NaN rows,
  * `fileutils.py:687-693`).
  *
  * Pure Column composition — stays in whole-stage codegen.
  */
object RowChecksum {

  private def zeroIfMissing(c: Column): Column =
    when(c.isNull || isnan(c), lit(0d)).otherwise(c)

  private def missing(c: Column): Column = c.isNull || isnan(c)

  /** `nansum` across metric columns; NULL when every input is missing. */
  def nansum(cols: Seq[Column]): Column = {
    val allMissing = cols.map(missing).reduce(_ && _)
    val sum = cols.map(zeroIfMissing).reduce(_ + _)
    when(allMissing, lit(null).cast("double")).otherwise(sum)
  }

  /** `np.isclose(a, b, rtol, atol)`: |a-b| <= atol + rtol*|b|. */
  def isClose(a: Column, b: Column, rtol: Double = 1e-5,
              atol: Double = 1e-3): Column =
    abs(a - b) <= lit(atol) + lit(rtol) * abs(b)
}
