package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-group quantiles by rank SELECTION, not interpolation.
  *
  * Interpolating quantiles (`percentile` / `quantile_cont`) compute
  * `lower + (higher - lower) * frac` — float arithmetic whose
  * association order differs across engines, so results are only
  * approximately portable. Selecting the value at rank `ceil(p·n)`
  * (classic type-1 quantile) involves NO float math: the answer is an
  * actual data value, bit-identical everywhere, with ties broken by a
  * deterministic order column.
  *
  * Shape: one shuffle on the group key, one within-partition sort
  * feeding both the row_number and the count window, then a tiny final
  * aggregation. At 100 TB a full per-group sort is the exact-quantile
  * price on any engine; the approximate path for dashboards is
  * `approx_percentile` (t-digest sketch, mergeable partials) — same
  * call shape, no sort.
  */
object Quantiles {

  /** One row per group: `q<pct>` columns with the type-1 quantile of
    * `valueCol` at each requested PERCENT (integer 1..100).
    *
    * The rank is computed in INTEGER arithmetic: `ceil(p·n)` for
    * `p = pct/100` is exactly `(pct·n + 99) div 100`. A double
    * `ceil(0.99 * n)` is off by one whenever the product lands just
    * above an integer (0.99·300 = 297.00000000000006 → rank 298) —
    * the "no float math" promise requires the rank itself to be exact,
    * not just the selected value (ADVICE r2).
    */
  def exactByRank(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  orderCol: String, pcts: Seq[Int]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol), col(orderCol))
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)))
    val aggs = pcts.map { pct =>
      require(pct >= 1 && pct <= 100, s"percent out of range: $pct")
      max(when(col("__rn") === expr(s"($pct * __n + 99) div 100"),
        col(valueCol))).as(s"q$pct")
    }
    ranked.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
