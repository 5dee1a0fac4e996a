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
    * `valueCol` at each requested fraction.
    */
  def exactByRank(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  orderCol: String, ps: Seq[Double]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol), col(orderCol))
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)))
    val aggs = ps.map { p =>
      val name = s"q${(p * 100).round}"
      max(when(col("__rn") === ceil(lit(p) * col("__n")).cast("long"),
        col(valueCol))).as(name)
    }
    ranked.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
