package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built
  * into Spark 4): the pre-aggregation shape that makes "distinct users
  * per <any time range>" a rollup-sized scan at 100 TB.
  *
  * The pattern mirrors `SensorStore.materializeMeanRollup`: materialize
  * per-(chunk, bucket) binary sketch PARTIALS once, then answer any
  * coarser/spanning range by `hll_union_agg` over the partials —
  * union is associative and lossless at a fixed lgK, so the merged
  * estimate equals the direct sketch over the raw rows (SketchesSpec
  * pins this exactly). Raw data is touched once at materialize time;
  * every query after that reads sketch rows ~10^4× smaller.
  */
object Sketches {

  /** Per-group binary HLL partials for `valueCol` (fixed lgK so unions
    * never degrade). One map-side-combinable aggregation.
    */
  def hllPartials(df: DataFrame, groupCols: Seq[String],
                  valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as(s"${valueCol}_hll"))

  /** Merge partials up to a coarser grouping and estimate. Partials
    * shuffle (tiny — one sketch per fine group), never the raw rows.
    */
  def hllEstimate(partials: DataFrame, groupCols: Seq[String],
                  sketchCol: String): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol), false))
        .as("distinct_est"))
}
