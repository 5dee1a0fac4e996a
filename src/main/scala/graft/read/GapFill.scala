package graft.read

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap filling on the tick grid. The reference leaves unwritten cells
  * NaN; time-series consumers usually want last-observation-carried-
  * forward. One window per series — a single shuffle on the series key,
  * then a sorted per-partition pass.
  */
object GapFill {

  /** Add `<col>_filled` columns carrying the last non-null observation
    * forward within each series partition, ordered by `orderCol`.
    */
  def forwardFill(df: DataFrame, partCols: Seq[String], orderCol: String,
                  cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(w))
    }
  }
}
