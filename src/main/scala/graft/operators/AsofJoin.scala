package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the most recent right row with
  * `right.ts <= left.ts` per key (the canonical time-series enrich:
  * trades←quotes, events←sensor readings). The reference engine has no
  * join at all (SURVEY §2.E); Spark has no native as-of join.
  *
  * Spark-first shape: UNION + single window pass, not a per-row range
  * probe. Both sides are tagged and unioned, then one window per key
  * ordered by (ts, side) carries the last right-side values forward onto
  * left rows (`last(..., ignoreNulls)` over unbounded-preceding). That
  * is ONE shuffle on the key and one within-partition sort — the same
  * cost as a regular sort-merge join, linear in rows, no range-join
  * quadratic blow-up, and AQE-skew-splittable because the window
  * partition key is the join key. At 100 TB this is the only shape that
  * survives: a point-in-interval join or a per-left-row subquery would
  * re-scan the right side per key×time bucket.
  */
object AsofJoin {

  /** Left as-of-join right. Output: every left row + `valueCols` from
    * the latest right row at-or-before the left timestamp (null when no
    * right row precedes), plus `asof_<rightTs>` = that right row's
    * timestamp.
    *
    * @param keyCols     equi-join keys
    * @param leftTs      left ordering column (numeric or timestamp)
    * @param rightTs     right ordering column (same type)
    * @param valueCols   right columns to carry (null-valued right cells
    *                    are skipped — LOCF semantics)
    * @param rightOrder  tie-break among right rows at the same ts
    *                    (the max wins — last-write-wins)
    * @param tolerance   max allowed leftTs - rightTs; older matches are
    *                    nulled out (None = unbounded)
    */
  def lastAtOrBefore(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                     leftTs: String, rightTs: String, valueCols: Seq[String],
                     rightOrder: Option[String] = None,
                     tolerance: Option[Long] = None): DataFrame = {
    val ts = "__asof_ts"
    val side = "__asof_side" // right=0 sorts before left=1 at equal ts ⇒ inclusive
    val ord = "__asof_ord"
    val leftCols = left.columns.toSeq

    val taggedRight = right.select(
      (keyCols.map(col) :+ col(rightTs).as(ts) :+ lit(0).as(side) :+
        rightOrder.map(col).getOrElse(lit(0L)).as(ord)) ++
        valueCols.map(col) ++
        leftCols.filterNot(c => keyCols.contains(c))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (keyCols.map(col) :+ col(leftTs).as(ts) :+ lit(1).as(side) :+
        lit(0L).as(ord)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(c => keyCols.contains(c)).map(col): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ts), col(side), col(ord))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn(s"asof_$rightTs",
        last(when(col(side) === 0, col(ts)), ignoreNulls = true).over(w))
    val withVals = valueCols.foldLeft(carried) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    val matched = tolerance match {
      case Some(tol) =>
        val fresh = col(s"asof_$rightTs").isNotNull &&
          (col(ts) - col(s"asof_$rightTs")) <= tol
        valueCols.foldLeft(
          withVals.withColumn(s"asof_$rightTs",
            when(fresh, col(s"asof_$rightTs")))) { (df, v) =>
          df.withColumn(v, when(fresh, col(v)))
        }
      case None => withVals
    }
    matched.filter(col(side) === 1)
      .select((leftCols.map(col) ++ valueCols.map(col) :+
        col(s"asof_$rightTs")): _*)
  }

  /** NEAREST-in-time as-of join: for every left row, the right row
    * whose timestamp is closest in EITHER direction (ties → the
    * at-or-before side). Same union + one-exchange shape as
    * [[lastAtOrBefore]], with one backward and one forward window
    * frame over the shared sort: each direction's winner is a single
    * `max`/`min` over a (ts, order, values…) struct — the whole
    * candidate row rides in the struct, so adding value columns never
    * adds window passes.
    *
    * Tie-breaks among right rows at the same timestamp: the BEFORE
    * side takes the largest `rightOrder` (last-write-wins, LOCF
    * convention), the AFTER side the smallest (first observation,
    * NOCB convention).
    *
    * @param tolerance max allowed |leftTs − rightTs|; farther matches
    *                  null out (None = unbounded)
    */
  def nearestInTime(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                    leftTs: String, rightTs: String, valueCols: Seq[String],
                    rightOrder: Option[String] = None,
                    tolerance: Option[Long] = None): DataFrame = {
    val ts = "__asof_ts"
    val side = "__asof_side" // right=0 before left=1 at equal ts ⇒ the
                             // backward frame is inclusive, forward exclusive
    val ord = "__asof_ord"
    val leftCols = left.columns.toSeq

    val taggedRight = right.select(
      (keyCols.map(col) :+ col(rightTs).as(ts) :+ lit(0).as(side) :+
        rightOrder.map(col).getOrElse(lit(0L)).as(ord)) ++
        valueCols.map(col) ++
        leftCols.filterNot(c => keyCols.contains(c))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (keyCols.map(col) :+ col(leftTs).as(ts) :+ lit(1).as(side) :+
        lit(0L).as(ord)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(c => keyCols.contains(c)).map(col): _*)

    val base = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ts), col(side), col(ord))
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rightStruct = when(col(side) === 0,
      struct(col(ts).as("__t") +: col(ord).as("__o") +:
        valueCols.map(col): _*))

    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__b", max(rightStruct).over(wb))
      .withColumn("__a", min(rightStruct).over(wf))
    val distB = col(ts) - col("__b.__t")
    val distA = col("__a.__t") - col(ts)
    val useBefore = col("__b").isNotNull &&
      (col("__a").isNull || distB <= distA)
    val pick = when(useBefore, col("__b")).otherwise(col("__a"))
    val dist = when(useBefore, distB).otherwise(distA)
    val within = tolerance match {
      case Some(tol) => pick.isNotNull && dist <= tol
      case None      => pick.isNotNull
    }
    carried.filter(col(side) === 1)
      .select((leftCols.map(col) ++
        valueCols.map(v => when(within, pick.getField(v)).as(v)) :+
        when(within, pick.getField("__t")).as(s"asof_$rightTs")): _*)
  }
}
