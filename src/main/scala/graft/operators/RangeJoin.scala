package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join. Naively this is a theta join
  * (`p.t BETWEEN i.start AND i.end`) — Spark would execute it as
  * BroadcastNestedLoopJoin (O(points × intervals)), which dies at scale
  * the moment the interval side stops fitting in a broadcast.
  *
  * Spark-first shape: BUCKETED equi-join. Points key by
  * `floor(t / W)`; each interval explodes to every W-bucket it covers;
  * the join is then a plain shuffled (or broadcast) hash equi-join on
  * the bucket, refined by the exact range predicate. A point lives in
  * exactly one bucket, so no dedup pass is needed. Cost:
  * O(points + intervals · width/W) rows through one hash join — choose
  * W near the typical interval width so the explode factor stays ~1-2.
  * Skewed buckets (hot time ranges) split under AQE like any equi-join.
  */
object RangeJoin {

  /** Inner-join points to every interval containing them.
    * `points`/`intervals` must not share column names (alias first).
    *
    * @param pointSec    numeric position of a point row
    * @param startCol    interval start (inclusive), numeric
    * @param endCol      interval end (inclusive), numeric
    * @param bucketWidth W — bucket size in the same units
    * @param keyCols     optional extra equi-keys present on BOTH sides
    */
  def pointsInIntervals(points: DataFrame, pointSec: Column,
                        intervals: DataFrame, startCol: Column, endCol: Column,
                        bucketWidth: Long,
                        keyCols: Seq[String] = Nil): DataFrame = {
    val b = "__range_bucket"
    val p = points.withColumn(b, floor(pointSec / lit(bucketWidth)))
    val i = intervals.withColumn(b,
      explode(sequence(floor(startCol / lit(bucketWidth)),
        floor(endCol / lit(bucketWidth)))))
    p.join(i, Seq(b) ++ keyCols)
      .filter(pointSec >= startCol && pointSec <= endCol)
      .drop(b)
  }
}
