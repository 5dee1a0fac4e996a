package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join: pairs (a, b) whose CLOSED intervals
  * [aStart, aEnd] and [bStart, bEnd] intersect — the two-sided
  * generalization of `RangeJoin.pointsInIntervals`.
  *
  * Same scale architecture: both sides explode to the fixed-width
  * buckets they cover, the join is a hash EQUI-join on the bucket (so
  * it shuffles/partitions cleanly at any scale — never the O(n·m)
  * nested-loop a raw `a.s <= b.e AND b.s <= a.e` theta-join plans),
  * duplicates from intervals spanning several buckets collapse with a
  * distinct, and the exact predicate re-verifies each candidate.
  * Pick `bucketWidth` near the typical interval length: fan-out per
  * interval is `len/width + 1` rows, candidate sets per bucket stay
  * bounded.
  */
object IntervalJoin {

  def overlapPairs(a: DataFrame, aStart: Column, aEnd: Column,
                   b: DataFrame, bStart: Column, bEnd: Column,
                   bucketWidth: Long): DataFrame = {
    // floor(double-div) is exact for epoch-second magnitudes (< 2^52)
    def buck(c: Column) = floor(c / bucketWidth).cast("long")
    val ab = a.withColumn("__as", aStart).withColumn("__ae", aEnd)
      .withColumn("__bucket",
        explode(sequence(buck(col("__as")), buck(col("__ae")))))
    val bb = b.withColumn("__bs", bStart).withColumn("__be", bEnd)
      .withColumn("__bucket",
        explode(sequence(buck(col("__bs")), buck(col("__be")))))
    ab.join(bb, "__bucket")
      .filter(col("__as") <= col("__be") && col("__bs") <= col("__ae"))
      .drop("__bucket").distinct()
      .drop("__as", "__ae", "__bs", "__be")
  }
}
