package graft.read

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LTTB-parallel downsample semantics (the bucket aggregations
  * first/mean are oracle-covered; this pins the visual property).
  */
class DownsampleSpec extends SparkSpec {

  test("lttb keeps the spike that first/mean-per-bucket would flatten") {
    import spark.implicits._
    // 3 buckets of 10s (spread 10): flat at 1.0 except one spike in the
    // middle bucket — LTTB must pick the spike there, not the first point
    val rows = (0L until 30L).map { t =>
      val v = if (t == 15L) 100.0 else 1.0
      ("s", t, t, v)
    }
    val df = rows.toDF("k", "sec", "oid", "v")
    val out = Downsample.lttbPerBucket(df, Seq("k"), col("sec"), "v", "oid",
        startSec = 0L, endSec = 29L, maxDataPoints = 3)
      .orderBy("bucket").collect()
    assert(out.length == 3)
    // middle bucket picks the spike point
    assert(out(1).getAs[Double]("value") == 100.0 &&
      out(1).getAs[Long]("picked_id") == 15L)
    // edge buckets (no neighbor on one side) keep their first point
    assert(out(0).getAs[Long]("picked_id") == 0L)
    assert(out(2).getAs[Long]("picked_id") == 20L)
  }

  test("lttb area ties break by the order column") {
    import spark.implicits._
    // middle bucket has two symmetric points with IDENTICAL area
    val df = Seq(
      ("s", 0L, 0L, 0.0), ("s", 1L, 1L, 0.0),   // bucket 0
      ("s", 2L, 2L, 3.0), ("s", 3L, 3L, 3.0),   // bucket 1: equal areas
      ("s", 4L, 4L, 0.0), ("s", 5L, 5L, 0.0))   // bucket 2
      .toDF("k", "sec", "oid", "v")
    val out = Downsample.lttbPerBucket(df, Seq("k"), col("sec"), "v", "oid",
        startSec = 0L, endSec = 5L, maxDataPoints = 3)
      .orderBy("bucket").collect()
    assert(out(1).getAs[Long]("picked_id") == 2L) // min oid wins the tie
  }
}
