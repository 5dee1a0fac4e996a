package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {

  test("hll estimate is within 5% of the exact distinct count") {
    import spark.implicits._
    val df = (0 until 20000).map(i => ("g", i % 3000L)).toDF("k", "uid")
    val est = Sketches.hllEstimate(
      Sketches.hllPartials(df, Seq("k"), "uid"), Seq("k"), "uid_hll")
      .collect()(0).getLong(1)
    assert(math.abs(est - 3000.0) / 3000.0 < 0.05, s"estimate $est")
  }

  test("per-chunk partials union to the SAME estimate as a direct sketch") {
    import spark.implicits._
    // ids overlap across chunks — union must dedup across partials
    val df = (0 until 30000).map { i =>
      (i / 10000L, (i * 37) % 4096L) // 3 chunks, shared id space
    }.toDF("chunk", "uid")
    // path A: one sketch over the raw rows
    val direct = Sketches.hllEstimate(
      Sketches.hllPartials(df.withColumn("all", lit(1)), Seq("all"), "uid"),
      Seq("all"), "uid_hll").collect()(0).getLong(1)
    // path B: per-chunk partials, then union-merge — the rollup path
    val merged = Sketches.hllEstimate(
      Sketches.hllPartials(df.withColumn("all", lit(1)),
        Seq("all", "chunk"), "uid"),
      Seq("all"), "uid_hll").collect()(0).getLong(1)
    assert(direct == merged,
      s"sketch union is not lossless: direct=$direct merged=$merged")
  }

  test("partial merge answers arbitrary range unions without raw data") {
    import spark.implicits._
    val df = (0 until 12000).map(i =>
      (i % 4L, ("u" + (i % 500)) + (i % 4))).toDF("bucket", "uid")
    val partials = Sketches.hllPartials(df, Seq("bucket"), "uid")
    assert(partials.count() == 4)
    // merge buckets {0,1} only
    val est01 = Sketches.hllEstimate(
      partials.filter(col("bucket") < 2).withColumn("all", lit(1)),
      Seq("all"), "uid_hll").collect()(0).getLong(1)
    val exact01 = df.filter(col("bucket") < 2).select("uid")
      .distinct().count()
    assert(math.abs(est01 - exact01.toDouble) / exact01 < 0.05,
      s"range estimate $est01 vs exact $exact01")
  }
}
