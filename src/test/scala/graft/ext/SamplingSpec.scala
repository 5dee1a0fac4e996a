package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("stratified sampling is deterministic and respects thresholds") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
    val out = Sampling.stratified(df, "id", "stratum",
      Map("a" -> "8000", "b" -> "1000"))
    val again = Sampling.stratified(df, "id", "stratum",
      Map("a" -> "8000", "b" -> "1000"))
    assert(out.collect().toSeq == again.collect().toSeq) // pure function
    // every kept row's bucket is under its stratum threshold
    val bad = out.filter(
      (col("stratum") === "a" && col("sample_bucket") >= "8000") ||
      (col("stratum") === "b" && col("sample_bucket") >= "1000")).count()
    assert(bad == 0)
    // rate sanity: "8000"/ffff ≈ 50%, "1000"/ffff ≈ 6.25% (hash-uniform)
    val aRate = out.filter(col("stratum") === "a").count() / 500.0
    val bRate = out.filter(col("stratum") === "b").count() / 500.0
    assert(aRate > 0.35 && aRate < 0.65, s"aRate=$aRate")
    assert(bRate > 0.01 && bRate < 0.15, s"bRate=$bRate")
  }

  test("shrinking the threshold yields a strict subset (monotone)") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, "s")).toDF("id", "stratum")
    val big = Sampling.stratified(df, "id", "stratum", Map("s" -> "4000"))
      .select("id").collect().map(_.getLong(0)).toSet
    val small = Sampling.stratified(df, "id", "stratum", Map("s" -> "1000"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("weighted sampling: rate 0 keeps nothing, 1 keeps all, monotone per row") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, (i % 5) / 4.0)).toDF("id", "rate")
    assert(Sampling.weighted(df, "id", lit(0.0)).count() == 0)
    assert(Sampling.weighted(df, "id", lit(1.0)).count() == 500)
    // per-row monotone: raising every rate can only add rows
    val low = Sampling.weighted(df, "id", col("rate") * 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    val high = Sampling.weighted(df, "id", col("rate"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high))
  }

  test("topKPerStratum keeps exactly k per stratum, reproducibly") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    val a = Sampling.topKPerStratum(df, "id", "stratum", 7)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a.length == 21)
    val b = Sampling.topKPerStratum(df.repartition(11), "id", "stratum", 7)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b) // hash-ranked: repartition-proof
    // a stratum with fewer than k rows keeps them all
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "stratum")
    assert(Sampling.topKPerStratum(tiny, "id", "stratum", 7).count() == 2)
  }

  test("unlisted strata drop entirely") {
    import spark.implicits._
    val df = Seq((1L, "known"), (2L, "unknown")).toDF("id", "stratum")
    val out = Sampling.stratified(df, "id", "stratum", Map("known" -> "ffff"))
    assert(out.select("stratum").collect().map(_.getString(0)).toSet == Set("known"))
  }

  test("mixAlpha: smallest source keeps all, rates follow (n_min/n)^(1-alpha), alpha=1 is identity") {
    import spark.implicits._
    // 4:1 skew: big has 400 rows, small has 100
    val df = ((0L until 400L).map(i => (i, "big")) ++
      (400L until 500L).map(i => (i, "small"))).toDF("id", "src")
    val half = Sampling.mixAlpha(df, "id", "src", alpha = 0.5)
    val rates = half.select("src", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("small") == 1.0)
    assert(rates("big") == math.sqrt(100.0 / 400.0)) // sqrt path, exact
    // the small source survives entirely
    assert(half.filter(col("src") === "small").count() == 100)
    // alpha=1 keeps the natural mix: every row passes (rate 1 for all)
    assert(Sampling.mixAlpha(df, "id", "src", alpha = 1.0).count() == 500)
    // flattening is monotone in alpha: lower alpha keeps fewer big rows
    val flat = Sampling.mixAlpha(df, "id", "src", alpha = 0.0)
    val nBigFlat = flat.filter(col("src") === "big").count()
    val nBigHalf = half.filter(col("src") === "big").count()
    assert(nBigFlat <= nBigHalf && nBigHalf <= 400)
    // same hash gate as weighted(): the α=0 sample is a subset of α=0.5
    val flatIds = flat.select("id").collect().map(_.getLong(0)).toSet
    val halfIds = half.select("id").collect().map(_.getLong(0)).toSet
    assert(flatIds.subsetOf(halfIds))
    // out-of-range alpha is rejected, not silently degraded to the
    // natural mix (rate > 1 would pass every row through the gate)
    intercept[IllegalArgumentException] {
      Sampling.mixAlpha(df, "id", "src", alpha = 1.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.mixAlpha(df, "id", "src", alpha = -0.1)
    }
  }
}
