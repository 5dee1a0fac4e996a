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

  test("misra-gries merge: guaranteed keys survive with bounded undercount") {
    import spark.implicits._
    // 4 chunks; key "hot" dominates globally, chunk-local noise differs
    val rows = (0 until 4).flatMap { chunk =>
      Seq.fill(60)((chunk.toLong, "hot")) ++
        Seq.fill(25)((chunk.toLong, s"warm$chunk")) ++
        (0 until 15).map(i => (chunk.toLong, s"noise${chunk}_$i"))
    }
    val df = rows.toDF("chunk", "key").withColumn("g", lit("all"))
    val partials = Sketches.mgPartials(df, Seq("g", "chunk"), "key", k = 3)
      .drop("chunk")
    val merged = Sketches.mgMerge(partials, Seq("g"), k = 3).collect()
    val byKey = merged.map(r =>
      r.getAs[String]("key") -> (r.getAs[Long]("count"),
        r.getAs[Long]("max_err"))).toMap
    // guarantee: true count 240 > N/(k+1) = 400/4 = 100 → "hot" present
    assert(byKey.contains("hot"))
    val (lo, err) = byKey("hot")
    // exact lower bound ≤ true ≤ lower + summed dropped mass
    assert(lo <= 240L && 240L <= lo + err)
    // "hot" was in every partial's top-3 → its count is exact
    assert(lo == 240L)
  }

  test("misra-gries partials: deterministic top-k cut and mass accounting") {
    import spark.implicits._
    val df = Seq("a", "a", "b", "b", "c", "d").map(("g", _)).toDF("g", "key")
    val p = Sketches.mgPartials(df, Seq("g"), "key", k = 3).collect()(0)
    val m = p.getAs[Map[String, Long]]("mg_summary")
    // a=2, b=2, then the c/d tie at 1 breaks by key ASC → c in, d out
    assert(m == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    assert(p.getAs[Long]("n_rows") == 6L)
    assert(p.getAs[Long]("dropped_mass") == 1L)
  }

  test("count-min: per-chunk partials merge to the whole-stream matrix, " +
    "est >= exact always") {
    import spark.implicits._
    val rows = (0 until 3).flatMap { chunk =>
      Seq.fill(40)((chunk.toLong, 7L)) ++
        (0 until 30).map(i => (chunk.toLong, (chunk * 100 + i).toLong))
    }
    val df = rows.toDF("chunk", "key")
    // merge-equals-direct: summed per-chunk matrices == one global matrix
    val merged = Sketches.cmsPartials(df, Seq("chunk"), "key", d = 2, w = 64)
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
    val direct = Sketches.cmsPartials(df.withColumn("g", lit(1)),
        Seq("g"), "key", d = 2, w = 64).drop("g")
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
    // point queries: over-count only, and the heavy key's estimate holds
    val cands = df.select("key").distinct()
    val est = Sketches.cmsEstimate(
      Sketches.cmsPartials(df, Seq("chunk"), "key", d = 2, w = 64),
      Seq.empty, cands, "key", d = 2, w = 64)
    val exact = df.groupBy("key").agg(count(lit(1)).as("exact"))
    val joined = est.join(exact, "key")
      .select(col("key"), col("est"), col("exact")).collect()
    assert(joined.forall(r => r.getLong(1) >= r.getLong(2)),
      "CMS must never under-count")
    val hot = joined.find(_.getLong(0) == 7L).get
    assert(hot.getLong(1) >= 120L)
  }
}
