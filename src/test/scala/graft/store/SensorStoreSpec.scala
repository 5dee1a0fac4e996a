package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.Influx

/** Write→read round-trips through the store — the Spark analog of the
  * reference's highest-value tests (`tests/test_client.py:84-120`:
  * exact frame equality across write/read paths; `:148-153`: 10k-point
  * volume; `:172-206`: MultiIndex metrics; `test_write_point_list.py`:
  * influx → store → read-back).
  */
class SensorStoreSpec extends SparkSpec {

  private def freshStoreDir(): (SensorStore, String) = {
    val dir = Files.createTempDirectory("graft-store").toString
    (new SensorStore(spark, dir), dir)
  }

  private def freshStore(): SensorStore = freshStoreDir()._1

  private def cfg1s = SensorConfig("test", "s1", "1s",
    Seq(MetricDef(Seq("active")), MetricDef(Seq("reactive"))))

  test("read PRUNES chunk partitions end-to-end: a bounded range read " +
    "over a 5-chunk sensor carries PartitionFilters and scans exactly " +
    "the intersecting chunk (database.py:676-717 chunk pruning, " +
    "Catalyst edition — r12 ask #5)") {
    import spark.implicits._
    val st = freshStore()
    st.createSensor(SensorConfig("pl", "s1", "1s", Seq(MetricDef(Seq("v")))))
    val chunkDur = graft.core.Freq.ChunkRows // 1s tick ⇒ 16384 s/chunk
    val t0 = 1704067200L - 1704067200L % chunkDur
    val pts = (0 until 5).flatMap(i => Seq(
        (t0 + i * chunkDur + 10, "v", i.toDouble),
        (t0 + i * chunkDur + 20, "v", i + 0.5)))
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"),
        col("metric"), col("value"))
    st.write("pl", "s1", pts)
    assert(st.listChunks("pl", "s1").length == 5,
      "fixture must span 5 chunk partitions")

    val rd = st.read("pl", "s1",
      Some(t0 + 2 * chunkDur), Some(t0 + 2 * chunkDur + 100))
    // sparkPlan, not executedPlan: AQE wraps the executed tree in an
    // AdaptiveSparkPlanExec whose collect() cannot see the scan
    val scans = rd.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "range read must be a parquet file scan")
    assert(scans.head.partitionFilters.nonEmpty,
      "chunk_start bounds did not reach the scan as partition filters")
    assert(scans.head.selectedPartitions.partitionCount == 1,
      s"bounded read scanned ${scans.head.selectedPartitions.partitionCount}" +
        " of 5 chunk partitions — pruning regressed")
    // and the pruned read still returns exactly the in-range rows
    val vals = rd.collect().map(_.getFloat(1))
    assert(vals.sorted.sameElements(Array(2.0f, 2.5f)))
  }

  test("catalog: create / exists / list / config round-trip / delete") {
    val st = freshStore()
    st.createSensor(cfg1s)
    assert(st.existsSensor("test", "s1"))
    assert(st.listDbs() == Seq("test"))
    assert(st.listSensors("test") == Seq("s1"))
    val c = st.config("test", "s1")
    assert(c.freq == "1s" && c.metricNames == Seq("active", "reactive"))
    st.deleteSensor("test", "s1")
    assert(!st.existsSensor("test", "s1"))
  }

  test("multi-level metric names flatten to dotted columns") {
    val cfg = SensorConfig("test", "mi", "1D",
      Seq(MetricDef(Seq("A", "B", "C")), MetricDef(Seq("D", "E", "F"))),
      metadata = Map("level_names" -> "one,two,three"))
    val st = freshStore()
    st.createSensor(cfg)
    val c = st.config("test", "mi")
    assert(c.metricNames == Seq("A.B.C", "D.E.F"))
    assert(c.metadata("level_names") == "one,two,three")
  }

  test("write then read: exact round-trip on the grid") {
    import spark.implicits._
    val st = freshStore()
    st.createSensor(cfg1s)
    val t0 = 1704067200L
    val pts = Seq(
      (t0, "active", 9.0), (t0, "reactive", 10.0),
      (t0 + 1, "active", 11.0),
      (t0 + 2, "reactive", 12.0))
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"), col("value"))
    st.write("test", "s1", pts)
    val out = st.read("test", "s1").collect()
    assert(out.length == 3)
    assert(out(0).getFloat(1) == 9.0f && out(0).getFloat(2) == 10.0f)
    assert(out(1).getFloat(1) == 11.0f && out(1).isNullAt(2))
    assert(out(2).isNullAt(1) && out(2).getFloat(2) == 12.0f)
  }

  test("nanForMissing: unwritten cells read as NaN (float32 parity)") {
    import spark.implicits._
    val st = freshStore()
    st.createSensor(cfg1s)
    val t0 = 1704067200L
    val pts = Seq((t0, "active", 1.0))
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"), col("value"))
    st.write("test", "s1", pts)
    val r = st.read("test", "s1", nanForMissing = true).head()
    assert(r.getFloat(1) == 1.0f)
    assert(r.getFloat(2).isNaN) // reactive never written → NaN, not null
  }

  test("sub-tick timestamps snap down; same tick last-write-wins") {
    import spark.implicits._
    val st = freshStore()
    st.createSensor(SensorConfig("test", "s15", "15m",
      Seq(MetricDef(Seq("v")))))
    val t0 = 1704067200L
    val pts = Seq(
      (t0 + 10, "v", 1.0),  // 00:00:10 → slot 00:00
      (t0 + 700, "v", 2.0)) // 00:11:40 → same 15m slot, later wins
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"), col("value"))
    st.write("test", "s15", pts)
    val out = st.read("test", "s15").collect()
    assert(out.length == 1)
    assert(out(0).getTimestamp(0).toInstant.getEpochSecond == t0)
    assert(out(0).getFloat(1) == 2.0f)
  }

  test("second write upserts cells without touching others") {
    import spark.implicits._
    val st = freshStore()
    st.createSensor(cfg1s)
    val t0 = 1704067200L
    def pts(rows: Seq[(Long, String, Double)]) =
      rows.toDF("sec", "metric", "value")
        .select(timestamp_seconds(col("sec")).as("ts"), col("metric"), col("value"))
    st.write("test", "s1", pts(Seq((t0, "active", 1.0), (t0, "reactive", 2.0))))
    st.write("test", "s1", pts(Seq((t0, "active", 9.0)))) // only one cell
    val out = st.read("test", "s1").collect()
    assert(out.length == 1)
    assert(out(0).getFloat(1) == 9.0f)   // overwritten
    assert(out(0).getFloat(2) == 2.0f)   // preserved
  }

  test("schema evolution: new metric fills old chunks, NaN-free reads") {
    import spark.implicits._
    val st = freshStore()
    st.createSensor(cfg1s)
    val t0 = 1704067200L
    def pts(rows: Seq[(Long, String, Double)]) =
      rows.toDF("sec", "metric", "value")
        .select(timestamp_seconds(col("sec")).as("ts"), col("metric"), col("value"))
    st.write("test", "s1", pts(Seq((t0, "active", 1.0))))
    // new metric "nueva" arrives much later (next chunk), fill=0
    val t1 = t0 + 16384 * 2 // two chunks later for 1s freq
    val cfg2 = st.write("test", "s1",
      pts(Seq((t1, "nueva", 17.0), (t1, "active", 2.0))), fillValue = 0.0)
    assert(cfg2.metricNames.contains("nueva"))
    val out = st.read("test", "s1").orderBy("ts").collect()
    assert(out.length == 2)
    // old row: nueva filled with 0 (reference add_new_metrics semantics)
    assert(out(0).getFloat(1) == 1.0f && out(0).getFloat(3) == 0.0f)
    // new row: real value
    assert(out(1).getFloat(1) == 2.0f && out(1).getFloat(3) == 17.0f)
  }

  test("time-range read prunes and bounds inclusively") {
    import spark.implicits._
    val st = freshStore()
    st.createSensor(SensorConfig("test", "sh", "1h", Seq(MetricDef(Seq("v")))))
    val t0 = 1704067200L
    val pts = (0 until 48).map(h => (t0 + h * 3600L, "v", h.toDouble))
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"), col("value"))
    st.write("test", "sh", pts)
    val out = st.read("test", "sh",
      fromSec = Some(t0 + 10 * 3600), toSec = Some(t0 + 20 * 3600)).collect()
    assert(out.length == 11)
    assert(out.head.getFloat(1) == 10.0f && out.last.getFloat(1) == 20.0f)
  }

  test("lastTimestamp: empty → None, else max written tick") {
    import spark.implicits._
    val st = freshStore()
    st.createSensor(cfg1s)
    assert(st.lastTimestamp("test", "s1").isEmpty)
    val t0 = 1704067200L
    val pts = Seq((t0, "active", 1.0), (t0 + 999, "active", 2.0))
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"), col("value"))
    st.write("test", "s1", pts)
    assert(st.lastTimestamp("test", "s1").contains(t0 + 999))
  }

  test("10k-point volume round-trip across many chunks") {
    import spark.implicits._
    val st = freshStore()
    st.createSensor(SensorConfig("vol", "s", "1s", Seq(MetricDef(Seq("v")))))
    val t0 = 1704067200L
    // 10k points spaced 600s apart — spans ~367 chunks of 16384s
    val pts = (0 until 10000).map(i => (t0 + i * 600L, "v", i.toDouble))
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"), col("value"))
    st.write("vol", "s", pts)
    val out = st.read("vol", "s")
    assert(out.count() == 10000L)
    val bounds = out.agg(min("ts"), max("ts")).head()
    assert(bounds.getTimestamp(0).toInstant.getEpochSecond == t0)
    assert(bounds.getTimestamp(1).toInstant.getEpochSecond == t0 + 9999 * 600L)
    assert(st.lastTimestamp("vol", "s").contains(t0 + 9999 * 600L))
  }

  test("checksum validation drops tampered rows, like the corrupt-chunk skip") {
    import spark.implicits._
    val (st, dir) = freshStoreDir()
    st.createSensor(cfg1s)
    val t0 = 1704067200L
    val pts = Seq((t0, "active", 1.0), (t0 + 1, "active", 2.0))
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"), col("value"))
    st.write("test", "s1", pts)
    assert(st.read("test", "s1", validateChecksums = true).count() == 2)

    // tamper one row's stored checksum on disk (out-of-band corruption):
    // write tampered copy to a tmp dir, then swap it in
    val dataPath = s"$dir/test/s1/data"
    val tmp = Files.createTempDirectory("tamper").toString
    spark.read.parquet(dataPath)
      .withColumn("checksum",
        when(col("slot") === t0, col("checksum") + lit(100f))
          .otherwise(col("checksum")))
      .write.mode("overwrite").partitionBy("chunk_start").parquet(tmp)
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.iterator().forEachRemaining(rm(_)) finally s.close()
      }
      Files.deleteIfExists(p)
    }
    rm(java.nio.file.Paths.get(dataPath))
    Files.move(java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(dataPath))

    assert(st.read("test", "s1", validateChecksums = false).count() == 2)
    val ok = st.read("test", "s1", validateChecksums = true)
      .collect()
    assert(ok.length == 1 && ok(0).getFloat(1) == 2.0f)
  }

  test("rollup materialization: first value per coarse bucket, pruned reads") {
    import spark.implicits._
    val st = freshStore()
    st.createSensor(cfg1s)
    val t0 = 1704067200L
    // 120 seconds of 1s data → 2 one-minute buckets
    val pts = (0 until 120).map(i => (t0 + i, "active", i.toDouble))
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"), col("value"))
    st.write("test", "s1", pts)
    st.materializeRollup("test", "s1", 60L)
    val rows = st.readRollup("test", "s1", 60L).collect()
    assert(rows.length == 2)
    assert(rows(0).getFloat(1) == 0f)   // first of minute 0
    assert(rows(1).getFloat(1) == 60f)  // first of minute 1
    val pruned = st.readRollup("test", "s1", 60L,
      fromSec = Some(t0 + 60), toSec = Some(t0 + 119)).collect()
    assert(pruned.length == 1 && pruned(0).getFloat(1) == 60f)
  }

  test("deleteBefore drops whole old chunks from data AND rollups") {
    import spark.implicits._
    val st = freshStore()
    st.createSensor(cfg1s)
    val chunkDur = 16384L // 1s tick × 2^14 rows
    val base = 1704067200L / chunkDur * chunkDur
    val pts = Seq(base, base + chunkDur, base + 2 * chunkDur).zipWithIndex
      .map { case (t, i) => (t, "active", i.toDouble) }
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"),
        col("value"))
    st.write("test", "s1", pts)
    // EVERY rollup family must be retention-pruned (r15 advice: the
    // stats/sketch/quant trees used to outlive their source chunks)
    val rollupPaths = Seq(
      st.materializeRollup("test", "s1", 60L),
      st.materializeMeanRollup("test", "s1", 60L),
      st.materializeSketchRollup("test", "s1", 60L),
      st.materializeQuantileRollup("test", "s1", 60L, 1.0),
      st.materializeStatsRollup("test", "s1", 60L))
    rollupPaths.foreach(p => assert(
      java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(s"$p/chunk_start=$base")), p))
    assert(st.listChunks("test", "s1").length == 3)
    // cutoff INSIDE the second chunk → only the wholly-older first
    // chunk drops (whole-chunk granularity)
    val dropped = st.deleteBefore("test", "s1", base + chunkDur + 5)
    assert(dropped == Seq(base))
    rollupPaths.foreach { p =>
      assert(!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(s"$p/chunk_start=$base")), p)
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(s"$p/chunk_start=${base + chunkDur}")), p)
    }
    assert(st.listChunks("test", "s1") ==
      Seq(base + chunkDur, base + 2 * chunkDur))
    val out = st.read("test", "s1")
      .select(unix_timestamp(col("ts")).as("sec")).collect()
    assert(out.length == 2 && out.forall(_.getLong(0) >= base + chunkDur))
    // the rollup's partition for the dropped chunk is gone too
    val roll = st.readRollup("test", "s1", 60L)
    assert(roll.count() == 2)
    // idempotent: nothing older remains
    assert(st.deleteBefore("test", "s1", base + chunkDur + 5).isEmpty)
  }

  test("concurrent writers to different sensors do not interfere") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val st = freshStore()
    val t0 = 1704067200L
    val sensors = (0 until 4).map(i => s"c$i")
    sensors.foreach(sn =>
      st.createSensor(SensorConfig("conc", sn, "1s", Seq(MetricDef(Seq("v"))))))
    val futures = sensors.zipWithIndex.map { case (sn, i) =>
      Future {
        val pts = (0 until 500).map(j => (t0 + j * 100L, "v", (i * 1000 + j).toDouble))
          .toDF("sec", "metric", "value")
          .select(timestamp_seconds(col("sec")).as("ts"), col("metric"), col("value"))
        st.write("conc", sn, pts)
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    sensors.zipWithIndex.foreach { case (sn, i) =>
      val rows = st.read("conc", sn).collect()
      assert(rows.length == 500, sn)
      assert(rows.head.getFloat(1) == i * 1000f)
      // checksum audit after hostile interleaving (test_database.py:190-207 analog)
      assert(st.read("conc", sn, validateChecksums = true).count() == 500)
    }
  }

  test("mean rollup partials re-aggregate exactly to any coarser grid") {
    import spark.implicits._
    val st = freshStore()
    val t0 = 1704067200L
    st.createSensor(SensorConfig("mr", "s", "1s", Seq(MetricDef(Seq("v")))))
    // 600 seconds, value = i at second i (only even seconds written)
    val pts = (0 until 600 by 2).map(i => (t0 + i, "v", i.toDouble))
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"),
        col("value"))
    st.write("mr", "s", pts)
    st.materializeMeanRollup("mr", "s", 60L)

    // read back at the rollup grid: mean of evens in [b, b+60)
    val at60 = st.readMeanRollup("mr", "s", 60L, 60L).collect()
    assert(at60.length == 10)
    // bucket 0 holds 0,2,...,58 → mean 29
    assert(at60(0).getDouble(1) == 29.0)

    // re-aggregated to 300s WITHOUT touching raw data: exact merge
    val at300 = st.readMeanRollup("mr", "s", 60L, 300L).collect()
    assert(at300.length == 2)
    assert(at300(0).getDouble(1) == 149.0) // mean of 0..298 evens
    assert(at300(1).getDouble(1) == 449.0) // mean of 300..598 evens

    // a coarse grid that is not a multiple of the rollup grid refuses
    intercept[IllegalArgumentException] {
      st.readMeanRollup("mr", "s", 60L, 90L)
    }
  }

  test("sketch rollup: merged distinct estimates equal the direct sketch") {
    import spark.implicits._
    val st = freshStore()
    val t0 = 1704067200L
    st.createSensor(SensorConfig("sk", "s", "1s", Seq(MetricDef(Seq("v")))))
    // 600 seconds; value cycles over 37 distinct doubles so coarse
    // buckets genuinely merge overlapping value sets across partials
    val pts = (0 until 600).map(i => (t0 + i, "v", (i % 37).toDouble))
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"),
        col("value"))
    st.write("sk", "s", pts)
    st.materializeSketchRollup("sk", "s", 60L)
    assert(st.listSketchRollups("sk", "s") == Seq(60L))

    // merged-to-300s estimates from partials must EQUAL the direct
    // sketch over the raw rows at the same grid (union is lossless at
    // fixed lgK — the SketchesSpec algebra, via the store path)
    val merged = st.readSketchRollup("sk", "s", 60L, 300L).collect()
    val direct = st.read("sk", "s")
      .select((unix_timestamp(col("ts")) - (unix_timestamp(col("ts")) % 300))
        .as("cb"), col("v"))
      .groupBy("cb")
      .agg(hll_sketch_estimate(
        hll_sketch_agg(when(!isnan(col("v")), col("v").cast("string")),
          lit(st.SketchLgK))).as("d"))
      .orderBy("cb").collect()
    assert(merged.length == 2 && direct.length == 2)
    assert(merged.map(_.getLong(1)).toSeq == direct.map(_.getLong(1)).toSeq)
    // 37 distinct values everywhere — HLL at lgK=12 is exact this small
    assert(merged.map(_.getLong(1)).toSeq == Seq(37L, 37L))

    // non-multiple coarse grid refuses, like the mean rollup
    intercept[IllegalArgumentException] {
      st.readSketchRollup("sk", "s", 60L, 90L)
    }
  }

  test("quantile rollup: merged histogram partials equal the direct grid quantile") {
    import spark.implicits._
    val st = freshStore()
    val t0 = 1704067200L
    st.createSensor(SensorConfig("qr", "s", "1s", Seq(MetricDef(Seq("v")))))
    // 600 seconds, value i%100 → per-300s-bucket p50 over 0..99 cycles
    val pts = (0 until 600).map(i => (t0 + i, "v", (i % 100).toDouble))
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"),
        col("value"))
    st.write("qr", "s", pts)
    st.materializeQuantileRollup("qr", "s", 60L, binWidth = 1.0)
    st.materializeQuantileRollup("qr", "s", 300L, binWidth = 1.0)
    assert(st.listQuantileRollups("qr", "s") ==
      Seq((60L, 1.0), (300L, 1.0)))

    // fine partials merged to 300s must EQUAL the 300s-native rollup:
    // integer counts sum losslessly (merge-equals-direct)
    val merged = st.readQuantileRollup("qr", "s", 60L, 1.0, 300L, 50)
      .collect()
    val direct = st.readQuantileRollup("qr", "s", 300L, 1.0, 300L, 50)
      .collect()
    assert(merged.map(r => (r.getTimestamp(0), r.getDouble(1))).toSeq ==
      direct.map(r => (r.getTimestamp(0), r.getDouble(1))).toSeq)
    // hand value: each 300s bucket holds 0..99 ×3 → rank ceil(150)=150
    // → cum reaches 150 at bin 49 → p50 = 49.0
    assert(merged.map(_.getDouble(1)).toSeq == Seq(49.0, 49.0))
    // p95: rank ceil(0.95·300)=285 → bin 94
    val p95 = st.readQuantileRollup("qr", "s", 60L, 1.0, 300L, 95)
      .collect()
    assert(p95.map(_.getDouble(1)).toSeq == Seq(94.0, 94.0))

    // upsert refresh: overwrite one second with a huge value — the
    // materialized partials must re-aggregate (no stale rollup serve)
    val up = Seq((t0 + 1, "v", 1000.0)).toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"),
        col("value"))
    st.write("qr", "s", up)
    val after = st.readQuantileRollup("qr", "s", 60L, 1.0, 600L, 100)
      .collect()
    assert(after.head.getDouble(1) == 1000.0) // p100 sees the upsert

    intercept[IllegalArgumentException] {
      st.readQuantileRollup("qr", "s", 60L, 1.0, 90L, 50)
    }
    intercept[IllegalArgumentException] {
      st.materializeQuantileRollup("qr", "s", 60L, binWidth = 0.0)
    }
  }

  test("writeLocked serializes concurrent writers to ONE sensor — no lost updates") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val st = freshStore()
    val t0 = 1704067200L
    st.createSensor(SensorConfig("race", "s", "1s", Seq(MetricDef(Seq("v")))))
    // 4 writers, interleaved slot ranges that share chunk partitions:
    // unlocked read-modify-write would lose whole slot sets when two
    // writers merge against the same stale history concurrently
    val futures = (0 until 4).map { i =>
      Future {
        val pts = (0 until 200).map(j => (t0 + (j * 4 + i) * 10L, "v",
          (i * 10000 + j).toDouble))
          .toDF("sec", "metric", "value")
          .select(timestamp_seconds(col("sec")).as("ts"), col("metric"),
            col("value"))
        st.writeLocked("race", "s", pts)
      }
    }
    Await.result(Future.sequence(futures), 300.seconds)
    val rows = st.read("race", "s").collect()
    assert(rows.length == 800) // every writer's every slot survived
    assert(st.read("race", "s", validateChecksums = true).count() == 800)
  }

  test("writer lock: held blocks with timeout, stale lock is taken over") {
    val (st, dir) = freshStoreDir()
    st.createSensor(SensorConfig("lk", "s", "1s", Seq(MetricDef(Seq("v")))))
    // hold the lock and verify a second acquisition times out
    st.withWriterLock("lk", "s") {
      val ex = intercept[graft.core.WriteLockTimeoutException] {
        st.withWriterLock("lk", "s", timeoutMs = 300) { fail("must not enter") }
      }
      assert(ex.getMessage.contains("lk/s"))
    }
    // a crashed holder's stale lock (old mtime) is taken over
    val lock = java.nio.file.Paths.get(s"$dir/lk/s/_WRITE_LOCK")
    java.nio.file.Files.write(lock, "dead@0".getBytes)
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600 * 1000))
    var entered = false
    st.withWriterLock("lk", "s", timeoutMs = 5000, staleMs = 60000) {
      entered = true
    }
    assert(entered)
    assert(!java.nio.file.Files.exists(lock)) // released cleanly
  }

  test("writer lock release is ownership-checked: a taken-over holder " +
       "does not delete the new holder's lock") {
    val (st, dir) = freshStoreDir()
    st.createSensor(SensorConfig("lk2", "s", "1s", Seq(MetricDef(Seq("v")))))
    val lock = java.nio.file.Paths.get(s"$dir/lk2/s/_WRITE_LOCK")
    st.withWriterLock("lk2", "s") {
      // simulate: this holder paused > staleMs, a second writer took
      // over and now holds the lock under ITS token
      java.nio.file.Files.write(lock, "other-holder@nonce".getBytes)
    }
    // the original holder's release must NOT have deleted the new
    // holder's lock (the pre-fix code deleted unconditionally)
    assert(java.nio.file.Files.exists(lock))
    assert(new String(java.nio.file.Files.readAllBytes(lock)) ==
      "other-holder@nonce")
    java.nio.file.Files.delete(lock)
  }

  test("writer lock heartbeat stops refreshing after a takeover " +
       "(old holder cannot keep the new holder's lock artificially fresh)") {
    val (st, dir) = freshStoreDir()
    st.createSensor(SensorConfig("lk3", "s", "1s", Seq(MetricDef(Seq("v")))))
    val lock = java.nio.file.Paths.get(s"$dir/lk3/s/_WRITE_LOCK")
    val oldMtime = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 3600 * 1000)
    val holder = new Thread(() =>
      // staleMs 300 → heartbeat ticks every 100 ms; the body outlives
      // the whole takeover simulation below
      st.withWriterLock("lk3", "s", timeoutMs = 5000, staleMs = 300) {
        Thread.sleep(1500)
      })
    holder.start()
    try {
      while (!java.nio.file.Files.exists(lock)) Thread.sleep(10)
      // simulate a stale takeover: the lock now carries ANOTHER token
      java.nio.file.Files.write(lock, "intruder@nonce".getBytes)
      // give the heartbeat a few ticks to observe the foreign token and
      // exit, THEN plant an old mtime and verify nobody refreshes it
      Thread.sleep(300)
      java.nio.file.Files.setLastModifiedTime(lock, oldMtime)
      Thread.sleep(400)
      assert(java.nio.file.Files.getLastModifiedTime(lock) == oldMtime,
        "old holder's heartbeat kept refreshing a lock it no longer owns")
    } finally holder.join()
    // and the release path left the intruder's lock in place
    assert(new String(java.nio.file.Files.readAllBytes(lock)) ==
      "intruder@nonce")
    java.nio.file.Files.delete(lock)
  }

  test("migrateCompression rewrites data, preserving every row (D-3)") {
    import spark.implicits._
    val (st, dir) = freshStoreDir()
    st.createSensor(cfg1s)
    val t0 = 1704067200L
    val pts = (0 until 100).map(i => (t0 + i * 20000L, "active", i.toDouble))
      .toDF("sec", "metric", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("metric"), col("value"))
    st.write("test", "s1", pts)
    val before = st.read("test", "s1").collect().map(_.toString).toSeq
    st.migrateCompression("test", "s1", "gzip")
    val after = st.read("test", "s1").collect().map(_.toString).toSeq
    assert(after == before)
    // codec actually changed on disk
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/test/s1/data"))
      .iterator()
    var sawGz = false
    files.forEachRemaining(p => if (p.toString.endsWith(".gz.parquet")) sawGz = true)
    assert(sawGz)
  }
}
