package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, TimestampType}

import graft.core.{Freq, Grid}
import graft.expr.RowChecksum
import graft.ingest.{Pivot, Upsert}

/** Parquet-backed sensor store — the engine's replacement for the
  * reference's chunk-file database (`database.py` + `fileutils.py`).
  *
  * Layout (mirrors the reference's BASE_DIR/db/sensor tree,
  * `fileutils.py:274-308`, with parquet partitions instead of chunk
  * files):
  * {{{
  *   baseDir/<db>/<sensor>/CONFIG.JSON
  *   baseDir/<db>/<sensor>/data/chunk_start=<epoch>/part-*.parquet
  * }}}
  *
  * A chunk spans `tick * 2^14` seconds exactly like the reference
  * (`chunker.py:97-104`), but is a *partition*, so time-range reads are
  * pruned by the planner instead of filename arithmetic, and the
  * parquet job-commit protocol replaces tmp-file + os.replace atomicity
  * (`fileutils.py:325-360`).
  *
  * Scale design:
  *  - writes touch only the partitions the batch intersects (dynamic
  *    partition overwrite), so upsert cost is O(batch ∩ chunks), not
  *    O(table);
  *  - the read-modify-write merge (A-5) shuffles on the tick slot only
  *    within those partitions;
  *  - schema evolution (A-8) never rewrites history: the new metric's
  *    fill value is recorded in the config (`MetricDef.fill/since`) and
  *    applied lazily on read to pre-evolution chunks — the reference's
  *    rewrite-every-chunk (`database.py:366-423`) would be a full-table
  *    write at 100 TB;
  *  - values are float32 (FloatType) like the reference
  *    (`__init__.py:26-28`): halves scan bytes vs double.
  *
  * Concurrency: the reference serializes writers with a per-sensor
  * process lock (`database.py:154-168`); here a sensor expects one
  * writer job at a time (the usual Spark table contract) — concurrent
  * readers are always safe.
  */
class SensorStore(spark: SparkSession, baseDir: String) {

  private def sensorDir(db: String, sensor: String) = s"$baseDir/$db/$sensor"
  private def dataDir(db: String, sensor: String) = s"${sensorDir(db, sensor)}/data"
  private def configPath(db: String, sensor: String) =
    Paths.get(sensorDir(db, sensor), "CONFIG.JSON")

  // ---- catalog (B-11) ------------------------------------------------

  def createSensor(cfg: SensorConfig): Unit = {
    val dir = Paths.get(sensorDir(cfg.db, cfg.sensor))
    Files.createDirectories(dir)
    Files.write(configPath(cfg.db, cfg.sensor),
      cfg.toJson.getBytes(StandardCharsets.UTF_8))
  }

  def config(db: String, sensor: String): SensorConfig = {
    if (!Files.isDirectory(Paths.get(s"$baseDir/$db")))
      throw new graft.core.DbNotFoundException(db)
    if (!existsSensor(db, sensor))
      throw new graft.core.SensorNotFoundException(db, sensor)
    SensorConfig.fromJson(new String(
      Files.readAllBytes(configPath(db, sensor)), StandardCharsets.UTF_8))
  }

  def existsSensor(db: String, sensor: String): Boolean =
    Files.exists(configPath(db, sensor))

  def listDbs(): Seq[String] = listDir(baseDir)

  def listSensors(db: String): Seq[String] = listDir(s"$baseDir/$db")

  def deleteSensor(db: String, sensor: String): Unit =
    rmTree(Paths.get(sensorDir(db, sensor)))

  /** Reference `delete_db` (`database.py:215` shutil.rmtree): removes
    * every sensor AND the db directory itself, so existsDb goes false.
    */
  def deleteDb(db: String): Unit = rmTree(Paths.get(s"$baseDir/$db"))

  /** Recursive delete that closes each Files.list stream — an unclosed
    * stream leaks one fd per directory, which a long-lived driver
    * deleting many chunk partitions can exhaust.
    */
  private def rmTree(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.foreach(rmTree) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  private def listDir(path: String): Seq[String] = {
    val p = Paths.get(path)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(Files.isDirectory(_))
        .map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }
  }

  /** Constant-time token check (reference `database.py:142-152`). */
  def keyOk(expected: String, provided: String): Boolean =
    java.security.MessageDigest.isEqual(
      expected.getBytes(StandardCharsets.UTF_8),
      provided.getBytes(StandardCharsets.UTF_8))

  // ---- write path (A-3..A-8) -----------------------------------------

  /** Ingest a long-format batch: columns (ts timestamp, metric string,
    * value double). Semantics of the reference write path:
    *  - timestamps snap DOWN to the tick grid (A-6);
    *  - within a batch, the last row wins per (tick, metric) cell (A-4);
    *  - only non-NaN/non-null incoming cells overwrite stored cells
    *    (A-5);
    *  - unknown metrics trigger schema evolution with `fillValue` for
    *    pre-existing chunks (A-8);
    *  - a `checksum` column (row nansum, C-1) is (re)computed on write.
    *
    * Returns the updated config.
    */
  def write(db: String, sensor: String, points: DataFrame,
            fillValue: Double = 0.0): SensorConfig = {
    val required = Seq("ts", "metric", "value")
    val missing = required.filterNot(points.columns.contains)
    if (missing.nonEmpty)
      throw new graft.core.InvalidDataWriteException(
        s"Points batch is missing column(s) ${missing.mkString(", ")} " +
          s"(needs $required) — reference col-count guard database.py:444-445")
    var cfg = config(db, sensor)
    val tick = cfg.tickSeconds
    val chunkDur = tick * Freq.ChunkRows

    // arrival order for last-write-wins within the batch
    val ordered = points.withColumn("_arrival", monotonically_increasing_id())

    // schema discovery: which metrics does the batch carry? (small,
    // bounded by sensor width — a metadata-sized collect)
    val batchMetrics = ordered.select("metric").distinct()
      .collect().map(_.getString(0)).toSeq
    val known = cfg.metricNames.toSet
    val newMetrics = batchMetrics.filterNot(known)
    if (newMetrics.nonEmpty) {
      val existingChunks = listChunks(db, sensor)
      val since = if (existingChunks.isEmpty) 0L
      else existingChunks.max + chunkDur
      cfg = cfg.copy(metrics = cfg.metrics ++ newMetrics.sorted.map(m =>
        MetricDef(Seq(m), fill = Some(fillValue), since = Some(since))))
      createSensor(cfg) // rewrite CONFIG.JSON
    }
    val metrics = cfg.metricNames

    val snapped = ordered
      .withColumn("slot", Grid.snap(col("ts"), tick))
      .withColumn("chunk_start", Grid.snapSeconds(col("slot"), chunkDur))
    val incoming = Pivot.longToWide(snapped, Seq("chunk_start", "slot"),
      "metric", "value", "_arrival", metrics)

    // only the touched partitions participate in the merge
    val touched = incoming.select("chunk_start").distinct()
      .collect().map(_.getLong(0)).toIndexedSeq
    val existing = readRaw(db, sensor, metrics)
      .filter(col("chunk_start").isin(touched: _*))
      .select(Seq("chunk_start", "slot").map(col) ++
        metrics.map(graft.core.Cols.q): _*)

    val merged = Upsert.merge(existing, incoming,
      Seq("chunk_start", "slot"), metrics)
      .withColumn("checksum",
        RowChecksum.nansum(metrics.map(graft.core.Cols.q)).cast(FloatType))
      .select(col("chunk_start") +: col("slot") +:
        cfg.metrics.map(m =>
          // persist the metric's LEVEL TUPLE into the parquet footer
          // (Spark stores field metadata in the schema key-value) so
          // the files are self-describing MultiIndex columns for any
          // external reader. Levels are immutable per metric, so the
          // metadata is identical across files and mergeSchema-safe;
          // the MUTABLE level NAMES (set_level_names) deliberately stay
          // out of the files and attach at read from CONFIG.
          graft.core.Cols.q(m.name).cast(FloatType).as(m.name,
            new org.apache.spark.sql.types.MetadataBuilder()
              .putStringArray("levels", m.levels.toArray).build()))
        :+ col("checksum"): _*)

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      merged
        .repartition(col("chunk_start"))
        .write.mode("overwrite")
        .partitionBy("chunk_start")
        .parquet(dataDir(db, sensor))
      // derived data stays derived: re-aggregate the touched chunk
      // partitions of every materialized rollup so no read can see a
      // pre-upsert rollup value (full rebuild when evolution widened
      // the schema — old rollup files lack the new column).
      refreshRollups(db, sensor, touched.toSeq,
        fullRebuild = newMetrics.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    cfg
  }

  // ---- writer serialization ------------------------------------------

  /** Run `f` holding the sensor's writer lock — the cross-process
    * analog of the reference's per-sensor process lock
    * (`database.py:154-168`), shared with [[graft.ext.DocStore]] via
    * [[graft.core.PathLock]] (token-checked exclusive create, stale
    * takeover by atomic rename, heartbeat — full discipline documented
    * there). With the lock, concurrent writers to ONE sensor serialize
    * and the read-modify-write merge can never lose an update; readers
    * never need the lock (parquet job commit keeps them consistent).
    */
  def withWriterLock[T](db: String, sensor: String, timeoutMs: Long = 30000,
                        staleMs: Long = 600000)(f: => T): T =
    graft.core.PathLock.withLock(sensorDir(db, sensor), s"$db/$sensor",
      timeoutMs, staleMs)(f)

  /** `write` under the sensor's writer lock — safe for concurrent
    * writer jobs targeting the same sensor.
    */
  def writeLocked(db: String, sensor: String, points: DataFrame,
                  fillValue: Double = 0.0): SensorConfig =
    withWriterLock(db, sensor) { write(db, sensor, points, fillValue) }

  /** Chunk partition values present on disk (driver-side listing — a
    * metadata op, like the reference's filename scan).
    */
  def listChunks(db: String, sensor: String): Seq[Long] = {
    val p = Paths.get(dataDir(db, sensor))
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("chunk_start="))
        .map(_.stripPrefix("chunk_start=").toLong).toSeq.sorted
      finally s.close()
    }
  }

  // ---- read path (B-1..B-8) ------------------------------------------

  /** Raw wide frame with every config metric present as a column (lit
    * null where no file carries it yet) and evolution fills applied to
    * pre-`since` chunks. No time filter.
    */
  private def readRaw(db: String, sensor: String,
                      metrics: Seq[String]): DataFrame = {
    val cfg = config(db, sensor)
    val path = dataDir(db, sensor)
    if (listChunks(db, sensor).isEmpty) {
      // empty sensor: zero-row frame with the full schema
      import org.apache.spark.sql.types._
      val fields = StructField("chunk_start", LongType) ::
        StructField("slot", LongType) ::
        metrics.toList.map(StructField(_, FloatType)) :::
        StructField("checksum", FloatType) :: Nil
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(fields))
    }
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    val present = df.columns.toSet
    val cols = metrics.map { m =>
      val md = cfg.metrics.find(_.name == m)
      val raw = if (present(m)) graft.core.Cols.q(m)
        else lit(null).cast(FloatType)
      (md.flatMap(_.fill), md.flatMap(_.since)) match {
        case (Some(f), Some(since)) =>
          when(col("chunk_start") < since && raw.isNull, lit(f).cast(FloatType))
            .otherwise(raw).as(m)
        case _ => raw.as(m)
      }
    }
    df.select(col("chunk_start") +: col("slot") +: cols :+
      (if (present("checksum")) col("checksum") else lit(null).cast(FloatType)).as("checksum"): _*)
  }

  /** Time-range read (B-1/B-2): `[fromSec, toSec]` inclusive like the
    * reference's `read(start_ts, end_ts)`; None ⇒ open end. Output:
    * `ts` timestamp + requested metric columns, one row per written
    * tick, ordered by ts. Chunk pruning = partition pruning on
    * `chunk_start`.
    */
  def read(db: String, sensor: String,
           fromSec: Option[Long] = None, toSec: Option[Long] = None,
           metrics: Option[Seq[String]] = None,
           validateChecksums: Boolean = false,
           atol: Double = 1e-3,
           nanForMissing: Boolean = false): DataFrame = {
    val cfg = config(db, sensor)
    val tick = cfg.tickSeconds
    val chunkDur = tick * Freq.ChunkRows
    val all = cfg.metricNames
    val wanted = metrics.getOrElse(all)

    var df = readRaw(db, sensor, all)
    fromSec.foreach { f =>
      val fSnap = f - f % tick
      df = df.filter(col("chunk_start") >= fSnap - fSnap % chunkDur &&
        col("slot") >= fSnap)
    }
    toSec.foreach { t =>
      df = df.filter(col("chunk_start") <= t && col("slot") <= t)
    }
    if (validateChecksums) {
      df = df.filter(RowChecksum.isClose(
        RowChecksum.nansum(all.map(graft.core.Cols.q)), col("checksum"),
        rtol = 1e-5, atol = atol))
    }
    // nanForMissing: reference float32 parity — unwritten cells read as
    // NaN instead of null (`database.py:456-461`); storage keeps nulls
    // (parquet RLE compresses them, NaN floats it cannot)
    val outCols = wanted.map { m =>
      if (nanForMissing)
        coalesce(graft.core.Cols.q(m), lit(Float.NaN).cast(FloatType)).as(m)
      else graft.core.Cols.q(m)
    }
    df.select(timestamp_seconds(col("slot")).cast(TimestampType).as("ts") +:
        outCols: _*)
      .orderBy("ts")
  }

  /** B-8: latest written tick as epoch seconds, None when empty. */
  def lastTimestamp(db: String, sensor: String): Option[Long] = {
    val chunks = listChunks(db, sensor)
    if (chunks.isEmpty) return None
    // prune to the newest chunk only — the reference reads just the
    // last chunk file (database.py:522-546)
    val row = readRaw(db, sensor, config(db, sensor).metricNames)
      .filter(col("chunk_start") === chunks.max)
      .agg(max(col("slot"))).head()
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  /** D-3 migrate: re-encode the sensor's data with a different parquet
    * codec (the reference's gz↔zst chunk migration,
    * `fileutils.py:777-954`, collapses to a partitioned rewrite —
    * checksum columns ride along unchanged, so integrity is preserved
    * by construction; the reference's backup + checksum-gate dance
    * exists because its rewrite wasn't atomic).
    */
  /** Retention: drop every chunk partition that ends at or before
    * `cutoffSec` — whole-chunk granularity (a chunk straddling the
    * cutoff stays, like dropping whole days of a day-partitioned
    * table). The delete is PARTITION-DIRECTORY removal, applied to the
    * data table AND every materialized rollup (rollups share the
    * chunk_start partitioning, so derived data can never outlive its
    * source): no file is rewritten, no data is scanned — at 100 TB
    * retention is a metadata operation, which is the entire point of
    * partitioning by chunk. Returns the dropped chunk starts.
    */
  def deleteBefore(db: String, sensor: String, cutoffSec: Long): Seq[Long] = {
    val cfg = config(db, sensor)
    val chunkDur = cfg.tickSeconds * Freq.ChunkRows
    val dropped = listChunks(db, sensor).filter(_ + chunkDur <= cutoffSec)
    // EVERY rollup family's tree must be pruned here — a rollup
    // surviving its deleted source chunks would keep serving an
    // aligned read over a retention-dropped range while the raw
    // fallback returns nothing, breaking the "routing changes cost,
    // never values" invariant (r15 advice: statsrollup_*,
    // sketchrollup_* and quantrollup_* were missing).
    val roots = dataDir(db, sensor) +:
      (listRollups(db, sensor).map(b => s"${sensorDir(db, sensor)}/rollup_$b") ++
        listMeanRollups(db, sensor)
          .map(b => s"${sensorDir(db, sensor)}/meanrollup_$b") ++
        listStatsRollups(db, sensor)
          .map(b => s"${sensorDir(db, sensor)}/statsrollup_$b") ++
        listSketchRollups(db, sensor)
          .map(b => s"${sensorDir(db, sensor)}/sketchrollup_$b") ++
        listQuantileRollups(db, sensor)
          .map { case (b, bw) => s"${sensorDir(db, sensor)}/quantrollup_${b}_$bw" })
    for (root <- roots; c <- dropped)
      rmTree(Paths.get(s"$root/chunk_start=$c"))
    dropped
  }

  def migrateCompression(db: String, sensor: String, codec: String): Unit = {
    val src = dataDir(db, sensor)
    if (listChunks(db, sensor).isEmpty) return
    val tmp = s"$src.migrating"
    spark.read.option("mergeSchema", "true").parquet(src)
      .repartition(col("chunk_start"))
      .write.mode("overwrite")
      .option("compression", codec)
      .partitionBy("chunk_start")
      .parquet(tmp)
    // swap: the window without `data` is bounded by two renames
    val srcP = Paths.get(src)
    val oldP = Paths.get(s"$src.old")
    Files.move(srcP, oldP)
    Files.move(Paths.get(tmp), srcP)
    rmTree(oldP)
  }

  /** Materialize a coarser-grid rollup of the sensor (first non-null
    * value per `bucketSec` bucket per metric) under
    * `<sensor>/rollup_<bucketSec>/` — the pre-aggregated downsample
    * table SURVEY §4 flags as the scale path for dashboard reads: a
    * maxDataPoints query over years of 1s data hits the rollup and
    * touches 1/bucketSec of the rows. Rollups are derived data;
    * re-running overwrites them (cheap to rebuild per partition after
    * upserts).
    */
  def materializeRollup(db: String, sensor: String,
                        bucketSec: Long): String = {
    val out = s"${sensorDir(db, sensor)}/rollup_$bucketSec"
    rollupFrame(db, sensor, bucketSec, None)
      .repartition(col("chunk_start"))
      .write.mode("overwrite").partitionBy("chunk_start").parquet(out)
    out
  }

  /** First-per-bucket rollup aggregation, optionally restricted to a
    * chunk subset (the unit of incremental refresh).
    */
  private def rollupFrame(db: String, sensor: String, bucketSec: Long,
                          chunks: Option[Seq[Long]]): DataFrame = {
    val metrics = config(db, sensor).metricNames
    val aggs = metrics.map(m =>
      min_by(graft.core.Cols.q(m),
        when(graft.core.Cols.q(m).isNotNull, col("slot"))).as(m))
    var raw = readRaw(db, sensor, metrics)
    chunks.foreach(c => raw = raw.filter(col("chunk_start").isin(c: _*)))
    raw.withColumn("bucket", Grid.snapSeconds(col("slot"), bucketSec))
      .groupBy(col("chunk_start"), col("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Materialize a MERGEABLE mean rollup: per (chunk, bucket) and per
    * metric, the `(sum, count)` partial pair with the sum routed
    * through DECIMAL. Unlike the first-per-bucket rollup (exact only
    * for first-value queries at exactly its grid), these partials
    * RE-AGGREGATE: any coarser grid's mean derives exactly by summing
    * them — the pre-aggregation shape that makes dashboard means over
    * years of fine data a rollup-sized scan at ANY zoom level.
    */
  def materializeMeanRollup(db: String, sensor: String,
                            bucketSec: Long): String = {
    val out = s"${sensorDir(db, sensor)}/meanrollup_$bucketSec"
    meanRollupFrame(db, sensor, bucketSec, None)
      .repartition(col("chunk_start"))
      .write.mode("overwrite").partitionBy("chunk_start").parquet(out)
    out
  }

  /** Mean-rollup partial-pair aggregation, optionally restricted to a
    * chunk subset (the unit of incremental refresh).
    */
  private def meanRollupFrame(db: String, sensor: String, bucketSec: Long,
                              chunks: Option[Seq[Long]]): DataFrame = {
    val metrics = config(db, sensor).metricNames
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val aggs = metrics.flatMap { m =>
      val c = graft.core.Cols.q(m)
      Seq(sum(when(!isnan(c), c).cast(dec)).as(s"${m}__sum"),
        count(when(!isnan(c), c)).as(s"${m}__n"))
    }
    var raw = readRaw(db, sensor, metrics)
    chunks.foreach(c => raw = raw.filter(col("chunk_start").isin(c: _*)))
    raw.withColumn("bucket", Grid.snapSeconds(col("slot"), bucketSec))
      .groupBy(col("chunk_start"), col("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Keep materialized rollups EXACT across upserts: re-aggregate only
    * the touched chunk partitions of every existing rollup (dynamic
    * partition overwrite — O(touched chunks) work, not a full rebuild),
    * or rebuild fully when schema evolution added a column. Called from
    * `write` so a rollup can never silently serve pre-upsert values
    * (ADVICE r2: stale-rollup invalidation). Caller must already be in
    * dynamic partitionOverwriteMode for the incremental path.
    */
  private def refreshRollups(db: String, sensor: String,
                             touched: Seq[Long],
                             fullRebuild: Boolean): Unit = {
    listRollups(db, sensor).foreach { b =>
      if (fullRebuild) materializeRollup(db, sensor, b)
      else rollupFrame(db, sensor, b, Some(touched))
        .repartition(col("chunk_start"))
        .write.mode("overwrite").partitionBy("chunk_start")
        .parquet(s"${sensorDir(db, sensor)}/rollup_$b")
    }
    listMeanRollups(db, sensor).foreach { b =>
      if (fullRebuild) materializeMeanRollup(db, sensor, b)
      else meanRollupFrame(db, sensor, b, Some(touched))
        .repartition(col("chunk_start"))
        .write.mode("overwrite").partitionBy("chunk_start")
        .parquet(s"${sensorDir(db, sensor)}/meanrollup_$b")
    }
    listSketchRollups(db, sensor).foreach { b =>
      if (fullRebuild) materializeSketchRollup(db, sensor, b)
      else sketchRollupFrame(db, sensor, b, Some(touched))
        .repartition(col("chunk_start"))
        .write.mode("overwrite").partitionBy("chunk_start")
        .parquet(s"${sensorDir(db, sensor)}/sketchrollup_$b")
    }
    listQuantileRollups(db, sensor).foreach { case (b, bw) =>
      if (fullRebuild) materializeQuantileRollup(db, sensor, b, bw)
      else quantRollupFrame(db, sensor, b, bw, Some(touched))
        .repartition(col("chunk_start"))
        .write.mode("overwrite").partitionBy("chunk_start")
        .parquet(s"${sensorDir(db, sensor)}/quantrollup_${b}_$bw")
    }
    listStatsRollups(db, sensor).foreach { b =>
      if (fullRebuild) materializeStatsRollup(db, sensor, b)
      else statsRollupFrame(db, sensor, b, Some(touched))
        .repartition(col("chunk_start"))
        .write.mode("overwrite").partitionBy("chunk_start")
        .parquet(s"${sensorDir(db, sensor)}/statsrollup_$b")
    }
  }

  /** Rollup read-range guard (r16 advice #4): BOTH bounds must sit on
    * the rollup grid — `fromSec % bucketSec == 0` and
    * `(toSec + 1) % bucketSec == 0` — because merged partials are
    * bucket-granular and cannot be trimmed post-hoc: a misaligned
    * fromSec would snap down a bucket and silently include readings
    * preceding it, and a misaligned toSec would keep the whole bucket
    * containing it and include readings after it (the symmetric bug).
    * The client routes (`readGrafana*`, `readDistinct`,
    * `readQuantile`) prove alignment before routing and fall back to
    * the raw scan otherwise, so routing changes cost, never values.
    */
  private def requireRollupAligned(bucketSec: Long, fromSec: Option[Long],
                                   toSec: Option[Long]): Unit = {
    fromSec.foreach(f => require(f % bucketSec == 0,
      s"fromSec $f must align to the rollup grid $bucketSec"))
    toSec.foreach(t => require((t + 1) % bucketSec == 0,
      s"toSec $t must end on the rollup grid ((toSec+1) % $bucketSec == 0)"))
  }

  /** Read means from a materialized mean rollup, RE-AGGREGATED to any
    * grid at least as coarse as the rollup's: partial (sum, count)
    * pairs merge exactly (decimal addition is associative), then one
    * division per output cell. Null where a coarse bucket holds no
    * observations.
    */
  def readMeanRollup(db: String, sensor: String, bucketSec: Long,
                     coarseSec: Long,
                     fromSec: Option[Long] = None,
                     toSec: Option[Long] = None): DataFrame = {
    require(coarseSec % bucketSec == 0,
      s"coarse grid $coarseSec must be a multiple of the rollup grid $bucketSec")
    requireRollupAligned(bucketSec, fromSec, toSec)
    val metrics = config(db, sensor).metricNames
    var df = spark.read.parquet(
      s"${sensorDir(db, sensor)}/meanrollup_$bucketSec")
    fromSec.foreach(f => df = df.filter(col("bucket") >= f - f % bucketSec))
    toSec.foreach(t => df = df.filter(col("bucket") <= t))
    val merged = df
      .withColumn("cbucket", Grid.snapSeconds(col("bucket"), coarseSec))
      .groupBy(col("cbucket"))
      .agg(
        metrics.flatMap(m => Seq(
          sum(graft.core.Cols.q(s"${m}__sum")).as(s"${m}__sum"),
          sum(graft.core.Cols.q(s"${m}__n")).as(s"${m}__n"))).head,
        metrics.flatMap(m => Seq(
          sum(graft.core.Cols.q(s"${m}__sum")).as(s"${m}__sum"),
          sum(graft.core.Cols.q(s"${m}__n")).as(s"${m}__n"))).tail: _*)
    merged.select(
      timestamp_seconds(col("cbucket")).cast(TimestampType).as("ts") +:
        metrics.map(m =>
          when(graft.core.Cols.q(s"${m}__n") > 0,
            graft.core.Cols.q(s"${m}__sum").cast("double") /
              graft.core.Cols.q(s"${m}__n")).as(m)): _*)
      .orderBy("ts")
  }

  /** Materialize a MERGEABLE distinct-count SKETCH rollup: per
    * (chunk, bucket) and per metric, a binary DataSketches HLL partial
    * over the metric's non-NaN values (stringified — one fixed,
    * deterministic representation). HLL union is associative and
    * lossless at a fixed lgK, so "distinct over <any range / any
    * coarser grid>" merges partials exactly as the direct sketch over
    * the raw rows would compute (SketchesSpec pins the algebra;
    * SensorStoreSpec pins this store path) — the dashboard
    * distinct-over-range read becomes a rollup-sized scan.
    * lgK is fixed at [[SketchLgK]] so incremental refresh partials
    * always union with the materialized ones.
    */
  def materializeSketchRollup(db: String, sensor: String,
                              bucketSec: Long): String = {
    val out = s"${sensorDir(db, sensor)}/sketchrollup_$bucketSec"
    sketchRollupFrame(db, sensor, bucketSec, None)
      .repartition(col("chunk_start"))
      .write.mode("overwrite").partitionBy("chunk_start").parquet(out)
    out
  }

  /** Fixed sketch precision for store rollups (union requires equal
    * lgK between materialize and refresh).
    */
  val SketchLgK = 12

  /** Materialize a MERGEABLE quantile rollup: per (chunk, bucket,
    * metric, bin) the COUNT of non-NaN values whose
    * ⌊value / binWidth⌋ lands in `bin` — fixed-grid histogram
    * partials. Counts are exact integers, so merging to any coarser
    * grid / any aligned range is lossless and "p95 over an arbitrary
    * range" becomes a rollup-sized scan returning bin-resolution
    * quantiles — the same materialize-once/merge-anywhere contract as
    * the HLL sketch rollups, with binWidth as the precision knob.
    * The grid (binWidth) is part of the rollup's identity: it is
    * encoded in the directory name so refresh partials always count on
    * the grid the materialized ones used.
    */
  def materializeQuantileRollup(db: String, sensor: String,
                                bucketSec: Long, binWidth: Double): String = {
    require(binWidth > 0.0, s"binWidth must be > 0, got $binWidth")
    val out = s"${sensorDir(db, sensor)}/quantrollup_${bucketSec}_$binWidth"
    quantRollupFrame(db, sensor, bucketSec, binWidth, None)
      .repartition(col("chunk_start"))
      .write.mode("overwrite").partitionBy("chunk_start").parquet(out)
    out
  }

  private def quantRollupFrame(db: String, sensor: String, bucketSec: Long,
                               binWidth: Double,
                               chunks: Option[Seq[Long]]): DataFrame = {
    val metrics = config(db, sensor).metricNames
    var raw = readRaw(db, sensor, metrics)
    chunks.foreach(c => raw = raw.filter(col("chunk_start").isin(c: _*)))
    val long = Pivot.wideToLong(
      raw.withColumn("bucket", Grid.snapSeconds(col("slot"), bucketSec))
        .select(col("chunk_start") +: col("bucket") +:
          metrics.map(graft.core.Cols.q): _*),
      Seq("chunk_start", "bucket"), metrics)
    long.filter(!isnan(col("value")))
      .withColumn("bin", floor(col("value") / binWidth).cast("long"))
      .groupBy(col("chunk_start"), col("bucket"), col("metric"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Read bin-resolution quantiles from a materialized quantile
    * rollup, merged to any grid at least as coarse as the rollup's:
    * integer count sums per (coarse bucket, metric, bin), then the
    * shared [[graft.operators.Quantiles.gridHistQuantile]] rank
    * selection. Boundary semantics are bucket-granular like the other
    * rollup readers — callers needing exact range ends must align
    * them, as [[graft.client.GraftClient.readQuantile]]'s routing
    * does.
    */
  def readQuantileRollup(db: String, sensor: String, bucketSec: Long,
                         binWidth: Double, coarseSec: Long, pct: Int,
                         fromSec: Option[Long] = None,
                         toSec: Option[Long] = None): DataFrame = {
    require(coarseSec % bucketSec == 0,
      s"coarse grid $coarseSec must be a multiple of the rollup grid $bucketSec")
    requireRollupAligned(bucketSec, fromSec, toSec)
    val metrics = config(db, sensor).metricNames
    var df = spark.read.parquet(
      s"${sensorDir(db, sensor)}/quantrollup_${bucketSec}_$binWidth")
    fromSec.foreach(f => df = df.filter(col("bucket") >= f - f % bucketSec))
    toSec.foreach(t => df = df.filter(col("bucket") <= t))
    val hist = df
      .withColumn("cbucket", Grid.snapSeconds(col("bucket"), coarseSec))
      .groupBy(col("cbucket"), col("metric"), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
    graft.operators.Quantiles.gridHistQuantile(hist, metrics, pct, binWidth)
  }

  /** Materialized QUANTILE-rollup (bucketSec, binWidth) pairs present
    * for a sensor.
    */
  def listQuantileRollups(db: String, sensor: String): Seq[(Long, Double)] = {
    val p = Paths.get(sensorDir(db, sensor))
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("quantrollup_"))
        .map { d =>
          val parts = d.stripPrefix("quantrollup_").split("_", 2)
          (parts(0).toLong, parts(1).toDouble)
        }.toSeq.sorted
      finally s.close()
    }
  }

  private def sketchRollupFrame(db: String, sensor: String, bucketSec: Long,
                                chunks: Option[Seq[Long]]): DataFrame = {
    val metrics = config(db, sensor).metricNames
    val aggs = metrics.map { m =>
      val c = graft.core.Cols.q(m)
      hll_sketch_agg(when(!isnan(c), c.cast("string")), SketchLgK)
        .as(s"${m}__hll")
    }
    var raw = readRaw(db, sensor, metrics)
    chunks.foreach(c => raw = raw.filter(col("chunk_start").isin(c: _*)))
    raw.withColumn("bucket", Grid.snapSeconds(col("slot"), bucketSec))
      .groupBy(col("chunk_start"), col("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Read distinct-count estimates from a materialized sketch rollup,
    * merged to any grid at least as coarse as the rollup's: one
    * `hll_union_agg` per metric over partial-scale rows (never the raw
    * rows), one estimate per output cell. Null where a coarse bucket
    * holds no observations.
    *
    * Boundary semantics are BUCKET-granular: `fromSec`/`toSec` admit
    * every rollup bucket that intersects the range, WHOLE (the from
    * filter rounds down to the bucket grid; the to filter keeps any
    * bucket starting at or before `toSec`). Merged HLL partials cannot
    * be trimmed post-hoc, so a range that does not start and end on
    * the rollup grid over-counts at the edges by up to one bucket each
    * side. Callers needing exact range semantics must pass
    * `fromSec % bucketSec == 0` and `(toSec + 1) % bucketSec == 0` —
    * [[graft.client.GraftClient.readDistinct]]'s routing enforces
    * exactly this and falls back to raw sketching otherwise.
    */
  def readSketchRollup(db: String, sensor: String, bucketSec: Long,
                       coarseSec: Long,
                       fromSec: Option[Long] = None,
                       toSec: Option[Long] = None): DataFrame = {
    require(coarseSec % bucketSec == 0,
      s"coarse grid $coarseSec must be a multiple of the rollup grid $bucketSec")
    requireRollupAligned(bucketSec, fromSec, toSec)
    val metrics = config(db, sensor).metricNames
    var df = spark.read.parquet(
      s"${sensorDir(db, sensor)}/sketchrollup_$bucketSec")
    fromSec.foreach(f => df = df.filter(col("bucket") >= f - f % bucketSec))
    toSec.foreach(t => df = df.filter(col("bucket") <= t))
    val merged = df
      .withColumn("cbucket", Grid.snapSeconds(col("bucket"), coarseSec))
      .groupBy(col("cbucket"))
      .agg(
        metrics.map(m =>
          hll_sketch_estimate(
            hll_union_agg(graft.core.Cols.q(s"${m}__hll"), false))
            .as(s"${m}_distinct")).head,
        metrics.map(m =>
          hll_sketch_estimate(
            hll_union_agg(graft.core.Cols.q(s"${m}__hll"), false))
            .as(s"${m}_distinct")).tail: _*)
    merged.select(
      timestamp_seconds(col("cbucket")).cast(TimestampType).as("ts") +:
        metrics.map(m => graft.core.Cols.q(s"${m}_distinct")): _*)
      .orderBy("ts")
  }

  /** Materialized SKETCH-rollup buckets present for a sensor. */
  def listSketchRollups(db: String, sensor: String): Seq[Long] = {
    val p = Paths.get(sensorDir(db, sensor))
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("sketchrollup_"))
        .map(_.stripPrefix("sketchrollup_").toLong).toSeq.sorted
      finally s.close()
    }
  }

  /** Materialized rollup buckets present for a sensor (metadata scan). */
  def listRollups(db: String, sensor: String): Seq[Long] = {
    val p = Paths.get(sensorDir(db, sensor))
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("rollup_"))
        .map(_.stripPrefix("rollup_").toLong).toSeq.sorted
      finally s.close()
    }
  }

  /** Materialized MEAN-rollup buckets present for a sensor. */
  // ---- windowed-STATS rollup (n/avg/min/max per window) --------------

  /** Non-missing readings of every metric as the long-format
    * `(chunk_start, ts, metric, value)` points frame the streaming
    * windowed-stats surface aggregates — the bridge that lets the
    * store rollup ride the ORACLE-PINNED
    * [[graft.streaming.StreamIngest.windowedStatsPartials]] code path
    * verbatim (r14 ask #8).
    */
  private def statsPointsFrame(db: String, sensor: String,
                               chunks: Option[Seq[Long]]): DataFrame = {
    val metrics = config(db, sensor).metricNames
    var raw = readRaw(db, sensor, metrics)
    chunks.foreach(c => raw = raw.filter(col("chunk_start").isin(c: _*)))
    raw.select(col("chunk_start"),
        timestamp_seconds(col("slot")).cast(TimestampType).as("ts"),
        explode(array(metrics.map(m =>
          struct(lit(m).as("metric"),
            graft.core.Cols.q(m).cast("double").as("value"))): _*))
          .as("mv"))
      .select(col("chunk_start"), col("ts"),
        col("mv.metric").as("metric"), col("mv.value").as("value"))
      .filter(col("value").isNotNull && !isnan(col("value")))
  }

  /** The mergeable windowed-stats partials per (chunk, window, metric)
    * — literally [[graft.streaming.StreamIngest.windowedStatsPartials]]
    * over [[statsPointsFrame]] with `chunk_start` riding as an extra
    * key, so the persisted rollup IS the streaming surface's aggregate
    * (batch ≡ stream ≡ oracle, StreamIngestSpec + the
    * events_windowed_stats key pin that path; SensorStoreSpec pins
    * this one equal to it).
    */
  private def statsRollupFrame(db: String, sensor: String,
                               bucketSec: Long,
                               chunks: Option[Seq[Long]]): DataFrame =
    graft.streaming.StreamIngest.windowedStatsPartials(
      statsPointsFrame(db, sensor, chunks), s"$bucketSec seconds",
      "0 seconds", extraKeys = Seq("chunk_start"))

  /** Materialize the windowed-stats rollup at `bucketSec`: per
    * (chunk, window, metric) the associative partials (n, n_value,
    * exact decimal sum, min, max) — every field merges, so any coarser
    * grid re-aggregates EXACTLY and an upsert refresh rewrites only
    * the touched chunk partitions ([[refreshRollups]] handles it like
    * every other rollup family).
    */
  def materializeStatsRollup(db: String, sensor: String,
                             bucketSec: Long): String = {
    val out = s"${sensorDir(db, sensor)}/statsrollup_$bucketSec"
    statsRollupFrame(db, sensor, bucketSec, None)
      .repartition(col("chunk_start"))
      .write.mode("overwrite").partitionBy("chunk_start").parquet(out)
    out
  }

  /** Read one metric's windowed stats from a materialized stats
    * rollup, re-aggregated to any grid at least as coarse as the
    * rollup's: counts/decimal sums/min/max merge exactly, the mean
    * divides once per output cell — the identical final expression
    * [[graft.streaming.StreamIngest.windowedStats]] applies.
    */
  def readStatsRollup(db: String, sensor: String, bucketSec: Long,
                      coarseSec: Long, fromSec: Option[Long],
                      toSec: Option[Long], metric: String): DataFrame = {
    require(coarseSec % bucketSec == 0,
      s"coarse grid $coarseSec must be a multiple of the rollup grid $bucketSec")
    // both bounds must sit ON the rollup grid (r15 advice closed the
    // fromSec side; r16 advice #4 the toSec side and every sibling
    // path — see requireRollupAligned)
    requireRollupAligned(bucketSec, fromSec, toSec)
    var df = spark.read.parquet(
        s"${sensorDir(db, sensor)}/statsrollup_$bucketSec")
      .filter(col("metric") === metric)
    fromSec.foreach(f => df = df.filter(col("window_start") >=
      timestamp_seconds(lit(f - f % bucketSec))))
    toSec.foreach(t => df = df.filter(col("window_start") <=
      timestamp_seconds(lit(t))))
    df.withColumn("cbucket",
        Grid.snapSeconds(Grid.tsSeconds(col("window_start")), coarseSec))
      .groupBy(col("cbucket"))
      .agg(sum(col("n")).as("n"), sum(col("n_value")).as("n_value"),
        sum(col("sum_value_dec")).as("sum_value_dec"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))
      .select(
        timestamp_seconds(col("cbucket")).cast(TimestampType).as("ts"),
        col("n"),
        (col("sum_value_dec").cast("double") / col("n_value"))
          .as("avg_value"),
        col("min_value"), col("max_value"))
      .orderBy("ts")
  }

  def listStatsRollups(db: String, sensor: String): Seq[Long] = {
    val p = Paths.get(sensorDir(db, sensor))
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("statsrollup_"))
        .map(_.stripPrefix("statsrollup_").toLong).toSeq.sorted
      finally s.close()
    }
  }

  def listMeanRollups(db: String, sensor: String): Seq[Long] = {
    val p = Paths.get(sensorDir(db, sensor))
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("meanrollup_"))
        .map(_.stripPrefix("meanrollup_").toLong).toSeq.sorted
      finally s.close()
    }
  }

  /** Read a materialized rollup: `ts` + metric columns on the coarse
    * grid, pruned by the same chunk partitioning as the base data.
    */
  def readRollup(db: String, sensor: String, bucketSec: Long,
                 fromSec: Option[Long] = None,
                 toSec: Option[Long] = None): DataFrame = {
    requireRollupAligned(bucketSec, fromSec, toSec)
    var df = spark.read.parquet(s"${sensorDir(db, sensor)}/rollup_$bucketSec")
    fromSec.foreach(f => df = df.filter(col("bucket") >= f - f % bucketSec))
    toSec.foreach(t => df = df.filter(col("bucket") <= t))
    df.select(timestamp_seconds(col("bucket")).cast(TimestampType).as("ts") +:
        config(db, sensor).metricNames.map(graft.core.Cols.q): _*)
      .orderBy("ts")
  }

  /** D-1 verify: per-chunk usage statistics. */
  /** Per-chunk integrity audit for the CLI `verify` subcommand
    * (reference `__main__.py:101-109` + the verify walk in
    * `fileutils.py:429-524`): recompute the row nansum and count rows
    * whose STORED checksum is present but outside the C-2 tolerance —
    * the parquet-era analog of the corrupt-chunk scan (file-level
    * truncation can't survive parquet's atomic commit, so value
    * integrity is the only corruption class left). Null stored
    * checksums pass, matching `read(validateChecksums = true)`.
    */
  def checksumAudit(db: String, sensor: String): DataFrame = {
    val all = config(db, sensor).metricNames
    val bad = col("checksum").isNotNull &&
      !RowChecksum.isClose(
        RowChecksum.nansum(all.map(graft.core.Cols.q)), col("checksum"),
        rtol = 1e-5, atol = 1e-3)
    readRaw(db, sensor, all)
      .groupBy(col("chunk_start"))
      .agg(count(lit(1)).as("rows_total"),
        count(when(bad, 1)).as("rows_corrupt"))
      .orderBy("chunk_start")
  }

  def verifyStats(db: String, sensor: String): DataFrame = {
    val cfg = config(db, sensor)
    val tick = cfg.tickSeconds
    val metrics = cfg.metricNames
    val used = metrics.map { m =>
      val c = graft.core.Cols.q(m)
      c.isNotNull && !isnan(c)
    }.reduce(_ || _)
    graft.maint.VerifyStats.stats(
      readRaw(db, sensor, metrics),
      Seq.empty, col("chunk_start"),
      ((col("slot") - col("chunk_start")) / tick).cast("long"), used)
  }
}
