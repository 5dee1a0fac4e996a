package graft.client

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Grid
import graft.ingest.{Influx, Pivot}
import graft.read.Downsample
import graft.store.{MetricDef, SensorConfig, SensorStore}

/** Library façade mirroring the reference client's public surface
  * (`/root/reference/src/ong_tsdb/client.py` — `OngTsdbClient`), minus
  * the HTTP transport: a user of the reference can port call-for-call.
  *
  * | reference                      | here                         |
  * |--------------------------------|------------------------------|
  * | `create_db` / `exist_db`       | `createDb` / `existsDb`      |
  * | `create_sensor` (+keys, meta)  | `createSensor`               |
  * | `delete_sensor` / `delete_db`  | `deleteSensor` / `deleteDb`  |
  * | `write(seq_of_lines, fill)`    | `write(lines, fill)`         |
  * | `write_df(db, sensor, df)`     | `writeDf` (wide frame)       |
  * | `read(db, sensor, f, t, m)`    | `read` → wide frame          |
  * | `read_grafana(...)`            | `readGrafana` → long frame   |
  * | `get_lasttimestamp`            | `lastTimestamp`              |
  * | `get_metadata`/`set_level_names`| `metadata` / `setLevelNames`|
  *
  * Auth tokens are stored with the sensor for config parity but not
  * enforced — a library embeds in the caller's security context.
  */
class GraftClient(spark: SparkSession, baseDir: String, token: String = "",
                  adminKey: String = "") {

  val store = new SensorStore(spark, baseDir)

  /** Reference auth model (`database.py:142-152,170-187` + server
    * routes): writes need the sensor's write key; reads accept read OR
    * write key; an `adminKey` holder passes every gate (`database.py:
    * 178` — "admin key is valid for any action"; the server embedding
    * sets it, the library default leaves it disabled). A sensor with
    * empty keys is open (the library default).
    */
  private def isAdmin: Boolean =
    adminKey.nonEmpty && store.keyOk(adminKey, token)

  private def authWrite(db: String, sensor: String): Unit = {
    if (isAdmin) return
    val cfg = store.config(db, sensor)
    if (cfg.writeKey.nonEmpty && !store.keyOk(cfg.writeKey, token))
      throw new graft.core.NotAuthorizedException(s"write $db/$sensor")
  }

  private def authRead(db: String, sensor: String): Unit = {
    if (isAdmin) return
    val cfg = store.config(db, sensor)
    if (cfg.readKey.nonEmpty &&
        !store.keyOk(cfg.readKey, token) && !store.keyOk(cfg.writeKey, token))
      throw new graft.core.NotAuthorizedException(s"read $db/$sensor")
  }

  // ---- catalog -------------------------------------------------------

  def createDb(db: String): Unit =
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$baseDir/$db"))

  def existsDb(db: String): Boolean = store.listDbs().contains(db)

  def createSensor(db: String, sensor: String, freq: String,
                   metrics: Seq[Seq[String]] = Seq.empty,
                   readKey: String = "", writeKey: String = "",
                   metadata: Map[String, String] = Map.empty): Unit = {
    createDb(db)
    store.createSensor(SensorConfig(db, sensor, freq,
      metrics.map(MetricDef(_)), metadata, readKey, writeKey))
  }

  def existsSensor(db: String, sensor: String): Boolean =
    store.existsSensor(db, sensor)

  def deleteSensor(db: String, sensor: String): Unit =
    store.deleteSensor(db, sensor)

  def deleteDb(db: String): Unit = store.deleteDb(db)

  def metadata(db: String, sensor: String): Map[String, String] =
    store.config(db, sensor).metadata

  /** Reference `get_metrics` (`client.py:415-418`). */
  def metrics(db: String, sensor: String): Seq[String] =
    store.config(db, sensor).metricNames

  /** Reference `update_token` (`client.py:149`): tokens are immutable
    * per client here — returns a new client bound to the new token.
    */
  def updateToken(newToken: String): GraftClient =
    new GraftClient(spark, baseDir, newToken)

  /** Reference `config_reload` (`client.py:384-390`): configs are read
    * from disk on every access in this engine, so reload is a no-op
    * kept for call-site parity.
    */
  def configReload(): Unit = ()

  /** Reference `get_lastdate` (`client.py:402-413`): the last written
    * tick as a wall-clock string in `tz` (region id or fixed offset).
    */
  def lastDate(db: String, sensor: String,
               tz: String = "UTC"): Option[String] =
    lastTimestamp(db, sensor).map { sec =>
      java.time.Instant.ofEpochSecond(sec)
        .atZone(java.time.ZoneId.of(tz))
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))
    }

  /** General metadata update (reference `update_metadata`,
    * `database.py:287-298`): REPLACES the sensor's metadata dict
    * wholesale, like the reference assignment — keys absent from
    * `newMetadata` are dropped (including `level_names`).
    */
  def updateMetadata(db: String, sensor: String,
                     newMetadata: Map[String, String]): Unit = {
    authWrite(db, sensor) // reference gates update_metadata behind auth
    val cfg = store.config(db, sensor)
    store.createSensor(cfg.copy(metadata = newMetadata))
  }

  /** Merge variant of [[updateMetadata]] for callers that want to patch
    * a few keys without re-supplying the whole dict: existing keys are
    * overwritten, others kept.
    */
  def mergeMetadata(db: String, sensor: String,
                    patch: Map[String, String]): Unit = {
    authWrite(db, sensor)
    val cfg = store.config(db, sensor)
    store.createSensor(cfg.copy(metadata = cfg.metadata ++ patch))
  }

  /** MultiIndex level names (reference `set_level_names`,
    * `client.py:493-503`): stored comma-joined in metadata.
    */
  def setLevelNames(db: String, sensor: String, names: Seq[String]): Unit = {
    authWrite(db, sensor) // metadata mutation — same gate as the writes
    val cfg = store.config(db, sensor)
    store.createSensor(cfg.copy(
      metadata = cfg.metadata + ("level_names" -> names.mkString(","))))
  }

  def levelNames(db: String, sensor: String): Seq[String] =
    metadata(db, sensor).get("level_names").map(_.split(",").toSeq)
      .getOrElse(Seq.empty)

  /** Retention (extension — the reference never deletes data): drop
    * every whole chunk ending at or before `cutoffSec`, from the data
    * table and every materialized rollup. Destructive → write-key
    * gated like the other mutations. Returns the dropped chunk starts.
    */
  def deleteBefore(db: String, sensor: String, cutoffSec: Long): Seq[Long] = {
    authWrite(db, sensor)
    store.deleteBefore(db, sensor, cutoffSec)
  }

  // ---- write ---------------------------------------------------------

  /** Ingest influx-protocol lines (reference `client.write`,
    * `client.py:337-370` → `server.write_point_list`). Lines may span
    * multiple (db, sensor) pairs — they are grouped per sensor like the
    * server's `DbMeterData` (A-3). Missing timestamps get ingest time.
    * Malformed lines raise, mirroring `InfluxParseException`.
    */
  def write(lines: Seq[String], fillValue: Double = 0.0): Unit = {
    import spark.implicits._
    val parsed = Influx.parseLines(lines.toDF("line"), "line").cache()
    try {
      val bad = parsed.filter(col("malformed")).select("line").limit(1).collect()
      if (bad.nonEmpty)
        throw new graft.core.InfluxParseException(bad(0).getString(0))
      val nowSec = System.currentTimeMillis() / 1000
      val pts = parsed
        .withColumn("ts_sec", coalesce(col("ts_sec"), lit(nowSec)))
        .select(col("db"), col("sensor"),
          timestamp_seconds(col("ts_sec")).as("ts"),
          col("metric"), col("value"))
      val sensors = pts.select("db", "sensor").distinct().collect()
        .map(r => (r.getString(0), r.getString(1)))
      sensors.foreach { case (db, sensor) =>
        authWrite(db, sensor)
        // locked like the reference server's per-sensor process lock —
        // concurrent client jobs writing one sensor serialize safely
        store.writeLocked(db, sensor,
          pts.filter(col("db") === db && col("sensor") === sensor)
            .select("ts", "metric", "value"),
          fillValue)
      }
    } finally { parsed.unpersist(); () }
  }

  /** Long-format ingest for ONE sensor — the `write_point_list` inner
    * grain (`server.py:215-266`): points `(ts, metric, value)` through
    * the locked upsert. The binary ingest route lands here after
    * [[graft.ingest.Msgpack.decodePointList]].
    */
  def writePoints(db: String, sensor: String, points: DataFrame,
                  fillValue: Double = 0.0): Unit = {
    authWrite(db, sensor)
    store.writeLocked(db, sensor, points, fillValue)
  }

  /** Ingest a wide frame (`ts` + one column per metric) — reference
    * `write_df` (`client.py:372-382`): melt to points, then the normal
    * ingest path (A-7).
    */
  def writeDf(db: String, sensor: String, wide: DataFrame,
              fillValue: Double = 0.0): Unit = {
    authWrite(db, sensor)
    val metrics = wide.columns.filterNot(_ == "ts").toSeq
    val long = Pivot.wideToLong(wide, Seq("ts"), metrics)
      .select(col("ts"), col("metric"), col("value").cast("double"))
    store.writeLocked(db, sensor, long, fillValue)
  }

  // ---- read ----------------------------------------------------------

  /** Wide read (reference `client.read`/`local_read`): tick-grid rows
    * `ts, <metrics...>` in `[fromSec, toSec]`, ordered by ts.
    */
  def read(db: String, sensor: String,
           fromSec: Option[Long] = None, toSec: Option[Long] = None,
           metrics: Option[Seq[String]] = None): DataFrame = {
    authRead(db, sensor)
    store.read(db, sensor, fromSec, toSec, metrics)
  }

  def lastTimestamp(db: String, sensor: String): Option[Long] = {
    authRead(db, sensor)
    store.lastTimestamp(db, sensor)
  }

  /** Tuple metrics exactly as the reference's `get_metrics` returns
    * them for a MultiIndex sensor — a list of level tuples
    * (`test_client.py:180-182`). Flat sensors return 1-element tuples.
    */
  def metricTuples(db: String, sensor: String): Seq[Seq[String]] = {
    authRead(db, sensor)
    store.config(db, sensor).metrics.map(_.levels)
  }

  /** The TRUE MultiIndex read (reference `client.py:545-547`): the
    * wide frame whose every metric column carries its LEVEL TUPLE and
    * the sensor's CURRENT level names as Spark column metadata — the
    * columnar analog of `pd.MultiIndex.from_tuples(metrics,
    * names=level_names)`. Level tuples are immutable and persisted in
    * the parquet footers at write (self-describing files); level NAMES
    * are mutable sensor metadata (`set_level_names`) and attach here
    * from CONFIG, so a rename is visible on the very next read without
    * touching a single data file — the reference's exact behavior
    * (`test_client.py:203-205`). [[multiIndex]] reconstructs
    * `(tuples, names)` from such a frame the way a pandas consumer
    * would.
    */
  def readMultiIndex(db: String, sensor: String,
                     fromSec: Option[Long] = None,
                     toSec: Option[Long] = None): DataFrame = {
    val cfg = store.config(db, sensor)
    val names = levelNames(db, sensor)
    read(db, sensor, fromSec, toSec).select(
      col("ts") +: cfg.metrics.map { m =>
        val b = new org.apache.spark.sql.types.MetadataBuilder()
          .putStringArray("levels", m.levels.toArray)
        if (names.nonEmpty) b.putStringArray("level_names", names.toArray)
        graft.core.Cols.q(m.name).as(m.name, b.build())
      }: _*)
  }

  /** Reconstruct `(metric tuples, level names)` from a
    * [[readMultiIndex]] frame's column metadata — names + order, the
    * pandas-compatible MultiIndex identity.
    */
  def multiIndex(df: DataFrame): (Seq[Seq[String]], Seq[String]) = {
    val fs = df.schema.fields.filter(_.metadata.contains("levels"))
    (fs.map(_.metadata.getStringArray("levels").toSeq).toSeq,
      fs.headOption.filter(_.metadata.contains("level_names"))
        .map(_.metadata.getStringArray("level_names").toSeq)
        .getOrElse(Nil))
  }

  /** Grafana-style downsampled read (reference `/query`,
    * `server.py:412-475` + `client.read_grafana`): per metric, first
    * value at/after each of `maxDataPoints` boundaries, long format
    * `(metric, value, ts_ms)`.
    *
    * ROLLUP ROUTING (the 100 TB dashboard path): when a materialized
    * rollup exists whose bucket ALIGNS with the query, the read is
    * served from it — touching bucketSec-times fewer rows — instead of
    * the raw grid. Alignment is required for exactness (ADVICE r2): the
    * rollup is used only when `fromSec` sits on the rollup grid (no
    * straddling first bucket whose pre-`fromSec` first value would be
    * wrong and whose in-range values would be lost) AND the query
    * spread is an integral multiple of the rollup bucket (so no rollup
    * bucket straddles a spread boundary and migrates its value into the
    * wrong output bucket). Then first-per-bucket over
    * first-per-rollup-bucket returns exactly the raw first VALUES; only
    * the reported timestamps coarsen to the rollup grid. Rollups are
    * refreshed on write (`SensorStore.refreshRollups`), so they never
    * serve pre-upsert data. Any misalignment falls back to the raw
    * read; `useRollups = false` forces raw (exact timestamps).
    */
  def readGrafana(db: String, sensor: String, fromSec: Long, toSec: Long,
                  maxDataPoints: Int,
                  targets: Option[Seq[String]] = None,
                  useRollups: Boolean = true): DataFrame = {
    val cfg = store.config(db, sensor)
    val wanted = targets.getOrElse(cfg.metricNames)
    val span = toSec - fromSec + 1
    // integral spread or no rollup: a fractional spread can never be a
    // multiple of an integer bucket
    val spreadSec = if (span % maxDataPoints == 0)
      Some(span / maxDataPoints) else None
    val rollup = if (useRollups) spreadSec.flatMap(sp =>
      store.listRollups(db, sensor)
        .filter(b => b <= sp && sp % b == 0 && fromSec % b == 0)
        .lastOption)
    else None
    val wide = rollup match {
      case Some(b) =>
        store.readRollup(db, sensor, b, Some(fromSec), Some(toSec))
          .select((col("ts") +: wanted.map(graft.core.Cols.q)): _*)
      case None =>
        store.read(db, sensor, Some(fromSec), Some(toSec), Some(wanted))
    }
    val withSec = wide.withColumn("sec", Grid.tsSeconds(col("ts")))
    val long = Pivot.wideToLong(withSec, Seq("sec"), wanted)
      .filter(!isnan(col("value")))
    Downsample.firstPerBucket(long, Seq("metric"), col("sec"),
        "value", "sec", fromSec, toSec, maxDataPoints)
      .select(col("metric"), col("first_value").as("value"),
        (col("first_ts") * 1000).as("ts_ms"))
      .orderBy("metric", "ts_ms")
  }

  /** Distinct-count dashboard read: per `coarseSec` bucket, the
    * approximate distinct VALUES per metric over the range. Routes
    * through the materialized SKETCH rollup when one aligns (rollup
    * bucket divides the coarse grid AND both range ends sit on the
    * rollup grid: `fromSec % b == 0`, `(toSec + 1) % b == 0`) — then
    * the read is a rollup-scale `hll_union_agg` merge and raw data is
    * never scanned; otherwise falls back to direct sketching over raw
    * rows. The end-alignment check matters: rollup buckets merge
    * WHOLE, so a query ending mid-bucket would count values observed
    * after `toSec` that the raw path excludes. With both ends aligned,
    * union at fixed lgK is lossless and BOTH routes return identical
    * estimates (GraftClientSpec pins aligned equality and the
    * unaligned-end fallback) — routing is a cost decision, never a
    * semantics one.
    */
  def readDistinct(db: String, sensor: String, fromSec: Long, toSec: Long,
                   coarseSec: Long, useRollups: Boolean = true): DataFrame = {
    authRead(db, sensor)
    val aligned = if (useRollups)
      store.listSketchRollups(db, sensor)
        .filter(b => b <= coarseSec && coarseSec % b == 0 &&
          fromSec % b == 0 && (toSec + 1) % b == 0)
        .lastOption
    else None
    aligned match {
      case Some(b) =>
        store.readSketchRollup(db, sensor, b, coarseSec,
          Some(fromSec), Some(toSec))
      case None =>
        val metrics = store.config(db, sensor).metricNames
        val raw = store.read(db, sensor, Some(fromSec), Some(toSec))
        val aggs = metrics.map { m =>
          val c = graft.core.Cols.q(m)
          hll_sketch_estimate(hll_sketch_agg(
            when(!isnan(c), c.cast("string")),
            lit(store.SketchLgK))).as(s"${m}_distinct")
        }
        raw
          .withColumn("cb",
            Grid.snapSeconds(Grid.tsSeconds(col("ts")), coarseSec))
          .groupBy("cb")
          .agg(aggs.head, aggs.tail: _*)
          .select(timestamp_seconds(col("cb"))
            .cast(org.apache.spark.sql.types.TimestampType).as("ts") +:
            metrics.map(m => graft.core.Cols.q(s"${m}_distinct")): _*)
          .orderBy("ts")
    }
  }

  /** Percentile dashboard read: per `coarseSec` bucket, the
    * bin-resolution type-1 quantile of each metric's values on the
    * fixed `binWidth` grid. Routes through a materialized QUANTILE
    * rollup when one matches (same binWidth, rollup bucket divides the
    * coarse grid, both range ends on the rollup grid) — then the read
    * merges integer histogram partials and raw data is never scanned;
    * otherwise it histograms the raw rows directly ON THE SAME GRID.
    * Counts are exact integers and the rank math is shared
    * ([[graft.operators.Quantiles.gridHistQuantile]]), so BOTH routes
    * return identical values — quantization to binWidth is the
    * operator's semantic, never a route artifact (GraftClientSpec pins
    * aligned equality and the unaligned-end fallback).
    */
  def readQuantile(db: String, sensor: String, fromSec: Long, toSec: Long,
                   coarseSec: Long, pct: Int, binWidth: Double,
                   useRollups: Boolean = true): DataFrame = {
    authRead(db, sensor)
    val aligned = if (useRollups)
      store.listQuantileRollups(db, sensor)
        .filter { case (b, bw) =>
          bw == binWidth && b <= coarseSec && coarseSec % b == 0 &&
            fromSec % b == 0 && (toSec + 1) % b == 0
        }.lastOption
    else None
    aligned match {
      case Some((b, bw)) =>
        store.readQuantileRollup(db, sensor, b, bw, coarseSec, pct,
          Some(fromSec), Some(toSec))
      case None =>
        val metrics = store.config(db, sensor).metricNames
        val raw = store.read(db, sensor, Some(fromSec), Some(toSec))
        val long = Pivot.wideToLong(
          raw.withColumn("cbucket",
              Grid.snapSeconds(Grid.tsSeconds(col("ts")), coarseSec))
            .select(col("cbucket") +: metrics.map(graft.core.Cols.q): _*),
          Seq("cbucket"), metrics)
        val hist = long.filter(!isnan(col("value")))
          .withColumn("bin", floor(col("value") / binWidth).cast("long"))
          .groupBy(col("cbucket"), col("metric"), col("bin"))
          .agg(count(lit(1)).as("cnt"))
        graft.operators.Quantiles.gridHistQuantile(hist, metrics, pct,
          binWidth)
    }
  }

  /** SHARED-BOUNDARY Grafana downsample — the reference's exact
    * multi-target row-selection semantics (`server.py:444-459`): ONE
    * boundary advances for ALL targets. The server walks grid rows in
    * time order; the first ROW at/after each spread boundary is emitted
    * with every non-NaN target value AT THAT ROW (an all-NaN row still
    * advances the boundary), then the boundary jumps past it. Because
    * boundaries live on the fixed grid anchored at `fromSec`, the
    * emitted rows are exactly the first grid ROW of every non-empty
    * spread bucket — expressible as ONE hash aggregation (`min_by` of
    * the whole row struct per bucket), no sequential scan needed.
    *
    * This differs from [[readGrafana]] (per-target independent
    * bucketing) on sparse multi-metric sensors: here a metric that is
    * NaN on the bucket's first row contributes NOTHING for that bucket,
    * even if it has a later value inside it. One acknowledged
    * divergence from the reference loop (DETERMINISM.md): when a row
    * lands exactly ON a boundary the reference's `while start_t < dt`
    * fails to advance and re-emits the following row too, overshooting
    * maxDataPoints — a contract-breaking artifact we do not replicate.
    */
  def readGrafanaShared(db: String, sensor: String, fromSec: Long,
                        toSec: Long, maxDataPoints: Int,
                        targets: Option[Seq[String]] = None): DataFrame = {
    val cfg = store.config(db, sensor)
    val wanted = targets.getOrElse(cfg.metricNames)
    val wide = store.read(db, sensor, Some(fromSec), Some(toSec), Some(wanted))
    val spread = Downsample.spreadOf(fromSec, toSec, maxDataPoints)
    val firstRow = wide.withColumn("sec", Grid.tsSeconds(col("ts")))
      .withColumn("bucket", Downsample.bucket(col("sec"), fromSec, spread))
      .groupBy(col("bucket"))
      .agg(min_by(struct(col("sec") +: wanted.map(graft.core.Cols.q): _*),
        col("sec")).as("r"))
      .select(col("r.sec").as("sec") +:
        wanted.map(m => col("r").getField(m).as(m)): _*)
    Pivot.wideToLong(firstRow, Seq("sec"), wanted)
      .filter(!isnan(col("value")))
      .select(col("metric"), col("value"), (col("sec") * 1000).as("ts_ms"))
      .orderBy("metric", "ts_ms")
  }

  /** The reference's exact Grafana wire JSON (`server.py:461-475`):
    * `[{"target":T,"datapoints":[[value,ts_ms],…]},…]` — one object
    * per REQUESTED target in request order (a data-less target emits
    * an empty list), datapoints in time order, NaN cells dropped
    * (`server.py:453-455`), numbers printed as C "%f" exactly like
    * the reference's `"[%f,%f]" % (value, dt*1000)`. Row selection is
    * the shared-boundary downsample ([[readGrafanaShared]] — the
    * server's one-boundary-for-all-targets loop). The per-target
    * datapoint strings are built and joined IN the engine (codegen'd
    * format_string + struct sort + array_join); the driver folds one
    * bounded string per target — ≤ maxDataPoints points each, the
    * Grafana panel-width contract, so the collect is safe by
    * construction.
    */
  def readGrafanaJson(db: String, sensor: String, fromSec: Long,
                      toSec: Long, maxDataPoints: Int,
                      targets: Option[Seq[String]] = None): String = {
    val wanted = targets.getOrElse(store.config(db, sensor).metricNames)
    val long = readGrafanaShared(db, sensor, fromSec, toSec, maxDataPoints,
      Some(wanted))
    val per = long
      .withColumn("dp", format_string("[%f,%f]",
        col("value").cast("double"), col("ts_ms").cast("double")))
      .groupBy(col("metric"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts_ms"), col("dp")))),
        x => x.getField("dp")), ",").as("dps"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    wanted.map(t =>
        s"""{"target":"$t","datapoints":[${per.getOrElse(t, "")}]}""")
      .mkString("[", ",", "]")
  }

  /** Grafana-style MEAN downsample: wide `(ts, <metrics...>)` rows, one
    * per spread bucket, each cell the mean of that metric's non-NaN
    * readings in the bucket.
    *
    * ROLLUP ROUTING: when the query aligns (`fromSec` on the spread
    * grid, spread an integral multiple of a materialized MEAN rollup's
    * bucket), the answer comes from the rollup's decimal `(sum, count)`
    * partials re-aggregated to the spread grid — EXACT, because decimal
    * partial sums merge associatively; the raw path computes the
    * identical expression shape (DECIMAL(28,6) sums, one double
    * division) directly on the grid. Misaligned queries always fall
    * back to raw, so routing changes cost, never values.
    */
  def readGrafanaMean(db: String, sensor: String, fromSec: Long,
                      toSec: Long, maxDataPoints: Int,
                      targets: Option[Seq[String]] = None,
                      useRollups: Boolean = true): DataFrame = {
    val cfg = store.config(db, sensor)
    val wanted = targets.getOrElse(cfg.metricNames)
    val span = toSec - fromSec + 1
    val spreadSec = if (span % maxDataPoints == 0)
      Some(span / maxDataPoints) else None
    // fromSec % spread == 0 makes the query's spread grid coincide with
    // the ABSOLUTE spread grid the rollup partials snap to
    val aligned = spreadSec.filter(sp => fromSec % sp == 0)
    val rollup = if (useRollups) aligned.flatMap(sp =>
      store.listMeanRollups(db, sensor)
        .filter(b => b <= sp && sp % b == 0).lastOption)
    else None
    rollup match {
      case Some(b) =>
        store.readMeanRollup(db, sensor, b, aligned.get,
            Some(fromSec), Some(toSec))
          .select((col("ts") +: wanted.map(graft.core.Cols.q)): _*)
      case None =>
        val dec = org.apache.spark.sql.types.DecimalType(28, 6)
        val wide = store.read(db, sensor, Some(fromSec), Some(toSec),
          Some(wanted))
        // RELATIVE float-spread bucketing anchored at fromSec — the
        // same grid as readGrafana / Downsample (reference
        // `server.py:430-434`): bucket k = floor((sec-fromSec)/spread),
        // so no bucket ever precedes `fromSec` and at most
        // maxDataPoints rows come back even for misaligned queries
        // (fromSec % spread != 0, span % maxDataPoints != 0). Absolute
        // snapping is used only on the rollup path above, where
        // alignment is proven before routing — there the two grids
        // coincide, so the paths stay bitwise-equal.
        val spread = Downsample.spreadOf(fromSec, toSec, maxDataPoints)
        val aggs = wanted.flatMap { m =>
          val c = graft.core.Cols.q(m)
          Seq(sum(when(!isnan(c), c).cast(dec)).as(s"${m}__sum"),
            count(when(!isnan(c), c)).as(s"${m}__n"))
        }
        wide.withColumn("sec", Grid.tsSeconds(col("ts")))
          .withColumn("cbucket",
            Downsample.bucket(col("sec"), fromSec, spread))
          .groupBy(col("cbucket"))
          .agg(aggs.head, aggs.tail: _*)
          .select(timestamp_seconds(lit(fromSec) +
              floor(col("cbucket") * lit(spread)).cast("long")).as("ts") +:
            wanted.map(m =>
              when(graft.core.Cols.q(s"${m}__n") > 0,
                graft.core.Cols.q(s"${m}__sum").cast("double") /
                  graft.core.Cols.q(s"${m}__n"))
                .as(m)): _*)
          .orderBy("ts")
    }
  }

  /** Grafana-style WINDOWED-STATS downsample for one metric — per
    * spread bucket `(ts, n, avg_value, min_value, max_value)` over the
    * metric's non-missing readings, the dashboard readout of the
    * oracle-pinned streaming windowed-stats surface (r14 ask #8).
    *
    * ROLLUP ROUTING (the `readGrafanaMean` discipline): when the query
    * aligns (fromSec on the spread grid, spread an integral multiple
    * of a materialized STATS rollup's window), the answer merges the
    * rollup's associative partials (integer counts, exact decimal sum,
    * min/max) — bit-identical to the raw path, which computes the same
    * decimal-routed expression shape directly on the grid. Misaligned
    * queries always fall back to raw, so routing changes cost, never
    * values.
    */
  def readGrafanaStats(db: String, sensor: String, fromSec: Long,
                       toSec: Long, maxDataPoints: Int, metric: String,
                       useRollups: Boolean = true): DataFrame = {
    val span = toSec - fromSec + 1
    val spreadSec = if (span % maxDataPoints == 0)
      Some(span / maxDataPoints) else None
    val aligned = spreadSec.filter(sp => fromSec % sp == 0)
    val rollup = if (useRollups) aligned.flatMap(sp =>
      store.listStatsRollups(db, sensor)
        .filter(b => b <= sp && sp % b == 0).lastOption)
    else None
    rollup match {
      case Some(b) =>
        store.readStatsRollup(db, sensor, b, aligned.get,
          Some(fromSec), Some(toSec), metric)
      case None =>
        val dec = org.apache.spark.sql.types.DecimalType(18, 6)
        val spread = Downsample.spreadOf(fromSec, toSec, maxDataPoints)
        val c = graft.core.Cols.q(metric)
        // the same value chain the rollup partials carry: float cell →
        // double → decimal sum; missing cells (null at rest) dropped
        store.read(db, sensor, Some(fromSec), Some(toSec),
            Some(Seq(metric)))
          .filter(c.isNotNull && !isnan(c))
          .withColumn("__v", c.cast("double"))
          .withColumn("sec", Grid.tsSeconds(col("ts")))
          .withColumn("cbucket",
            Downsample.bucket(col("sec"), fromSec, spread))
          .groupBy(col("cbucket"))
          .agg(count(lit(1)).as("n"),
            count(col("__v")).as("n_value"),
            sum(col("__v").cast(dec)).as("sum_value_dec"),
            min(col("__v")).as("min_value"),
            max(col("__v")).as("max_value"))
          .select(timestamp_seconds(lit(fromSec) +
              floor(col("cbucket") * lit(spread)).cast("long")).as("ts"),
            col("n"),
            (col("sum_value_dec").cast("double") / col("n_value"))
              .as("avg_value"),
            col("min_value"), col("max_value"))
          .orderBy("ts")
    }
  }
}
