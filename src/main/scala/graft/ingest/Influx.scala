package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** InfluxDB-line-protocol ingest (reference operator A-1).
  *
  * Grammar (from `/root/reference/src/ong_tsdb/server_utils.py:8-25`):
  * `"<db>,<ignored>=<sensor> <m1>=<v1>,<m2>=<v2>,... <ts_ns>"` — the
  * first comma-field's key is ignored, only its value names the sensor;
  * the trailing nanosecond timestamp is optional (missing → ingest
  * time); a malformed line raises (`InfluxParseException`).
  *
  * Implemented as pure Column expressions (split/regexp — all
  * codegen'd); the multi-metric field list is exploded into long rows
  * `(db, sensor, metric, value, ts_sec)`, the engine's canonical ingest
  * shape.
  */
object Influx {

  /** Lines that the grammar accepts: header, fields, optional ts
    * (possibly negative — the reference's `int()` accepts pre-epoch).
    */
  val LineRegex = """^([^, ]+),[^= ]+=([^ ]+) ([^ ]+)( -?\d+)?$"""

  /** Parse a DataFrame with a string column `lineCol` into long-format
    * points. Output columns: db, sensor, metric, value (double),
    * ts_sec (long; null when the line had no timestamp — caller fills
    * ingest time), malformed (boolean).
    */
  def parseLines(df: DataFrame, lineCol: String): DataFrame = {
    // `get()` (not getItem) everywhere: under ANSI mode an out-of-bounds
    // index throws, and malformed lines must FLAG, not crash the batch
    val line = col(lineCol)
    val header = get(split(line, " "), lit(0))
    val fields = coalesce(get(split(line, " "), lit(1)), lit(""))
    val tsStr = regexp_extract(line, """ (-?\d+)$""", 1)
    df.withColumn("malformed", !line.rlike(LineRegex))
      .withColumn("db", get(split(header, ","), lit(0)))
      .withColumn("sensor", regexp_extract(header, """,[^=]+=(.+)$""", 1))
      .withColumn("field", explode(split(fields, ",")))
      .withColumn("metric", get(split(col("field"), "="), lit(0)))
      // TRY_CAST, not cast: a non-numeric value ('m=abc') must FLAG the
      // row, not throw SparkNumberFormatException under ANSI mode and
      // kill the whole batch (the reference raises per line:
      // server_utils.py float(v) ValueError).
      .withColumn("value_str", get(split(col("field"), "="), lit(1)))
      .withColumn("value", expr("try_cast(value_str AS DOUBLE)"))
      .withColumn("malformed",
        col("malformed") || (col("value").isNull && col("value_str").isNotNull))
      // integer arithmetic on int64, NOT decimal division: Spark rounds
      // a decimal quotient half-up at the result scale (6) BEFORE any
      // floor can run, so 1704067199999999999 ns became ...200 s. An
      // int64 holds epoch-ns until year 2262. Spark's `div` TRUNCATES
      // toward zero while the reference's Python `//` FLOORS — they
      // differ on pre-epoch (negative) nanoseconds — so correct the
      // truncated quotient by 1 whenever a negative remainder was
      // discarded (java-style % keeps the dividend's sign). This floors
      // for every sign and, unlike `ns - pmod(ns, 1e9)`, cannot
      // overflow at the int64 edges under ANSI. try_cast → null for
      // absurd digit runs (treated as no-timestamp) instead of an ANSI
      // overflow crash.
      .withColumn("ts_ns_str", tsStr)
      .withColumn("__ts_ns", expr("try_cast(ts_ns_str AS BIGINT)"))
      .withColumn("ts_sec",
        when(col("ts_ns_str") === "", lit(null).cast("long"))
          .otherwise(expr(
            """__ts_ns div 1000000000
              | - (CASE WHEN __ts_ns % 1000000000 < 0 THEN 1 ELSE 0 END)"""
              .stripMargin)))
      .drop("field", "value_str", "ts_ns_str", "__ts_ns")
  }

  /** Fill-value parsing (reference C-5, `server.py:296-301`): numeric
    * string → its value; "nan" (any case) → NaN; anything else → warn
    * semantics collapsed to the default 0.0.
    */
  def parseFillValue(s: String): Double = {
    val t = s.trim.toLowerCase
    if (t == "nan") Double.NaN
    else try t.toDouble catch { case _: NumberFormatException => 0.0 }
  }

  /** Render long-format points back into influx lines (client.py:372-382
    * direction). One metric per line; value printed with a fixed `%.6f`
    * so the text form is deterministic across engines.
    */
  def formatLine(db: Column, sensor: Column, metric: Column, value: Column,
                 tsSec: Column): Column =
    format_string("%s,circuit=%s %s=%.6f %d",
      db, sensor, metric, value, tsSec * lit(1000000000L))
}
