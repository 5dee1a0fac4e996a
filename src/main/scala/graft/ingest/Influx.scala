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

  /** Lines that the grammar accepts: header, fields, optional ts. */
  val LineRegex = """^([^, ]+),[^= ]+=([^ ]+) ([^ ]+)( \d+)?$"""

  /** Parse a DataFrame with a string column `lineCol` into long-format
    * points. Output columns: db, sensor, metric, value (double),
    * ts_sec (long; null when the line had no timestamp — caller fills
    * ingest time), malformed (boolean).
    */
  def parseLines(df: DataFrame, lineCol: String): DataFrame = {
    val line = col(lineCol)
    val header = split(line, " ").getItem(0)
    val fields = split(line, " ").getItem(1)
    val tsStr = regexp_extract(line, """ (\d+)$""", 1)
    df.withColumn("malformed", !line.rlike(LineRegex))
      .withColumn("db", split(header, ",").getItem(0))
      .withColumn("sensor", regexp_extract(header, """,[^=]+=(.+)$""", 1))
      .withColumn("field", explode(split(fields, ",")))
      .withColumn("metric", split(col("field"), "=").getItem(0))
      .withColumn("value", split(col("field"), "=").getItem(1).cast("double"))
      .withColumn("ts_sec",
        when(tsStr === "", lit(null).cast("long"))
          .otherwise((tsStr.cast("decimal(30,0)") / lit(1000000000L)).cast("long")))
      .drop("field")
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
