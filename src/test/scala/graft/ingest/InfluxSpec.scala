package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Influx line grammar (reference `server_utils.py:8-25`, fixture
  * shapes from FIXTURES.md §A.2 / `tests/test_client.py:65-71`).
  */
class InfluxSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def parse(lines: String*) = {
    import spark.implicits._
    Influx.parseLines(lines.toDF("line"), "line")
  }

  test("multi-metric line explodes to long rows in order") {
    val rows = parse("test,circuit=s1 active=9,reactive=10 1704067200000000000")
      .select("db", "sensor", "metric", "value", "ts_sec")
      .collect().toSeq
    assert(rows == Seq(
      Row("test", "s1", "active", 9.0, 1704067200L),
      Row("test", "s1", "reactive", 10.0, 1704067200L)))
  }

  test("pre-epoch nanoseconds floor to the earlier second (python //)") {
    // -1 ns is inside second -1 ([-1e9, 0)); truncation would say 0
    val rows = parse(
      "test,circuit=s1 active=1 -1",
      "test,circuit=s1 active=1 -1000000000",
      "test,circuit=s1 active=1 -1000000001",
      "test,circuit=s1 active=1 1")
      .select("ts_sec").collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(-1L, -1L, -2L, 0L))
  }

  test("ragged lines: single metric, missing ts → null ts") {
    val rows = parse("test,circuit=s1 active=11")
      .select("metric", "value", "ts_sec").collect().toSeq
    assert(rows == Seq(Row("active", 11.0, null)))
  }

  test("new metric mid-stream parses like any other") {
    val rows = parse(
      "test,circuit=s1 reactive=15,active=16,nueva=17 1704067201000000000")
      .select("metric").collect().map(_.getString(0)).toSeq
    assert(rows == Seq("reactive", "active", "nueva"))
  }

  test("malformed lines are flagged, not dropped") {
    val rows = parse("garbage without equals", "test,circuit=s1 a=1 123")
      .select("malformed").collect().map(_.getBoolean(0)).toSeq
    assert(rows == Seq(true, false))
  }

  test("non-numeric metric value FLAGS the row — never throws under ANSI") {
    // the reference raises InfluxParseException per line (float(v)
    // ValueError); a plain cast would kill the whole batch instead
    val rows = parse("test,circuit=s1 m=abc 123", "test,circuit=s1 m=2.5 123")
      .select("malformed", "value").collect()
    assert(rows(0).getBoolean(0) && rows(0).isNullAt(1))
    assert(!rows(1).getBoolean(0) && rows(1).getDouble(1) == 2.5)
  }

  test("ns→sec floors — a ts 1ns below a boundary must not round up") {
    val rows = parse(
      "test,circuit=s1 a=1 1704067199999999999",
      "test,circuit=s1 a=1 1704067200000000000")
      .select("ts_sec").collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1704067199L, 1704067200L))
  }

  test("format → parse round-trip") {
    import spark.implicits._
    val df = Seq(("g", "u7", "active", 12.5, 1704067200L))
      .toDF("db", "sensor", "metric", "value", "sec")
      .select(Influx.formatLine(col("db"), col("sensor"), col("metric"),
        col("value"), col("sec")).as("line"))
    assert(df.head().getString(0) == "g,circuit=u7 active=12.500000 1704067200000000000")
    val back = Influx.parseLines(df, "line")
      .select("db", "sensor", "metric", "value", "ts_sec").head()
    assert(back == Row("g", "u7", "active", 12.5, 1704067200L))
  }
}
