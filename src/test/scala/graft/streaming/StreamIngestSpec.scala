package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.{MetricDef, SensorConfig, SensorStore}

/** Streaming influx ingest → store upsert → batch read-back; late data
  * lands in its historical slot (the reference's in-place late-write
  * semantics, `database.py:425-488`).
  */
class StreamIngestSpec extends SparkSpec {

  test("micro-batched influx lines upsert into the store; late data in place") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("graft-stream").toString
    val store = new SensorStore(spark, dir)
    store.createSensor(SensorConfig("test", "s1", "1s",
      Seq(MetricDef(Seq("active")), MetricDef(Seq("reactive")))))

    val t0 = 1704067200L
    val src = MemoryStream[String]
    val points = StreamIngest.parse(src.toDF().withColumnRenamed("value", "line"),
      "line", "test", "s1")
    val query = StreamIngest.writer(points, store, "test", "s1").start()
    try {
      src.addData(
        s"test,circuit=s1 active=9,reactive=10 ${t0}000000000",
        s"test,circuit=s1 active=11 ${(t0 + 5)}000000000")
      query.processAllAvailable()
      // second batch: an update to t0 and a LATE point before it
      src.addData(
        s"test,circuit=s1 reactive=20 ${t0}000000000",
        s"test,circuit=s1 active=7 ${(t0 - 100)}000000000")
      query.processAllAvailable()
    } finally query.stop()

    val out = store.read("test", "s1").collect()
    assert(out.length == 3)
    val byTs = out.map(r =>
      r.getTimestamp(0).toInstant.getEpochSecond ->
        (if (r.isNullAt(1)) None else Some(r.getFloat(1)),
          if (r.isNullAt(2)) None else Some(r.getFloat(2)))).toMap
    assert(byTs(t0 - 100) == (Some(7.0f), None))        // late write landed
    assert(byTs(t0) == (Some(9.0f), Some(20.0f)))       // cell updated, other kept
    assert(byTs(t0 + 5) == (Some(11.0f), None))
  }

  test("watermarked windowed stats aggregate per event-time window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val t0 = 1704067200L
    val src = MemoryStream[String]
    val points = StreamIngest.parse(src.toDF().withColumnRenamed("value", "line"),
      "line", "test", "w1")
    val stats = StreamIngest.windowedStats(points, "5 minutes", "10 minutes")
    val query = stats.writeStream.outputMode("complete")
      .format("memory").queryName("wstats").start()
    try {
      src.addData(
        s"test,circuit=w1 v=1 ${t0}000000000",
        s"test,circuit=w1 v=3 ${(t0 + 60)}000000000",
        s"test,circuit=w1 v=10 ${(t0 + 301)}000000000") // next window
      query.processAllAvailable()
    } finally query.stop()

    val rows = spark.sql(
      "SELECT * FROM wstats ORDER BY window_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(2) == 2L && rows(0).getDouble(3) == 2.0)
    assert(rows(1).getLong(2) == 1L && rows(1).getDouble(5) == 10.0)
  }
}
