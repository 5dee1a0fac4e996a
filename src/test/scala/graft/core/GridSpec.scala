package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Grid-snap properties (reference `chunker.py:74-95`): snapping is
  * idempotent, never increases the timestamp, and lands on the grid.
  * Property-style over a seeded sample (deterministic).
  */
class GridSpec extends SparkSpec {

  test("snap is idempotent, floor, and on-grid (seeded property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val ticks = Seq(1L, 60L, 300L, 900L, 3600L, 86400L)
    val secs = Seq.fill(300)(math.abs(rnd.nextLong()) % 4102444800L)
    for (tick <- ticks) {
      val rows = secs.toDF("sec")
        .withColumn("snapped", Grid.snapSeconds(col("sec"), tick))
        .withColumn("twice", Grid.snapSeconds(col("snapped"), tick))
        .collect()
      rows.foreach { r =>
        val (sec, snapped, twice) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(snapped == twice, s"idempotent tick=$tick sec=$sec")
        assert(snapped <= sec && sec - snapped < tick, s"floor tick=$tick sec=$sec")
        assert(snapped % tick == 0, s"on grid tick=$tick sec=$sec")
      }
    }
  }

  test("posInChunk matches reference getpos arithmetic") {
    import spark.implicits._
    // 1h tick ⇒ chunk = 16384h; ts 10h into a chunk ⇒ pos 10
    val tick = 3600L
    val chunkDur = tick * Freq.ChunkRows
    val df = Seq(chunkDur * 3 + 10 * 3600 + 17).toDF("sec")
      .select(
        Grid.chunkStart(col("sec"), chunkDur).as("cs"),
        Grid.posInChunk(Grid.snapSeconds(col("sec"), tick), chunkDur, tick).as("pos"))
    val r = df.head()
    assert(r.getLong(0) == chunkDur * 3)
    assert(r.getLong(1) == 10L)
  }
}
