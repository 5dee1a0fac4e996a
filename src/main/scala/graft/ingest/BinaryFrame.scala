package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset}

/** Binary wire-frame codec (reference A-2): the reference's binary read
  * response is `float64 dates || float32 value-matrix` decoded with
  * `np.frombuffer` (`client.py:549-560`, values dtype `__init__.py:26`).
  * Here the same layout decodes distributed: a typed `mapPartitions`
  * over payload records — ByteBuffer views, zero copies beyond the
  * payload itself, no driver involvement — emitting long-format points.
  * The encode side exists for round-trips and for serving the same
  * frame format back out.
  */
object BinaryFrame {

  /** One wire frame: `nRows` float64 epoch-seconds, then an
    * `nRows × nMetrics` row-major float32 matrix.
    */
  case class Frame(frame_id: Long, n_rows: Int, n_metrics: Int,
                   payload: Array[Byte])

  case class Point(frame_id: Long, row: Int, metric_idx: Int,
                   ts_sec: Double, value: Float)

  /** Little-endian encode (numpy default byte order). */
  def encode(frameId: Long, dates: Array[Double],
             values: Array[Array[Float]]): Frame = {
    require(values.length == dates.length, "one value row per date")
    val nMetrics = if (values.isEmpty) 0 else values(0).length
    val buf = ByteBuffer.allocate(dates.length * 8 +
      dates.length * nMetrics * 4).order(ByteOrder.LITTLE_ENDIAN)
    dates.foreach(buf.putDouble)
    values.foreach { row =>
      require(row.length == nMetrics, "ragged value matrix")
      row.foreach(buf.putFloat)
    }
    Frame(frameId, dates.length, nMetrics, buf.array())
  }

  /** Distributed decode: one task per partition of frames; each frame
    * unpacks to `n_rows × n_metrics` long-format points. A malformed
    * payload (wrong byte count) throws a per-frame
    * [[graft.core.InvalidDataWriteException]] — mirroring the
    * reference's corrupt-chunk byte-count guard (`database.py:470-476`).
    */
  def decode(frames: Dataset[Frame]): Dataset[Point] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      it.flatMap { f =>
        val expected = f.n_rows * 8 + f.n_rows * f.n_metrics * 4
        if (f.payload.length != expected)
          throw new graft.core.InvalidDataWriteException(
            s"Binary frame ${f.frame_id}: expected $expected bytes, " +
              s"got ${f.payload.length}")
        val buf = ByteBuffer.wrap(f.payload).order(ByteOrder.LITTLE_ENDIAN)
        val dates = Array.fill(f.n_rows)(buf.getDouble)
        for {
          r <- (0 until f.n_rows).iterator
          m <- (0 until f.n_metrics).iterator
        } yield Point(f.frame_id, r, m, dates(r), buf.getFloat(
          f.n_rows * 8 + (r * f.n_metrics + m) * 4))
      }
    }
  }

  /** Decoded points joined back to metric names, as the store's
    * canonical long ingest shape `(ts, metric, value)`.
    */
  def toPoints(decoded: Dataset[Point], metricNames: Seq[String]): DataFrame = {
    import decoded.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val names = metricNames.zipWithIndex
      .map { case (n, i) => (i, n) }.toDF("metric_idx", "metric")
    decoded.toDF().join(broadcast(names), "metric_idx")
      .select(timestamp_seconds(col("ts_sec")).as("ts"), col("metric"),
        col("value").cast("double").as("value"))
  }
}
