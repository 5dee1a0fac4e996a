package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star §2.F): media as opaque
  * `BinaryType` payloads + typed metadata structs, with
  * decode/feature/resize steps as per-partition batch functions.
  *
  * The actual codec work (image decode, resampling, frame extraction)
  * needs native libraries that are intentionally NOT in this
  * environment, so `decodeStub` computes deterministic fake features
  * from the bytes; the Spark-side contract — schema, batching,
  * partition-parallel map, no driver collection — is real. Swap
  * `fakeFeatures` for a JNI/FFI codec and nothing else changes.
  */
object Multimodal {

  /** Canonical multimodal record schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Wrap a text table as a binary media table (UTF-8 payload) — the
    * test stand-in for real image/audio bytes.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))

  /** STUB decode/feature-extract: deterministic features of the raw
    * bytes (length, first byte, 256-byte "frame" count). A real
    * implementation decodes `payload` per the `meta.mime`; it would be
    * a `mapPartitions` over batches with the same output schema.
    */
  def decodeStub(df: DataFrame): DataFrame =
    df.select(
      col("media_id"),
      length(col("payload")).as("n_bytes"),
      coalesce(ascii(substring(col("payload").cast(StringType), 1, 1)),
        lit(0)).as("first_byte"),
      floor(length(col("payload")) / lit(256.0)).cast(LongType).as("n_frames"))

  /** Deterministic "frame sample": byte offsets of `n` evenly spaced
    * frames — the partition/batch shape a real video sampler would use.
    */
  def frameOffsets(df: DataFrame, n: Int): DataFrame =
    df.withColumn("frame_offsets",
      transform(sequence(lit(0), lit(n - 1)),
        i => (i * greatest(length(col("payload")), lit(1)) / n).cast(LongType)))

  /** Typed record for the partition-batch decode path. */
  case class MediaRecord(media_id: Long, payload: Array[Byte], mime: String)

  /** Decoded features; a real codec would fill these from pixels /
    * samples. `thumb` stands in for a resized image (fixed-size byte
    * grid), `frame_bytes` for sampled frame payloads.
    */
  case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      byte_mean: Double,
      thumb: Array[Byte],
      frame_bytes: Array[Long])

  /** The REAL multimodal execution shape: a per-partition batch
    * function over a typed Dataset (Scala's `mapPartitions` ≈ pandas'
    * `mapInPandas`) — codec state (decoder handles, model weights) is
    * initialized once per partition, then streamed over the records
    * without materializing the partition. The decode itself is a
    * deterministic STUB (this environment ships no media codecs): a
    * real implementation swaps `decodeOne` and nothing else — schema,
    * batching, partitioning, and the executor-side lifecycle stay
    * exactly as tested.
    */
  def decodeBatch(media: Dataset[MediaRecord], thumbSize: Int = 16,
                  nFrames: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // per-partition init: a real decoder/codec pool would open here
      val codec = new StubCodec(thumbSize, nFrames)
      records.map(codec.decodeOne)
    }
  }

  /** Deterministic fake codec: "thumbnail" = byte downsample to a fixed
    * grid, "frames" = evenly spaced byte values. Stateless but modelled
    * as a per-partition object to mirror real codec lifecycle.
    */
  private class StubCodec(thumbSize: Int, nFrames: Int) extends Serializable {
    def decodeOne(r: MediaRecord): MediaFeatures = {
      val b = if (r.payload == null) Array.emptyByteArray else r.payload
      if (b.isEmpty)
        return MediaFeatures(r.media_id, 0L, 0.0,
          Array.fill[Byte](thumbSize)(0), Array.fill[Long](nFrames)(0L))
      val n = b.length
      val thumb = Array.tabulate(thumbSize)(i => b(math.min(i * n / thumbSize, n - 1)))
      val frames = Array.tabulate(nFrames)(i =>
        b(math.min(i * n / nFrames, n - 1)).toLong & 0xffL)
      val mean = b.map(_.toLong & 0xffL).sum.toDouble / b.length
      MediaFeatures(r.media_id, b.length.toLong, mean, thumb, frames)
    }
  }
}
