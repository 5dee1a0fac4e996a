package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
}
