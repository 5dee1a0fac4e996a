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

  /** Big-endian unsigned integer from `n` bytes at 1-indexed `pos`
    * (null when the payload is too short). `conv(hex(substr))` keeps
    * the whole parse in codegen'd built-ins — no UDF.
    */
  private def beInt(payload: Column, pos: Column, n: Int): Column =
    when(length(payload) >= pos + lit(n - 1),
      conv(hex(payload.substr(pos, lit(n))), 16, 10).cast(LongType))

  private def byteAt(payload: Column, pos: Column): Column =
    beInt(payload, pos, 1)

  private val NullL = lit(null).cast(LongType)

  /** Image dimensions from raw header bytes — the honest core of
    * "decode" that needs NO codec library, as pure byte expressions:
    *
    *  - PNG: 8-byte signature, then the IHDR chunk is mandatory-first,
    *    so width/height are the big-endian u32s at fixed offsets 17/21
    *    (PNG spec §5.2/§11.2.2).
    *  - JPEG: markers are not at fixed offsets, so this walks the
    *    segment chain from SOI — skipping each variable-length segment
    *    by its OWN declared length — until a SOF marker (C0-C3, C5-C7,
    *    C9-CB, CD-CF), whose payload carries height/width at +5/+7.
    *    The walk (a fold over a bounded step sequence) is immune to
    *    decoy marker BYTES inside APPn payloads (e.g. Exif), which a
    *    substring scan would misread, and stops at SOS/EOI. FF fill
    *    bytes before a marker are skipped per the spec.
    *
    * Returns struct(format, width, height) with nulls for truncated or
    * unrecognized payloads. Everything stays inside whole-stage codegen
    * (conv/hex/substr/aggregate over a 32-element sequence); per-row
    * cost is bounded by `maxSegments`, independent of payload size —
    * exactly what a 100 TB media scan wants from a metadata pass.
    */
  def imageDims(payload: Column, maxSegments: Int = 32): Column = {
    val isPng = hex(payload.substr(lit(1), lit(8))) === lit("89504E470D0A1A0A") &&
      hex(payload.substr(lit(13), lit(4))) === lit("49484452")
    val isJpeg = hex(payload.substr(lit(1), lit(2))) === lit("FFD8")

    // JPEG marker walk: state = (pos, h, w, done); pos is 1-indexed at
    // the FF of the next marker. SOF variants per ITU T.81 Table B.1.
    val sofMarkers = Seq(0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF).map(_.toLong)
    val walk = aggregate(
      sequence(lit(1), lit(maxSegments)),
      struct(lit(3L).as("pos"), NullL.as("h"), NullL.as("w"),
        lit(false).as("done")),
      (st, _) => {
        val pos = st.getField("pos")
        val m1 = byteAt(payload, pos)
        val m2 = byteAt(payload, pos + 1)
        val segLen = beInt(payload, pos + 2, 2)
        def halt(h: Column, w: Column) =
          struct(pos.as("pos"), h.as("h"), w.as("w"), lit(true).as("done"))
        def advance(next: Column) =
          struct(next.as("pos"), NullL.as("h"), NullL.as("w"),
            lit(false).as("done"))
        when(st.getField("done"), st)
          // truncated / desynced: not at a marker — stop, no dims
          .when(m1.isNull || m1 =!= lit(0xFFL), halt(NullL, NullL))
          // FF fill byte before the marker proper: slide by one
          .when(m2 <=> lit(0xFFL), advance(pos + 1))
          .when(m2.isin(sofMarkers: _*),
            halt(beInt(payload, pos + 5, 2), beInt(payload, pos + 7, 2)))
          // SOS (entropy data follows — no SOF seen) or EOI: stop
          .when(m2 <=> lit(0xDAL) || m2 <=> lit(0xD9L), halt(NullL, NullL))
          // standalone markers (TEM, RST0-7): no length field
          .when(m2 <=> lit(0x01L) ||
            (m2 >= lit(0xD0L) && m2 <= lit(0xD7L)), advance(pos + 2))
          // variable-length segment: skip by its declared length
          .otherwise(advance(pos + 2 + coalesce(segLen, lit(1L << 40))))
      })

    when(isPng, struct(lit("png").as("format"),
      beInt(payload, lit(17), 4).as("width"),
      beInt(payload, lit(21), 4).as("height")))
      .when(isJpeg, struct(lit("jpeg").as("format"),
        walk.getField("w").as("width"), walk.getField("h").as("height")))
      .otherwise(struct(lit("unknown").as("format"),
        NullL.as("width"), NullL.as("height")))
  }

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
