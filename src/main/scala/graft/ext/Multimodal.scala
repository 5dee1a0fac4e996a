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

  /** Image dimensions for the FIXED-OFFSET header formats (r11) — the
    * formats whose dims sit at spec-pinned offsets, so no walk at all:
    *
    *  - GIF87a/GIF89a: logical-screen width/height as LE u16 at
    *    offsets 7/9 (GIF89a spec §18).
    *  - BMP: 'BM' + 12-byte file header, then BITMAPINFOHEADER with
    *    width/height as LE 32-bit at offsets 19/23.
    *  - WebP (VP8X extended): RIFF/WEBP container with a leading VP8X
    *    chunk; canvas width-1/height-1 as LE u24 at offsets 25/28.
    *
    * Same contract as [[imageDims]] (struct(format, width, height),
    * nulls on truncation, codegen'd byte expressions, consumption
    * through a projection barrier) and covered by the same PlanSpec
    * node-count budget.
    */
  def imageDimsExt(payload: Column): Column = {
    val isGif = hex(payload.substr(lit(1), lit(6))) === lit("474946383761") ||
      hex(payload.substr(lit(1), lit(6))) === lit("474946383961")
    val isBmp = hex(payload.substr(lit(1), lit(2))) === lit("424D")
    val isWebpX = hex(payload.substr(lit(1), lit(4))) === lit("52494646") &&
      hex(payload.substr(lit(9), lit(4))) === lit("57454250") &&
      hex(payload.substr(lit(13), lit(4))) === lit("56503858")
    when(isGif, struct(lit("gif").as("format"),
      leInt(payload, lit(7), 2).as("width"),
      leInt(payload, lit(9), 2).as("height")))
      .when(isWebpX, struct(lit("webp").as("format"),
        (leInt(payload, lit(25), 3) + 1).as("width"),
        (leInt(payload, lit(28), 3) + 1).as("height")))
      .when(isBmp, {
        // DIB header size at 15 picks the layout: 12 = BITMAPCOREHEADER
        // (u16 dims at 19/21); else BITMAPINFOHEADER+ (i32 dims at
        // 19/23 — height SIGNED: negative = top-down row order, the
        // magnitude is the pixel height)
        val dib = leInt(payload, lit(15), 4)
        val h32 = leInt(payload, lit(23), 4)
        val hSigned = when(h32 > Int.MaxValue.toLong, h32 - 4294967296L)
          .otherwise(h32)
        struct(lit("bmp").as("format"),
          when(dib === 12, leInt(payload, lit(19), 2))
            .otherwise(leInt(payload, lit(19), 4)).as("width"),
          when(dib === 12, leInt(payload, lit(21), 2))
            .otherwise(abs(hSigned)).as("height"))
      })
      .otherwise(struct(lit("unknown").as("format"),
        NullL.as("width"), NullL.as("height")))
  }

  /** Little-endian unsigned integer from `n` bytes at 1-indexed `pos`
    * (null when the payload is too short) — the RIFF/WAV byte order.
    */
  private def leInt(payload: Column, pos: Column, n: Int): Column =
    when(length(payload) >= pos + lit(n - 1),
      (0 until n).map(i => byteAt(payload, pos + i) * lit(1L << (8 * i)))
        .reduce(_ + _))

  /** Hex of the 4-byte tag at 1-indexed `pos` (chunk/box fourcc). */
  private def fourcc(payload: Column, pos: Column): Column =
    hex(payload.substr(pos, lit(4)))

  /** Audio/video container metadata from raw header bytes — the A/V
    * sibling of [[imageDims]], as pure codegen'd byte expressions:
    *
    *  - WAV (RIFF): chunks are not at fixed offsets (INFO `LIST` or
    *    `JUNK` chunks may precede `fmt `), so this walks the chunk
    *    chain from byte 13, skipping each chunk by its declared
    *    little-endian size (+1 pad byte when odd, per RIFF), until
    *    both `fmt ` (sample rate at +12, byte rate at +16 of the
    *    chunk) and `data` (payload size) are seen;
    *    duration_ms = ⌊data_size·1000 / byte_rate⌋.
    *  - MP4 (ISO BMFF): a bounded box-walk — top level to `moov`
    *    (skipping `ftyp`/`free`/`mdat` by their big-endian sizes),
    *    inside `moov` to `mvhd` (duration/timescale; version 0 and 1
    *    layouts both handled) and the first `trak`, inside that to
    *    `tkhd` (width/height as 16.16 fixed-point, v0/v1 offsets);
    *    duration_ms = ⌊duration·1000 / timescale⌋.
    *
    * Returns struct(format, sample_rate, duration_ms, width, height)
    * with nulls for truncated or unrecognized payloads. Like
    * [[imageDims]], every walk is an `aggregate` over a bounded step
    * sequence: per-row cost is capped by `maxBoxes`, independent of
    * payload size — a 100 TB media scan pays a metadata-pass price
    * (box SIZES are read, box bodies are never touched).
    *
    * PLAN-SIZE CONTRACT (the r10 lesson): Column trees are trees, not
    * DAGs — nesting one `aggregate()` inside another's bounds, or
    * reading fold output through several downstream expressions,
    * DUPLICATES the whole sub-tree per reference, and Catalyst
    * re-optimizes the multiplied tree on every execution (~49 s/run
    * at its worst). So the MP4 walk is ONE fold whose state machine
    * descends top-level → moov → trak and carries every extracted
    * field (timescale, duration, width, height) in its state; field
    * reads happen INSIDE the lambda (single tree, never duplicated),
    * and the fold output is referenced a bounded handful of times.
    * Callers must consume the returned struct through a projection
    * barrier (alias it, then `getField` the ATTRIBUTE — CollapseProject
    * keeps non-cheap multi-referenced aliases unmerged), never
    * `getField` this Column five times in one select. PlanSpec pins a
    * node-count budget on the whole byte-walk family.
    */
  def avMeta(payload: Column, maxBoxes: Int = 64): Column = {
    val isWav = fourcc(payload, lit(1L)) === lit("52494646") && // RIFF
      fourcc(payload, lit(9L)) === lit("57415645")              // WAVE
    val isMp4 = fourcc(payload, lit(5L)) === lit("66747970")    // ftyp

    // WAV chunk walk: state = (pos, sample_rate, byte_rate, data_size)
    val wavWalk = aggregate(
      sequence(lit(1), lit(maxBoxes)),
      struct(lit(13L).as("pos"), NullL.as("sr"), NullL.as("br"),
        NullL.as("ds")),
      (st, _) => {
        val pos = st.getField("pos")
        val id = fourcc(payload, pos)
        val size = leInt(payload, pos + 4, 4)
        val haveAll = st.getField("sr").isNotNull &&
          st.getField("ds").isNotNull
        val isFmt = id === lit("666D7420")  // "fmt "
        val isData = id === lit("64617461") // "data"
        when(haveAll || size.isNull, st)
          .otherwise(struct(
            (pos + 8 + size + pmod(size, lit(2))).as("pos"),
            coalesce(st.getField("sr"),
              when(isFmt, leInt(payload, pos + 12, 4))).as("sr"),
            coalesce(st.getField("br"),
              when(isFmt, leInt(payload, pos + 16, 4))).as("br"),
            coalesce(st.getField("ds"), when(isData, size)).as("ds")))
      },
      // finish lambda (r12, same contract as audioRms): synthesize the
      // FINAL output struct here, where the state is a 1-node
      // LambdaVariable — the r11 shape read sr/br/ds through four
      // external getFields, re-inlining the whole walk per reference
      st => struct(lit("wav").as("format"),
        st.getField("sr").as("sample_rate"),
        when(st.getField("br") > 0,
          floor(st.getField("ds") * lit(1000.0) / st.getField("br"))
            .cast(LongType)).as("duration_ms"),
        NullL.as("width"), NullL.as("height")))

    // ISO-BMFF box walk: ONE fold, descending state machine.
    // mode 0 = top-level scan for moov; 1 = inside moov (mvhd fields
    // read in-lambda, first trak entered); 2 = inside trak (tkhd
    // fields read in-lambda, then pop back to moov at `ret`).
    // `lim` bounds the current region; `ret` holds the moov end while
    // inside a trak. Field reads (version-dependent mvhd/tkhd offsets
    // per ISO 14496-12 §8.2.2/§8.3.2) happen at the moment the box is
    // found, so the payload-offset arithmetic lives once in this
    // single lambda instead of being re-inlined per downstream use.
    val mFalse = lit(false)
    val mp4Walk = aggregate(
      sequence(lit(1), lit(maxBoxes)),
      struct(mFalse.as("done"), lit(0).as("mode"),
        lit(1L).as("pos"), (length(payload) + 1).cast(LongType).as("lim"),
        NullL.as("ret"), mFalse.as("mvhdSeen"), mFalse.as("trakSeen"),
        NullL.as("ts"), NullL.as("dur"), NullL.as("w"), NullL.as("h")),
      (st, _) => {
        val mode = st.getField("mode")
        val pos = st.getField("pos")
        val lim = st.getField("lim")
        val size = beInt(payload, pos, 4)
        val typ = fourcc(payload, pos + 4)
        val ver = byteAt(payload, pos + 8)
        def keep(done: Column, m: Column, p: Column, l: Column, r: Column,
                 mvhd: Column, trak: Column, ts: Column, dur: Column,
                 w: Column, h: Column) =
          struct(done.as("done"), m.as("mode"), p.as("pos"), l.as("lim"),
            r.as("ret"), mvhd.as("mvhdSeen"), trak.as("trakSeen"),
            ts.as("ts"), dur.as("dur"), w.as("w"), h.as("h"))
        def same(done: Column, m: Column, p: Column, l: Column, r: Column) =
          keep(done, m, p, l, r, st.getField("mvhdSeen"),
            st.getField("trakSeen"), st.getField("ts"), st.getField("dur"),
            st.getField("w"), st.getField("h"))
        val freeze = same(lit(true), mode, pos, lim, st.getField("ret"))
        when(st.getField("done"), st)
          // trak exhausted — or a malformed child inside it — pop back
          // into moov so a corrupt trak can't cost the mvhd fields the
          // independent walks of the r10 version still recovered
          .when(mode === 2 && (pos.isNull || pos >= lim ||
              size.isNull || size < 8),
            same(mFalse, lit(1), lim, st.getField("ret"), NullL))
          // region exhausted / truncated / not a box: stop
          .when(pos.isNull || pos >= lim, freeze)
          .when(size.isNull || size < 8, freeze)
          .when(mode === 0 && typ === lit("6D6F6F76"), // moov: descend
            same(mFalse, lit(1), pos + 8, pos + size, NullL))
          .when(mode === 1 && typ === lit("6D766864") && // mvhd: read
            !st.getField("mvhdSeen"),
            keep(st.getField("trakSeen") && st.getField("w").isNotNull,
              lit(1), pos + size, lim, NullL,
              lit(true), st.getField("trakSeen"),
              when(ver === 0, beInt(payload, pos + 20, 4))
                .when(ver === 1, beInt(payload, pos + 28, 4)),
              when(ver === 0, beInt(payload, pos + 24, 4))
                .when(ver === 1, beInt(payload, pos + 32, 8)),
              st.getField("w"), st.getField("h")))
          .when(mode === 1 && typ === lit("7472616B") && // trak: descend
            !st.getField("trakSeen"),
            keep(mFalse, lit(2), pos + 8, pos + size, lim,
              st.getField("mvhdSeen"), lit(true), st.getField("ts"),
              st.getField("dur"), st.getField("w"), st.getField("h")))
          .when(mode === 2 && typ === lit("746B6864"), // tkhd: read, pop
            keep(st.getField("mvhdSeen"), lit(1), lim,
              st.getField("ret"), NullL, st.getField("mvhdSeen"), lit(true),
              st.getField("ts"), st.getField("dur"),
              // 16.16 fixed-point: the integer part is the leading u16
              when(ver === 0, beInt(payload, pos + 84, 2))
                .when(ver === 1, beInt(payload, pos + 96, 2)),
              when(ver === 0, beInt(payload, pos + 88, 2))
                .when(ver === 1, beInt(payload, pos + 100, 2))))
          .otherwise( // opaque box (ftyp/free/mdat/udta/…): skip by size
            same(mFalse, mode, pos + size, lim, st.getField("ret")))
      },
      // finish lambda: final mp4 struct synthesized over 1-node state
      // refs (five external getFields used to re-inline the walk 5×)
      st => struct(lit("mp4").as("format"),
        NullL.as("sample_rate"),
        when(st.getField("ts") > 0,
          floor(st.getField("dur") * lit(1000.0) / st.getField("ts"))
            .cast(LongType)).as("duration_ms"),
        st.getField("w").as("width"), st.getField("h").as("height")))

    // each walk appears EXACTLY once; CaseWhen's lazy branches also
    // skip the mp4 walk entirely on wav rows and vice versa
    when(isWav, wavWalk)
      .when(isMp4, mp4Walk)
      .otherwise(struct(lit("unknown").as("format"),
        NullL.as("sample_rate"), NullL.as("duration_ms"),
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
  /** RMS + peak of a PCM16LE WAV's `data` chunk — the first
    * BODY-reading operator in the family ([[avMeta]] reads only
    * chunk/box sizes; this one runs the data plane). Since r13 the
    * walk is the NATIVE [[graft.expr.WavRms]] expression: the previous
    * `aggregate`-fold state machine evaluated its per-step when-chain
    * interpreted per element, and the data plane (one step per sample)
    * made that the family's steady hot spot; the native port keeps the
    * fold's semantics bit-for-bit — step budget, chunk-pad and
    * truncation rules, the `min(size/2, maxSamples)` cap (WavRmsSpec
    * pins native ≡ fold on fixtures + edges).
    *
    * Per-row cost stays bounded by `maxChunks + maxSamples` regardless
    * of payload size. Returns struct(n_samples, sum_sq, peak), nulls
    * for truncated/unrecognized payloads. Same consumption contract as
    * [[avMeta]]: read the struct through a projection barrier so its
    * fields are attribute refs.
    */
  def audioRms(payload: Column, maxChunks: Int = 8,
               maxSamples: Int = 256): Column =
    graft.expr.WavRms.wav_rms(payload, maxChunks, maxSamples)

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
