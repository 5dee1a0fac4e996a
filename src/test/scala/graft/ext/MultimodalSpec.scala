package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins `Multimodal.imageDims` against REAL format bytes — the oracled
  * `multimodal_dims` key verifies the synthesize→parse round trip on
  * the sf tables; these fixtures prove the parser reads actual PNG /
  * JPEG headers, including the cases the round trip can't exercise
  * (decoy markers inside Exif payloads, FF fill bytes, truncation).
  */
class MultimodalSpec extends SparkSpec {

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  /** The canonical 67-byte 1×1 transparent PNG (valid CRCs). */
  private val png1x1 = hexBytes(
    "89504E470D0A1A0A" +               // signature
      "0000000D49484452" +             // IHDR length + type
      "0000000100000001" +             // width=1 height=1
      "08060000001F15C489" +           // depth/color/etc + CRC
      "0000000A49444154789C6300010000050001" +
      "0D0A2DB4" +
      "0000000049454E44AE426082")

  /** JPEG whose APP1 (Exif) payload CONTAINS the bytes FF C0 00 11 08
    * 00 99 00 77 — a substring scan would report 153×119 from the
    * decoy; the segment walk skips APP1 by its declared length and
    * reads the real SOF0: height=256, width=512.
    */
  private val jpegExifDecoy = hexBytes(
    "FFD8" +
      "FFE10011" +                     // APP1, length 17
      "457869660000" + "FFC000110800990077" + // Exif\0\0 + DECOY bytes
      "FFC0" + "0011" + "08" + "0100" + "0200" + // real SOF0 h=256 w=512
      "03010011000211010311" +
      "FFDA000C03010002110311003F00" + // SOS
      "ABCD" + "FFD9")

  /** Progressive (SOF2) variant with an FF fill byte before the SOF
    * marker, which the walk must slide over (ITU T.81 §B.1.1.2).
    */
  private val jpegProgressiveFill = hexBytes(
    "FFD8" +
      "FFE00010" + "4A46494600010100004800480000" + // APP0 JFIF, len 16
      "FF" +                           // fill byte
      "FFC2" + "0011" + "08" + "0040" + "0030" + // SOF2 h=64 w=48
      "03010011000211010311" +
      "FFDA000C03010002110311003F00" + "FFD9")

  private def dims(payloads: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    val df = payloads.toDF("media_id", "payload")
    val d = Multimodal.imageDims(col("payload"))
    df.select(col("media_id"), d.getField("format").as("format"),
        d.getField("width").as("width"), d.getField("height").as("height"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
  }

  test("PNG IHDR: real 1x1 fixture parses as png 1x1") {
    assert(dims(Seq(0L -> png1x1))(0L) == (("png", 1L, 1L)))
  }

  test("JPEG walk skips decoy SOF bytes inside the Exif APP1 payload") {
    assert(dims(Seq(0L -> jpegExifDecoy))(0L) == (("jpeg", 512L, 256L)))
  }

  test("JPEG walk slides over FF fill bytes and reads progressive SOF2") {
    assert(dims(Seq(0L -> jpegProgressiveFill))(0L) == (("jpeg", 48L, 64L)))
  }

  test("truncation and garbage degrade to nulls, not errors") {
    val truncatedPng = png1x1.take(20) // IHDR width present, height cut
    val truncatedJpeg = jpegExifDecoy.take(6) // dies mid-APP1
    val garbage = "just some text bytes".getBytes("UTF-8")
    val d = dims(Seq(0L -> truncatedPng, 1L -> truncatedJpeg,
      2L -> garbage, 3L -> Array.emptyByteArray))
    assert(d(0L) == (("png", 1L, -1L)))   // width readable, height null
    assert(d(1L) == (("jpeg", -1L, -1L))) // walk runs out of bytes
    assert(d(2L) == (("unknown", -1L, -1L)))
    assert(d(3L) == (("unknown", -1L, -1L)))
  }

  // ---- avMeta fixtures: WAV / MP4 container headers ----------------

  /** Canonical 44.1 kHz 16-bit stereo WAV: fmt then data, 2 s of
    * audio declared (352800 bytes at 176400 B/s → 2000 ms).
    */
  private val wavCanonical = hexBytes(
    "52494646" + "24620500" + "57415645" + // RIFF size WAVE
      "666D7420" + "10000000" +            // "fmt " len=16
      "0100" + "0200" + "44AC0000" +       // PCM, 2ch, 44100
      "10B10200" + "0400" + "1000" +       // byteRate=176400, align, bits
      "64617461" + "20620500" +            // "data" size=352800
      "ABCD")                              // stub sample bytes

  /** WAV with an ODD-sized LIST chunk before fmt — the walk must add
    * the RIFF pad byte or it desyncs onto garbage.
    */
  private val wavOddList = hexBytes(
    "52494646" + "FFFF0000" + "57415645" +
      "4C495354" + "0B000000" +            // "LIST" len=11 (odd)
      "494E464F41424344454647" +           // 11 payload bytes
      "00" +                               // RIFF pad byte
      "666D7420" + "10000000" +
      "0100" + "0100" + "803E0000" +       // mono 16000 Hz
      "007D0000" + "0200" + "1000" +       // byteRate=32000
      "64617461" + "00FA0000")             // size=64000 → 2000 ms

  /** MP4 with v1 mvhd/tkhd AND an mdat (skipped by size) whose payload
    * contains the decoy bytes "moov" — a substring scan would walk
    * into it; the box walk skips mdat by its declared size.
    * timescale=600, duration=12345 → 20575 ms; track 1920×1080.
    */
  private val mp4V1Decoy = {
    def be(v: Long, n: Int) =
      f"$v%016X".takeRight(2 * n)
    hexBytes(
      be(16, 4) + "66747970" + "69736F6D" + "00000000" + // ftyp isom
        be(20, 4) + "6D646174" +                          // mdat size=20
        "6D6F6F76" + be(0xDEADBEEFL, 4) + be(0xCAFEL, 4) + // DECOY "moov"
        be(240, 4) + "6D6F6F76" +                         // real moov
        be(120, 4) + "6D766864" + "01" + "000000" +       // mvhd v1
        "00" * 16 +                                       // creation+mod (8+8)
        be(600, 4) + be(12345, 8) +                       // timescale, duration
        "00" * 80 +                                       // rate..next_track_id
        be(112, 4) + "7472616B" +                         // trak
        be(104, 4) + "746B6864" + "01" + "000000" +       // tkhd v1
        "00" * 84 +                                       // creation..matrix
        be(1920, 2) + "0000" + be(1080, 2) + "0000")      // 16.16 w/h
  }

  private def av(payloads: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    val df = payloads.toDF("media_id", "payload")
    val m = Multimodal.avMeta(col("payload"))
    df.select(col("media_id"), m.getField("format").as("f"),
        m.getField("sample_rate").as("sr"),
        m.getField("duration_ms").as("d"),
        m.getField("width").as("w"), m.getField("height").as("h"))
      .collect().map { r =>
        def g(i: Int) = if (r.isNullAt(i)) -1L else r.getLong(i)
        r.getLong(0) -> ((r.getString(1), g(2), g(3), g(4), g(5)))
      }.toMap
  }

  test("WAV: canonical fmt+data header parses rate and duration") {
    assert(av(Seq(0L -> wavCanonical))(0L) ==
      (("wav", 44100L, 2000L, -1L, -1L)))
  }

  test("WAV: odd-sized LIST chunk before fmt — pad byte honored") {
    assert(av(Seq(0L -> wavOddList))(0L) ==
      (("wav", 16000L, 2000L, -1L, -1L)))
  }

  test("MP4: v1 mvhd/tkhd parse; mdat with decoy 'moov' bytes skipped " +
    "by size") {
    assert(av(Seq(0L -> mp4V1Decoy))(0L) ==
      (("mp4", -1L, 20575L, 1920L, 1080L)))
  }

  test("MP4: a corrupt child inside trak pops back to moov — mvhd " +
    "duration still parses (the r11 review fix)") {
    def be(v: Long, n: Int) = f"$v%016X".takeRight(2 * n)
    val corruptTrak = hexBytes(
      be(16, 4) + "66747970" + "69736F6D" + "00000000" + // ftyp
        be(132, 4) + "6D6F6F76" +                        // moov
        be(16, 4) + "7472616B" +                         // trak
        be(0, 4) + "78787878" +                          // child size=0: bad
        be(108, 4) + "6D766864" + "00000000" +           // mvhd v0 AFTER trak
        "00" * 8 + be(1000, 4) + be(5000, 4) + "00" * 80)
    assert(av(Seq(0L -> corruptTrak))(0L) ==
      (("mp4", -1L, 5000L, -1L, -1L)))
  }

  // ---- imageDimsExt fixtures: GIF / BMP / WebP-VP8X ----------------

  private def dimsExt(payloads: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    val df = payloads.toDF("media_id", "payload")
    val d = Multimodal.imageDimsExt(col("payload"))
    df.select(col("media_id"), d.getField("format").as("format"),
        d.getField("width").as("width"), d.getField("height").as("height"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
  }

  test("imageDimsExt: GIF89a LE u16 dims; WebP VP8X canvas-1 u24 dims") {
    val gif = hexBytes("474946383961" + "4001" + "C800" + "F70000") // 320×200
    val webp = hexBytes("52494646" + "1E000000" + "57454250" +
      "56503858" + "0A000000" + "00000000" +
      "7F020000".take(6) + "DF010000".take(6)) // w-1=639, h-1=479 (u24 LE)
    val d = dimsExt(Seq(0L -> gif, 1L -> webp))
    assert(d(0L) == (("gif", 320L, 200L)))
    assert(d(1L) == (("webp", 640L, 480L)))
  }

  test("imageDimsExt: BMP negative (top-down) height reads |h|; " +
    "BITMAPCOREHEADER u16 dims; garbage stays unknown") {
    def le(v: Long, n: Int) = (0 until n)
      .map(i => f"${(v >> (8 * i)) & 0xff}%02X").mkString
    val topDown = hexBytes("424D" + le(122, 4) + le(0, 4) + le(54, 4) +
      le(40, 4) + le(640, 4) + le((-480L) & 0xFFFFFFFFL, 4) + le(0, 8))
    val core = hexBytes("424D" + le(62, 4) + le(0, 4) + le(26, 4) +
      le(12, 4) + le(100, 2) + le(50, 2) + le(1, 2) + le(8, 2))
    val junk = "no image here".getBytes("UTF-8")
    val d = dimsExt(Seq(0L -> topDown, 1L -> core, 2L -> junk))
    assert(d(0L) == (("bmp", 640L, 480L)))
    assert(d(1L) == (("bmp", 100L, 50L)))
    assert(d(2L) == (("unknown", -1L, -1L)))
  }

  test("avMeta truncation/garbage degrade to nulls, not errors") {
    val d = av(Seq(
      0L -> wavCanonical.take(20),          // dies before fmt fields
      1L -> mp4V1Decoy.take(40),            // dies inside mdat
      2L -> "plain text".getBytes("UTF-8"),
      3L -> Array.emptyByteArray))
    assert(d(0L) == (("wav", -1L, -1L, -1L, -1L)))
    assert(d(1L) == (("mp4", -1L, -1L, -1L, -1L)))
    assert(d(2L) == (("unknown", -1L, -1L, -1L, -1L)))
    assert(d(3L) == (("unknown", -1L, -1L, -1L, -1L)))
  }
}
