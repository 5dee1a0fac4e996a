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
}
