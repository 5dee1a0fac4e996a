package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** Pins the native [[WavRms]] expression against the interpreted
  * `aggregate`-fold state machine it replaced (the pre-r13 body of
  * `Multimodal.audioRms`, preserved verbatim below): same step
  * budget, same chunk-walk rules (odd-size pad, null-size freeze),
  * same sample decode and truncation semantics — on the oracled key's
  * synthetic fixture shape AND adversarial payloads (truncated mid-
  * header, missing data chunk, data longer than the sample cap,
  * hostile 4 GiB chunk size, odd data size, non-WAV).
  */
class WavRmsSpec extends SparkSpec {

  // ---- the pre-r13 composable fold, verbatim -------------------------

  private def beInt(payload: Column, pos: Column, n: Int): Column =
    when(length(payload) >= pos + lit(n - 1),
      conv(hex(payload.substr(pos, lit(n))), 16, 10).cast(LongType))

  private def byteAt(payload: Column, pos: Column): Column =
    beInt(payload, pos, 1)

  private def leInt(payload: Column, pos: Column, n: Int): Column =
    when(length(payload) >= pos + lit(n - 1),
      (0 until n).map(i => byteAt(payload, pos + i) * lit(1L << (8 * i)))
        .reduce(_ + _))

  private def fourcc(payload: Column, pos: Column): Column =
    hex(payload.substr(pos, lit(4)))

  private val NullL = lit(null).cast(LongType)

  private def foldAudioRms(payload: Column, maxChunks: Int = 8,
                           maxSamples: Int = 256): Column = {
    val isWav = fourcc(payload, lit(1L)) === lit("52494646") &&
      fourcc(payload, lit(9L)) === lit("57415645")
    val steps = maxChunks + maxSamples + 1
    def mk(ph: Column, pos: Column, n: Column, ns: Column, ss: Column,
           mx: Column) =
      struct(ph.as("ph"), pos.as("pos"), n.as("n"), ns.as("ns"),
        ss.as("ss"), mx.as("mx"))
    val fold = aggregate(
      sequence(lit(1), lit(steps)),
      mk(lit(0), lit(13L), NullL, lit(0L), lit(0L), lit(0L)),
      (st, _) => {
        val ph = st.getField("ph")
        val pos = st.getField("pos")
        val id = fourcc(payload, pos)
        val size = leInt(payload, pos + 4, 4)
        val u = leInt(payload, pos, 2)
        val s = when(u >= 32768L, u - 65536L).otherwise(u)
        val n = st.getField("n")
        val ns = st.getField("ns")
        when(ph === 2, st)
          .when(ph === 0 && (pos.isNull || size.isNull),
            mk(lit(2), pos, NullL, lit(0L), lit(0L), lit(0L)))
          .when(ph === 0 && id === lit("64617461"),
            mk(lit(1), pos + 8,
              least(size / 2, lit(maxSamples.toLong)).cast(LongType),
              lit(0L), lit(0L), lit(0L)))
          .when(ph === 0,
            mk(lit(0), pos + 8 +
              shiftleft(shiftright(size + lit(1L), 1), 1), NullL,
              lit(0L), lit(0L), lit(0L)))
          .when(ns >= n || u.isNull,
            mk(lit(2), pos, n, ns, st.getField("ss"), st.getField("mx")))
          .otherwise(
            mk(lit(1), pos + 2, n, ns + 1,
              st.getField("ss") + s * s,
              greatest(st.getField("mx"), abs(s))))
      },
      st => when(st.getField("n").isNotNull &&
          st.getField("ns") === st.getField("n") &&
          st.getField("n") > 0,
        struct(st.getField("n").as("n_samples"),
          st.getField("ss").as("sum_sq"),
          st.getField("mx").as("peak"))))
    when(isWav, fold)
  }

  // ---- fixture builders ----------------------------------------------

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private def chunk(id: String, body: Array[Byte],
                    declared: Option[Long] = None): Array[Byte] =
    id.getBytes("UTF-8") ++ le(declared.getOrElse(body.length.toLong), 4) ++
      body

  private def wav(chunks: Array[Byte]*): Array[Byte] =
    "RIFF".getBytes("UTF-8") ++ le(1000L, 4) ++
      "WAVE".getBytes("UTF-8") ++ chunks.flatten

  private def samples(vals: Seq[Int]): Array[Byte] =
    vals.flatMap(v => le(v.toLong & 0xffffL, 2)).toArray

  private def check(df: DataFrame): Unit = {
    val rows = df
      .select(col("id"), foldAudioRms(col("payload")).as("old"),
        WavRms.wav_rms(col("payload")).as("nw"))
      .orderBy("id").collect()
    for (r <- rows) {
      val o = if (r.isNullAt(1)) "null" else r.getStruct(1).toString
      val n = if (r.isNullAt(2)) "null" else r.getStruct(2).toString
      assert(o == n, s"id=${r.getLong(0)}: fold=$o native=$n")
    }
  }

  test("native ≡ fold on the oracled key's fixture shape (variable " +
    "LIST padding, fmt, 64-sample data; every 7th payload truncated " +
    "to 20 bytes)") {
    import spark.implicits._
    val rows = (0L until 40L).map { id =>
      val pad = (10 + (id % 7) * 2).toInt
      val smp = samples((0 until 64).map(i => ((id * 31 + i * 17) % 4096).toInt))
      val full = wav(
        chunk("LIST", Array.fill(pad)('x'.toByte)),
        chunk("fmt ", le(1L, 2) ++ le(1L, 2) ++ le(8000L, 4) ++
          le(16000L, 4) ++ le(2L, 2) ++ le(16L, 2)),
        chunk("data", smp))
      (id, if (id % 7 == 0) full.take(20) else full)
    }
    check(rows.toDF("id", "payload"))
  }

  test("RANDOMIZED native ≡ fold: 200 scalacheck chunk layouts — " +
    "random pre-data chunks (odd/even/zero sizes), lying declared " +
    "sizes, random sample counts across the cap, random truncation") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val preChunk = for {
      id <- Gen.oneOf("LIST", "JUNK", "fmt ", "bad")
      bodyLen <- Gen.chooseNum(0, 9)
      lie <- Gen.oneOf(0L, 0L, 0L, 1L, 3L, 0xFFFFFFF0L) // mostly honest
    } yield chunk(id, Array.fill(bodyLen)(0x42.toByte),
      declared = if (lie == 0L) None else Some(lie))
    val payload = for {
      pre <- Gen.chooseNum(0, 10).flatMap(Gen.listOfN(_, preChunk))
      nSamp <- Gen.chooseNum(0, 300)
      vals <- Gen.listOfN(nSamp, Gen.chooseNum(-32768, 32767))
      dataLie <- Gen.oneOf[Option[Long]](None, None, Some(nSamp * 2L + 5),
        Some(7L))
      cut <- Gen.chooseNum(0, 100) // percent kept
    } yield {
      val full = wav(pre :+ chunk("data", samples(vals),
        declared = dataLie): _*)
      full.take(math.max(1, full.length * cut / 100))
    }
    val cases = Gen.listOfN(200, payload)
      .apply(Gen.Parameters.default, Seed(777L)).get
    check(cases.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload"))
  }

  test("native ≡ fold on adversarial payloads: non-WAV, missing data, " +
    "sample-cap overflow, hostile 4GiB chunk size, odd data size, " +
    "signed samples, empty data, budget exhaustion") {
    import spark.implicits._
    val negSamples = samples(Seq(-32768, -1, 32767, 0, -12345, 30000))
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> "not a wav at all".getBytes("UTF-8"),
      2L -> wav(chunk("fmt ", le(1L, 2))), // no data chunk
      3L -> wav(chunk("data", samples(0 until 300 map (_ * 7)))), // > cap
      4L -> wav(chunk("LIST", Array.emptyByteArray,
        declared = Some(0xFFFFFFF0L))), // hostile size walks off the end
      5L -> wav(chunk("data", samples(Seq(1, 2, 3)) ++ Array(9.toByte),
        declared = Some(7L))), // odd size: n = 3
      6L -> wav(chunk("data", negSamples)), // signed decode + peak
      7L -> wav(chunk("data", Array.emptyByteArray)), // n = 0 -> null
      8L -> wav(chunk("data", samples(Seq(5, 6)),
        declared = Some(100L))), // declared > present: truncated -> null
      // 9: so many pre-data chunks the step budget (8 chunks) runs out
      9L -> wav((1 to 12).map(i =>
        chunk("JUNK", Array.fill(2)(i.toByte))) :+
        chunk("data", samples(Seq(1, 2))): _*),
      10L -> wav(chunk("junk", Array(1.toByte)), // odd chunk: pad byte
        chunk("data", samples(Seq(7, 8, 9)))))
    check(rows.toDF("id", "payload"))
    // and the known-value sanity: id 6 decodes signed int16
    val got = spark.createDataset(Seq((6L, wav(chunk("data", negSamples)))))
      .toDF("id", "payload")
      .select(WavRms.wav_rms(col("payload")).as("a"))
      .selectExpr("a.n_samples", "a.sum_sq", "a.peak").collect()(0)
    val exp = Seq(-32768, -1, 32767, 0, -12345, 30000)
    assert(got.getLong(0) == 6L)
    assert(got.getLong(1) == exp.map(v => v.toLong * v).sum)
    assert(got.getLong(2) == 32768L)
  }
}
