package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** RIFF/WAVE RMS statistics as ONE native expression — the byte walk
  * `Multimodal.audioRms` previously ran as an interpreted `aggregate`
  * state-machine fold (ph 0 = chunk walk, ph 1 = one 16-bit LE sample
  * per step, ph 2 = frozen), ported step-for-step so every semantic —
  * the chunk/sample STEP BUDGET (`maxChunks + maxSamples + 1`
  * transitions, then freeze), the when-chain's null-size-before-id
  * ordering, RIFF odd-size pad bytes, `min(size/2, maxSamples)`
  * sample cap, truncation-inside-data ⇒ null, missing-data-chunk ⇒
  * null — survives bit-for-bit (WavRmsSpec pins the equivalence
  * against the fold, the DuckDB oracle pins the numbers).
  *
  * Returns `struct<n_samples long, sum_sq long, peak long>`, NULL for
  * non-WAV payloads or any failed walk. All positions below are
  * 0-based; the fold's 1-based `pos` maps as pos0 = pos − 1.
  */
case class WavRms(child: Expression, maxChunks: Int, maxSamples: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"wav_rms needs a binary column, got ${t.simpleString}")
    }

  @inline private def tag4(b: Array[Byte], pos0: Int): Int =
    ((b(pos0) & 0xff) << 24) | ((b(pos0 + 1) & 0xff) << 16) |
      ((b(pos0 + 2) & 0xff) << 8) | (b(pos0 + 3) & 0xff)

  private val Riff = 0x52494646 // "RIFF"
  private val Wave = 0x57415645 // "WAVE"
  private val Data = 0x64617461 // "data"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 12 || tag4(b, 0) != Riff || tag4(b, 8) != Wave)
      return null
    val steps = maxChunks + maxSamples + 1
    var ph = 0
    // LONG cursor: a hostile u32 chunk size (~4 GiB) must walk the
    // cursor past the payload and fail the NEXT bounds check, exactly
    // like the fold's long `pos` — an int cursor would wrap negative
    // and index out of bounds instead
    var pos0 = 12L // the fold starts at 1-based pos 13
    var n = -1L // −1 encodes the fold's NULL n
    var ns = 0L
    var ss = 0L
    var mx = 0L
    var step = 0
    while (step < steps && ph != 2) {
      if (ph == 0) {
        if (pos0 + 8 > b.length) { // size read null ⇒ freeze with n null
          ph = 2; n = -1L; ns = 0L; ss = 0L; mx = 0L
        } else {
          val p = pos0.toInt
          val size = (b(p + 4) & 0xffL) | ((b(p + 5) & 0xffL) << 8) |
            ((b(p + 6) & 0xffL) << 16) | ((b(p + 7) & 0xffL) << 24)
          if (tag4(b, p) == Data) {
            ph = 1
            n = math.min(size / 2, maxSamples.toLong)
            ns = 0L; ss = 0L; mx = 0L
            pos0 += 8
          } else {
            pos0 += 8 + (((size + 1) >> 1) << 1) // odd-size pad
          }
        }
      } else { // ph == 1
        if (ns >= n || pos0 + 2 > b.length) { // exhausted or truncated
          ph = 2
        } else {
          val p = pos0.toInt
          val u = (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8)
          val s = if (u >= 32768L) u - 65536L else u
          ss += s * s
          val a = math.abs(s)
          if (a > mx) mx = a
          ns += 1L
          pos0 += 2
        }
      }
      step += 1
    }
    if (n >= 0 && ns == n && n > 0) InternalRow(n, ss, mx) else null
  }

  override def prettyName: String = "wav_rms"

  override protected def withNewChildInternal(newChild: Expression)
      : WavRms = copy(child = newChild)
}

object WavRms {
  import org.apache.spark.sql.graftshim.ColumnBridge

  def wav_rms(payload: Column, maxChunks: Int = 8,
              maxSamples: Int = 256): Column =
    ColumnBridge.column(
      WavRms(ColumnBridge.expression(payload), maxChunks, maxSamples))
}
