package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Fixed-size accumulator for [[GramStats]]: per-dimension first/second
  * moments plus the upper-triangle cross-moment (the Gram triangle),
  * all in exact fixed-point (scale-12 longs with a BigDecimal spill
  * lane) so partial-aggregate merge order can never change the result
  * — the same determinism contract as the `DECIMAL(38,12)` sums this
  * aggregate replaces (the row-explosion formulation that was the
  * board's slowest key through r11).
  *
  * Memory is O(d²) and independent of row count: d=64 → 64×4 + 2016×3
  * longs ≈ 55 KB per task buffer, so at 100 TB every executor carries
  * one constant-size buffer per partition, map-side combine collapses
  * the shuffle to one buffer per task, and no (row × pair) tuple is
  * ever materialized.
  */
final class GramBuffer(val dim: Int, val diagOnly: Boolean = false)
    extends Serializable {
  val nCells: Int = if (diagOnly) 0 else dim * (dim - 1) / 2
  // per-dimension: element-row count, non-null count, Σx, Σx²
  val dN = new Array[Long](dim)
  val dNnz = new Array[Long](dim)
  val dSx = new Array[Long](dim)
  val dSxx = new Array[Long](dim)
  var dSxBig: Array[java.math.BigDecimal] = _
  var dSxxBig: Array[java.math.BigDecimal] = _
  // per upper-triangle cell (i<j): pair-row count, non-null count, Σxy
  val cN = new Array[Long](nCells)
  val cNnz = new Array[Long](nCells)
  val cS = new Array[Long](nCells)
  var cSBig: Array[java.math.BigDecimal] = _

  @inline private def spillAdd(longs: Array[Long], idx: Int, v: Long,
                               bigs: () => Array[java.math.BigDecimal])
      : Unit = {
    val acc = longs(idx) + v
    if (acc > GramBuffer.SpillAt || acc < -GramBuffer.SpillAt) {
      val b = bigs()
      val prev = if (b(idx) == null) java.math.BigDecimal.ZERO else b(idx)
      b(idx) = prev.add(java.math.BigDecimal.valueOf(acc, 12))
      longs(idx) = 0L
    } else longs(idx) = acc
  }

  private def ensureDSxBig(): Array[java.math.BigDecimal] = {
    if (dSxBig == null) dSxBig = new Array(dim); dSxBig
  }
  private def ensureDSxxBig(): Array[java.math.BigDecimal] = {
    if (dSxxBig == null) dSxxBig = new Array(dim); dSxxBig
  }
  private def ensureCSBig(): Array[java.math.BigDecimal] = {
    if (cSBig == null) cSBig = new Array(nCells); cSBig
  }

  def addDimX(i: Int, scaled: Long): Unit =
    spillAdd(dSx, i, scaled, () => ensureDSxBig())
  def addDimXx(i: Int, scaled: Long): Unit =
    spillAdd(dSxx, i, scaled, () => ensureDSxxBig())
  def addCell(idx: Int, scaled: Long): Unit =
    spillAdd(cS, idx, scaled, () => ensureCSBig())
  def addDimXBig(i: Int, v: java.math.BigDecimal): Unit = {
    val b = ensureDSxBig()
    b(i) = (if (b(i) == null) java.math.BigDecimal.ZERO else b(i)).add(v)
  }
  def addDimXxBig(i: Int, v: java.math.BigDecimal): Unit = {
    val b = ensureDSxxBig()
    b(i) = (if (b(i) == null) java.math.BigDecimal.ZERO else b(i)).add(v)
  }
  def addCellBig(idx: Int, v: java.math.BigDecimal): Unit = {
    val b = ensureCSBig()
    b(idx) = (if (b(idx) == null) java.math.BigDecimal.ZERO else b(idx))
      .add(v)
  }

  /** Exact scale-12 total of a (long, spill) lane. */
  def total(longs: Array[Long], bigs: Array[java.math.BigDecimal],
            idx: Int): java.math.BigDecimal = {
    val l = java.math.BigDecimal.valueOf(longs(idx), 12)
    if (bigs == null || bigs(idx) == null) l else l.add(bigs(idx))
  }
}

object GramBuffer {
  /** Spill the long lane to BigDecimal past this magnitude: one more
    * max-size term (≤ 2^52) can then never overflow the long.
    */
  val SpillAt: Long = 4000000000000000000L
}

/** One-pass Gram/moment aggregate over a fixed-width embedding column.
  *
  * Replaces the double-`posexplode` covariance formulation (which
  * materialized d(d−1)/2 product rows per vector before the hash
  * aggregate — per-row work AND per-row allocation both O(d²) rows)
  * with a single `TypedImperativeAggregate` pass: per input row a tight
  * i<j loop over the array values updates a constant-size triangle
  * buffer. Per-term values are the scale-12 fixed-point image of the
  * double product — the same grain as `cast(xy AS DECIMAL(38,12))` —
  * and the summation is exact and order-independent.
  *
  * Output (one row): struct of
  *  - `dims`:  array<struct<d int, n long, sx decimal(38,12), sxx decimal(38,12)>>
  *  - `cells`: array<struct<di int, dj int, n_vecs long, sxy decimal(38,12)>>
  * with the same null semantics as the exploded formulation: counts
  * count every element/pair row, sums are null iff no non-null term
  * contributed (null array elements contribute to `n` but not sums).
  * Dimensions are 1-based in the output, matching the SQL oracle's
  * `range(1, dim+1)` indexing.
  */
case class GramStats(child: Expression, dim: Int,
                     diagOnly: Boolean = false,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramBuffer]
    with UnaryLike[Expression] {

  private val cellType = StructType(Seq(
    StructField("di", IntegerType, nullable = false),
    StructField("dj", IntegerType, nullable = false),
    StructField("n_vecs", LongType, nullable = false),
    StructField("sxy", DecimalType(38, 12))))
  private val dimType = StructType(Seq(
    StructField("d", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sx", DecimalType(38, 12)),
    StructField("sxx", DecimalType(38, 12))))

  override def dataType: DataType = StructType(Seq(
    StructField("dims", ArrayType(dimType, containsNull = false),
      nullable = false),
    StructField("cells", ArrayType(cellType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_stats needs an array<float>/array<double> column, got " +
        t.simpleString)
  }

  override def createAggregationBuffer(): GramBuffer =
    new GramBuffer(dim, diagOnly)

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Scale-12 fixed-point image of a double — the exact value
    * `round(v * 1e12)` (half away from zero), which agrees with the
    * decimal-cast grain to within one ulp of the 12th decimal. Falls
    * back to an exact BigDecimal term past 2^52 where the double
    * arithmetic would lose integer exactness (unreachable for
    * unit-scale embeddings; kept for generality).
    */
  @inline private def addScaled(v: Double, addL: Long => Unit,
                                addB: java.math.BigDecimal => Unit): Unit = {
    val mag = Math.abs(v) * 1e12
    if (mag <= 4.5e15) {
      val r = Math.floor(mag + 0.5).toLong
      addL(if (v < 0) -r else r)
    } else {
      addB(new java.math.BigDecimal(java.lang.Double.toString(v))
        .setScale(12, java.math.RoundingMode.HALF_UP))
    }
  }

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val n = if (len < dim) len else dim
    // local copy of the values + null mask: one array-access pass,
    // then the O(d²/2) pair loop runs over primitives only.
    val xs = new Array[Double](n)
    val ok = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        ok(i) = true
        xs(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      }
      i += 1
    }
    i = 0
    while (i < n) {
      buf.dN(i) += 1
      if (ok(i)) {
        buf.dNnz(i) += 1
        val x = xs(i)
        addScaled(x, buf.addDimX(i, _), buf.addDimXBig(i, _))
        addScaled(x * x, buf.addDimXx(i, _), buf.addDimXxBig(i, _))
      }
      if (!diagOnly) {
        var j = i + 1
        var idx = i * (2 * dim - i - 1) / 2 + (j - i - 1)
        while (j < n) {
          buf.cN(idx) += 1
          if (ok(i) && ok(j)) {
            buf.cNnz(idx) += 1
            addScaled(xs(i) * xs(j), buf.addCell(idx, _),
              buf.addCellBig(idx, _))
          }
          j += 1
          idx += 1
        }
      }
      i += 1
    }
    buf
  }

  override def merge(a: GramBuffer, b: GramBuffer): GramBuffer = {
    var i = 0
    while (i < dim) {
      a.dN(i) += b.dN(i)
      a.dNnz(i) += b.dNnz(i)
      val sx = b.total(b.dSx, b.dSxBig, i)
      if (sx.signum != 0) a.addDimXBig(i, sx)
      val sxx = b.total(b.dSxx, b.dSxxBig, i)
      if (sxx.signum != 0) a.addDimXxBig(i, sxx)
      i += 1
    }
    i = 0
    while (i < a.nCells) {
      a.cN(i) += b.cN(i)
      a.cNnz(i) += b.cNnz(i)
      val s = b.total(b.cS, b.cSBig, i)
      if (s.signum != 0) a.addCellBig(i, s)
      i += 1
    }
    a
  }

  override def eval(buf: GramBuffer): Any = {
    def dec(v: java.math.BigDecimal): Decimal = Decimal(scala.math.BigDecimal(v))
    val dims = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      val sx = if (buf.dNnz(i) == 0) null
        else dec(buf.total(buf.dSx, buf.dSxBig, i))
      val sxx = if (buf.dNnz(i) == 0) null
        else dec(buf.total(buf.dSxx, buf.dSxxBig, i))
      dims(i) = new GenericInternalRow(Array[Any](i + 1, buf.dN(i), sx, sxx))
      i += 1
    }
    val cells = new Array[Any](buf.nCells)
    i = 0
    var idx = 0
    while (idx < buf.nCells && i < dim) {
      var j = i + 1
      while (j < dim) {
        val s = if (buf.cNnz(idx) == 0) null
          else dec(buf.total(buf.cS, buf.cSBig, idx))
        cells(idx) =
          new GenericInternalRow(Array[Any](i + 1, j + 1, buf.cN(idx), s))
        j += 1
        idx += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(dims), new GenericArrayData(cells)))
  }

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dim)
    out.writeBoolean(buf.diagOnly)
    def writeLongs(a: Array[Long]): Unit = { a.foreach(out.writeLong) }
    writeLongs(buf.dN); writeLongs(buf.dNnz)
    writeLongs(buf.cN); writeLongs(buf.cNnz)
    // each sum lane folds (long + spill) into one scale-12 unscaled
    // BigInteger; Long.MinValue length sentinel marks a null spill so
    // the long lane round-trips alone.
    def writeSum(longs: Array[Long], bigs: Array[java.math.BigDecimal],
                 idx: Int): Unit = {
      out.writeLong(longs(idx))
      val big = if (bigs == null) null else bigs(idx)
      if (big == null) out.writeInt(-1)
      else {
        val bytes = big.unscaledValue.toByteArray
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    }
    var i = 0
    while (i < buf.dim) {
      writeSum(buf.dSx, buf.dSxBig, i)
      writeSum(buf.dSxx, buf.dSxxBig, i)
      i += 1
    }
    i = 0
    while (i < buf.nCells) { writeSum(buf.cS, buf.cSBig, i); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt()
    val buf = new GramBuffer(d, in.readBoolean())
    def readLongs(a: Array[Long]): Unit = {
      var i = 0; while (i < a.length) { a(i) = in.readLong(); i += 1 }
    }
    readLongs(buf.dN); readLongs(buf.dNnz)
    readLongs(buf.cN); readLongs(buf.cNnz)
    def readSum(longs: Array[Long],
                addB: java.math.BigDecimal => Unit, idx: Int): Unit = {
      longs(idx) = in.readLong()
      val n = in.readInt()
      if (n >= 0) {
        val b = new Array[Byte](n)
        in.readFully(b)
        addB(new java.math.BigDecimal(new java.math.BigInteger(b), 12))
      }
    }
    var i = 0
    while (i < d) {
      readSum(buf.dSx, buf.addDimXBig(i, _), i)
      readSum(buf.dSxx, buf.addDimXxBig(i, _), i)
      i += 1
    }
    i = 0
    while (i < buf.nCells) { readSum(buf.cS, buf.addCellBig(i, _), i); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): GramStats =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GramStats =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
  override def prettyName: String = "gram_stats"
}

object GramStats {
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** Column API: one-pass per-dim moments + Gram triangle. */
  def gram_stats(embedding: Column, dim: Int): Column =
    ColumnBridge.column(
      GramStats(ColumnBridge.expression(embedding), dim)
        .toAggregateExpression())

  /** Diagonal-only mode: per-dim moments (n, Σx, Σx²) with NO
    * cross-moment triangle — per-row work and buffer drop from O(d²)
    * to O(d), for consumers that need centroids/variances but not
    * covariances (e.g. the per-label drift audit). `cells` is empty.
    */
  def gram_diag(embedding: Column, dim: Int): Column =
    ColumnBridge.column(
      GramStats(ColumnBridge.expression(embedding), dim, diagOnly = true)
        .toAggregateExpression())
}
