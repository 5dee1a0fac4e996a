package graft.expr

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec
import graft.expr.GramStats.gram_stats

/** The one-pass Gram aggregate must reproduce the exploded
  * decimal-sum formulation it replaced (the r11 `embedding_corr_audit`
  * shape) to the 1e-12 fixed-point grain, independent of partitioning
  * (merge path + serde both exercised by a repartition).
  */
class GramStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val d12 = DecimalType(38, 12)

  private def exploded(dim: Int) = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("embedding"))
    val dims = e.select(posexplode(col("embedding")))
      .select((col("pos") + 1).cast("int").as("d"),
        col("col").cast("double").as("x"))
      .groupBy("d")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(d12)).cast("double").as("sx"),
        sum((col("x") * col("x")).cast(d12)).cast("double").as("sxx"))
    val cells = e
      .select(col("embedding"), posexplode(col("embedding")))
      .select(col("embedding"), (col("pos") + 1).cast("int").as("di"),
        col("col").cast("double").as("xi"))
      .select(col("di"), col("xi"),
        posexplode(slice(col("embedding"), col("di") + 1,
          lit(dim) - col("di"))))
      .select(col("di"),
        (col("di") + col("pos") + 1).cast("int").as("dj"),
        (col("xi") * col("col").cast("double")).as("xy"))
      .groupBy("di", "dj")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("xy").cast(d12)).cast("double").as("sxy"))
    (dims, cells)
  }

  private def gram(dim: Int, parts: Int) = {
    val g = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("embedding"))
      .repartition(parts)
      .agg(gram_stats(col("embedding"), dim).as("g"))
    val dims = g.select(explode(col("g.dims")).as("t"))
      .select(col("t.d").as("d"), col("t.n").as("n"),
        col("t.sx").cast("double").as("sx"),
        col("t.sxx").cast("double").as("sxx"))
    val cells = g.select(explode(col("g.cells")).as("t"))
      .select(col("t.di").as("di"), col("t.dj").as("dj"),
        col("t.n_vecs").as("n_vecs"),
        col("t.sxy").cast("double").as("sxy"))
    (dims, cells)
  }

  test("matches the exploded decimal-sum formulation on the real " +
    "fixture, across partitionings (merge + serde path)") {
    val (ed, ec) = exploded(64)
    val expDims = ed.orderBy("d").collect()
    val expCells = ec.orderBy("di", "dj").collect()
    for (parts <- Seq(1, 7)) {
      val (gd, gc) = gram(64, parts)
      val gotDims = gd.orderBy("d").collect()
      val gotCells = gc.orderBy("di", "dj").collect()
      assert(gotDims.length == 64 && gotCells.length == 64 * 63 / 2)
      expDims.zip(gotDims).foreach { case (e, g) =>
        assert(e.getInt(0) == g.getInt(0) && e.getLong(1) == g.getLong(1))
        assert(math.abs(e.getDouble(2) - g.getDouble(2)) < 1e-9,
          s"sx mismatch at d=${e.getInt(0)} parts=$parts")
        assert(math.abs(e.getDouble(3) - g.getDouble(3)) < 1e-9,
          s"sxx mismatch at d=${e.getInt(0)} parts=$parts")
      }
      expCells.zip(gotCells).foreach { case (e, g) =>
        assert(e.getInt(0) == g.getInt(0) && e.getInt(1) == g.getInt(1) &&
          e.getLong(2) == g.getLong(2))
        assert(math.abs(e.getDouble(3) - g.getDouble(3)) < 1e-9,
          s"sxy mismatch at (${e.getInt(0)},${e.getInt(1)}) parts=$parts")
      }
    }
  }

  test("deterministic across partitionings: exact fixed-point sums " +
    "are bit-identical for 1 vs 13 partitions") {
    val a = gram(64, 1)._2.orderBy("di", "dj").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(3)))
    val b = gram(64, 13)._2.orderBy("di", "dj").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(3)))
    assert(a.sameElements(b))
  }

  test("null semantics: null elements count into n but not sums; " +
    "null arrays contribute nothing; short arrays only their prefix") {
    val rows = Seq(
      org.apache.spark.sql.Row(Seq[Any](1.0f, 2.0f, 3.0f)),
      org.apache.spark.sql.Row(Seq[Any](2.0f, null, 1.0f)),
      org.apache.spark.sql.Row(Seq[Any](0.5f)), // short: d=1 only
      org.apache.spark.sql.Row(null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, containsNull = true)))))
    val g = df.agg(gram_stats(col("embedding"), 3).as("g"))
    val dims = g.select(explode(col("g.dims")).as("t"))
      .select(col("t.d"), col("t.n"), col("t.sx").cast("double"))
      .orderBy("t.d").collect()
    // d=1: rows 1,2,3 → n=3, sx=1+2+0.5 ; d=2: rows 1,2 → n=2 but the
    // null element still counts, sx=2 ; d=3: n=2, sx=3+1
    assert(dims.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      == Seq((1, 3L, 3.5), (2, 2L, 2.0), (3, 2L, 4.0)))
    val cells = g.select(explode(col("g.cells")).as("t"))
      .select(col("t.di"), col("t.dj"), col("t.n_vecs"),
        col("t.sxy").cast("double"))
      .orderBy("t.di", "t.dj").collect()
    // (1,2): both full rows emit the pair row (n=2) but row 2's product
    // is null → sxy=1*2 ; (1,3): 1*3 + 2*1 ; (2,3): 2*3 + null
    assert(cells.map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
      r.getDouble(3))).toSeq
      == Seq((1, 2, 2L, 2.0), (1, 3, 2L, 5.0), (2, 3, 2L, 6.0)))
  }

  test("randomized: arbitrary arrays (nulls, ragged lengths, extreme " +
    "magnitudes) agree with a driver-side BigDecimal reference and are " +
    "partitioning-invariant") {
    val rnd = new scala.util.Random(20260815L)
    val dim = 5
    // ragged lengths 0..7 (beyond dim exercises the cap), ~15% null
    // elements, ~10% null arrays, magnitudes spanning 1e-6..1e4
    val data: Seq[Array[java.lang.Float]] = (0 until 400).map { _ =>
      if (rnd.nextDouble() < 0.1) null
      else Array.fill(rnd.nextInt(8)) {
        if (rnd.nextDouble() < 0.15) null.asInstanceOf[java.lang.Float]
        else java.lang.Float.valueOf(
          ((rnd.nextDouble() * 2 - 1) *
            math.pow(10, rnd.nextInt(11) - 6)).toFloat)
      }
    }
    // driver-side reference with the SAME dual-path scale-12 grain as
    // GramStats.addScaled (long fast path; BigDecimal past 2^52 where
    // the extreme-magnitude products land — this fixture exercises it)
    def scaled(v: Double): java.math.BigDecimal = {
      val mag = math.abs(v) * 1e12
      if (mag <= 4.5e15) {
        val r = math.floor(mag + 0.5).toLong
        java.math.BigDecimal.valueOf(if (v < 0) -r else r, 12)
      } else new java.math.BigDecimal(java.lang.Double.toString(v))
        .setScale(12, java.math.RoundingMode.HALF_UP)
    }
    val nC = dim * (dim - 1) / 2
    val refN = new Array[Long](nC)
    val refS = Array.fill(nC)(java.math.BigDecimal.ZERO)
    val refNnz = new Array[Long](nC)
    data.filter(_ != null).foreach { arr =>
      val n = math.min(arr.length, dim)
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val idx = i * (2 * dim - i - 1) / 2 + (j - i - 1)
          refN(idx) += 1
          if (arr(i) != null && arr(j) != null) {
            refNnz(idx) += 1
            refS(idx) = refS(idx).add(
              scaled(arr(i).doubleValue * arr(j).doubleValue))
          }
          j += 1
        }
        i += 1
      }
    }
    val rows = data.map(a => org.apache.spark.sql.Row(
      if (a == null) null else a.toSeq))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true))))
    for (parts <- Seq(1, 11)) {
      val got = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, parts), schema)
        .agg(gram_stats(col("embedding"), dim).as("g"))
        .select(explode(col("g.cells")).as("t"))
        .select(col("t.di"), col("t.dj"), col("t.n_vecs"), col("t.sxy"))
        .orderBy("t.di", "t.dj").collect()
      assert(got.length == nC)
      got.foreach { r =>
        val idx = (r.getInt(0) - 1) * (2 * dim - r.getInt(0)) / 2 +
          (r.getInt(1) - r.getInt(0) - 1)
        assert(r.getLong(2) == refN(idx),
          s"n_vecs mismatch at (${r.getInt(0)},${r.getInt(1)}) parts=$parts")
        if (refNnz(idx) == 0) assert(r.isNullAt(3))
        else assert(r.getDecimal(3).compareTo(refS(idx)) == 0,
          s"sxy mismatch at (${r.getInt(0)},${r.getInt(1)}) " +
            s"parts=$parts: got ${r.getDecimal(3)}, want ${refS(idx)}")
      }
    }
  }

  test("long-lane spill keeps sums exact past the spill threshold") {
    val buf = new GramBuffer(2)
    // drive the single cell's long lane over SpillAt twice
    val big = GramBuffer.SpillAt - 5L
    buf.addCell(0, big); buf.addCell(0, 7L)  // spills
    buf.addCell(0, big); buf.addCell(0, 9L)  // spills again
    val total = buf.total(buf.cS, buf.cSBig, 0)
    assert(total ==
      java.math.BigDecimal.valueOf(big, 12)
        .add(java.math.BigDecimal.valueOf(big, 12))
        .add(java.math.BigDecimal.valueOf(16L, 12)))
  }
}
