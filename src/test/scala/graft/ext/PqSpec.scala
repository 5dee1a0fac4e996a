package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product-quantization semantics on hand-computable vectors: codebook
  * shape, nearest-codeword encoding, and the exact-reconstruction
  * property (a vector that IS a codeword combination has ADC score
  * equal to its true cosine — quantization error zero).
  */
class PqSpec extends SparkSpec {

  import spark.implicits._

  // 4-dim space, m=2 subspaces of 2 dims; two seed rows → 2 codewords
  // per subspace. Unit-scale values keep the hand math easy.
  private def seeds = Seq(
    (1L, Seq(1.0, 0.0, 1.0, 0.0)),
    (2L, Seq(0.0, 1.0, 0.0, 1.0))).toDF("vec_id", "embedding")

  test("codebook: m x ncodes normalized sub-vectors, id order = code order") {
    val cb = Similarity.pqCodebook(seeds, "vec_id", "embedding", m = 2,
      subDim = 2).orderBy("sub", "code").collect()
    assert(cb.length == 4)
    // seed 1 normalizes to (1/sqrt2, 0, 1/sqrt2, 0): code 0, sub 0 = (.707, 0)
    val c00 = cb.find(r => r.getInt(1) == 0 && r.getInt(0) == 0).get
      .getSeq[Double](2)
    assert(math.abs(c00.head - 1.0 / math.sqrt(2)) < 1e-12 && c00(1) == 0.0)
    // seed 2 → code 1, sub 1 = (0, .707)
    val c11 = cb.find(r => r.getInt(1) == 1 && r.getInt(0) == 1).get
      .getSeq[Double](2)
    assert(c11.head == 0.0 && math.abs(c11(1) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("encode picks the nearest codeword per subspace") {
    val cb = Similarity.pqCodebook(seeds, "vec_id", "embedding", 2, 2)
    // first half ~ seed1's direction, second half ~ seed2's
    val corpus = Seq((10L, Seq(0.9, 0.1, 0.1, 0.9)))
      .toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", cb, 2, 2)
      .orderBy("sub").collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(codes.toSeq == Seq((0, 0), (1, 1)),
      s"expected sub0->code0, sub1->code1, got ${codes.toSeq}")
  }

  test("exactly-reconstructible vectors have ADC == true cosine") {
    // corpus row 5 = seed 1 scaled (same direction): its normalized
    // sub-vectors ARE codewords, so quantization error is zero and the
    // coarse ADC score equals the exact cosine to the query.
    val corpus = Seq(
      (5L, Seq(2.0, 0.0, 2.0, 0.0)),
      (6L, Seq(0.3, 0.7, 0.8, 0.2))).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Seq(1.0, 1.0, 1.0, 1.0))).toDF("qvec")
    val out = Similarity.pqTopK(
      corpus.crossJoin(broadcast(q)), "vec_id", "embedding", seeds,
      col("qvec"), k = 2, m = 2, subDim = 2).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val (simPq, sim) = out(5L)
    assert(simPq == sim, s"ADC $simPq != exact $sim for a codeword vector")
  }
}
