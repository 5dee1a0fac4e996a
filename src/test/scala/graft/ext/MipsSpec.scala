package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The MIPS → cosine norm-augmentation reduction must preserve
  * inner-product order exactly — that equivalence is what licenses
  * reusing every cosine index (LSH/IVF/SQ) for MIPS at scale.
  */
class MipsSpec extends SparkSpec {

  test("norm-augmented cosine ranking equals inner-product ranking") {
    import spark.implicits._
    // deterministic vectors with VARIED norms — MIPS and cosine
    // genuinely disagree here, so rank equality is a real check, not
    // a fixture artifact
    val vecs = (1 to 40).map { i =>
      val scale = (i % 5) + 1
      (i.toLong, Array.tabulate(6)(d =>
        scale * (((i * 31 + d * 17) % 7) - 3).toDouble))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = typedlit(Array.tabulate(6)(d => ((d % 3) + 1).toDouble))

    val brute = Similarity.mipsTopK(df, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaAug = Similarity
      .mipsTopKAugmented(df, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(brute.map(_._1).toSeq == viaAug.map(_._1).toSeq,
      s"rank mismatch: brute=${brute.map(_._1).mkString(",")} " +
        s"aug=${viaAug.map(_._1).mkString(",")}")
    assert(brute.toSeq == viaAug.toSeq) // the carried ip values agree too

    // sanity that the fixture has teeth: cosine order differs from
    // inner-product order on these varied-norm vectors
    val cosIds = Similarity.topK(df, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(cosIds != brute.map(_._1).toSeq,
      "fixture degenerate: cosine and MIPS orders coincide")
  }
}
