package graft.ext

import graft.SparkSpec

class SimhashRadiusSpec extends SparkSpec {

  test("radius-1 pairs: banding finds exactly the ≤1-bit-apart pairs") {
    import spark.implicits._
    val sims = Seq(
      (1L, "0000000011111111"),
      (2L, "0000000011111110"), // dist 1 from #1 (shares first half)
      (3L, "0000000111111110"), // dist 1 from #2? differs at pos 8 AND... check: vs #2: pos8 0→1 = dist 1 (shares second half)
      (4L, "1111111100000000"), // far from all
      (5L, "0000000011111111")) // dist 0 from #1
      .toDF("doc_id", "simhash")
    val out = Dedup.simhashRadius(sims, "doc_id", "simhash", maxDist = 1)
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 2L, 1), (1L, 5L, 0), (2L, 3L, 1), (2L, 5L, 1)))
  }

  test("a distance-2 pair sharing no half is correctly absent (pigeonhole bound)") {
    import spark.implicits._
    val sims = Seq(
      (1L, "0000000011111111"),
      (2L, "0000000111111110")) // differs at pos 8 and pos 16 → dist 2
      .toDF("doc_id", "simhash")
    val out = Dedup.simhashRadius(sims, "doc_id", "simhash", maxDist = 1)
    assert(out.count() == 0)
  }
}
