package graft.ext

import graft.SparkSpec

class KmeansSpec extends SparkSpec {

  /** Two well-separated direction clusters (cosine metric): vectors
    * near +x and vectors near +y. Ids 0/1 seed the two centroids.
    */
  test("kmeans converges to the obvious direction clusters") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(10.0f, 0.5f)), (2L, Array(8.0f, 1.0f)), (4L, Array(12.0f, 0.0f)),
      (1L, Array(0.5f, 10.0f)), (3L, Array(1.0f, 9.0f)), (5L, Array(0.0f, 11.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansFit(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(0L) == 0 && out(2L) == 0 && out(4L) == 0)
    assert(out(1L) == 1 && out(3L) == 1 && out(5L) == 1)
  }

  test("kmeans is deterministic across runs and repartitionings") {
    import spark.implicits._
    val vecs = (0L until 50L)
      .map(i => (i, Array.tabulate(8)(d => ((i * 7 + d * 3) % 13).toFloat)))
      .toDF("vec_id", "embedding")
    val a = Similarity.kmeansFit(vecs, "vec_id", "embedding", 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val b = Similarity.kmeansFit(vecs.repartition(7), "vec_id", "embedding", 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("an empty cluster keeps its previous centroid") {
    import spark.implicits._
    // id 1 seeds a centroid that nothing (not even itself) assigns to:
    // all mass is identical to id 0's direction — cluster 1 goes empty
    // but must survive with its original centroid (no NaN/collapse).
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9999f, 0.0001f)),
      (2L, Array(1.0f, 0.0f)), (3L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansFit(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.size == 4)
    assert(out.values.forall(c => c == 0 || c == 1))
  }
}
