package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star extension §2.F).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline; a single pass,
  *    fully codegen'd (`zip_with` + `aggregate` fold, no UDF);
  *  - LSH-bucketed ANN — random-hyperplane signatures assign every
  *    vector to one of 2^planes buckets; a query probes only its own
  *    bucket. At 100 TB the table is written bucketed/partitioned by
  *    the signature so a probe is a partition-pruned scan, not a full
  *    pass. Hyperplane weights are derived deterministically from md5
  *    nibbles so the index is reproducible anywhere.
  */
object Similarity {

  /** Sequential-fold dot product of two float/double arrays, computed
    * in double (element casts first). Left-to-right order makes the fp
    * result deterministic and engine-portable. Backed by the native
    * codegen'd [[graft.expr.ArrayDot]] — the equivalent
    * `aggregate(zip_with(...))` fold is interpreted per element and was
    * the hot spot of every similarity query.
    */
  def dot(a: Column, b: Column): Column =
    graft.expr.VectorExprs.array_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against one query vector (a Column literal
    * or a broadcastable one-row frame joined in by the caller).
    * Deterministic order: rounded similarity desc, then id.
    */
  def topK(df: DataFrame, idCol: String, vecCol: String, query: Column,
           k: Int): DataFrame =
    df.select(col(idCol), round(cosine(col(vecCol), query), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * first md5 nibble of "p|d", centred: value in [-7.5, 7.5].
    * Materialized driver-side into literal arrays so the per-row
    * signature is a pure float fold — no hashing in the scan hot path
    * (the md5 depends only on (plane, dim), never on data).
    */
  private def planeWeights(plane: Int, dim: Int): Seq[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { d =>
      val hex = digest.digest(s"$plane|$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 1), 16) - 7.5
    }
  }

  /** Random-hyperplane LSH signature: bit p = [sum_d w(p,d)*x_d >= 0].
    * Returns a bit-string column usable as a bucket key.
    */
  def lshSignature(vec: Column, planes: Int, dim: Int): Column =
    concat((0 until planes).map { p =>
      val s = dot(vec, typedLit(planeWeights(p, dim)))
      when(s >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** IVF-style ANN: assign every vector to its best "cell" (highest
    * cosine against a deterministic centroid set), probe only the
    * `nprobe` cells closest to the query, rank candidates by exact
    * cosine. At 100 TB the table is written partitioned by `cell`, so a
    * probe reads nprobe partitions; centroids here are the first k
    * vectors (a k-means fit would slot in without changing the shape).
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame, centIdCol: String,
                centVecCol: String): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("cent_sim").desc, col(centIdCol))
    df.crossJoin(broadcast(centroids))
      .withColumn("cent_sim", cosine(col(vecCol), col(centVecCol)))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .select(col(idCol), col(vecCol), col(centIdCol).as("cell"))
  }

  /** ANN: probe the query's LSH bucket, rank by exact cosine. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, query: Column,
              planes: Int, dim: Int, k: Int): DataFrame = {
    val sig = lshSignature(col(vecCol), planes, dim)
    val qsig = lshSignature(query, planes, dim)
    df.filter(sig === qsig)
      .select(col(idCol), round(cosine(col(vecCol), query), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
