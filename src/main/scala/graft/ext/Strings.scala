package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** String-similarity join for short keys (names, titles, URLs) — the
  * curation pass that catches "same entity, one typo" records exact
  * dedup misses and MinHash (tuned for documents) is too coarse for.
  *
  * Candidate generation is the FastSS deletion-neighborhood (Bocek et
  * al. 2007, public): every string keys on itself plus each
  * single-character deletion, so two strings within edit distance 1
  * (substitution, insertion, or deletion) are guaranteed to share at
  * least one key — candidate generation is a plain equi-join on the
  * key, NEVER an all-pairs comparison, and the fan-out is a fixed
  * (len+1)× row explode. Verification is the built-in codegen'd
  * `levenshtein`, evaluated only on bucket-local candidates.
  */
object Strings {

  /** `s` plus every single-character deletion of `s` (the distance-1
    * deletion neighborhood). Narrow, codegen'd.
    */
  def deletionKeys(s: Column): Column =
    array_union(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s) - i))))

  /** All pairs (a < b by id) within edit distance `maxDist` (only 1 is
    * supported — the deletion neighborhood guarantees recall exactly
    * for distance ≤ 1). Output: a_id, b_id, a_str, b_str, dist.
    */
  def nearJoin(df: DataFrame, idCol: String, strCol: String,
               maxDist: Int = 1): DataFrame = {
    require(maxDist == 1, s"deletion-neighborhood recall holds for maxDist=1, got $maxDist")
    val keyed = df.select(col(idCol), col(strCol),
      explode(deletionKeys(col(strCol))).as("__dkey"))
    val a = keyed.select(col(idCol).as("a_id"), col(strCol).as("a_str"),
      col("__dkey"))
    val b = keyed.select(col(idCol).as("b_id"), col(strCol).as("b_str"),
      col("__dkey"))
    a.join(b, "__dkey")
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_str", "b_str").distinct()
      .withColumn("dist",
        levenshtein(col("a_str"), col("b_str")).cast("long"))
      .filter(col("dist") <= maxDist)
  }
}
