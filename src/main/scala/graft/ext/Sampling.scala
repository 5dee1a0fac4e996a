package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `sample()`/`TABLESAMPLE` are seed-dependent AND partition-dependent —
  * a repartition changes the sample, which is poison for reproducible
  * corpus curation. Hash-gating is the industry-standard fix: a row is
  * kept iff a hash of its stable id falls under a threshold, so the
  * sample is a pure function of the data (re-runs, engine changes and
  * repartitions all agree), downsampling is monotone (rate 5% ⊂ rate
  * 10% — shrinking a corpus never swaps documents in and out), and the
  * filter is a narrow codegen'd predicate that pushes no shuffle
  * anywhere.
  */
object Sampling {

  /** 16-bit uniform hash bucket of an id column: the first 4 hex chars
    * of md5(id as string). Lexicographic compare on the hex prefix ==
    * numeric compare on the top 16 bits — engine-portable with zero
    * integer-parsing gymnastics.
    */
  def hashBucket(id: Column): Column = substring(md5(id.cast("string")), 1, 4)

  /** Per-stratum deterministic sampling: keep a row iff
    * `hashBucket(id) < thresholds(stratum)`. Thresholds are 4-hex-digit
    * strings; rate = parseInt(threshold, 16) / 65536 (e.g. "1000" = 1/16,
    * "8000" = 1/2, "ffff" ≈ keep-all). Unlisted strata drop.
    */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 thresholds: Map[String, String]): DataFrame = {
    val thr = thresholds.foldLeft(lit(null).cast("string")) {
      case (acc, (stratum, t)) =>
        when(col(stratumCol) === stratum, lit(t)).otherwise(acc)
    }
    df.withColumn("sample_bucket", hashBucket(col(idCol)))
      .filter(col("sample_bucket") < thr)
  }
}
