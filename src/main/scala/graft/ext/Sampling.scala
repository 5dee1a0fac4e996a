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

  /** Uniform-in-[0,1) hash of an id: the top-16-bit integer of
    * md5(id) divided by 2¹⁶ (a power of two, so the division is exact
    * in binary — the comparison against any rate is bit-portable).
    */
  def hashUniform(id: Column): Column =
    conv(hashBucket(id), 16, 10).cast("int") / lit(65536.0)

  /** PER-ROW-RATE sampling: keep a row iff `hashUniform(id) < rateCol`,
    * where `rateCol` is any deterministic [0,1] column (a quality
    * score, a per-domain quota, a curriculum weight). The standard
    * quality-weighted corpus downsample — still a pure narrow filter,
    * still reproducible under any repartitioning, and still monotone:
    * raising a row's rate can only ever ADD it to the sample.
    */
  def weighted(df: DataFrame, idCol: String, rateCol: Column): DataFrame =
    df.withColumn("sample_u", hashUniform(col(idCol)))
      .filter(col("sample_u") < rateCol)

  /** Corpus-MIXTURE resampling: hash-gated downsample of over-
    * represented sources so the kept corpus approaches a UNIFORM
    * source distribution (rate_s = min(1, (N/K)/n_s) — sources at or
    * below the uniform share keep everything). The data-mixture pass
    * of training-set assembly, with all the hash-gate properties of
    * [[weighted]]: deterministic, repartition-proof, monotone.
    *
    * Shape: one count aggregation (source-cardinality rows), the rate
    * table broadcast back, one narrow filter. Nothing corpus-scale
    * shuffles.
    */
  def mixToUniform(df: DataFrame, idCol: String,
                   sourceCol: String): DataFrame = {
    val bySource = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_source"))
    val totals = bySource.agg(sum(col("n_source")).as("n_total"),
      count(lit(1)).as("n_sources"))
    val rates = bySource.crossJoin(broadcast(totals))
      .withColumn("rate",
        least(lit(1.0), col("n_total") / col("n_sources") / col("n_source")))
      .select(col(sourceCol), col("n_source"), col("rate"))
    df.join(broadcast(rates), sourceCol)
      .withColumn("sample_u", hashUniform(col(idCol)))
      .filter(col("sample_u") < col("rate"))
  }

  /** Temperature-α mixture resampling — the multilingual-LM data-prep
    * standard (α≈0.3–0.7 in the mBERT/XLM-R lineage): expected kept
    * counts ∝ n_source^α, realized as a per-source keep rate
    * (n_min/n_source)^(1−α). The smallest source keeps everything;
    * larger sources flatten toward it (α=1 → the natural mix, α=0 →
    * uniform counts, the [[mixToUniform]] target up to the min/mean
    * anchor). Same monotone hash gate as [[weighted]]: reproducible
    * under any repartitioning, and raising α only ever ADDS rows from
    * over-represented sources. For α = 0.5 the rate goes through
    * `sqrt` — IEEE-exact, hence bit-identical across engines; other α
    * use `pow`, where a last-ulp libm divergence at the gate boundary
    * is theoretically possible (noted per the determinism doctrine).
    */
  def mixAlpha(df: DataFrame, idCol: String, sourceCol: String,
               alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"alpha must be in [0, 1] (got $alpha): outside it the keep rate " +
        "(n_min/n_source)^(1-alpha) leaves (0, 1] and the hash gate " +
        "silently degrades to the natural mix")
    val bySource = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_source"))
    val mins = bySource.agg(min(col("n_source")).as("n_min"))
    val ratio = col("n_min") / col("n_source")
    val rateExpr =
      if (1.0 - alpha == 0.5) sqrt(ratio) else pow(ratio, lit(1.0 - alpha))
    val rates = bySource.crossJoin(broadcast(mins))
      .withColumn("rate", rateExpr)
      .select(col(sourceCol), col("n_source"), col("rate"))
    df.join(broadcast(rates), sourceCol)
      .withColumn("sample_u", hashUniform(col(idCol)))
      .filter(col("sample_u") < col("rate"))
  }

  /** Exactly-k-per-stratum deterministic sampling: rank rows inside
    * each stratum by their id hash (a reproducible shuffle) and keep
    * the first k. One shuffle on the stratum + a per-partition sort —
    * the "take exactly 100 docs per language, reproducibly" primitive.
    */
  def topKPerStratum(df: DataFrame, idCol: String, stratumCol: String,
                     k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }
}
