package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora (north-star
  * extension §2.F — no reference implementation; designed for the
  * standard exact / MinHash-LSH / SimHash / n-gram-Jaccard pipeline at
  * 100 TB scale: everything is groupBy/join on derived keys, never an
  * O(n²) cross product; candidate generation is banded LSH so the join
  * fan-out is bounded by bucket size).
  *
  * All hashes are built from `md5` hex strings so results are
  * deterministic and reproducible in any engine (the DuckDB oracle uses
  * the byte-identical construction).
  */
object Dedup {

  /** Exact dedup: group by content hash of the normalised text, keep
    * the first (minimum) id per group. Map-side combinable single
    * shuffle on the 128-bit hash — the canonical 100 TB exact-dedup.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(lower(trim(col(textCol)))).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** Distinct word `n`-gram shingles per document: one row per
    * (id, shingle). `explode(sequence)` keeps generation inside codegen;
    * `distinct` is per-doc set semantics for Jaccard.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String,
               n: Int): DataFrame = {
    val words = split(col(textCol), " ")
    df.select(col(idCol), words.as("w"))
      .filter(size(col("w")) >= n)
      .select(col(idCol),
        explode(sequence(lit(0), size(col("w")) - n)).as("i"), col("w"))
      .select(col(idCol),
        array_join(slice(col("w"), col("i") + 1, lit(n)), " ").as("shingle"))
      .distinct()
  }

  /** MinHash signatures: for each of `numHashes` seeded hash functions,
    * the minimum `md5(seed || '|' || shingle)` over the document's
    * shingles (hex strings compare lexicographically — engine-neutral).
    * Output: (id, h, minhash). One aggregation; signature width is a
    * constant factor, not a data-dependent blow-up.
    */
  def minhash(shingleDf: DataFrame, idCol: String,
              numHashes: Int): DataFrame =
    shingleDf
      .select(col(idCol),
        explode(sequence(lit(0), lit(numHashes - 1))).as("h"),
        col("shingle"))
      .groupBy(col(idCol), col("h"))
      .agg(min(md5(concat(col("h"), lit("|"), col("shingle")))).as("minhash"))

  /** LSH banding: rows of the signature are grouped into bands of
    * `rowsPerBand`; a band's key is the hash of its concatenated
    * minhashes. Docs sharing any (band, key) are near-dup candidates.
    */
  def bands(sig: DataFrame, idCol: String, rowsPerBand: Int): DataFrame =
    sig.withColumn("band", (col("h") / lit(rowsPerBand)).cast("int"))
      .groupBy(col(idCol), col("band"))
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("h"), col("minhash")))),
          x => x.getField("minhash")), ",")).as("band_key"))

  /** Candidate pairs (a < b) sharing at least one LSH band. The
    * self-join shuffles on (band, band_key) — bucket-local, never
    * all-pairs.
    */
  def candidatePairs(bandDf: DataFrame, idCol: String): DataFrame = {
    val a = bandDf.select(col(idCol).as("a_id"), col("band"), col("band_key"))
    val b = bandDf.select(col(idCol).as("b_id"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs: |A∩B| via a shingle
    * equi-join restricted to candidates, |A∪B| = |A|+|B|-|A∩B|.
    */
  def jaccard(cands: DataFrame, shingleDf: DataFrame,
              idCol: String): DataFrame = {
    val sizes = shingleDf.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val sa = shingleDf.select(col(idCol).as("a_id"), col("shingle"))
    val sb = shingleDf.select(col(idCol).as("b_id"), col("shingle"))
    val inter = cands.join(sa, "a_id").join(sb, Seq("b_id", "shingle"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed(idCol, "a_id").withColumnRenamed("n", "n_a"), "a_id")
      .join(sizes.withColumnRenamed(idCol, "b_id").withColumnRenamed("n", "n_b"), "b_id")
      .withColumn("jaccard",
        round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")), 6))
      .select("a_id", "b_id", "jaccard")
  }

  /** 16-bit SimHash over whitespace tokens. Bit `i` of a token is the
    * top bit of nibble `i` of `md5(token)` (hex char in [89abcdef]);
    * the document bit is the exact-integer majority vote
    * (`2*ones >= tokens`, no float threshold). Output: (id, simhash
    * bit-string). Hamming-adjacent grouping is then a groupBy on the
    * fingerprint (or on fingerprint chunks for distance>0 lookups).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 16): DataFrame = {
    val tokens = df.select(col(idCol),
      explode(split(col(textCol), " ")).as("tok"))
      .withColumn("md5", md5(col("tok")))
    val bitCols = tokens.select(
      col(idCol) +: (0 until bits).map { i =>
        // top bit of nibble i: hex digit value >= 8
        (conv(substring(col("md5"), i + 1, 1), 16, 10).cast("int") >= 8)
          .cast("int").as(s"b$i")
      }: _*)
    val agg = bitCols.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tok"),
      (0 until bits).map(i => sum(col(s"b$i")).as(s"s$i")): _*)
    agg.select(col(idCol),
      concat((0 until bits).map(i =>
        when(col(s"s$i") * 2 >= col("n_tok"), lit("1")).otherwise(lit("0"))): _*
      ).as("simhash"))
  }
}
