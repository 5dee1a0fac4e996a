package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as dataframe passes — the
  * vocabulary-learning step of an LLM data pipeline (Sennrich et al.
  * 2016), distributed the only way that scales: each merge step is one
  * corpus-wide pair-count aggregation (map-side combinable) + a 1-row
  * argmax + one narrow re-segmentation projection. Nothing is ever
  * collected to the driver — the selected pair rides along as a 1-row
  * broadcast.
  *
  * Determinism and engine portability:
  *  - ties in the pair argmax break on (count DESC, left ASC, right
  *    ASC) — binary string order, identical everywhere;
  *  - segmentations are strings of '·'-WRAPPED symbols ("·a· ·b·"):
  *    the wrapper makes `replace(seg, "·a· ·b·", "·ab·")` boundary-
  *    safe (a symbol can never match inside a longer symbol) and
  *    adjacent-overlap-safe (left-to-right non-overlapping replacement
  *    — the same greedy semantics in Spark and DuckDB, and the same
  *    order real BPE applies merges in);
  *  - word frequencies weight the counts, so training reads each
  *    DISTINCT word once per step regardless of corpus size — at
  *    100 TB the words table is the (tiny) aggregation output, and the
  *    steps loop over it, never over raw text.
  */
object Bpe {

  /** Initial character segmentation, wrapped: "abc" → "·a· ·b· ·c·".
    * Codepoint-safe: `split(word, "")` splits between CODE POINTS on
    * the JVM (zero-width regex matches never fall inside a surrogate
    * pair), so a supplementary-plane character is one symbol — and
    * every later step is substring `replace` over wrapped symbols, no
    * index arithmetic — the chain has no UTF-16 unit-vs-codepoint
    * hazard (audited for r14 "wrong" #1; BpeSpec pins an astral case).
    */
  def segment0(word: Column): Column =
    concat_ws(" ", transform(split(word, ""),
      c => concat(lit("·"), c, lit("·"))))

  /** Corpus-weighted counts of adjacent symbol pairs in `segCol`. */
  private def pairCounts(seg: DataFrame, segCol: String,
                         countCol: String): DataFrame = {
    val sy = split(col(segCol), " ")
    seg.select(col(countCol), sy.as("sy"))
      .filter(size(col("sy")) >= 2)
      .select(col(countCol),
        explode(transform(sequence(lit(0), size(col("sy")) - 2),
          i => struct(element_at(col("sy"), i + 1).as("s1"),
            element_at(col("sy"), i + 2).as("s2")))).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(sum(col(countCol)).as("pair_count"))
  }

  /** Train `steps` merges over a (word, count) table. Returns the merge
    * table: (step, left_sym, right_sym, merged, pair_count) — one row
    * per learned rule, the artifact a tokenizer ships.
    *
    * Input words must not contain the U+00B7 sentinel itself (e.g.
    * Catalan "l·l"): segment0 would wrap it into "···" and the
    * merged-symbol builder strips interior dots, making distinct symbol
    * sequences indistinguishable — silently-wrong merges. Rather than
    * silently corrupt, fit() REJECTS such input (one cheap aggregation
    * over the distinct-words table); callers on interpunct-bearing
    * corpora should pre-escape (e.g. replace '·' with an unused
    * private-use codepoint) and un-escape the learned symbols.
    */
  def fit(words: DataFrame, wordCol: String, countCol: String,
          steps: Int): DataFrame = {
    val spark = words.sparkSession
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val nBad = words.filter(col(wordCol).contains("·")).limit(1).count()
    require(nBad == 0L,
      "Bpe.fit: input contains the U+00B7 sentinel character; " +
        "pre-escape it before training (see Scaladoc)")
    var seg = words.filter(length(col(wordCol)) > 0)
      .select(col(countCol).as("__c"), segment0(col(wordCol)).as("__seg"))
      .localCheckpoint()
    var merges: DataFrame = null
    for (step <- 1 to steps) {
      val best = pairCounts(seg, "__seg", "__c")
        .orderBy(col("pair_count").desc, col("s1"), col("s2"))
        .limit(1)
        .withColumn("merged",
          concat(lit("·"),
            regexp_replace(col("s1"), "·", ""),
            regexp_replace(col("s2"), "·", ""), lit("·")))
        .localCheckpoint() // selected ONCE; feeds both outputs below
      merges = {
        val row = best.select(lit(step).as("step"), col("s1").as("left_sym"),
          col("s2").as("right_sym"), col("merged"), col("pair_count"))
        if (merges == null) row else merges.unionByName(row)
      }
      // apply the rule: left-to-right non-overlapping replacement of the
      // wrapped pair — one narrow projection over the words table
      seg = seg.crossJoin(broadcast(best))
        .select(col("__c"),
          expr("replace(__seg, concat(s1, ' ', s2), merged)").as("__seg"))
        .localCheckpoint()
    }
    merges
  }

  /** ENCODE with a learned merge table — the apply half of the
    * tokenizer lifecycle (fit → encode). The merge table is a bounded
    * model artifact (`steps` rows, like a centroid set), so collecting
    * it and fusing rules into replace-chain projections is the
    * distributed-correct move: the words side runs narrow codegen'd
    * passes — no join, no shuffle — which is the shape that encodes
    * 100 TB. Rules apply in training order (step ASC), the same greedy
    * left-to-right semantics fit() itself used.
    *
    * Rules are fused `rulesPerPass` at a time with a LAZY
    * `localCheckpoint` between passes: a production 30k-merge vocab as
    * one fused expression would blow past codegen's method-size limits
    * (interpreted fallback at best, analysis blow-up at worst), while
    * bounded batches keep every pass inside whole-stage codegen at the
    * cost of one intermediate materialization per batch. A vocab that
    * fits in one batch (the common oracled case) pays NO checkpoint —
    * the plan is the single fused pass it always was. Output: the
    * input rows plus `tokens` (unwrapped symbol array) and `n_tokens`.
    * Same U+00B7 sentinel contract as [[fit]].
    */
  def encode(words: DataFrame, wordCol: String, merges: DataFrame,
             rulesPerPass: Int = 100): DataFrame = {
    require(rulesPerPass >= 1,
      s"rulesPerPass must be >= 1, got $rulesPerPass")
    val nBad = words.filter(col(wordCol).contains("·")).limit(1).count()
    require(nBad == 0L,
      "Bpe.encode: input contains the U+00B7 sentinel character; " +
        "pre-escape it before encoding (see Bpe.fit Scaladoc)")
    val rules = merges.orderBy(col("step"))
      .select("left_sym", "right_sym", "merged").collect()
    val batches = rules.grouped(rulesPerPass).toSeq
    var df = words.filter(length(col(wordCol)) > 0)
      .withColumn("__seg", segment0(col(wordCol)))
    for ((batch, i) <- batches.zipWithIndex) {
      if (i > 0) df = df.localCheckpoint(false) // truncate the prior chain
      val seg = batch.foldLeft(col("__seg")) { (acc, r) =>
        replace(acc, lit(r.getString(0) + " " + r.getString(1)),
          lit(r.getString(2)))
      }
      df = df.withColumn("__seg", seg)
    }
    df.withColumn("tokens",
        transform(split(col("__seg"), " "), t => regexp_replace(t, "·", "")))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
      .drop("__seg")
  }
}
