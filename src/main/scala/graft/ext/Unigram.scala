package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-language-model tokenizer TRAINING (SentencePiece's unigram
  * mode, Kudo 2018 "Subword regularization") as dataframe passes — the
  * OTHER standard subword vocabulary learner beside BPE ([[Bpe]]), and
  * the one modern multilingual tokenizers default to.
  *
  * Fixed-iteration EM over the distinct-word table:
  *  - SEED: every corpus character plus the top-K corpus-weighted
  *    substrings of length 2..`maxPieceLen` (the standard
  *    substring-count seed);
  *  - E-STEP: Viterbi-segment every distinct word under the current
  *    piece scores ([[graft.expr.UnigramViterbi]], a native O(L·P)
  *    dynamic program per row — no join, no shuffle: the score table
  *    rides as a bounded foldable map literal, the [[Bpe.encode]]
  *    collected-model-artifact pattern);
  *  - M-STEP: piece usage = exact BIGINT corpus-weighted occurrence
  *    sums from the segmentations; pieces re-score as integer-quantized
  *    log-likelihoods `floor(1e6·ln((usage+1)/Σ(usage+1)))` (add-one
  *    smoothing keeps every kept piece finite);
  *  - PRUNE after the first E-step: multi-character pieces the Viterbi
  *    never used are dropped (the deterministic, exact-arithmetic
  *    analog of SentencePiece's likelihood-loss prune); single
  *    characters are never pruned, so every corpus word stays
  *    segmentable.
  *
  * Determinism and engine portability: all cross-row sums are integer
  * counts (exact, order-free); scores are integers, so DP comparisons
  * are exact; Viterbi ties break (score desc, pieces asc, longer final
  * piece) identically in the expression and the DuckDB oracle's
  * composite-packed recursive DP; the seed's top-K cut orders by
  * (count desc, piece asc). The only floats anywhere are the single
  * `ln` per piece per scoring, quantized at 1e-6 from exact integer
  * ratios.
  *
  * 100 TB shape: training reads each DISTINCT word once per E-step
  * regardless of corpus size — the words table is the (tiny)
  * aggregation output, exactly as in [[Bpe.fit]]; the corpus itself is
  * scanned once to build it and never collected. The vocabulary
  * (≤ chars + topK rows) is the only thing the driver ever holds.
  */
object Unigram {

  /** Integer-quantized log-likelihood of `cnt` out of `tot`:
    * `floor(1e6 · ln(cnt/tot))`. Inputs are exact integers, so both
    * engines quantize the same ratio.
    */
  private def llq(cnt: Column, tot: Column): Column =
    floor(lit(1e6) * log(cnt.cast("double") / tot.cast("double")))
      .cast("long")

  /** Seed vocabulary over a (word, count) table: every single
    * character (weighted count, never pruned later) plus the `topK`
    * corpus-weighted substrings of length 2..`maxPieceLen`
    * (count desc, piece asc). Output: (piece, cnt).
    */
  def seed(words: DataFrame, wordCol: String, countCol: String,
           maxPieceLen: Int, topK: Int): DataFrame = {
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val w = words.filter(length(col(wordCol)) > 0)
      .select(col(wordCol).as("__w"), col(countCol).as("__c"))
    def gramsOf(len: Int): DataFrame = w
      .filter(length(col("__w")) >= len)
      .select(col("__c"), explode(transform(
        sequence(lit(1), length(col("__w")) - (len - 1)),
        i => col("__w").substr(i, lit(len)))).as("__p"))
      .groupBy(col("__p").as("piece"))
      .agg(sum(col("__c")).cast("long").as("cnt"))
    val chars = gramsOf(1)
    val subs = (2 to maxPieceLen).map(gramsOf)
      .reduce(_ unionByName _)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(topK)
    chars.unionByName(subs)
  }

  /** One E-step: Viterbi-segment every word under `scores` (a bounded
    * collected (piece, llq) artifact) and return exact corpus-weighted
    * piece usage. Output: (piece, usage).
    */
  def usage(words: DataFrame, wordCol: String, countCol: String,
            scores: Seq[(String, Long)], maxPieceLen: Int): DataFrame = {
    val table = typedlit(scores.toMap)
    words.filter(length(col(wordCol)) > 0)
      .select(col(countCol).as("__c"),
        explode(graft.expr.UnigramViterbi.unigram_viterbi(
          col(wordCol), table, maxPieceLen)).as("piece"))
      .groupBy("piece")
      .agg(sum(col("__c")).cast("long").as("usage"))
  }

  /** Train over a (word, count) table; returns the final vocabulary
    * (piece, usage, llq) ordered by piece: usage from the LAST E-step
    * (0 for kept-but-unused single characters), llq the smoothed final
    * score — the artifact an encoder ships.
    */
  def fit(words: DataFrame, wordCol: String, countCol: String,
          maxPieceLen: Int = 4, topK: Int = 40): DataFrame = {
    // ONE corpus-scale pass: the distinct-word aggregate materializes
    // once and every later pass (4 seed gram lengths, 2 E-steps) reads
    // the checkpointed word table, never the corpus again
    val w0 = words.filter(length(col(wordCol)) > 0)
      .select(col(wordCol).as(wordCol), col(countCol).as(countCol))
      .localCheckpoint(false)
    val sd = seed(w0, wordCol, countCol, maxPieceLen, topK)
      .localCheckpoint(false) // seed cut selected once; feeds both E-steps
    // iteration-1 scores: raw seed counts (all ≥ 1 — no smoothing needed)
    val tot1 = sd.agg(sum(col("cnt")).cast("long")).head.getLong(0)
    val v1 = sd.select(col("piece"), llq(col("cnt"), lit(tot1)).as("sc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val u1 = usage(w0, wordCol, countCol, v1, maxPieceLen)
    // prune: multi-char pieces the Viterbi never used leave the vocab
    val vocab2 = sd.join(u1, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("usage"), lit(0L)).as("u1"))
      .filter(col("u1") > 0 || length(col("piece")) === 1)
      .localCheckpoint(false) // the fixed vocab both remaining passes use
    // iteration-2 scores: smoothed usage over the pruned vocab
    val tot2 = vocab2.agg(sum(col("u1") + 1).cast("long")).head.getLong(0)
    val v2 = vocab2
      .select(col("piece"), llq(col("u1") + 1, lit(tot2)).as("sc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val u2 = usage(w0, wordCol, countCol, v2, maxPieceLen)
    // final artifact: vocab2 with last-E-step usage and smoothed score
    val out = vocab2.join(u2, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("usage"), lit(0L)).as("usage"))
    val tot3 = out.agg(sum(col("usage") + 1).cast("long")).head.getLong(0)
    out.select(col("piece"), col("usage"),
        llq(col("usage") + 1, lit(tot3)).as("llq"))
      .orderBy("piece")
  }

  /** ENCODE with a trained vocabulary — the apply half (fit → encode),
    * mirroring [[Bpe.encode]]: the (piece, llq) table is a bounded
    * model artifact, collected and fused into ONE narrow Viterbi
    * projection over the words side — no join, no shuffle. Output: the
    * input rows plus `tokens` (piece array) and `n_tokens`.
    */
  def encode(words: DataFrame, wordCol: String, vocab: DataFrame,
             maxPieceLen: Int = 4): DataFrame = {
    val scores = vocab.select(col("piece"), col("llq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val table = typedlit(scores.toMap)
    words.filter(length(col(wordCol)) > 0)
      .withColumn("tokens", graft.expr.UnigramViterbi.unigram_viterbi(
        col(wordCol), table, maxPieceLen))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }
}
