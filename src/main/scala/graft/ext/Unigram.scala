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
    *
    * EM depth is a parameter (r14 ask #7): `eSteps` Viterbi E-steps
    * run over the checkpointed word table — the zero-usage prune
    * happens after the FIRST (SentencePiece's shape), every later step
    * re-scores the fixed vocabulary from smoothed usage. Each
    * generation of the vocab table re-checkpoints LAZILY (the batched
    * [[Bpe.encode]] discipline), so the logical plan stays one
    * join deep no matter how many steps run — a ~400-piece vocab at
    * maxPieceLen 8 trains with the same bounded plans as the default.
    * `eSteps = 2` reproduces the original fixed-depth fit
    * bit-for-bit.
    */
  def fit(words: DataFrame, wordCol: String, countCol: String,
          maxPieceLen: Int = 4, topK: Int = 40,
          eSteps: Int = 2): DataFrame = {
    require(eSteps >= 2, s"eSteps must be >= 2, got $eSteps (one " +
      "segmenting pass + at least one re-scored pass)")
    // ONE corpus-scale pass: the distinct-word aggregate materializes
    // once and every later pass (seed gram lengths, all E-steps) reads
    // the checkpointed word table, never the corpus again
    val w0 = words.filter(length(col(wordCol)) > 0)
      .select(col(wordCol).as(wordCol), col(countCol).as(countCol))
      .localCheckpoint(false)
    val sd = seed(w0, wordCol, countCol, maxPieceLen, topK)
      .localCheckpoint(false) // seed cut selected once; feeds all E-steps
    // iteration-1 scores: raw seed counts (all ≥ 1 — no smoothing needed)
    val tot1 = sd.agg(sum(col("cnt")).cast("long")).head.getLong(0)
    val v1 = sd.select(col("piece"), llq(col("cnt"), lit(tot1)).as("sc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val u1 = usage(w0, wordCol, countCol, v1, maxPieceLen)
    // prune: multi-char pieces the Viterbi never used leave the vocab
    var vocab = sd.join(u1, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("usage"), lit(0L)).as("u"))
      .filter(col("u") > 0 || length(col("piece")) === 1)
      .localCheckpoint(false) // the fixed piece set all later passes use
    // steps 2..eSteps: re-score from smoothed usage, re-segment; each
    // INTERMEDIATE generation re-checkpoints lazily, truncating the
    // plan chain (the vocab is bounded — chars + topK — so this is
    // rows-cheap); the LAST generation stays live so the shipped
    // frame's plan carries the final Viterbi E-step (PlanSpec pins
    // the native DP is what produced it)
    for (step <- 2 to eSteps) {
      val tot = vocab.agg(sum(col("u") + 1).cast("long")).head.getLong(0)
      val v = vocab
        .select(col("piece"), llq(col("u") + 1, lit(tot)).as("sc"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      val u = usage(w0, wordCol, countCol, v, maxPieceLen)
      vocab = vocab.select(col("piece")).join(u, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("usage"), lit(0L)).as("u"))
      if (step < eSteps) vocab = vocab.localCheckpoint(false)
    }
    // final artifact: the fixed vocab with last-E-step usage + smoothed
    // score
    val tot3 = vocab.agg(sum(col("u") + 1).cast("long")).head.getLong(0)
    vocab.select(col("piece"), col("u").as("usage"),
        llq(col("u") + 1, lit(tot3)).as("llq"))
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
