package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("decontaminateNgram drops docs sharing a 5-gram with the bench set") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // shares "the quick brown fox jumps" → contaminated
      (1L, "prefix words the quick brown fox jumps again"),
      // shares only a 4-gram ("quick brown fox jumps" split) → survives
      (2L, "a quick brown fox jumps high today"),
      // nothing in common → survives
      (3L, "completely different content entirely here now ok"),
      // short doc (< 5 words) → cannot match, survives
      (4L, "tiny doc here")).toDF("doc_id", "text")
    val out = Pipeline.decontaminateNgram(corpus, bench, "doc_id", "text", 5)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 3L, 4L))
  }

  test("redactPii counts and replaces emails, phones, digit runs") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail me at a.b+c@ex-ample.org or call +34 600 1234 ok"),
      (2L, "account 1234567890 and code 42")).toDF("doc_id", "text")
    val out = Pipeline.redactPii(df, "text")
      .select("doc_id", "n_emails", "n_phones", "n_longnums", "clean")
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 1)
    assert(out(0).getString(4) ==
      "mail me at <EMAIL> or call <PHONE> ok")
    assert(out(1).getInt(3) == 1)
    assert(out(1).getString(4) == "account <NUM> and code 42")
  }

  test("repetitionStats flags duplicate 2-gram fractions") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a b"),       // grams: ab ba ab ba ab → 2 distinct of 5
      (2L, "all words differ here now"), // 4 grams, all distinct
      (3L, "x")).toDF("doc_id", "text")  // <2 words: dropped
    val out = Pipeline.repetitionStats(df, "text")
      .select("doc_id", "n_2grams", "dup_2gram_frac", "r_repetition")
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 5L)
    assert(out(0).getDouble(2) == 0.6)
    assert(!out(0).getBoolean(3))
    assert(out(1).getDouble(2) == 0.0 && out(1).getBoolean(3))
  }

  test("qualityRules verdicts follow the thresholds") {
    import spark.implicits._
    val longDoc = (1 to 60).map(i => s"word$i").mkString(" ") // 60 distinct words
    val df = Seq(
      (1L, longDoc),                 // passes everything
      (2L, "too short entirely"),    // fails r_length
      (3L, (1 to 60).map(_ => "aa").mkString(" "))) // repetitive + short words
      .toDF("doc_id", "text")
    val out = Pipeline.qualityRules(df, "text")
      .select("doc_id", "r_length", "r_word_len", "r_distinct", "pass")
      .orderBy("doc_id").collect()
    assert(out(0).getBoolean(4))
    assert(!out(1).getBoolean(1) && !out(1).getBoolean(4))
    assert(!out(2).getBoolean(3) && !out(2).getBoolean(2) && !out(2).getBoolean(4))
  }

  test("repetitionStats works on column names that need quoting") {
    import spark.implicits._
    // "text col.v2" would break a string-interpolated expr() (parse
    // error / wrong binding) — the typed Column API must handle it
    val df = Seq((1L, "a b a b"), (2L, "x y z w"))
      .toDF("doc_id", "text col.v2")
    val out = Pipeline.repetitionStats(df, "text col.v2")
      .select("doc_id", "n_2grams", "dup_2gram_frac", "r_repetition")
      .orderBy("doc_id").collect()
    // doc 1: grams (a b, b a, a b) → 2 distinct of 3 → dup 1/3
    assert(out(0).getLong(1) == 3L)
    assert(out(0).getDouble(2) == 0.333333)
    assert(out(0).getBoolean(3) == (0.333333 <= 0.4))
    // doc 2: all distinct → dup 0
    assert(out(1).getDouble(2) == 0.0 && out(1).getBoolean(3))
  }

  test("vocabStats: OOV is measured against the deterministic top-K cut") {
    import spark.implicits._
    // corpus counts: the=4, fox=2, dog=1, cat=1 → top-2 = {the, fox}
    // (count DESC, token ASC — "cat" and "dog" tie at 1, both out)
    val df = Seq((1L, "the fox the dog"), (2L, "the fox the cat"))
      .toDF("doc_id", "text")
    val out = TextStats.vocabStats(df, "doc_id", "text", topK = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 4L)       // n_tokens
    assert(out(0).getLong(2) == 1L)       // n_oov: "dog"
    assert(out(0).getDouble(3) == 0.25)   // oov_frac
    // avg freq doc 1: (4 + 2 + 4 + 1)/4 = 2.75
    assert(out(0).getDouble(4) == 2.75)
    assert(out(1).getLong(2) == 1L)       // "cat"
  }

  test("decontaminateOverlapFrac grades by position fraction, not any-hit") {
    import spark.implicits._
    // bench doc: "a b c d e f" → grams {a b c d e, b c d e f}
    val bench = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d e f"),             // both grams hit → frac 1.0, dropped
      (2L, "a b c d e x y z w q r s"), // 1 of 8 grams hit → 0.125, dropped at 0.1
      (3L, "p q r s t u v w x y a b"), // 0 hits → 0.0, kept
      (4L, "too short"))               // < 5 words → NULL frac, kept
      .toDF("doc_id", "text")
    val out = Pipeline.decontaminateOverlapFrac(corpus, bench,
        "doc_id", "text", n = 5, maxOverlap = 0.1)
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(3) == 1.0 && !out(0).getBoolean(4))
    assert(out(1).getDouble(3) == 0.125 && !out(1).getBoolean(4))
    assert(out(2).getDouble(3) == 0.0 && out(2).getBoolean(4))
    assert(out(3).isNullAt(3) && out(3).getBoolean(4))
  }

  test("bloom-pre-filtered decontamination equals the exact broadcast path") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words the quick brown fox jumps again"), // contaminated
      (2L, "a quick brown fox jumps high today"),           // survives
      (3L, "completely different content entirely here now ok"),
      (4L, "too short"))
      .toDF("doc_id", "text")
    val exact = Pipeline.decontaminateNgram(corpus, bench, "doc_id", "text", 5)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val bloom = Pipeline.decontaminateNgramBloom(corpus, bench,
        "doc_id", "text", 5, expectedItems = 1000L)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    // the bloom only prunes the probe side; the exact join confirms —
    // outputs are identical regardless of false positives
    assert(bloom == exact && exact == Seq(2L, 3L, 4L))
  }

  test("chunkWindows: overlap, tail chunk, and sub-size docs") {
    import spark.implicits._
    val df = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words
      (2L, "a b c"))                                            // < size
      .toDF("doc_id", "text")
    val out = TextStats.chunkWindows(df, "doc_id", "text",
      size = 4, stride = 3).orderBy("doc_id", "chunk_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // ceil((10-4)/3)+1 = 3 chunks: [w1..w4], [w4..w7], [w7..w10]
    assert(d1.length == 3)
    assert(d1(0).getString(3) == "w1 w2 w3 w4")
    assert(d1(1).getString(3) == "w4 w5 w6 w7") // 1-word overlap
    assert(d1(2).getString(3) == "w7 w8 w9 w10")
    assert(d1.forall(_.getLong(2) == 4L))
    // short doc: exactly one (partial) chunk
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getString(3) == "a b c" &&
      d2(0).getLong(2) == 3L)
  }

  test("mixToUniform downsamples only the over-represented sources") {
    import spark.implicits._
    // 40 "big" docs vs 10 "small": uniform share = 25 → big rate 0.625,
    // small rate 1.0 (never upsampled)
    val df = ((1L to 40L).map(i => (i, "big")) ++
      (41L to 50L).map(i => (i, "small"))).toDF("doc_id", "src")
    val out = Sampling.mixToUniform(df, "doc_id", "src")
    val rates = out.select("src", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("small") == 1.0)
    assert(math.abs(rates("big") - 0.625) < 1e-12)
    // every small doc kept; big docs filtered by the hash gate
    assert(out.filter(col("src") === "small").count() == 10L)
    val kept = out.filter(col("src") === "big").count()
    assert(kept < 40L && kept > 0L)
  }

  test("vocabStats top-K tie at the cut is broken by token order") {
    import spark.implicits._
    // all four tokens have count 1 → top-2 = {a, b} lexicographically
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = TextStats.vocabStats(df, "doc_id", "text", topK = 2)
      .collect()(0)
    assert(out.getLong(2) == 2L) // c, d are OOV
  }
}
