package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE trainer semantics on a hand-computed corpus. */
class BpeSpec extends SparkSpec {

  test("bpe fit learns the hand-computed merge sequence") {
    import spark.implicits._
    // "aaab"×2, "aab"×1:
    //   step 1: (a,a) = 2·2 + 1 = 5 beats (a,b) = 3 → merge ·aa·
    //   step 2: (aa,a)=2 vs (a,b)=2 tie → s1 ASC in BINARY order:
    //     '·' is 0xC2B7 > 'a', so "·aa·" < "·a·" → (·aa·,·a·) → ·aaa·
    //   step 3: (aaa,b)=2 beats (aa,b)=1 → ·aaab·
    val words = Seq(("aaab", 2L), ("aab", 1L)).toDF("w", "c")
    val out = Bpe.fit(words, "w", "c", steps = 3).orderBy("step").collect()
    assert(out.map(r => (r.getString(1), r.getString(2), r.getString(3),
      r.getLong(4))).toSeq == Seq(
      ("·a·", "·a·", "·aa·", 5L),
      ("·aa·", "·a·", "·aaa·", 2L),
      ("·aaa·", "·b·", "·aaab·", 2L)))
  }

  test("bpe replacement is left-to-right non-overlapping (greedy BPE order)") {
    import spark.implicits._
    // "aaaa": after merging (a,a), greedy left-to-right gives ·aa· ·aa·
    // (not ·a· ·aa· ·a· or overlap artifacts)
    val words = Seq(("aaaa", 1L)).toDF("w", "c")
    val m = Bpe.fit(words, "w", "c", steps = 2).orderBy("step").collect()
    // step 1: (a,a)=3 → ·aa·; step 2 re-seg is "·aa· ·aa·" → (aa,aa)=1
    assert(m(0).getString(3) == "·aa·" && m(0).getLong(4) == 3L)
    assert(m(1).getString(1) == "·aa·" && m(1).getString(2) == "·aa·" &&
      m(1).getString(3) == "·aaaa·" && m(1).getLong(4) == 1L)
  }

  test("bpe fit exhausts its merge supply gracefully (no crash, fewer rows)") {
    import spark.implicits._
    // one 2-char word: step 1 merges it whole; steps 2-3 have NO pairs
    // left — fit returns the 1 learnable rule, not 3
    val words = Seq(("ab", 1L)).toDF("w", "c")
    val m = Bpe.fit(words, "w", "c", steps = 3).collect()
    assert(m.length == 1)
    assert(m(0).getString(3) == "·ab·")
  }

  test("bpe fit rejects steps < 1 instead of returning null") {
    import spark.implicits._
    val words = Seq(("ab", 1L)).toDF("w", "c")
    intercept[IllegalArgumentException] {
      Bpe.fit(words, "w", "c", steps = 0)
    }
  }

  test("bpe fit rejects input containing the U+00B7 sentinel (no silent corruption)") {
    import spark.implicits._
    // Catalan interpunct: segment0 would wrap '·' into '···' and the
    // merged-symbol builder strips interior dots — distinct symbol
    // sequences would collapse. fit must fail loudly, not learn wrong
    // merges.
    val words = Seq(("col·lecció", 1L), ("ab", 1L)).toDF("w", "c")
    val e = intercept[IllegalArgumentException] {
      Bpe.fit(words, "w", "c", steps = 1)
    }
    assert(e.getMessage.contains("U+00B7"))
  }

  test("bpe wrapped symbols never match inside longer symbols") {
    import spark.implicits._
    // corpus where symbol "x" and merged "xy" coexist: replacing
    // "·x· ·z·" must not fire inside "·xy· ·z·"
    val words = Seq(("xyz", 3L), ("xz", 1L)).toDF("w", "c")
    // step 1: (x,y)=3 beats (x,z)=1 and (y,z)=3 tie → s1: ·x· < ·y· → xy
    val m = Bpe.fit(words, "w", "c", steps = 2).orderBy("step").collect()
    assert(m(0).getString(3) == "·xy·")
    // step 2: "xyz"→"·xy· ·z·" (xy,z)=3; "xz"→(x,z)=1 → merge (xy,z)
    assert(m(1).getString(1) == "·xy·" && m(1).getString(3) == "·xyz·")
  }

  test("bpe is codepoint-safe: an astral-plane character is ONE " +
    "initial symbol (segment0 never splits a surrogate pair) and " +
    "fit/encode merge across it") {
    import spark.implicits._
    val g = "𝄞" // U+1D11E, two UTF-16 units
    val seg = Seq(g + "a" + g).toDF("w")
      .select(Bpe.segment0(col("w")).as("s")).head.getString(0)
    assert(seg == s"·${g}· ·a· ·${g}·",
      s"astral char split across symbols: $seg")
    val words = Seq((g + "a", 2L), (g + "b", 1L)).toDF("w", "c")
    val m = Bpe.fit(words, "w", "c", steps = 1).collect()
    assert(m(0).getString(3) == s"·${g}a·")
    val enc = Bpe.encode(Seq(g + "a").toDF("w"), "w", Bpe.fit(words, "w",
      "c", steps = 1)).select("tokens").head.getSeq[String](0)
    assert(enc == Seq(g + "a"))
  }

  test("bpe encode applies trained merges greedily, unseen words fall back to chars") {
    import spark.implicits._
    // merges from the hand corpus: ·aa·, ·aaa·, ·aaab· (first test)
    val words = Seq(("aaab", 2L), ("aab", 1L)).toDF("w", "c")
    val merges = Bpe.fit(words, "w", "c", steps = 3)
    // encode the training vocab plus an UNSEEN word — no rule fires on
    // it, so it falls back to the character segmentation
    val probe = Seq("aaab", "aab", "ba").toDF("w")
    val out = Bpe.encode(probe, "w", merges)
      .select("w", "tokens", "n_tokens").orderBy("w").collect()
    val byWord = out.map(r => r.getString(0) ->
      (r.getSeq[String](1), r.getLong(2))).toMap
    assert(byWord("aaab") == (Seq("aaab"), 1L)) // all 3 merges chain
    assert(byWord("aab") == (Seq("aa", "b"), 2L)) // only merge 1 fires
    assert(byWord("ba") == (Seq("b", "a"), 2L)) // unseen → chars
  }

  test("bpe encode at 64 merges: batched rule application matches one fused pass") {
    import spark.implicits._
    // 64 words over an 8-char alphabet, every ordered pair distinct and
    // counts strictly decreasing → fit learns exactly one whole-word
    // merge per step, 64 rules total. Encoding with rulesPerPass=7
    // (10 batches, lazy checkpoint between) must equal the single
    // fused pass — batching bounds expression depth, never semantics.
    val pairs = for (a <- 'a' to 'h'; b <- 'a' to 'h') yield s"$a$b"
    val words = pairs.zipWithIndex
      .map { case (w, i) => (w, (1000 - i).toLong) }.toDF("w", "c")
    val merges = Bpe.fit(words, "w", "c", steps = 64)
    assert(merges.count() == 64L)
    val probe = (pairs :+ "zz").toDF("w")
    val batched = Bpe.encode(probe, "w", merges, rulesPerPass = 7)
      .select("w", "tokens", "n_tokens").orderBy("w").collect()
    val fused = Bpe.encode(probe, "w", merges, rulesPerPass = 10000)
      .select("w", "tokens", "n_tokens").orderBy("w").collect()
    assert(batched.map(_.toSeq).toSeq == fused.map(_.toSeq).toSeq)
    val byWord = batched.map(r => r.getString(0) ->
      (r.getSeq[String](1), r.getLong(2))).toMap
    assert(pairs.forall(w => byWord(w) == (Seq(w), 1L))) // every rule fired
    assert(byWord("zz") == (Seq("z", "z"), 2L)) // unseen → chars
    intercept[IllegalArgumentException] {
      Bpe.encode(probe, "w", merges, rulesPerPass = 0)
    }
  }

  test("bpe encode rejects the sentinel like fit does") {
    import spark.implicits._
    val words = Seq(("ab", 1L)).toDF("w", "c")
    val merges = Bpe.fit(words, "w", "c", steps = 1)
    val e = intercept[IllegalArgumentException] {
      Bpe.encode(Seq("col·lecció").toDF("w"), "w", merges).collect()
    }
    assert(e.getMessage.contains("U+00B7"))
  }
}
