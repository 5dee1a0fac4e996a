package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics checks for the training-data extension operators on
  * constructed corpora (the sf-dir oracle checks cover scale/parity;
  * these pin the behaviors the oracle can't show, e.g. that near-dups
  * actually cluster).
  */
class ExtSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog today"), // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy cat today"), // near dup
      (3L, "completely different words about spark execution engines"))
      .toDF("doc_id", "text")
  }

  test("exact dedup keeps first id and counts dups") {
    val out = Dedup.exact(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 2L)
  }

  test("minhash banding finds the near-dup pair, not the unrelated doc") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val sig = Dedup.minhash(sh, "doc_id", 8)
    val pairs = Dedup.candidatePairs(Dedup.bands(sig, "doc_id", 8, 1), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical docs share every band
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash bands support multi-row bands (4 bands of 2)") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val sig = Dedup.minhash(sh, "doc_id", 8)
    val b = Dedup.bands(sig, "doc_id", 8, 2)
    assert(b.select("band").distinct().count() == 4)
    val pairs = Dedup.candidatePairs(b, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("jaccard: identical docs 1.0; near-dups high; via candidates") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val sig = Dedup.minhash(sh, "doc_id", 8)
    val cands = Dedup.candidatePairs(Dedup.bands(sig, "doc_id", 8, 1), "doc_id")
    val j = Dedup.jaccard(cands, sh, "doc_id").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((0L, 1L)) == 1.0)
    j.get((0L, 2L)).foreach(v => assert(v > 0.3 && v < 1.0))
  }

  test("langId leaks no CacheManager entry (lazy localCheckpoint, not persist)") {
    graft.queries.ExtQueries.clearMemo()
    spark.catalog.clearCache()
    import spark.implicits._
    val df = Seq((0L, "the cat sat on the mat", "en"),
      (1L, "le chat noir dort bien", "fr")).toDF("doc_id", "text", "lang")
    TextStats.langId(df, "doc_id", "text", "lang").collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "langId must not leave a CacheManager entry behind")
  }

  test("clearMemo: a cleared session rebuilds the shared dedup index correctly") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("dedup_near_minhash")
    val before = q(spark, dir).collect().map(_.toString).sorted.toSeq
    graft.queries.ExtQueries.clearMemo()
    val after = q(spark, dir).collect().map(_.toString).sorted.toSeq
    assert(before == after, "rebuild after clearMemo must be identical")
  }

  test("incremental dedup tolerates a multi-row-per-hash corpus index") {
    import spark.implicits._
    val batch = Seq((10L, "alpha beta"), (11L, "alpha beta"), (12L, "gamma"))
      .toDF("doc_id", "text")
    // index violating the one-row-per-hash contract: two corpus holders
    // of the same content hash — incremental must not duplicate batch
    // rows, and must pick the min corpus id as canonical
    val dupIndex = Seq((1L, "alpha beta"), (2L, "alpha beta"))
      .toDF("corpus_id", "text")
      .select(md5(lower(trim(col("text")))).as("content_hash"), col("corpus_id"))
    val out = Dedup.incremental(batch, dupIndex, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 3, s"batch rows duplicated: ${out.length}")
    assert(out(0).getString(2) == "dup_of_corpus" && out(0).getLong(3) == 1L)
    assert(out(1).getString(2) == "dup_of_corpus" && out(1).getLong(3) == 1L)
    assert(out(2).getString(2) == "new" && out(2).getLong(3) == 12L)
  }

  test("incrementalNear: corpus hit beats batch hit; short docs are new") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different words about spark execution engines"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"), // = corpus 1
      (11L, "the quick brown fox jumps over the lazy dog today"), // = 10 too; corpus wins
      (12L, "an entirely novel document with its own distinct phrasing"),
      (13L, "an entirely novel document with its own distinct phrasing"), // dup of 12 in batch
      (14L, "tiny doc")) // < 3 words: no shingles → new
      .toDF("doc_id", "text")
    val idx = Dedup.bands(
        Dedup.minhash(Dedup.shingles(corpus, "doc_id", "text", 3), "doc_id", 8),
        "doc_id", 8, 1)
      .select(col("band"), col("band_key"), col("doc_id").as("corpus_id"))
    val out = Dedup.incrementalNear(batch, idx, "doc_id", "text", 8, 1, 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) == ((10L, "near_dup_of_corpus", 1L)))
    assert(out(1) == ((11L, "near_dup_of_corpus", 1L))) // corpus precedence
    assert(out(2) == ((12L, "new", 12L)))
    assert(out(3) == ((13L, "near_dup_in_batch", 12L)))
    assert(out(4) == ((14L, "new", 14L)))
  }

  test("connected components: driver union-find and distributed loop agree") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 1L))
      .toDF("a_id", "b_id")
    // components: {1,2,3,8,9} → 1 and {5,6} → 5
    val expected = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L),
      (8L, 1L), (9L, 1L))
    def run(threshold: Long) =
      Dedup.connectedComponents(pairs, driverThreshold = threshold)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(1000000L) == expected) // union-find path
    assert(run(0L) == expected)       // distributed hash-to-min path
  }

  test("incremental dedup: corpus hit beats batch-first; first-in-batch wins") {
    import spark.implicits._
    val corpus = Seq((0L, "alpha beta"), (1L, "gamma delta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "ALPHA BETA "),   // normalises to corpus doc 0's hash
      (11L, "epsilon zeta"),  // genuinely new
      (12L, "epsilon zeta"),  // dup of 11 within the batch
      (13L, "eta theta"))     // new
      .toDF("doc_id", "text")
    val index = Dedup.exact(corpus, "doc_id", "text")
      .select(col("content_hash"), col("doc_id").as("corpus_id"))
    val out = Dedup.incremental(batch, index, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getString(2) == "dup_of_corpus" && out(0).getLong(3) == 0L)
    assert(out(1).getString(2) == "new" && out(1).getLong(3) == 11L)
    assert(out(2).getString(2) == "dup_in_batch" && out(2).getLong(3) == 11L)
    assert(out(3).getString(2) == "new" && out(3).getLong(3) == 13L)
  }

  test("span dedup: duplicated-span fraction counts cross-doc grams only") {
    import spark.implicits._
    val d = Seq(
      (0L, "a b c d e"),   // grams (n=3): "a b c","b c d","c d e"
      (1L, "a b c x y"),   // shares "a b c" with doc 0
      (2L, "p q r s t"),   // no shared grams
      (3L, "z z"))         // shorter than n → 0 grams
      .toDF("doc_id", "text")
    val out = Dedup.spanDupStats(d, "doc_id", "text", n = 3, dupFracMax = 0.4)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 1L)
    assert(math.abs(out(0).getAs[Double]("dup_frac") - 0.333333) < 1e-9)
    assert(out(0).getBoolean(4)) // 1/3 ≤ 0.4 → keep
    assert(out(1).getLong(2) == 1L)
    assert(out(2).getLong(2) == 0L && out(2).getBoolean(4))
    // sub-n doc: zero grams, null frac, keep
    assert(out(3).getLong(1) == 0L && out(3).isNullAt(3) && out(3).getBoolean(4))
  }

  test("span dedup: a gram repeated WITHIN one doc is not cross-doc duplicated") {
    import spark.implicits._
    val d = Seq((0L, "a b c a b c a b"), (1L, "x y z w v u"))
      .toDF("doc_id", "text")
    val out = Dedup.spanDupStats(d, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    // doc 0 repeats "a b c" internally but no OTHER doc has it
    assert(out(0).getLong(2) == 0L)
  }

  test("int8 scalar quantization: codes bounded, reconstruction within one cell") {
    import spark.implicits._
    val d = Seq((0L, Seq(0.0f, 10.0f)), (1L, Seq(1.0f, 20.0f)),
      (2L, Seq(0.5f, 15.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.sqReconstruct(d, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    out.foreach { r =>
      val codes = r.getSeq[Int](r.fieldIndex("qcode"))
      assert(codes.forall(c => c >= 0 && c <= 255))
      val orig = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble)
      val rec = r.getSeq[Double](r.fieldIndex("rvec"))
      // dim 0 range [0,1] → cell 1/256; dim 1 range [10,20] → 10/256
      assert(math.abs(orig(0) - rec(0)) <= 1.0 / 256 + 1e-12)
      assert(math.abs(orig(1) - rec(1)) <= 10.0 / 256 + 1e-12)
    }
  }

  test("sq top-k: coarse int8 scoring + exact re-rank finds the true neighbor") {
    import spark.implicits._
    val base = (1 to 40).map { i =>
      val ang = i / 40.0 * math.Pi / 2
      (i.toLong, Seq(math.cos(ang).toFloat, math.sin(ang).toFloat, 0.1f))
    }
    val d = base.toDF("vec_id", "embedding")
      .withColumn("qvec", typedLit(Seq(1.0, 0.0, 0.1)))
    val out = Similarity.sqTopK(d, "vec_id", "embedding", col("qvec"), k = 3)
      .collect()
    // nearest to the x-axis query are the smallest angles 1, 2, 3
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // exact sim must dominate the ordering and be close to sim_sq
    out.foreach(r => assert(
      math.abs(r.getAs[Double]("sim") - r.getAs[Double]("sim_sq")) < 0.05))
  }

  test("simhash: identical docs share fingerprints; bits are 0/1 string") {
    val out = Dedup.simhash(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getString(1) == out(1).getString(1))
    assert(out(0).getString(1).matches("[01]{16}"))
  }

  test("cosine: self-similarity 1.0, orthogonal 0.0; topK ordering") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.7071f, 0.7071f)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val out = Similarity.topK(
      vecs.crossJoin(broadcast(q)).filter(col("vec_id") =!= 0),
      "vec_id", "embedding", col("qvec"), 3).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 2L))
    assert(out(0).getDouble(1) == 1.0)
    assert(out(2).getDouble(1) == 0.0)
  }

  test("LSH signature is deterministic and groups identical vectors") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array.fill(8)(1.0f)),
      (1L, Array.fill(8)(1.0f)),
      (2L, Array.fill(8)(-1.0f)))
      .toDF("vec_id", "embedding")
    val out = vecs.select(col("vec_id"),
      Similarity.lshSignature(col("embedding"), 6, 8).as("sig"))
      .orderBy("vec_id").collect()
    assert(out(0).getString(1) == out(1).getString(1))
    assert(out(0).getString(1) != out(2).getString(1))
    assert(out(0).getString(1).matches("[01]{6}"))
    // plane indices at/past the rpProject offset would overlap the
    // projection family — rejected, not silently shared
    intercept[IllegalArgumentException] {
      Similarity.lshSignature(col("embedding"), 100, 8)
    }
  }

  test("semantic dedup collapses within-cell near-identical pairs to the lowest id") {
    import spark.implicits._
    val cents = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f))).toDF("cent_id", "cvec")
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f, 0f)),   // cell 0
      (11L, Array(1f, 0f, 0f, 0f)),   // cell 0, identical → dup of 10
      (12L, Array(0f, 1f, 0f, 0f)))   // cell 1, alone → kept
      .toDF("vec_id", "embedding")
    val out = Dedup.semantic(corpus, "vec_id", "embedding",
        cents, "cent_id", "cvec", tau = 0.9)
      .orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getLong(3))).toSeq == Seq(
      (10L, 0L, "kept", 10L),
      (11L, 0L, "dup", 10L),
      (12L, 1L, "kept", 12L)))
    // cross-cell near-identity is NOT flagged (the SemDeDup trade):
    // a similar pair split across cells stays kept — that's what the
    // cell bound buys, and why recall is audited separately
    val split2 = Seq(
      (20L, Array(1f, 0.9f, 0f, 0f)),   // cell 0
      (21L, Array(0.9f, 1f, 0f, 0f)))   // cell 1 — same-ish vector, other cell
      .toDF("vec_id", "embedding")
    val v2 = Dedup.semantic(split2, "vec_id", "embedding",
      cents, "cent_id", "cvec", tau = 0.9).collect()
    assert(v2.forall(_.getString(2) == "kept"))
    // an empty centroid set is a contract violation, not "no dups"
    val e = intercept[IllegalArgumentException] {
      Dedup.semantic(corpus, "vec_id", "embedding",
        cents.filter(col("cent_id") < 0), "cent_id", "cvec", tau = 0.9)
    }
    assert(e.getMessage.contains("centroid set is empty"))
  }

  test("semanticFitted scales the cell count with the corpus and dedups within fitted cells") {
    import spark.implicits._
    // two tight bundles far apart, one anchor per bundle (ids 0, 1);
    // target cell size 2 over 4 vectors → k = 2 anchors, kc = 2
    // coarse centroids — one Lloyd step pulls each coarse centroid to
    // its bundle, and each near-dup resolves to its bundle's anchor
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 0f, 1f, 0f)),
      (2L, Array(1f, 0.01f, 0f, 0f)),   // near-identical to 0 → dup
      (3L, Array(0f, 0.01f, 1f, 0f)))   // near-identical to 1 → dup
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticFitted(corpus, "vec_id", "embedding",
        targetCellSize = 2, tau = 0.99, iters = 1)
      .orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
      .toSeq == Seq(
        (0L, "kept", 0L), (1L, "kept", 1L),
        (2L, "dup", 0L), (3L, "dup", 1L)))
    // k grows with n: the two bundles land in DIFFERENT anchor cells
    assert(out.map(_.getLong(1)).distinct.length == 2)
    intercept[IllegalArgumentException] {
      Dedup.semanticFitted(corpus, "vec_id", "embedding",
        targetCellSize = 1, tau = 0.9)
    }
  }

  test("incrementalSemantic: batch probes the persisted cell index, first-wins in batch") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 0f, 1f, 0f)),
      (2L, Array(1f, 0.01f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val (coarse, anchors) = Dedup.fittedIndex(corpus, "vec_id", "embedding",
      targetCellSize = 2, iters = 1)
    val corpusCells = Dedup.assignCells(corpus, "vec_id", "embedding",
        coarse, anchors)
      .select(col("cell"), col("vec_id").as("corpus_id"),
        col("embedding").as("corpus_vec"))
    val batch = Seq(
      (10L, Array(1f, 0.005f, 0f, 0f)),  // near corpus 0 and 2 → min id 0
      (12L, Array(0f, 1f, 0f, 0f)),      // nothing like it anywhere → new
      (13L, Array(0f, 1f, 0f, 0f)),      // identical to 12 → dup_in_batch
      (14L, Array(0f, 0f, 0f, 1f)))      // orthogonal to everything → new
      .toDF("vec_id", "embedding")
    val out = Dedup.incrementalSemantic(batch, corpusCells, coarse, anchors,
        "vec_id", "embedding", tau = 0.99)
      .orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
      .toSeq == Seq(
        (10L, "dup_of_corpus", 0L),
        (12L, "new", 12L),
        (13L, "dup_in_batch", 12L),
        (14L, "new", 14L)))
  }

  test("substringRuns finds maximal duplicated runs with exact character ranges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),            // shares an 8-gram with 2
      (2L, "x y a b c d e f g h z"),
      (5L, "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4 w5 w6 w7 w8"))
      .toDF("doc_id", "text")
    val out = Dedup.substringRuns(docs, "doc_id", "text",
        n = 8, minRunWords = 8)
      .orderBy("doc_id", "start_word").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == Seq(
        (1L, 0L, 8L, 0L, 15L),
        (2L, 2L, 8L, 4L, 19L),
        (5L, 0L, 8L, 0L, 23L),   // self-repetition IS duplication:
        (5L, 8L, 8L, 24L, 47L))) // both copies reported, runs split
    // the character range IS the substring a cut pass would remove
    val byDoc = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val cut = byDoc(r.getLong(0))
        .substring(r.getLong(3).toInt, r.getLong(4).toInt)
      assert(cut.split(" ").length == r.getLong(2))
    }
    // overlapping duplicated grams merge into ONE maximal run
    val merged = Seq(
      (7L, "p q r s t u v w k l"),
      (8L, "p q r s t u v w k l"))
      .toDF("doc_id", "text")
    val m = Dedup.substringRuns(merged, "doc_id", "text",
        n = 8, minRunWords = 8).orderBy("doc_id").collect()
    assert(m.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == Seq(
        (7L, 0L, 10L, 0L, 19L), (8L, 0L, 10L, 0L, 19L)))
  }

  test("semanticFitted sub-split caps a skewed cell's pair join in id order") {
    import spark.implicits._
    // six identical vectors all collapse to anchor cell 0 — a worst-
    // case mega-cell. maxCellSize = 2 chunks it into 3 subs; dedup
    // fires only within a sub (the documented price of the bound), so
    // each even id survives as its chunk's canonical row.
    val corpus = (0L until 6L).map(i => (i, Array(1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticFitted(corpus, "vec_id", "embedding",
        targetCellSize = 2, tau = 0.99, iters = 1, maxCellSize = 2)
      .orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
      .toSeq == Seq(
        (0L, "kept", 0L), (1L, "dup", 0L),
        (2L, "kept", 2L), (3L, "dup", 2L),
        (4L, "kept", 4L), (5L, "dup", 4L)))
    assert(out.map(_.getLong(1)).distinct.toSeq == Seq(0L)) // one cell
  }

  test("random projection is deterministic, linear, and cosine-preserving on scaled vectors") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array.fill(8)(1.0f)),
      (1L, Array.fill(8)(2.0f)), // 2× vector 0 — cosine must be exactly preserved
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val out = vecs.select(col("vec_id"),
      Similarity.rpProject(col("embedding"), 4, 8).as("p"))
      .orderBy("vec_id").collect()
    val p0 = out(0).getSeq[Double](1)
    val p1 = out(1).getSeq[Double](1)
    assert(p0.length == 4)
    // linearity: rp(2x) = 2·rp(x) exactly (literal planes, double fold)
    assert(p0.zip(p1).forall { case (a, b) => b == 2.0 * a })
    // determinism: a second evaluation sees the same literal planes
    val again = vecs.filter(col("vec_id") === 0)
      .select(Similarity.rpProject(col("embedding"), 4, 8)).head().getSeq[Double](0)
    assert(again == p0)
  }

  test("rpTopK re-ranks on true vectors: k rows, exact-sim descending, both scores present") {
    import spark.implicits._
    val vecs = (1 to 20).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (1.0f / i) + (if (d % 2 == 0) 0f else 0.01f * i)))
    }.toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array.fill(8)(1.0f))).toDF("qvec")
    val corpus = vecs.crossJoin(q)
    val out = Similarity.rpTopK(corpus, "vec_id", "embedding",
      col("qvec"), outDim = 4, dim = 8, k = 5).collect()
    assert(out.length == 5)
    val sims = out.map(_.getDouble(2))
    assert(sims.sameElements(sims.sorted.reverse)) // exact-sim DESC
    // with rerankFactor 4 the coarse cut keeps all 20 — the re-rank
    // must therefore equal the brute-force exact top-5
    val brute = corpus.select(col("vec_id"),
        round(Similarity.cosine(col("embedding"), col("qvec")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(5)
      .collect().map(_.getLong(0))
    assert(out.map(_.getLong(0)).sameElements(brute))
  }

  test("quality/token/fingerprint columns are sane on a known doc") {
    import spark.implicits._
    val d = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val q = TextStats.qualityColumns(d, "doc_id", "text").head()
    assert(q.getInt(1) == 11)         // n_chars
    assert(q.getInt(2) == 3)          // n_words
    assert(math.abs(q.getDouble(3) - 1.0 / 3) < 1e-6) // stopword ratio
    val t = d.select(
      TextStats.wsTokens(col("text")).as("ws"),
      TextStats.bpeTokens(col("text")).as("bpe"),
      TextStats.rollingFingerprint(col("text")).as("fp")).head()
    assert(t.getInt(0) == 3 && t.getInt(1) == 3)
    // fp = fold of (acc*31 + ascii) mod 1e9+7 over "the cat sat"
    val expected = "the cat sat".foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    assert(t.getLong(2) == expected)
  }

  test("multimodal batch decode: per-partition typed mapPartitions path") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "abcdefgh".getBytes("UTF-8"), "text/plain"),
      Multimodal.MediaRecord(2L, Array.emptyByteArray, "text/plain"))
      .toDS().repartition(2) // exercise the per-partition codec init
    val out = Multimodal.decodeBatch(media, thumbSize = 4, nFrames = 2)
      .collect().sortBy(_.media_id)
    assert(out(0).n_bytes == 8L)
    assert(out(0).thumb.toSeq == "aceg".getBytes("UTF-8").toSeq)
    assert(out(0).frame_bytes.toSeq == Seq('a'.toLong, 'e'.toLong))
    assert(math.abs(out(0).byte_mean - "abcdefgh".getBytes.map(_.toInt).sum / 8.0) < 1e-9)
    assert(out(1).n_bytes == 0L && out(1).thumb.length == 4)
  }

  test("salted aggregation equals the plain aggregation") {
    import spark.implicits._
    val df = (0 until 10000).map(i =>
      (i.toLong, if (i % 100 == 0) "cold" else "hot", (i % 7).toDouble))
      .toDF("id", "key", "v")
    val plain = df.groupBy("key")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v").cast("decimal(28,2)")).cast("double").as("sum_value"))
      .orderBy("key").collect().map(_.toSeq).toSeq
    val salted = graft.ingest.Salt
      .saltedSumCount(df, Seq("key"), "v", "id", saltFactor = 8)
      .orderBy("key").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("multimodal: media wrap + stub decode are schema-stable") {
    import spark.implicits._
    val d = Seq((7L, "abcd")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(d, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "payload", "meta"))
    val out = Multimodal.decodeStub(media).head()
    assert(out.getLong(0) == 7L)
    assert(out.getInt(1) == 4)        // n_bytes
    assert(out.getInt(2) == 'a'.toInt)
    assert(out.getLong(3) == 0L)      // n_frames
    val offs = Multimodal.frameOffsets(media, 4).select("frame_offsets")
      .head().getSeq[Long](0)
    assert(offs.length == 4 && offs.head == 0L)
  }

  test("IVF table written partitioned by cell: probe reads prune partitions") {
    import spark.implicits._
    // 40 vectors in 4 obvious clusters around axis directions
    val vecs = (0 until 40).map { i =>
      val axis = i % 4
      val base = Array.fill(8)(0.01f * ((i * 7) % 5))
      base(axis * 2) = 1.0f
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val cents = (0 until 4).map { c =>
      val base = Array.fill(8)(0.0f)
      base(c * 2) = 1.0f
      (c.toLong, base.toSeq)
    }.toDF("cent_id", "cvec")
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding",
      cents, "cent_id", "cvec")
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/t"
    assigned.write.partitionBy("cell").parquet(dir)
    // the probe: read back only cells {0, 1}
    val probe = spark.read.parquet(dir).filter(col("cell").isin(0L, 1L))
    // the cell predicate must land in PartitionFilters (planner-side
    // pruning — no data outside cell=0/ and cell=1/ is opened), never
    // in the post-scan data Filter
    val plan = probe.queryExecution.executedPlan.toString()
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse("")
    assert(pf.contains("cell"), s"probe not partition-pruned:\n$plan")
    // pruning is real: only the probed cells' rows come back
    assert(probe.count() == 20)
    // partition column type is re-inferred from dir names (int, not long)
    assert(probe.select("cell").distinct().collect()
      .map(_.get(0).toString.toLong).toSet == Set(0L, 1L))
  }
}
