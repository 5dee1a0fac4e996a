package graft.queries

import graft.SparkSpec

/** Pins that the shared fitted-index memo actually SHARES: each index
  * family builds its artifact once per (session, dir) and every query
  * in the family gets the same instance. Without this, index-build
  * cost re-runs per bench pass and migrates between alphabetical
  * neighbors in the per-key attribution (the r10 `dedup_semantic`
  * 1.08→6.46 s motion), indistinguishable from a real regression.
  */
class MemoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("semantic-dedup fitted index builds once and is reused across " +
    "constructions") {
    ExtQueries.clearMemo()
    graft.SparkEntry.queries("dedup_semantic")(spark, dir)
    val c1 = ExtQueries.memoEntry(spark, dir, "semfit_coarse")
    val a1 = ExtQueries.memoEntry(spark, dir, "semfit_anchors")
    assert(c1.isDefined && a1.isDefined,
      "dedup_semantic must populate the semfit memo")
    graft.SparkEntry.queries("dedup_semantic")(spark, dir)
    assert(ExtQueries.memoEntry(spark, dir, "semfit_coarse").get eq c1.get,
      "second construction re-fit the coarse centroids")
    assert(ExtQueries.memoEntry(spark, dir, "semfit_anchors").get eq a1.get,
      "second construction re-fit the anchors")
  }

  test("incremental-dedup corpus indexes build once as AT-REST " +
    "artifacts (probe-only steady state, r14 ask #1)") {
    ExtQueries.clearMemo()
    ExtQueries.clearIndexes()
    for ((key, kind) <- Seq(
        "dedup_incremental" -> "exact",
        "dedup_incremental_near" -> "near",
        "dedup_incremental_semantic" -> "semantic")) {
      graft.SparkEntry.queries(key)(spark, dir)
      val p1 = ExtQueries.dedupIndexEntry(spark, dir, kind)
      assert(p1.isDefined, s"$key must register its $kind artifact")
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p1.get)),
        s"$kind artifact must be on disk")
      graft.SparkEntry.queries(key)(spark, dir)
      assert(ExtQueries.dedupIndexEntry(spark, dir, kind).get == p1.get,
        s"second construction rebuilt the persisted $kind index")
    }
    // clearIndexes deletes + unregisters the dedup artifacts too
    val paths = Seq("exact", "near", "semantic")
      .map(k => ExtQueries.dedupIndexEntry(spark, dir, k).get)
    ExtQueries.clearIndexes()
    for (p <- paths)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
        "clearIndexes must delete the dedup artifact trees")
    for (k <- Seq("exact", "near", "semantic"))
      assert(ExtQueries.dedupIndexEntry(spark, dir, k).isEmpty)
  }

  test("kmeans centroid fit is shared across its whole query family") {
    ExtQueries.clearMemo()
    graft.SparkEntry.queries("similar_ood_score")(spark, dir)
    val k1 = ExtQueries.memoEntry(spark, dir, "kmeans_cents")
    assert(k1.isDefined, "similar_ood_score must populate kmeans_cents")
    for (key <- Seq("kmeans_fit_assign", "similar_ivf_kmeans",
        "similar_cluster_purity")) {
      graft.SparkEntry.queries(key)(spark, dir)
      assert(ExtQueries.memoEntry(spark, dir, "kmeans_cents").get eq k1.get,
        s"$key re-fit the centroids instead of sharing the memo")
    }
  }

  test("retrieval frames build once: the three bm25/hybrid keys share " +
    "ONE memoized scored frame + ONE pair of rank frames (r12 ask #1 " +
    "— no per-key corpus tokenize)") {
    ExtQueries.clearMemo()
    graft.SparkEntry.queries("doc_bm25_topk")(spark, dir)
    val b1 = ExtQueries.memoEntry(spark, dir, "bm25")
    assert(b1.isDefined, "doc_bm25_topk must populate the bm25 memo")
    graft.SparkEntry.queries("similar_hybrid_rrf")(spark, dir)
    assert(ExtQueries.memoEntry(spark, dir, "bm25").get eq b1.get,
      "hybrid fusion rebuilt the bm25 frame instead of sharing it")
    val l1 = ExtQueries.memoEntry(spark, dir, "hyb_lex")
    val v1 = ExtQueries.memoEntry(spark, dir, "hyb_vec")
    assert(l1.isDefined && v1.isDefined)
    graft.SparkEntry.queries("similar_hybrid_audit")(spark, dir)
    assert((ExtQueries.memoEntry(spark, dir, "hyb_lex").get eq l1.get) &&
      (ExtQueries.memoEntry(spark, dir, "hyb_vec").get eq v1.get),
      "the audit rebuilt a rank frame instead of sharing the memo")
  }

  test("clearIndexes: the persisted BM25 index artifact is deleted " +
    "from disk and unregistered; the next touch rebuilds a working " +
    "probe (VERDICT r13 'wrong' #1 — no orphaned /tmp trees)") {
    ExtQueries.clearMemo()
    ExtQueries.clearIndexes()
    assert(ExtQueries.indexEntry(spark, dir).isEmpty)
    val before =
      graft.SparkEntry.queries("doc_bm25_topk")(spark, dir).collect()
    val path1 = ExtQueries.indexEntry(spark, dir)
    assert(path1.isDefined, "doc_bm25_topk must register the index")
    val p1 = java.nio.file.Paths.get(path1.get)
    assert(java.nio.file.Files.exists(p1), "artifact must be on disk")
    ExtQueries.clearIndexes()
    assert(!java.nio.file.Files.exists(p1),
      "clearIndexes must DELETE the temp parquet tree, not just " +
        "unregister it")
    assert(ExtQueries.indexEntry(spark, dir).isEmpty)
    ExtQueries.clearMemo() // drop the memoized scored frame too
    val after =
      graft.SparkEntry.queries("doc_bm25_topk")(spark, dir).collect()
    assert(before.sameElements(after),
      "rebuild after clearIndexes must be identical")
    ExtQueries.clearIndexes()
  }

  test("prebuildSharedIndexes forces every shared artifact and reports " +
    "a named per-index cost") {
    ExtQueries.clearMemo()
    val costs = ExtQueries.prebuildSharedIndexes(spark, dir)
    val names = costs.map(_._1).toSet
    for (n <- Seq("lsh_chain", "kmeans_cents", "semfit", "seminc"))
      assert(names.contains(n), s"prebuild missing $n")
    assert(costs.forall(_._2 >= 0.0))
    // after prebuild, query construction must NOT rebuild anything
    val c1 = ExtQueries.memoEntry(spark, dir, "semfit_coarse").get
    graft.SparkEntry.queries("dedup_semantic")(spark, dir)
    assert(ExtQueries.memoEntry(spark, dir, "semfit_coarse").get eq c1,
      "construction after prebuild re-fit the index")
  }
}
