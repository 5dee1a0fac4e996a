package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** End-to-end lifecycle of the corpus-owning ingest surface (r15
  * verdict ask #5): one [[DocStore.ingestBatch]] call must leave EVERY
  * routed probe (bm25 / phrase / exact / near / semantic dedup)
  * serving the updated corpus THROUGH the artifact path, bit-equal to
  * a cold full rebuild — and a same-count content replacement
  * ([[DocStore.replaceDocs]], the event count-equality gates are blind
  * to) must route every probe to the fallback until
  * [[DocStore.rebuildIndexes]] re-earns the artifact path.
  */
class DocStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // unified corpus (doc_id, text, vec): documents ⋈ embeddings so one
  // store exercises the text AND vector artifacts
  private lazy val all = {
    val d = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("vec"))
    d.join(e, d("doc_id") === e("vec_id")).drop("vec_id")
      .localCheckpoint(true)
  }

  private val cfg = DocStore.Config("doc_id", "text",
    vecCol = Some("vec"), bm25 = true, exact = true,
    near = Some(DocStore.NearParams(8, 1, 3)),
    sem = Some(DocStore.SemParams(32, 1)))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.orderBy("doc_id").collect().map(_.toString)

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("ingestBatch: every routed probe serves the updated corpus " +
    "through the ARTIFACT path, bit-equal to a cold full rebuild") {
    // live store: init on 5/7 of the corpus, ingest the %7==6 slice;
    // cold store: init directly on all 6/7 — the target state
    val batch = all.filter(col("doc_id") % 7 === 3)
    val ingested = all.filter(col("doc_id") % 7 === 6)
    val initial = all.filter(col("doc_id") % 7 =!= 3 &&
      col("doc_id") % 7 =!= 6)

    val live = tmp("dslive")
    DocStore.init(spark, live, initial, cfg)
    assert(DocStore.version(spark, live) == 1L)
    val v2 = DocStore.ingestBatch(spark, live, ingested, cfg)
    assert(v2 == 2L && DocStore.version(spark, live) == 2L)
    assert(DocStore.count(spark, live) ==
      all.filter(col("doc_id") % 7 =!= 3).count())

    val cold = tmp("dscold")
    DocStore.init(spark, cold, all.filter(col("doc_id") % 7 =!= 3), cfg)

    val terms = Seq("stream", "spark")
    def probes(root: String) = Seq(
      ("bm25", DocStore.bm25(spark, root, cfg, terms), "postings"),
      ("phrase", DocStore.phraseBm25(spark, root, cfg, terms), "postings"),
      ("exact", DocStore.dedupBatchExact(spark, root, cfg, batch), "hashes"),
      ("near", DocStore.dedupBatchNear(spark, root, cfg, batch), "bands"))
    probes(live).zip(probes(cold)).foreach {
      case ((name, liveDf, marker), (_, coldDf, _)) =>
        assert(plan(liveDf).contains(marker),
          s"$name: refreshed store must probe the artifact")
        assert(rows(liveDf).sameElements(rows(coldDf)),
          s"$name: ingest+refresh != cold rebuild")
    }

    // semantic: refresh deliberately never refits (frozen-index
    // SemDeDup contract), so the comparison is NOT a cold rebuild —
    // the store's probe must equal the direct computation over the
    // live artifact's own frames
    val sem = DocStore.dedupBatchSemantic(spark, live, cfg, batch, 0.40)
    assert(plan(sem).contains("cells"),
      "sem: refreshed store must probe the artifact")
    val semWant = Dedup.incrementalSemantic(batch,
      spark.read.parquet(s"${DocStore.semPath(live)}/cells"),
      spark.read.parquet(s"${DocStore.semPath(live)}/coarse"),
      spark.read.parquet(s"${DocStore.semPath(live)}/anchors"),
      "doc_id", "vec", 0.40)
    assert(rows(sem).sameElements(rows(semWant)),
      "sem: store probe != direct artifact computation")
  }

  test("TORN ingest (crash between an index refresh and the meta " +
    "commit): the refreshed artifact reads AHEAD of the corpus " +
    "version and must NOT be probed — the fallback serves the " +
    "pre-ingest corpus the store still owns") {
    val batch = all.filter(col("doc_id") % 7 === 3)
    val corpus0 = all.filter(col("doc_id") % 7 =!= 3 &&
      col("doc_id") % 7 =!= 6)
    val ingested = all.filter(col("doc_id") % 7 === 6)
    val root = tmp("dstear")
    val cfgLite = DocStore.Config("doc_id", "text", bm25 = false,
      exact = true)
    DocStore.init(spark, root, corpus0, cfgLite)
    // simulate the tear: step 1 of ingestBatch ran (index refreshed,
    // stamped v2) but the crash hit before the docs append and the
    // meta commit — exactly the window the commit ordering defends
    DedupIndex.refreshExactIndex(spark, DocStore.exactPath(root),
      ingested, "doc_id", "text", newVersion = Some(2L))
    assert(DocStore.version(spark, root) == 1L, "meta must still be v1")
    val probe = DocStore.dedupBatchExact(spark, root, cfgLite, batch)
    assert(!plan(probe).contains("hashes"),
      "an artifact AHEAD of the corpus version must not be probed")
    // and the fallback's verdicts are the PRE-ingest corpus's — the
    // only corpus the store's docs/ actually holds
    assert(rows(probe).sameElements(rows(DedupIndex
      .incrementalExactRouted(spark, batch, DocStore.docs(spark, root),
        "doc_id", "text", None))))
    // re-running the ingest end-to-end from the torn state completes
    // the transaction: refresh is append-only on per-doc facts, so the
    // double-refreshed index still answers identically to a cold
    // rebuild on the final corpus (hash rows dedupe via min(corpus_id);
    // the recorded n now over-counts the twice-appended batch, which
    // only ever makes the COUNT tier read conservative-stale — the
    // version tier, which this store routes by, is exact)
    DocStore.ingestBatch(spark, root, ingested, cfgLite)
    assert(DocStore.version(spark, root) == 2L)
    val healed = DocStore.dedupBatchExact(spark, root, cfgLite, batch)
    val cold = tmp("dstearcold")
    DocStore.init(spark, cold,
      all.filter(col("doc_id") % 7 =!= 3), cfgLite)
    assert(rows(healed).sameElements(
      rows(DocStore.dedupBatchExact(spark, cold, cfgLite, batch))))
  }

  test("replaceDocs (SAME-count content replacement — invisible to a " +
    "count gate): every probe falls back with correct values; " +
    "rebuildIndexes restores the artifact path") {
    val batch = all.filter(col("doc_id") % 7 === 3)
    val corpus0 = all.filter(col("doc_id") % 7 =!= 3)
    val root = tmp("dsrepl")
    DocStore.init(spark, root, corpus0, cfg)

    // replace the text of the %7==0 docs — ids and count unchanged
    val repl = corpus0.filter(col("doc_id") % 7 === 0)
      .withColumn("text", concat(lit("REPLACED "), col("text")))
    val v2 = DocStore.replaceDocs(spark, root, repl, cfg)
    assert(v2 == 2L)
    assert(DocStore.count(spark, root) == corpus0.count(),
      "replacement must not change the doc count")

    val replaced = DocStore.docs(spark, root)
    // every probe routes to the FALLBACK (the artifacts record v1)...
    val b = DocStore.bm25(spark, root, cfg, Seq("stream", "spark"))
    assert(!plan(b).contains("postings"),
      "a version-mismatched bm25 artifact must NOT be probed")
    // ...and the fallback computes over the REPLACED corpus
    assert(rows(b).sameElements(rows(TextStats.bm25(replaced, "doc_id",
      "text", Seq("stream", "spark")))))
    val ex = DocStore.dedupBatchExact(spark, root, cfg, batch)
    assert(!plan(ex).contains("hashes"))
    assert(rows(ex).sameElements(rows(DedupIndex.incrementalExactRouted(
      spark, batch, replaced, "doc_id", "text", None))))
    val nr = DocStore.dedupBatchNear(spark, root, cfg, batch)
    assert(!plan(nr).contains("bands"))

    // rebuild re-earns the artifact path at the corpus's version
    DocStore.rebuildIndexes(spark, root, cfg)
    val b2 = DocStore.bm25(spark, root, cfg, Seq("stream", "spark"))
    assert(plan(b2).contains("postings"),
      "rebuilt artifacts must route back to the probe")
    assert(rows(b2).sameElements(rows(b)),
      "rebuild changed values — routing must never do that")
    val ex2 = DocStore.dedupBatchExact(spark, root, cfg, batch)
    assert(plan(ex2).contains("hashes"))
    assert(rows(ex2).sameElements(rows(ex)))
  }
}
