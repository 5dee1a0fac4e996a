package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-owning ingest surface (r15 verdict ask #5): ONE write path
  * that appends a documents batch and refreshes every derived
  * retrieval/dedup artifact in lockstep, so the routed probes
  * ([[graft.ext.TextStats.bm25Routed]], [[DedupIndex]]'s three
  * incremental probes) always serve through the artifact path after
  * an ingest — the reference's upsert→derived-state-maintenance
  * contract (`database.py:425-488`) applied to the document side.
  *
  * Layout under `root/`:
  *  - `docs/`  the corpus parquet (append per ingested batch)
  *  - `meta/`  one row `(version, n)` — the corpus VERSION every
  *    freshness gate compares against, overwritten LAST
  *  - `index/bm25/`, `index/exact/`, `index/near/`, `index/semantic/`
  *    the enabled artifacts (each with its own internal data-first /
  *    stats-last commit order)
  *
  * Transactional commit order of [[ingestBatch]] — version-gate
  * routing makes the multi-artifact refresh atomic WITHOUT a
  * coordinator:
  *  1. refresh every enabled index, stamping the NEW version v+1
  *     (each artifact internally appends data parts first, overwrites
  *     its stats row last);
  *  2. append the batch to `docs/`;
  *  3. overwrite `meta/` to (v+1, n+batch) — the commit record.
  * A crash ANYWHERE before step 3 leaves `meta` at v: already-
  * refreshed indexes read v+1 ≠ v → their probes fall back to the
  * session build over whatever `docs/` holds (correct by
  * construction); not-yet-refreshed indexes read v — fresh — and
  * `docs/` cannot yet contain the batch (step 2 follows every
  * refresh), so they correctly describe the corpus they serve.
  * Either way routing changes cost, never verdicts. After step 3
  * every gate matches and every probe serves the artifact path.
  *
  * Same-count content REPLACEMENT ([[replaceDocs]]) — the event the
  * old count-equality gates were blind to (r15 "missing" #3) — bumps
  * the version WITHOUT refreshing the indexes: every gate mismatches,
  * every probe falls back (correct values at session-build cost)
  * until [[rebuildIndexes]] re-stamps the artifacts at the corpus's
  * version.
  *
  * 100 TB shape: ingest cost is batch-scale (each refresh tokenizes /
  * hashes / bands / assigns ONLY the batch and appends one clustered
  * part; stats and meta are one-row writes), and probe cost is
  * index-probe-scale — the corpus is never rescanned because a batch
  * arrived. [[replaceDocs]] rewrites `docs/` (an eager checkpoint of
  * corpus ∖ replaced ∪ replacement) — at scale that is a
  * partition-pruned merge, here the simple whole-table form; its cost
  * is priced once and the version bump keeps every probe honest
  * meanwhile.
  */
object DocStore {

  /** LSH parameters of the near-dup index (must match the probes'). */
  case class NearParams(numHashes: Int = 8, rowsPerBand: Int = 1,
                        shingleN: Int = 3)

  /** Fit parameters of the SemDeDup cell index. */
  case class SemParams(targetCellSize: Int = 32, iters: Int = 1)

  /** Which artifacts the store maintains, and the corpus column
    * names. `sem` requires `vecCol`. */
  case class Config(idCol: String, textCol: String,
                    vecCol: Option[String] = None,
                    bm25: Boolean = true,
                    exact: Boolean = true,
                    near: Option[NearParams] = None,
                    sem: Option[SemParams] = None) {
    require(sem.isEmpty || vecCol.nonEmpty,
      "the semantic index needs a vector column")
  }

  def docsPath(root: String): String = s"$root/docs"
  def bm25Path(root: String): String = s"$root/index/bm25"
  def exactPath(root: String): String = s"$root/index/exact"
  def nearPath(root: String): String = s"$root/index/near"
  def semPath(root: String): String = s"$root/index/semantic"

  def docs(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(docsPath(root))

  private def metaRow(spark: SparkSession, root: String) =
    spark.read.parquet(s"$root/meta").head()

  def version(spark: SparkSession, root: String): Long =
    metaRow(spark, root).getAs[Long]("version")

  def count(spark: SparkSession, root: String): Long =
    metaRow(spark, root).getAs[Long]("n")

  private def writeMeta(spark: SparkSession, root: String, v: Long,
                        n: Long): Unit =
    spark.range(1).select(lit(v).as("version"), lit(n).as("n"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")

  /** Create the store: corpus + every enabled artifact at version 1,
    * meta committed last. */
  def init(spark: SparkSession, root: String, df: DataFrame,
           cfg: Config): String = {
    df.write.mode("overwrite").parquet(docsPath(root))
    val corpus = docs(spark, root)
    buildIndexes(spark, root, corpus, cfg, 1L)
    writeMeta(spark, root, 1L, corpus.count())
    root
  }

  private def buildIndexes(spark: SparkSession, root: String,
                           corpus: DataFrame, cfg: Config,
                           v: Long): Unit = {
    if (cfg.bm25)
      TextStats.buildBm25Index(corpus, cfg.idCol, cfg.textCol,
        bm25Path(root), version = v)
    if (cfg.exact)
      DedupIndex.buildExactIndex(corpus, cfg.idCol, cfg.textCol,
        exactPath(root), version = v)
    cfg.near.foreach(np =>
      DedupIndex.buildNearIndex(corpus, cfg.idCol, cfg.textCol,
        np.numHashes, np.rowsPerBand, np.shingleN, nearPath(root),
        version = v))
    cfg.sem.foreach(sp =>
      DedupIndex.buildSemanticIndex(corpus, cfg.idCol, cfg.vecCol.get,
        sp.targetCellSize, sp.iters, semPath(root), version = v))
  }

  /** Ingest a batch of NEW documents: refresh every enabled artifact
    * at the bumped version, append the batch to the corpus, commit
    * meta last (ordering rationale in the object doc). Returns the
    * new version. */
  def ingestBatch(spark: SparkSession, root: String, batch: DataFrame,
                  cfg: Config): Long = {
    val m = metaRow(spark, root)
    val v = m.getAs[Long]("version") + 1
    if (cfg.bm25)
      TextStats.refreshBm25Index(spark, bm25Path(root), batch,
        cfg.idCol, cfg.textCol, newVersion = Some(v))
    if (cfg.exact)
      DedupIndex.refreshExactIndex(spark, exactPath(root), batch,
        cfg.idCol, cfg.textCol, newVersion = Some(v))
    cfg.near.foreach(_ =>
      DedupIndex.refreshNearIndex(spark, nearPath(root), batch,
        cfg.idCol, cfg.textCol, newVersion = Some(v)))
    cfg.sem.foreach(_ =>
      DedupIndex.refreshSemanticIndex(spark, semPath(root), batch,
        cfg.idCol, cfg.vecCol.get, newVersion = Some(v)))
    val bn = batch.count()
    batch.write.mode("append").parquet(docsPath(root))
    writeMeta(spark, root, v, m.getAs[Long]("n") + bn)
    v
  }

  /** Replace existing documents IN PLACE (same ids, new content —
    * count unchanged): rewrite the corpus and bump the version
    * WITHOUT refreshing the indexes. Every version gate now
    * mismatches, so every probe falls back to the session build over
    * the replaced corpus — correct verdicts at recompute cost — until
    * [[rebuildIndexes]]. Returns the new version. */
  def replaceDocs(spark: SparkSession, root: String, repl: DataFrame,
                  cfg: Config): Long = {
    val m = metaRow(spark, root)
    val v = m.getAs[Long]("version") + 1
    // materialize the merge BEFORE overwriting the path being read
    val merged = docs(spark, root)
      .join(repl.select(col(cfg.idCol)), Seq(cfg.idCol), "left_anti")
      .unionByName(repl)
      .localCheckpoint(true)
    val n = merged.count()
    merged.write.mode("overwrite").parquet(docsPath(root))
    writeMeta(spark, root, v, n)
    v
  }

  /** Rebuild every enabled artifact at the corpus's CURRENT version —
    * the recovery path after [[replaceDocs]] (or any externally-
    * detected divergence). Meta is already the commit record; the
    * rebuilds just re-earn it. */
  def rebuildIndexes(spark: SparkSession, root: String,
                     cfg: Config): Long = {
    val v = version(spark, root)
    buildIndexes(spark, root, docs(spark, root), cfg, v)
    v
  }

  // ------------------------------------------------------------------
  // store-bound routed probes: corpus = the store's docs, expected
  // version = the store's meta — the caller never plumbs either
  // ------------------------------------------------------------------

  def bm25(spark: SparkSession, root: String, cfg: Config,
           terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame =
    TextStats.bm25Routed(spark, docs(spark, root), cfg.idCol,
      cfg.textCol, terms, Some(bm25Path(root)), k1, b,
      expectedVersion = Some(version(spark, root)))

  def phraseBm25(spark: SparkSession, root: String, cfg: Config,
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                 topN: Int = 10): DataFrame =
    TextStats.phraseBm25Routed(spark, docs(spark, root), cfg.idCol,
      cfg.textCol, terms, Some(bm25Path(root)), k1, b, topN,
      expectedVersion = Some(version(spark, root)))

  def dedupBatchExact(spark: SparkSession, root: String, cfg: Config,
                      batch: DataFrame): DataFrame =
    DedupIndex.incrementalExactRouted(spark, batch, docs(spark, root),
      cfg.idCol, cfg.textCol, Some(exactPath(root)),
      expectedVersion = Some(version(spark, root)))

  def dedupBatchNear(spark: SparkSession, root: String, cfg: Config,
                     batch: DataFrame): DataFrame = {
    val np = cfg.near.getOrElse(NearParams())
    DedupIndex.incrementalNearRouted(spark, batch, docs(spark, root),
      cfg.idCol, cfg.textCol, np.numHashes, np.rowsPerBand, np.shingleN,
      cfg.near.map(_ => nearPath(root)),
      expectedVersion = Some(version(spark, root)))
  }

  def dedupBatchSemantic(spark: SparkSession, root: String, cfg: Config,
                         batch: DataFrame, tau: Double): DataFrame = {
    val sp = cfg.sem.getOrElse(SemParams())
    DedupIndex.incrementalSemanticRouted(spark, batch,
      docs(spark, root), cfg.idCol, cfg.vecCol.getOrElse(
        sys.error("semantic dedup needs a vector column")),
      sp.targetCellSize, sp.iters, tau,
      cfg.sem.map(_ => semPath(root)),
      expectedVersion = Some(version(spark, root)))
  }
}
