package graft.queries

import org.apache.spark.sql.execution.FormattedMode

import graft.SparkSpec

/** Physical-plan regression tests: the scale properties PLANS.md
  * documents must not silently rot. These run on sf0.001 (plan shape is
  * scale-invariant; AQE may adapt joins at runtime but the static plan
  * records the intent).
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    // pins assert the COLD plan shape; a memo populated by an earlier
    // suite in the same JVM would splice InMemoryRelations (and their
    // exchanges) into it
    ExtQueries.clearMemo()
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(FormattedMode)
  }

  test("scan_time_range pushes the time bounds into the parquet scan") {
    val p = plan("scan_time_range")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"no pushed range filter:\n$p")
  }

  test("q1_pricing prunes the lineitem scan to the 4 needed columns") {
    val p = plan("q1_pricing")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_quantity") && read.contains("l_returnflag"))
    assert(!read.contains("l_shipdate") && !read.contains("l_partkey"),
      s"scan reads unneeded columns: $read")
  }

  test("join_enrich broadcasts both dims (no fact shuffle for the join)") {
    val p = plan("join_enrich")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), s"dim join degraded to SMJ:\n$p")
  }

  test("similarity uses the native arraydot expression, not a HOF fold") {
    val p = plan("similar_topk_cosine")
    assert(p.contains("arraydot"), p)
    assert(!p.contains("aggregate(zip_with"), p)
    // top-k must be TakeOrdered, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("pivot_long_to_wide is a single hash-aggregate exchange") {
    val p = plan("pivot_long_to_wide")
    // one partial + one final aggregate pair over one exchange (plus the
    // output sort) — no second shuffle for pivot-value discovery
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected agg+sort exchanges only, got $exchanges:\n$p")
    assert(p.contains("HashAggregate"))
  }

  test("asof join is one union + window pass — no join operator at all") {
    val p = plan("asof_join_purchase")
    assert(p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("NestedLoop"),
      s"asof degraded to a join:\n$p")
    // key-hash exchanges only (window + aggregation + output sort);
    // never a range/cartesian expansion
    assert(p.contains("Union"), p)
  }

  test("range join is a hash equi-join on the bucket, not a nested loop") {
    val p = plan("range_join_window_count")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degraded to O(n·m):\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("rolling mean reuses ONE exchange+sort for both window aggregates") {
    val p = plan("ts_rolling_mean")
    // count + decimal-sum share the same window spec → a single Window
    // operator over a single hash exchange (plus the output sort)
    val windows = """\(\d+\) Window""".r.findAllIn(p).size
    assert(windows == 1, s"expected 1 Window op, got $windows:\n$p")
  }

  test("interpolation's two window passes share one partitioning shuffle") {
    val p = plan("ts_interpolate")
    // forward+backward passes sort differently but partition identically:
    // exactly one exchange hashes user_id for the windows
    val winExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(user_id"))
    assert(winExchanges <= 1, s"window passes re-shuffled:\n$p")
  }

  test("kmeans assignment broadcasts the centroid table") {
    val p = graft.ext.Similarity.kmeansFit(
      graft.core.Tables.load(spark, dir, "embeddings"),
      "vec_id", "embedding", k = 4, iters = 1)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("arraydot"), s"centroid distance not codegen'd:\n$p")
  }

  test("z-score moments run in ONE Window operator") {
    val p = plan("ts_anomaly_zscore")
    val windows = """\(\d+\) Window""".r.findAllIn(p).size
    assert(windows == 1, s"expected 1 Window op, got $windows:\n$p")
  }

  test("tfidf argmax is aggregation-only — no sort window, no cartesian") {
    val p = plan("doc_top_tfidf")
    assert(!p.contains("Window"), s"argmax degraded to a window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  private def hintCount(name: String): Int =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }.size

  test("token-vocabulary-scale joins carry no UNCONDITIONAL broadcast hint") {
    // A forced broadcast() on a vocab/candidate-scale table is fine at
    // sf0.1 and a driver OOM at 100 TB. Bounded tables (1-row totals,
    // the topK cut, #langs×vocab-free frames) hint unconditionally;
    // vocabulary-scale tables hint ONLY through the measured size gate
    // (TextStats.gatedBroadcast) — at this SF the gate passes, so each
    // key shows its bounded hints + exactly one gated vocab hint.
    // dedup_ngram_jaccard: no hints at all — the candidate-scale
    // shingle-set joins shuffle on the id keys.
    assert(hintCount("lang_id") == 2,
      "lang_id: totals×vocab + gated counts only")
    assert(hintCount("doc_top_tfidf") == 2,
      "tfidf: nDocs + gated dfreq only")
    // the topK-cut hint sits INSIDE the checkpointed vocab frame (the
    // checkpoint collapses its subtree to a LogicalRDD), so only the
    // outer gated hint is visible in the analyzed plan
    assert(hintCount("quality_vocab") == 1,
      "vocabStats: the gated vocab hint only")
    assert(hintCount("dedup_ngram_jaccard") == 0,
      "jaccard must not force-broadcast the shingle-set tables")
  }

  test("gatedBroadcast withholds the hint past the row gate") {
    import spark.implicits._
    val big = (1 to 100).toDF("x").localCheckpoint(false)
    val hinted = graft.ext.TextStats.gatedBroadcast(big, maxRows = 1000)
    val unhinted = graft.ext.TextStats.gatedBroadcast(big, maxRows = 10)
    def hints(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.size
    assert(hints(hinted) == 1 && hints(unhinted) == 0)
  }

  test("stratified sample is a pure narrow filter — no exchange before sort") {
    val p = plan("sample_stratified")
    // the gate itself adds no shuffle; only the output orderBy exchanges
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 1, s"sampling should be narrow, got $exchanges:\n$p")
    assert(!p.contains("Sample"), "hash-gate must not use Sample (seed-dependent)")
  }

  test("q6 pushes every predicate into the scan and reads 4 columns") {
    val p = plan("q6_forecast")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      pushed.contains("LessThan(l_quantity"), s"filters not pushed: $pushed")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_discount") && !read.contains("l_orderkey"),
      s"scan reads unneeded columns: $read")
  }

  test("decontamination broadcasts the benchmark gram set") {
    val p = plan("decontaminate_ngram")
    assert(p.contains("BroadcastHashJoin"), s"bench grams not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side shuffle for the gram join:\n$p")
  }

  test("incremental dedup family probes AT-REST artifacts: the corpus " +
    "side of each plan is the persisted index parquet, the only " +
    "documents/embeddings scans are the batch side (r14 ask #1)") {
    def loc(p: String, what: String) =
      p.linesIterator.count(l => l.contains("Location") && l.contains(what))
    val pe = plan("dedup_incremental")
    assert(loc(pe, "hashes") >= 1, s"exact probe must read hashes/:\n$pe")
    // both documents scans are the BATCH (the probe hashes the batch
    // twice — firsts + rows); the CORPUS text is never rescanned
    assert(pe.contains("(doc_id#") && pe.contains("% 7) = 3"),
      s"documents scans must be the batch filter:\n$pe")
    assert(!pe.contains("% 7) != 3") && !pe.contains("NOT ((doc_id"),
      s"corpus-side documents scan leaked into the exact probe:\n$pe")
    val pn = plan("dedup_incremental_near")
    assert(loc(pn, "bands") >= 1, s"near probe must read bands/:\n$pn")
    assert(!pn.contains("% 7) != 3") && !pn.contains("NOT ((doc_id"),
      s"corpus-side documents scan leaked into the near probe:\n$pn")
    val ps = plan("dedup_incremental_semantic")
    assert(loc(ps, "cells") >= 1, s"semantic probe must read cells/:\n$ps")
    // the batch-side assignment is behind its lazy localCheckpoint
    // (Scan ExistingRDD) — the raw embeddings parquet never appears:
    // the ONLY at-rest table in the plan is the persisted index
    assert(loc(ps, "embeddings.parquet") == 0,
      s"corpus-side embeddings scan leaked into the semantic probe:\n$ps")
  }

  test("incremental semantic dedup: corpus cell table never shuffles") {
    val p = plan("dedup_incremental_semantic")
    // the persisted corpus cells stream straight into a broadcast-hash
    // probe against the batch cell list; shuffles are the two
    // batch-scale hit aggregations and the output sort only
    assert(!p.contains("SortMergeJoin"), s"probe degraded to SMJ:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 4,
      s"expected hit aggs + sort exchanges only, got $exchanges:\n$p")
  }

  test("substring-run dedup has no doc-pair stage (gram-key joins only)") {
    val p = plan("dedup_substring_runs")
    assert(!p.contains("CartesianProduct"), s"doc-pair cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"doc-pair loop join:\n$p")
  }

  test("interval overlap join is a hash equi-join on the bucket") {
    val p = plan("interval_overlap_join")
    assert(!p.contains("NestedLoop"), s"theta-join nested loop:\n$p")
    assert(p.contains("Join"), p)
  }

  test("cube/rollup is ONE Expand + aggregate pass (no per-set rescan)") {
    val p = plan("events_cube_rollup")
    val expands = """\(\d+\) Expand""".r.findAllIn(p).size
    assert(expands == 1, s"expected 1 Expand, got $expands:\n$p")
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).size
    assert(scans == 1, s"grouping sets re-scanned the table $scans times:\n$p")
  }

  test("window suite shares ONE exchange across its two orderings") {
    val p = plan("ts_window_suite")
    // one shuffle on the series key + the output orderBy — the two sort
    // orders (time, value) must NOT re-exchange
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 2, s"window orderings re-shuffled, got $exchanges:\n$p")
  }

  test("ohlc is one map-side-combinable aggregation — no window, no extra sort") {
    val p = plan("ts_ohlc")
    assert(!p.contains("Window"), s"argmin/argmax degraded to a window:\n$p")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected agg+sort exchanges only, got $exchanges:\n$p")
  }

  test("dedup_exact is one hash-aggregate exchange (plus the output sort)") {
    val p = plan("dedup_exact")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window") && !p.contains("Join"), p)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected agg+sort exchanges only, got $exchanges:\n$p")
  }

  test("minhash candidate generation joins on (band, band_key) — never cartesian") {
    // built directly (not via the session memo) so the join shape is
    // visible in the plan, not hidden inside an InMemoryRelation
    val docsDf = graft.core.Tables.load(spark, dir, "documents")
    val sh = graft.ext.Dedup.shingles(docsDf, "doc_id", "text", 3)
    val cand = graft.ext.Dedup.candidatePairs(
      graft.ext.Dedup.bands(graft.ext.Dedup.minhash(sh, "doc_id", 8),
        "doc_id", 8, 1), "doc_id")
    val p = cand.queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"banded self-join degraded to all-pairs:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("dedup_embedding_cosine never joins on the label alone (no all-pairs)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    // built directly (k differs from the memoized query's) so the
    // session cache cannot substitute an InMemoryRelation leaf for the
    // plan under inspection
    val df = graft.ext.Similarity.exactNNWithinGroup(
      graft.core.Tables.load(spark, dir, "embeddings"),
      "vec_id", "embedding", "label", k = 8, iters = 0)
    // every pair-producing equi-join must key on the cell as well as the
    // group — a group-only condition is the quadratic shape this query
    // used to have (VERDICT r4 finding 5)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.exists(_.toString.contains("grp")) => j
    }
    assert(joins.nonEmpty, "expected grp-keyed pair joins in the plan")
    joins.foreach { j =>
      val c = j.condition.get.toString.toLowerCase
      assert(c.contains("cell"), s"group-only (all-pairs) join survived: $c")
    }
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_embedding_ann probes via a (label, signature) equi-join") {
    val p = plan("dedup_embedding_ann")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"hamming predicate degraded to all-pairs:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(p.contains("arraydot"), p) // signature + re-rank in codegen
  }

  test("nearest asof is union + windows — no join operator, no range probe") {
    val p = plan("asof_join_nearest")
    assert(p.contains("Union") && p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("NestedLoop") &&
      !p.contains("CartesianProduct"), s"nearest asof degraded to a join:\n$p")
  }

  test("incremental dedup broadcasts the batch against the corpus index") {
    val p = plan("dedup_incremental")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"batch-vs-index join degraded to a corpus shuffle:\n$p")
  }

  test("chunking is a pure narrow explode — only the output-sort exchange") {
    val p = plan("text_chunk_windows")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 1, s"chunking grew a shuffle:\n$p")
    assert(p.contains("Generate"), p) // the explode
  }

  test("mixture resample broadcasts the rate table — corpus never shuffles") {
    val p = plan("corpus_mix_resample")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"rate join degraded to a corpus shuffle:\n$p")
  }

  test("span dedup joins on the gram key only — no pairwise stage anywhere") {
    val p = plan("dedup_span_ngram")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"span dedup grew an all-pairs stage:\n$p")
    // grams aggregate map-side: partial + final HashAggregate pairs
    assert(p.contains("HashAggregate"), p)
  }

  test("sq top-k: coarse pass is TakeOrdered; re-rank joins by id broadcast") {
    val p = plan("similar_sq_int8")
    assert(p.contains("TakeOrderedAndProject"),
      s"coarse cut is not TakeOrdered:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"survivor re-rank is not a broadcast id join:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("incremental near-dup: corpus band index never shuffles") {
    val p = plan("dedup_incremental_near")
    // every join is a broadcast-hash probe with a batch-scale build
    // side — the corpus-scale band index streams straight into its BHJ
    // with no Exchange below it; the only shuffles are the two
    // batch-scale hit-list aggregations and the output sort
    assert(!p.contains("SortMergeJoin"), s"probe degraded to SMJ:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 4,
      s"expected hit-list aggs + sort exchanges only, got $exchanges:\n$p")
  }

  test("string near join: equi-join on deletion keys, never all-pairs") {
    val p = plan("supplier_name_near_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"near join degraded to all-pairs:\n$p")
  }

  test("snapshot diff is a side-tagged union + key aggregation — no join") {
    val p = plan("snapshot_diff_orders")
    assert(p.contains("Union"), p)
    assert(!p.contains("Join"), s"diff must not join:\n$p")
    // key agg + verdict agg + output sort only
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected 3 exchanges, got $exchanges:\n$p")
  }

  test("ewma folds in ONE Window operator (no per-step self-joins)") {
    val p = plan("ts_ewma")
    val windows = """\(\d+\) Window""".r.findAllIn(p).size
    assert(windows == 1, s"expected 1 Window op, got $windows:\n$p")
    assert(!p.contains("Join"), s"ewma must not join:\n$p")
  }

  test("interpolated quantiles share one exchange across both windows + agg") {
    val p = plan("events_quantiles_interp")
    // rank window (ordered) + count window (unordered) + group agg all
    // partition on event_type: ONE hash exchange + the output sort only
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected window+sort exchanges only, got $exchanges:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("sequence packing is one per-source window — no join, two exchanges") {
    val p = plan("text_pack_sequences")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), s"packing must not join:\n$p")
    // prefix-sum window exchange (hash on source) + the output sort only
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected window+sort exchanges only, got $exchanges:\n$p")
  }

  test("image header decode is a single narrow pass — no join, no UDF, " +
    "one output-sort exchange") {
    val p = plan("multimodal_dims")
    assert(!p.contains("Join"), s"header parse must not join:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      s"parse left codegen:\n$p")
    // per-row bounded byte expressions + the output sort only
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected the output sort only, got $exchanges:\n$p")
  }

  test("A/V header decode is a single narrow pass — no join, no UDF, " +
    "one output-sort exchange") {
    val p = plan("multimodal_av_meta")
    assert(!p.contains("Join"), s"container parse must not join:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      s"parse left codegen:\n$p")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected the output sort only, got $exchanges:\n$p")
  }

  test("byte-walk family: expression trees stay bounded (the r10 " +
    "plan-compile lesson — shape pins can't see tree SIZE)") {
    // r10 shipped multimodal_av_meta with a perfect one-exchange shape
    // and a ~million-node expression tree: nested aggregate() folds +
    // 5× getField consumption duplicated the walk sub-tree until
    // Catalyst spent ~49 s/run re-optimizing it. Budget: the fixed
    // fold-once/emit-once versions measure ~1-3k nodes; 20k leaves
    // headroom for growth while catching any order-of-magnitude jump.
    // Counting rule shared with the committed record (PlanDump).
    def exprSize(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      graft.tools.PlanDump.exprSize(e)
    for (key <- Seq("multimodal_dims", "multimodal_av_meta",
        "multimodal_image_formats", "multimodal_audio_rms")) {
      ExtQueries.clearMemo()
      val t0 = System.nanoTime()
      val qe = graft.SparkEntry.queries(key)(spark, dir).queryExecution
      val nodes = qe.optimizedPlan.collect {
        case p => p.expressions.map(exprSize).sum
      }.sum
      qe.executedPlan // physical planning included in the time budget
      val secs = (System.nanoTime() - t0) / 1e9
      assert(nodes < 20000,
        s"$key optimized plan carries $nodes expression nodes — a " +
          "byte-walk is duplicating sub-trees again")
      assert(secs < 15.0,
        f"$key took $secs%.1f s to analyze+optimize+plan — recurring " +
          "Catalyst cost per execution")
    }
  }

  test("key-skew detector is two hash aggregations — the argmax never joins") {
    val p = plan("events_key_skew")
    assert(!p.contains("Join"), s"argmax grew a join:\n$p")
    assert(p.contains("HashAggregate"), p)
    // (type,user) agg + type agg + output sort
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected two agg exchanges + sort, got $exchanges:\n$p")
  }

  test("level shift: both window frames share one exchange; top-50 is TakeOrdered") {
    val p = plan("ts_level_shift")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-50 cut is a global sort, not TakeOrdered:\n$p")
    assert(!p.contains("Join"), s"level shift must not join:\n$p")
    // the four frame aggregates all partition by event_type and order by
    // (sec, event_id): one hash exchange total
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 1, s"window frames split exchanges, got $exchanges:\n$p")
  }

  test("autocorr reuses the lead-window partitioning for the moment agg") {
    val p = plan("ts_autocorr")
    // lead window hash-partitions on event_type; the groupBy(event_type)
    // satisfies its distribution from the same exchange — one hash
    // exchange + the output sort only
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 2, s"agg re-shuffled after the window, got $exchanges:\n$p")
    assert(p.contains("Window") && p.contains("HashAggregate"), p)
  }

  test("MIPS top-k: native arraydot, TakeOrdered cut, no corpus shuffle") {
    val p = plan("similar_mips_topk")
    assert(p.contains("arraydot"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("Exchange hashpartitioning"),
      s"MIPS scan grew a shuffle:\n$p")
  }

  test("q3: date predicates pushed to both fact scans; top-10 is TakeOrdered") {
    val p = plan("q3_shipping")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate"),
      s"order-date filter not pushed:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"),
      s"ship-date filter not pushed:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 degraded to a global sort:\n$p")
  }

  test("q5: orderdate range pushed; nation-region dim broadcast; no cartesian anywhere") {
    val p = plan("q5_local_supplier")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"order-date range not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), s"q5 grew a cartesian:\n$p")
  }

  test("PQ serving: codebook/LUT broadcast, no SMJ, coarse cut TakeOrdered") {
    val p = plan("similar_pq_topk")
    assert(!p.contains("SortMergeJoin"), s"PQ grew a sort-merge join:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 3, s"PQ exchange budget exceeded: $exchanges:\n$p")
  }

  test("IVFPQ: everything index-side broadcasts; full vectors never shuffle") {
    val p = plan("similar_ivfpq_topk")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 3, s"IVFPQ exchange budget exceeded: $exchanges:\n$p")
  }

  test("CMS heavy hitters: fixed-size matrix partials, no raw-row re-scan join") {
    val p = plan("events_cms_heavy_hitters")
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sequential fits (holt, cusum): one series-collect exchange + " +
    "output sort, no join") {
    for (k <- Seq("ts_holt_forecast", "ts_cusum")) {
      val p = plan(k)
      assert(!p.contains("Join"), s"$k grew a join:\n$p")
      val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
      assert(exchanges <= 2, s"$k exchange budget exceeded: $exchanges:\n$p")
    }
  }

  test("q4: EXISTS is a LEFT SEMI probe (fact rows never multiplied); " +
    "quarter pushed to the orders scan") {
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), s"EXISTS must lower to a semi join:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"quarter window not pushed:\n$p")
  }

  test("q7: shipdate window pushed; the pair-filtered nation dim broadcasts; " +
    "no cartesian") {
    val p = plan("q7_volume_shipping")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"shipdate window not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), s"q7 grew a cartesian:\n$p")
  }

  test("q10: returnflag and quarter window pushed to their scans; " +
    "top-20 is TakeOrdered, never a global sort") {
    val p = plan("q10_returned_revenue")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"returnflag not pushed to the lineitem scan:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"order-date quarter not pushed:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q10 global-sorts:\n$p")
    assert(!p.contains("CartesianProduct"), s"q10 grew a cartesian:\n$p")
  }

  test("q18: the HAVING aggregate runs on lineitem alone BEFORE any join; " +
    "top-100 is TakeOrdered") {
    val p = plan("q18_large_orders")
    assert(p.contains("Keys [1]: [l_orderkey#"),
      s"lineitem not pre-aggregated on l_orderkey:\n$p")
    // the qty filter applies to the aggregate's output, not a joined row
    assert("""qty_dec.* > 250""".r.findFirstIn(p).isDefined,
      s"HAVING threshold missing from the plan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q18 global-sorts:\n$p")
    assert(!p.contains("CartesianProduct"), s"q18 grew a cartesian:\n$p")
  }

  test("q13: orders aggregate to per-customer counts BEFORE the outer " +
    "join (customer never multiplies against raw orders)") {
    val p = plan("q13_customer_distribution")
    assert(p.contains("Keys [1]: [o_custkey#"),
      s"orders not pre-aggregated on o_custkey:\n$p")
    val outerIdx = p.indexOf("LeftOuter")
    assert(outerIdx >= 0, s"q13 lost its outer join:\n$p")
    assert(!p.contains("CartesianProduct"), s"q13 grew a cartesian:\n$p")
  }

  test("q16: the complaint-supplier exclusion is a BROADCAST anti join; " +
    "part's filters prune before the bridge join") {
    val p = plan("q16_supplier_census")
    assert(p.contains("LeftAnti"), s"NOT IN must lower to an anti join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"anti side not broadcast:\n$p")
    assert(p.contains("Not(EqualTo(p_brand,Brand#9))"),
      s"brand exclusion not pushed to the part scan:\n$p")
    assert(!p.contains("CartesianProduct"), s"q16 grew a cartesian:\n$p")
  }

  test("q17: the per-part average aggregates the BRAND-PRUNED fact, " +
    "never full lineitem") {
    val p = plan("q17_small_qty_revenue")
    assert(p.contains("EqualTo(p_brand,Brand#9)"),
      s"brand filter not pushed to the part scan:\n$p")
    // the pre-aggregation keys on l_partkey over the pruned bridge
    assert(p.contains("Keys [1]: [l_partkey#"),
      s"per-part quantity aggregate missing:\n$p")
    assert(!p.contains("CartesianProduct"), s"q17 grew a cartesian:\n$p")
  }

  test("q22: NOT EXISTS is a LEFT ANTI probe; the dormancy window is " +
    "pushed to the orders scan; the global scalar broadcasts") {
    val p = plan("q22_dormant_customers")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must lower to an anti join:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"dormancy window not pushed:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"scalar aggregate not broadcast:\n$p")
  }

  test("q19: each side's superset range pushes to its own scan; " +
    "the disjunction never becomes a cartesian") {
    val p = plan("q19_disjunctive")
    assert(p.contains("GreaterThanOrEqual(l_quantity,1") &&
      p.contains("LessThanOrEqual(l_quantity,30"),
      s"lineitem quantity superset not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(p_size,1") &&
      p.contains("LessThanOrEqual(p_size,35"),
      s"part size superset not pushed:\n$p")
    assert(!p.contains("CartesianProduct"), s"q19 grew a cartesian:\n$p")
  }

  test("q12: ship-year pushed to the lineitem scan; the priority split " +
    "is one conditional aggregation, not two joins") {
    val p = plan("q12_late_shipping")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"ship-year window not pushed:\n$p")
    // one fact⨝fact join, one agg pass — never a per-priority-class scan
    assert("""\(\d+\) [A-Za-z]*HashJoin""".r.findAllIn(p).size == 1,
      s"q12 needs exactly one join:\n$p")
    assert(!p.contains("CartesianProduct"), s"q12 grew a cartesian:\n$p")
  }

  test("q15: the per-supplier revenue materializes ONCE (the max probe " +
    "never re-scans lineitem); the max is a broadcast probe, not a rank " +
    "window over everything") {
    val p = plan("q15_top_supplier")
    // the total+probe double reference of the rev aggregate is the
    // exact shape that re-inlines a whole subtree — the lazy checkpoint
    // cut ENFORCES the single scan instead of hoping for exchange reuse
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("lineitem.parquet")) == 0,
      s"lineitem leaked past the checkpoint (rev agg re-inlined):\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"max scalar + probe must read the one materialized rev table:\n$p")
    assert(!p.contains("Window"), s"q15 must not rank with a window:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"max scalar not broadcast:\n$p")
  }

  test("similar_filtered_topk: the label predicate prunes at the " +
    "embeddings SCAN (pre-filter, before IVF assignment); 3 cells probed; " +
    "top-5 is TakeOrdered") {
    val p = plan("similar_filtered_topk")
    // pre-filter: the predicate reaches the scan feeding the cell
    // assignment — a post-filter (above the top-k limit) could never
    // push there, so this line IS the pre/post distinction
    assert(p.contains("PushedFilters: [IsNotNull(label)"),
      s"label predicate not pushed to the embeddings scan:\n$p")
    assert(p.contains("% 2) = 0"), s"label mod-2 pre-filter missing:\n$p")
    // one extra probed cell vs the unfiltered key (3 vs 2)
    assert(p.contains("Arguments: 3, [qsim"),
      s"probed cell list must be the 3-cell TakeOrdered:\n$p")
    assert(p.contains("Arguments: 5, [sim"),
      s"final top-5 must be TakeOrdered, not a global sort:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"cell-probe join degraded to SMJ:\n$p")
  }

  test("q8: region chain and part filter prune before the fact joins; " +
    "numerator and denominator share one grouped pass") {
    val p = plan("q8_market_share")
    assert(p.contains("EqualTo(p_type,ECONOMY)"),
      s"part-type filter not pushed:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"order-date window not pushed:\n$p")
    // share = conditional sum in ONE aggregate — a second scan of
    // lineitem would show as two parquet reads of it
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("lineitem.parquet")) == 1,
      s"q8 scans lineitem more than once:\n$p")
    assert(!p.contains("CartesianProduct"), s"q8 grew a cartesian:\n$p")
  }

  test("q9: the name-filtered part dim prunes the fact; one grouped " +
    "pass computes profit") {
    val p = plan("q9_profit_by_nation")
    assert(p.contains("StringContains(p_name,rod)"),
      s"name filter not pushed to the part scan:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("lineitem.parquet")) == 1,
      s"q9 scans lineitem more than once:\n$p")
    assert(!p.contains("CartesianProduct"), s"q9 grew a cartesian:\n$p")
  }

  test("q20: per-part totals are a WINDOW over the per-(part,supplier) " +
    "aggregate — one fact scan, no self-join") {
    val p = plan("q20_dominant_supplier")
    assert(p.contains("StringStartsWith(p_name,cold)"),
      s"name prefix not pushed to the part scan:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("lineitem.parquet")) == 1,
      s"q20 scans lineitem more than once — the per-part total must " +
        s"reuse the per-supplier aggregate:\n$p")
    assert("""\(\d+\) Window""".r.findAllIn(p).size == 1,
      s"per-part share must be one window pass:\n$p")
    assert(!p.contains("CartesianProduct"), s"q20 grew a cartesian:\n$p")
  }

  test("ts_stl_decompose: the detrended frame materializes ONCE (both " +
    "consumers read the checkpointed RDD — no re-scan of events)") {
    val p = plan("ts_stl_decompose")
    // the series+window pipeline lives behind the lazy checkpoint; the
    // outer plan must show its two consumers reading that ONE frame,
    // never a second events scan or a re-run window
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the checkpoint (pipeline re-inlined):\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"both consumers must read the one materialized frame:\n$p")
    assert(!p.contains("Window"), s"the MA window re-ran downstream:\n$p")
    assert(!p.contains("CartesianProduct"), s"stl grew a cartesian:\n$p")
  }

  test("ts_sax_symbols: the PAA table materializes once; the per-type " +
    "stats broadcast back") {
    val p = plan("ts_sax_symbols")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the checkpoint (pipeline re-inlined):\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"both consumers must read the one materialized PAA table:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"stats join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"stats join degraded to SMJ:\n$p")
  }

  test("orders_ntile_deciles: NO per-class ntile window — ranks come " +
    "from the (class, bucket)-partitioned two-pass rank; offsets broadcast") {
    val p = plan("orders_ntile_deciles")
    assert(!p.contains("ntile("), s"the 5-partition NTILE window is back:\n$p")
    // the only window over fact-scale rows must be partitioned by
    // (class, __bucket) — 20k+ partitions, never 5
    val rnLine = p.linesIterator.find(_.contains("row_number()"))
    assert(rnLine.exists(_.contains("__bucket")),
      s"row_number window not bucket-partitioned:\n$p")
    // bucket-count pass + rank pass: exactly two pruned scans
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("orders.parquet")) == 2,
      s"expected exactly the two rank passes over orders:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket-offset table not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"offset join degraded to SMJ:\n$p")
  }

  test("doc_bigram_logprob: the STREAM joins the pre-scored bigram " +
    "vocab exactly once through the size gate (r17)") {
    // r17 shape: the log-prob is computed at the bigram-VOCAB grain
    // (bcount × two lazy-gated unigram censuses × the 1-row total),
    // and the corpus-scale bigram stream joins that scored table
    // exactly once — eager-gated, so at sf0.001 the hint is present
    // and the stream never shuffles. Hints visible in the final
    // analyzed plan: exactly the 1 gated scored table (the vocab-grain
    // scoring — its unigram joins lazy-gated, its 1-row total
    // broadcast — sits behind the scored checkpoint).
    assert(hintCount("doc_bigram_logprob") == 1,
      "bigram LM: exactly the one gated scored-table hint")
    val p = plan("doc_bigram_logprob")
    // stream scan + the inline 1-row token total = 2; the count tables
    // sit behind checkpoints
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) <= 2,
      s"the bigram stream must scan documents once (plus the scalar):\n$p")
  }

  test("q2: the cheapest supplier is a struct-MIN aggregation, not a " +
    "rank window; dims join after the cut; top-100 is TakeOrdered") {
    val p = plan("q2_min_price_supplier")
    assert(!p.contains("Window"), s"q2 ranks with a window:\n$p")
    assert(p.contains("min_by") || p.contains("minby"),
      s"q2 lost the struct-min argmax:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q2 global-sorts:\n$p")
    assert(!p.contains("CartesianProduct"), s"q2 grew a cartesian:\n$p")
  }

  test("q11: the per-part value materializes ONCE; the global total " +
    "broadcasts back — no second scan of the join tree") {
    val p = plan("q11_important_stock")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("lineitem.parquet")) == 0,
      s"lineitem leaked past the checkpoint (tree re-inlined):\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"both consumers must read the one materialized value table:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"total scalar not broadcast:\n$p")
  }

  test("dedup_loss_weights: ONE hash-partitioned window computes size " +
    "and canonical — no self-join of the hash table") {
    val p = plan("dedup_loss_weights")
    assert("""\(\d+\) Window""".r.findAllIn(p).size == 1,
      s"weights must be one window pass:\n$p")
    assert(!p.contains("Join"), s"loss weights grew a join:\n$p")
    // window exchange + output sort only
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size <= 2,
      s"unexpected exchanges:\n$p")
  }

  test("events_ab_lift: both arms aggregate in ONE grouped pass — " +
    "no per-arm scan, no join") {
    val p = plan("events_ab_lift")
    assert(!p.contains("Join"), s"ab lift grew a join:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1,
      s"ab lift scans events more than once:\n$p")
  }

  test("orders_pareto_share: NO per-class ntile window — the customer " +
    "revenue table materializes once; ranks are bucket-partitioned; the " +
    "only class-partitioned windows run over the ≤50 decile rows") {
    val p = plan("orders_pareto_share")
    assert(!p.contains("ntile("), s"the 5-partition NTILE window is back:\n$p")
    // the rev aggregate is cut by the lazy checkpoint: orders never
    // leaks into the outer plan, and the three consumers (min/max
    // stats, bucket counts, rank join) read the ONE materialized frame
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("orders.parquet")) == 0,
      s"orders leaked past the checkpoint (rev agg re-inlined):\n$p")
    // counts pass + rank pass, each carrying its own inlined copy of
    // the one-row min/max scalar aggregate (cheap: it reads the
    // materialized frame, not the orders fact) = 4 ExistingRDD reads
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 4,
      s"the rank passes must read the one materialized rev table:\n$p")
    val rnLine = p.linesIterator.find(_.contains("row_number()"))
    assert(rnLine.exists(_.contains("__bucket")),
      s"row_number window not bucket-partitioned:\n$p")
    assert(!p.contains("SortMergeJoin"), s"offset join degraded to SMJ:\n$p")
  }

  test("similar_ood_score: one broadcast-centroid argmax pass + " +
    "TakeOrdered — no window, no shuffle of the vectors for the join") {
    val p = plan("similar_ood_score")
    assert(p.contains("TakeOrderedAndProject"), s"ood global-sorts:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"centroid join degraded to SMJ:\n$p")
    assert(p.contains("arraydot"), s"cosine not codegen'd:\n$p")
  }

  test("q21: the double-correlated EXISTS lowers to grouped aggregates " +
    "— lineitem never self-joins; top-20 is TakeOrdered") {
    val p = plan("q21_sole_late_supplier")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("lineitem.parquet")) == 1,
      s"q21 scans lineitem more than once (self-join crept in):\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q21 global-sorts:\n$p")
    assert(!p.contains("CartesianProduct"), s"q21 grew a cartesian:\n$p")
  }

  // ---- round 9 --------------------------------------------------------

  test("ts_ols_trend: ONE hash aggregation — no window, no join, one " +
    "events scan") {
    val p = plan("ts_ols_trend")
    assert(!p.contains("Window"), s"OLS grew a window:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1,
      s"trend fit must be one scan:\n$p")
    assert(!p.contains("Join"), s"OLS grew a join:\n$p")
  }

  test("ts_drawdown: the slot-collapsed series materializes ONCE (max " +
    "table + trough probe share it); the max table broadcasts") {
    val p = plan("ts_drawdown")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"max scalar + trough probe must read the one slot series:\n$p")
    assert(!p.contains("SortMergeJoin"), s"max probe degraded to SMJ:\n$p")
  }

  test("ts_bollinger: windows run over the slot-COLLAPSED series (one " +
    "events scan, aggregate below the window)") {
    val p = plan("ts_bollinger")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1,
      s"bollinger must scan events once:\n$p")
    // the collapse aggregate keys on (event_type, slot) below the window
    assert(p.contains("Keys [2]"), s"slot collapse missing:\n$p")
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("orders_rfm_segments: no ntile window anywhere; every " +
    "row_number is bucket-partitioned; the fact materializes once") {
    val p = plan("orders_rfm_segments")
    assert(!p.contains("ntile("), s"a global NTILE window crept in:\n$p")
    val rnLines = p.linesIterator.filter(_.contains("row_number()")).toSeq
    assert(rnLines.nonEmpty && rnLines.forall(_.contains("__bucket")),
      s"a row_number window is not bucket-partitioned:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("orders.parquet")) == 0,
      s"orders leaked past the rfm checkpoint:\n$p")
    // the bucket-offset tables are literal bounded artifacts riding
    // broadcast joins; the three customer-grain score joins are
    // big-big and legitimately sort-merge at scale — only the offsets
    // must never shuffle
    assert(p.contains("BroadcastHashJoin"),
      s"bucket-offset tables not broadcast:\n$p")
  }

  test("events_dau_wau: day-grain distinct materializes once; the " +
    "trailing-window expansion reads it, never the fact") {
    val p = plan("events_dau_wau")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the user-day checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"dau + expansion must read the one user-day table:\n$p")
    assert(p.contains("Generate") && p.contains("explode"),
      s"contribution expansion missing:\n$p")
  }

  test("events_funnel_time: per-user firsts materialize once; counts + " +
    "quantiles share them; cohort windows never touch the fact") {
    val p = plan("events_funnel_time")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the conv checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"counts + quantiles must read the one conv table:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("events_top_paths: rn<=3 cut precedes every collect buffer — " +
    "the user-partitioned window spills, an unbounded collect_list " +
    "doesn't; top-10 is TakeOrdered") {
    val p = plan("events_top_paths")
    val rnLine = p.linesIterator.find(_.contains("row_number()"))
    assert(rnLine.exists(_.contains("user_id")),
      s"first-3 window must partition on the high-cardinality user key:\n$p")
    assert(p.contains("<= 3"),
      s"missing the rn<=3 cut before aggregation:\n$p")
    // rank-limit pushdown: the rn<=3 predicate must reach the map side
    // as a WindowGroupLimit BELOW the shuffle — each task keeps ≤3 rows
    // per user before any exchange, so a power user's history never
    // even shuffles in full
    assert(p.contains("WindowGroupLimit"),
      s"rn<=3 not pushed down as a group limit:\n$p")
    // the collect aggregate must NOT consume raw fact rows: the
    // collected struct carries rn, a column that only exists above the
    // window+filter, so the buffer's input grain is ≤3 rows/user —
    // never a user's full history
    val aggLines = p.linesIterator.filter(_.contains("collect_list")).toSeq
    assert(aggLines.nonEmpty && aggLines.forall(_.contains("rn#")),
      s"collect_list consumes pre-cut fact rows:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1,
      s"paths must scan events once:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-10 global-sorts:\n$p")
  }

  test("events_user_gini: user-count aggregate materializes once; the " +
    "rank window is bucket-partitioned") {
    val p = plan("events_user_gini")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the user-count checkpoint:\n$p")
    val rnLine = p.linesIterator.find(_.contains("row_number()"))
    assert(rnLine.exists(_.contains("__bucket")),
      s"rank window not bucket-partitioned:\n$p")
    assert(!p.contains("SortMergeJoin"), s"offset join degraded to SMJ:\n$p")
  }

  test("orders_interorder_gap: the lag window partitions on the " +
    "high-cardinality customer key, never the segment") {
    val p = plan("orders_interorder_gap")
    val lagLine = p.linesIterator.find(_.contains("lag("))
    assert(lagLine.exists(_.contains("o_custkey")),
      s"lag window not customer-partitioned:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("orders.parquet")) == 1,
      s"gap pass must scan orders once:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("decontaminate_minhash: eval bands probe via semi join, the " +
    "verdict is an anti join — the corpus band stream never self-joins") {
    val p = plan("decontaminate_minhash")
    assert(p.contains("LeftSemi"), s"band probe must be a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"verdict must be an anti join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("quality_gopher: a pure narrow projection — no aggregate, no " +
    "window, no join; only the output sort exchanges") {
    val p = plan("quality_gopher")
    assert(!p.contains("HashAggregate") && !p.contains("Window") &&
      !p.contains("Join"), s"gopher rules must stay narrow:\n$p")
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1,
      s"only the output sort may exchange:\n$p")
  }

  test("doc_ngram_entropy: two hash aggregations, no window, one " +
    "documents scan") {
    val p = plan("doc_ngram_entropy")
    assert(!p.contains("Window"), p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 1,
      s"entropy must scan documents once:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("dedup_cross_source: fingerprint audit is one aggregation over " +
    "a narrow projection — no window, no join") {
    val p = plan("dedup_cross_source")
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 1,
      s"audit must scan documents once:\n$p")
  }

  test("corpus_token_budget: rank + cumulative come from the bounded " +
    "triangular join — no window operator; the fact materializes once") {
    val p = plan("corpus_token_budget")
    assert(!p.contains("Window"), s"budget fill grew a window:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the source checkpoint:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the triangular join must broadcast the bounded source table:\n$p")
  }

  test("grafana_long_json: boundary table broadcasts back onto the " +
    "bucketed stream; the JSON assembles in two aggregation passes") {
    val p = plan("grafana_long_json")
    // bucket-boundary pass + join pass: the two documented scans
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 2,
      s"expected the boundary + join scans only:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"boundary table not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ts_block_maxima: two hash aggregations, no window, no join, " +
    "one events scan") {
    val p = plan("ts_block_maxima")
    assert(!p.contains("Window"), s"block maxima grew a window:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1,
      s"block maxima must scan events once:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("orders_cohort_ltv: the cohort-tagged frame materializes once " +
    "(sizes + revenue share it); cohort sizes broadcast") {
    val p = plan("orders_cohort_ltv")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("orders.parquet")) == 0,
      s"orders leaked past the cohort checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"sizes + revenue must read the one cohort frame:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"cohort sizes not broadcast:\n$p")
  }

  test("similar_cluster_purity: codegen'd cosine assignment; cluster " +
    "windows never shuffle vectors via SMJ") {
    val p = plan("similar_cluster_purity")
    assert(p.contains("arraydot"), s"cosine not codegen'd:\n$p")
    assert(!p.contains("SortMergeJoin"), s"label join degraded to SMJ:\n$p")
  }

  test("doc_jaccard_sources: the (source, token) distinct materializes " +
    "once; sizes broadcast; pair join is token-bucketed, no cartesian") {
    val p = plan("doc_jaccard_sources")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the vocab checkpoint:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"sizes not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"pair stage went all-pairs:\n$p")
  }

  test("dedup_threshold_curve: the 4-row threshold table broadcasts " +
    "against the candidate-scale pair table — no cartesian") {
    val p = plan("dedup_threshold_curve")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"threshold table not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("basket_brand_affinity: the (order, brand) frame materializes " +
    "once; supports broadcast; top-20 is TakeOrdered") {
    val p = plan("basket_brand_affinity")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("lineitem.parquet")) == 0,
      s"lineitem leaked past the basket checkpoint:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"supports not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 global-sorts:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("supplier_share_hhi: one lineitem scan; part broadcasts; the " +
    "total is a window over the bounded (brand, supplier) aggregate") {
    val p = plan("supplier_share_hhi")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("lineitem.parquet")) == 1,
      s"hhi must scan lineitem once:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part dim not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("events_mix_drift: (day, type) counts materialize once; the " +
    "dense grid is a 5-row broadcast cross; global dist broadcasts") {
    val p = plan("events_mix_drift")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the counts checkpoint:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"type grid not a broadcast cross:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("downsample_m4: ONE hash aggregation carries all four M4 " +
    "values — no window, no join, one pushed scan") {
    val p = plan("downsample_m4")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"M4 must stay one aggregation:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1,
      s"M4 must scan events once:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(ts)"),
      s"time range not pushed:\n$p")
  }

  test("doc_hill_tail: two hash aggregations, no window, no join, one " +
    "documents scan") {
    val p = plan("doc_hill_tail")
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 1,
      s"hill tail must scan documents once:\n$p")
  }

  test("bpe_fertility: word-grain segmentation (no per-doc re-encode); " +
    "no window; no cartesian") {
    val p = plan("bpe_fertility")
    // the encode chain is word-grain: the only join keys are the word
    assert(!p.contains("Window"), s"fertility grew a window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("events_cuped_lift: two hash aggregations — no window, no " +
    "join, one events scan") {
    val p = plan("events_cuped_lift")
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1,
      s"CUPED must scan events once:\n$p")
  }

  test("events_attribution: ONE user-partitioned window pass " +
    "materializes both touches; the two credit rollups share it") {
    val p = plan("events_attribution")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the touch checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"first/last credit must read the one touch frame:\n$p")
  }

  test("events_bot_score: the lag window partitions on the user key; " +
    "one events scan, no join") {
    val p = plan("events_bot_score")
    val lagLine = p.linesIterator.find(_.contains("lag("))
    assert(lagLine.exists(_.contains("user_id")),
      s"lag window not user-partitioned:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1,
      s"bot score must scan events once:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("ts_running_max_split: every row-grain window partitions on " +
    "(series, slice) — no whole-series sort task anywhere") {
    val p = plan("ts_running_max_split")
    val winLines = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, s"subsplit lost its windows:\n$p")
    // the only window WITHOUT __slice in its partition spec is the
    // carry pass over the bounded (series × nSlices) table
    assert(winLines.exists(_.contains("__slice")),
      s"local prefix window is not slice-partitioned:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"carry-in must broadcast back, not shuffle:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  // ---- r11 keys ----------------------------------------------------

  test("matryoshka ANN: native arraydot, TakeOrdered cuts, no corpus " +
    "shuffle or sort") {
    val p = plan("similar_matryoshka_topk")
    assert(p.contains("arraydot"), p)
    assert(p.contains("TakeOrderedAndProject"), s"coarse cut must be " +
      s"TakeOrdered, not a global sort:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("text_ngram_novelty: first-doc is a min window RIDING the gram " +
    "repartition — one fact scan, NO join, no doc-pair stage (r17)") {
    val p = plan("text_ngram_novelty")
    // r17 shape: explode → Exchange(gram) → (doc,gram) count (exchange
    // REUSED) → min-over-gram window (reused again) → groupBy(doc) —
    // the former groupBy(gram) + join-back (two more Exchanges + a
    // checkpoint) is gone. The window partitions on the
    // high-cardinality gram key, never on doc-pair anything.
    assert(!p.contains("Join"), s"novelty re-grew a join stage:\n$p")
    assert(p.contains("Window"), s"first-doc window missing:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 1,
      s"expected exactly one fact scan:\n$p")
    // gram repartition + groupBy(doc) + output sort = 3 exchanges max
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("fixed-offset image formats: single narrow pass, no join, no " +
    "UDF, one output-sort exchange") {
    val p = plan("multimodal_image_formats")
    assert(!p.contains("Join"), s"header parse must not join:\n$p")
    assert(!p.contains("ScalaUDF"), s"parse left codegen:\n$p")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected the output sort only, got $exchanges:\n$p")
  }

  test("corpus_pack_waste: broadcast 3-row length table × one " +
    "map-side-combinable aggregation — no window, one fact scan") {
    val p = plan("corpus_pack_waste")
    assert(!p.contains("Window"), p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 1,
      s"pack audit must scan documents once:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"length table must broadcast:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("decontaminate_substring: fragment set broadcasts; the hit list " +
    "broadcasts back as an anti join — the corpus never shuffles") {
    val p = plan("decontaminate_substring")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"contains probe must ride a broadcast of the fragments:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus shuffled for decontamination:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) <= 3,
      s"document scans grew past frags+probe+survivors:\n$p")
  }

  test("events_diff_in_diff: one grouped pass over the checkpointed " +
    "fact × a broadcast 1-row bounds table — no window, no fact join") {
    val p = plan("events_diff_in_diff")
    assert(!p.contains("Window"), p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"bounds + grouped pass must share the one filtered fact:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"bounds must broadcast:\n$p")
  }

  test("similar_ivf_probe_curve: all three arms read the ONE " +
    "checkpointed assignment + exact top-10 — no re-scan per nprobe") {
    val p = plan("similar_ivf_probe_curve")
    assert(p.contains("Union"), p)
    // per arm: qcells(centroids + q) + ivf(assigned + q) + exact = 5
    // checkpointed reads ×3 arms = 15; the embeddings parquet itself
    // must not appear once per arm
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 15,
      s"arms must share the checkpointed passes:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("embeddings.parquet")) == 0,
      s"embeddings leaked past the checkpoints:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("dedup_band_tuning: four one-row aggregates over the CACHED " +
    "pair table — fact never rescanned, no window, no cartesian") {
    val p = plan("dedup_band_tuning")
    assert(p.contains("Union"), p)
    assert(p.contains("InMemoryTableScan"),
      s"band tuning must read the memoized jaccard index:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
  }

  test("events_srm_check: distinct + one agg on the user grain — no " +
    "join, no window, one events scan") {
    val p = plan("events_srm_check")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1,
      s"SRM must scan events once:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("quality_linear_score: one word-grain scan into one hash " +
    "aggregation — no window, no join") {
    val p = plan("quality_linear_score")
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 1,
      s"linear scorer must scan documents once:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("ts_perm_entropy: one series-partitioned lead window; entropy " +
    "reads the checkpointed 6-row-per-series pattern table") {
    val p = plan("ts_perm_entropy")
    val winLine = p.linesIterator.find(_.contains("windowspecdefinition"))
    assert(winLine.isEmpty || winLine.exists(_.contains("event_type")),
      s"lead window not series-partitioned:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the pattern-count checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"totals + entropy must read the one pattern table:\n$p")
  }

  // ---- r10 corpus-observability keys (pins added r11 — these four
  // shipped in the r10 end-of-round snapshot without plan pins) ------

  test("doc_source_kl: fact scanned once behind the (source,word) " +
    "checkpoint; totals broadcast; no cartesian") {
    val p = plan("doc_source_kl")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the (source,word) checkpoint:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"marginal/totals must read the checkpointed count table:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"per-source totals must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in KL:\n$p")
    assert(!p.contains("Window"), s"KL needs no window:\n$p")
  }

  test("doc_js_divergence: fact scanned once behind the (source,word) " +
    "checkpoint; pair join token-bucketed; totals broadcast") {
    val p = plan("doc_js_divergence")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the (source,word) checkpoint:\n$p")
    // totals×2 + a side + b side all read the one checkpointed table
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 4,
      s"both join sides + both totals must read the one count table:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"per-source totals must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"pair stage went all-pairs:\n$p")
    assert(!p.contains("Window"), s"JSD needs no window:\n$p")
  }

  test("quality_lexical_complexity: pure per-row lambdas — one scan, " +
    "no explode, no join, no window") {
    val p = plan("quality_lexical_complexity")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 1,
      s"documents must scan exactly once:\n$p")
    assert(!p.contains("Generate"), s"explode crept in:\n$p")
    assert(!p.contains("Join"), s"join crept in:\n$p")
    assert(!p.contains("Window"), s"window crept in:\n$p")
  }

  test("ts_anomaly_esd: ONE grid pass feeds the peel (r15 ask #7) — " +
    "the output frame is a pure local relation; the candidate scan " +
    "ran exactly one events read with the moments and both extreme " +
    "ranks fused into its window stage") {
    // the returned frame is the driver-peeled result: local rows only
    val p = plan("ts_anomaly_esd")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"the output must be a local relation, not a corpus re-scan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the candidate stage itself: one events scan, windows fused over
    // one exchange (moments + rank-desc + rank-asc share the shuffle)
    import org.apache.spark.sql.functions._
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val grid = graft.queries.TsQueries.base(spark, dir)
      .filter(col("value").isNotNull && !isnan(col("value")))
      .groupBy("event_type", "slot")
      .agg((sum(col("value").cast(dec6)).cast("double") /
        count(lit(1))).as("v"))
    val wPart = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
    val cand = grid
      .withColumn("n", count(lit(1)).over(wPart))
      .withColumn("s", sum(col("v").cast(dec6)).over(wPart))
      .withColumn("ss", sum((col("v") * col("v")).cast(dec12)).over(wPart))
      .withColumn("rn_hi", row_number().over(
        wPart.orderBy(col("v").desc, col("slot").asc)))
      .withColumn("rn_lo", row_number().over(
        wPart.orderBy(col("v").asc, col("slot").asc)))
      .filter(col("rn_hi") <= 3 || col("rn_lo") <= 3)
    val cp = cand.queryExecution.executedPlan.toString
    assert(cp.linesIterator.count(l =>
        l.contains("Location") && l.contains("events.parquet")) == 1,
      s"the candidate stage must scan events exactly once:\n$cp")
    assert("""\(\d+\) Exchange""".r.findAllIn(cp).size <= 2,
      s"windows must share the per-series exchange:\n$cp")
  }

  test("orders_survival_km: orders reduce behind the observation " +
    "checkpoint; at-risk + horizons are broadcast joins, no window") {
    val p = plan("orders_survival_km")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("orders.parquet")) == 0,
      s"orders leaked past the observation checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 3,
      s"total + both duration-table readers must hit the checkpoints:\n$p")
    assert(!p.contains("Window"),
      s"the lead window must stay inside the checkpointed lineage:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"at-risk/horizon joins over tiny tables must broadcast:\n$p")
  }

  test("graph_link_pred: hub-capped pair stage, anti-join on edges, " +
    "TakeOrdered top-20 — no cartesian, no window") {
    val p = plan("graph_link_pred")
    assert(!p.contains("CartesianProduct"),
      s"pair stage went all-pairs:\n$p")
    assert(!p.contains("Window"), s"CN scoring needs no window:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must not global-sort:\n$p")
    assert(p.contains("LeftAnti"), s"existing edges must anti-join:\n$p")
  }

  test("corpus_length_percentiles: one narrow scan, one hash agg — " +
    "no join, no window, no explode") {
    val p = plan("corpus_length_percentiles")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 1,
      s"documents must scan exactly once:\n$p")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Generate"), p)
  }

  test("ts_changepoint: prefix pass materializes once; totals " +
    "broadcast; argmax is a struct-max, no second window") {
    val p = plan("ts_changepoint")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the prefix checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"totals + candidate scan must read the one prefix pass:\n$p")
    assert(!p.contains("Window"),
      s"the argmax must be a struct-max over the candidates:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"totals not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("text_kneser_ney: censuses re-aggregate the one checkpointed " +
    "bigram table; no doc-grain work, no window") {
    val p = plan("text_kneser_ney")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the bigram checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 4,
      s"left/right censuses + type total + final scan must read the one bigram table:\n$p")
    assert(!p.contains("Window"), s"KN needs no window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
  }

  test("embedding_clip_audit: one posexplode pass; the 64-row " +
    "percentile table broadcasts back; no window") {
    val p = plan("embedding_clip_audit")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("embeddings.parquet")) == 0,
      s"embeddings leaked past the posexplode checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"percentile build + count pass must share the exploded frame:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the percentile table must broadcast:\n$p")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ts_ljung_box: slot grid materializes once; means broadcast; " +
    "all five leads ride one series-partitioned window") {
    val p = plan("ts_ljung_box")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the slot-grid checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"means + lead pass must read the one slot grid:\n$p")
    assert(p.linesIterator.count(l => l.trim.matches("""\(\d+\) Window""")) <= 1,
      s"the five leads must share one window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"per-series means must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ts_macd: one events scan; the three fold windows and the lag " +
    "share one series sort; no join") {
    val p = plan("ts_macd")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1,
      s"events must scan exactly once:\n$p")
    assert(!p.contains("Join"), s"MACD needs no join:\n$p")
    assert(p.linesIterator.count(_.trim.matches("""\(\d+\) Sort""")) <= 2,
      s"fold windows must share the series sort (plus the output sort):\n$p")
  }

  test("quality_calibration: score + rule sides scan docs once each; " +
    "doc-grain id join; 10-row decile agg, no window") {
    val p = plan("quality_calibration")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 2,
      s"exactly the score and rule sides may scan documents:\n$p")
    assert(!p.contains("Window"), s"calibration needs no window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ts_spectral_power: slot grid materializes once; mean joins " +
    "broadcast; constant x2 period fanout; no window") {
    val p = plan("ts_spectral_power")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the slot-grid checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"mean + projection must read the one slot grid:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"per-series means must broadcast:\n$p")
    assert(!p.contains("Window"), s"projection needs no window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("corpus_shard_balance: one agg pass behind the checkpoint; " +
    "total is a broadcast scalar, not a window") {
    val p = plan("corpus_shard_balance")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the shard-table checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"total + shares must read the one 16-row shard table:\n$p")
    assert(!p.contains("Window"), s"share must not window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("corpus_split_assign: census checkpoint feeds both sides; " +
    "source totals broadcast; no window") {
    val p = plan("corpus_split_assign")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the census checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"census + totals must read the one (source,split) table:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"per-source totals must broadcast:\n$p")
    assert(!p.contains("Window"), s"share must not window:\n$p")
  }

  test("doc_vocab_growth: no global rank — first-doc-id agg × " +
    "broadcast 10-row cuts; fact scanned exactly twice") {
    val p = plan("doc_vocab_growth")
    assert(!p.contains("Window"), s"Heaps curve must not rank:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 2,
      s"fact scans grew past types-pass + token-pass (cuts must ride " +
        s"the checkpoint, bounds must not recompute):\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"checkpoint cuts must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"growth curve must never shuffle-join the fact:\n$p")
  }

  test("dedup_normalized: base + variant scans union into ONE hash " +
    "agg — only the md5 shuffles, no join, no window") {
    val p = plan("dedup_normalized")
    assert(p.contains("Union"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 2,
      s"normalized dedup must scan documents exactly twice (base + variants):\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("embedding_norm_stats: two linear passes over embeddings meet " +
    "in a broadcast join — no window, no shuffle join") {
    val p = plan("embedding_norm_stats")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("embeddings.parquet")) == 2,
      s"norm stats must scan embeddings exactly twice (norms + mean vector):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the labels-grain aggregates must meet in a broadcast join:\n$p")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin") &&
      !p.contains("CartesianProduct"), p)
    assert(p.contains("Generate"), s"mean vector needs the posexplode pass:\n$p")
  }

  test("corpus_epoch_schedule: totals + per-source rows share the ONE " +
    "checkpointed source table; totals broadcast; no window") {
    val p = plan("corpus_epoch_schedule")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the source-tokens checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"totals + schedule must read the one per-source table:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row totals frame must broadcast:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
  }

  test("events_power_mde: one grouped pass with conditional " +
    "aggregates — no join, no window, one events scan") {
    val p = plan("events_power_mde")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1,
      s"MDE must scan events once:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("decontaminate_semantic: broadcast NLJ probe + broadcast anti " +
    "— the corpus never shuffles, no window, no shuffle join") {
    val p = plan("decontaminate_semantic")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the constant-size benchmark side must broadcast into the probe:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window") &&
      !p.contains("CartesianProduct"), p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("embeddings.parquet")) == 3,
      s"probe + bench + anti base = exactly three embeddings scans:\n$p")
  }

  test("corpus_dsir_weights: one checkpointed vocab table feeds the " +
    "log-ratio join; the fact streams once; no window") {
    val p = plan("corpus_dsir_weights")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 1,
      s"the token stream must be the only documents scan (vocab is checkpointed):\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"log-ratio table + totals must both read the one vocab checkpoint:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 1-row totals frame must broadcast into the vocab table:\n$p")
  }

  test("decontaminate_agreement: the three flagged sets build behind " +
    "ONE checkpoint; the readout never rescans documents; no window") {
    val p = plan("decontaminate_agreement")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the flagged-set checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 4,
      s"census x2 + pair join x2 must all read the one flagged checkpoint:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("events_holm_correction: the fact reduces in one checkpointed " +
    "grouped pass; rank + step-down are broadcast self-joins, no window") {
    val p = plan("events_holm_correction")
    // the zcrit-joined frame is a lazy checkpoint with 3 readers
    // (step-down left side + broadcast b-side + bonferroni scalar);
    // the first checkpoint (per-type aggregate, 3 readers of its own)
    // sits INSIDE this frame's truncated lineage, so the final plan
    // sees exactly the second frame's fanout and nothing deeper
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 3,
      s"the zcrit-joined frame must materialize once and fan out x3:\n$p")
    assert(!p.contains("Window"),
      s"no window may touch the frame (empty-partition warnings):\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"every join over the tiny frame must broadcast:\n$p")
    // ≤#event_types rows: the non-equi step-down join and the scalar
    // bonferroni cross both broadcast their build side
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BuildRight"), p)
  }

  test("similar_hard_negatives: broadcast query probe + struct-min " +
    "argmax — the corpus streams once, no window over candidates") {
    val p = plan("similar_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the constant-size query sample must broadcast:\n$p")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin") &&
      !p.contains("CartesianProduct"), p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("embeddings.parquet")) == 2,
      s"corpus + query sample = exactly two embeddings scans:\n$p")
    // the struct-min argmax is a SortAggregate (struct buffers are not
    // hash-aggregable) — the property that matters is that a PARTIAL
    // aggregate sits between the probe join and the first exchange, so
    // only queries-grain partials ever shuffle, never candidates
    val tree = p.linesIterator.takeWhile(l => !l.trim.startsWith("(")).toSeq
    val idxNlj = tree.indexWhere(_.contains("BroadcastNestedLoopJoin"))
    val idxExch = tree.lastIndexWhere(_.contains("Exchange"), idxNlj)
    assert(idxExch >= 0 && tree.slice(idxExch, idxNlj)
      .exists(_.contains("Aggregate")),
      s"no partial aggregate between the probe join and the shuffle:\n$p")
  }

  test("corpus_embedding_coverage: one scan per side into one join + " +
    "one agg — no window, physical join left to AQE") {
    val p = plan("corpus_embedding_coverage")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 1, p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("embeddings.parquet")) == 1, p)
    assert(p.contains("Join") && !p.contains("Window") &&
      !p.contains("CartesianProduct"), p)
  }

  test("ts_hurst: one events scan; the only full-series op is the " +
    "shared row_number window; blocks aggregate independently") {
    val p = plan("ts_hurst")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1,
      s"the series must be read once:\n$p")
    assert(p.contains("Window"), p)
    assert(p.contains("Generate"), s"the block-size explode is missing:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"hurst must not join anything:\n$p")
    val tree = p.linesIterator.takeWhile(l => !l.trim.startsWith("(")).toSeq
    assert(tree.count(_.contains("Window")) == 1,
      s"exactly one window (the per-type row_number):\n$p")
  }

  test("ts_forecast_backtest: per-series folds behind one grouped " +
    "collect — one events scan, no join, no window") {
    val p = plan("ts_forecast_backtest")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1, p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("Aggregate"), p)
  }

  test("corpus_dup_inflation: hash-group + join back on the digest — " +
    "exactly two documents scans, no window") {
    val p = plan("corpus_dup_inflation")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 2,
      s"canonical table + token stream = exactly two scans:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the size-gated canonical join must broadcast at this SF:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
  }

  test("quality_rule_impact: one verdict projection, constant x4 " +
    "explode, one hash agg — no join, no window, one docs scan") {
    val p = plan("quality_rule_impact")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 1, p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("Generate") && p.contains("HashAggregate"), p)
  }

  test("doc_boilerplate_prefix: one docs scan into two hash aggs and " +
    "a struct-min argmax — no join, no window") {
    val p = plan("doc_boilerplate_prefix")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 1, p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("Aggregate"), p)
  }

  test("orders_benford: one orders scan behind the 9-row digit " +
    "checkpoint; total is a broadcast — no window, no SMJ") {
    val p = plan("orders_benford")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("orders.parquet")) == 0,
      s"orders leaked past the digit checkpoint:\n$p")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin") &&
      !p.contains("CartesianProduct"), p)
  }

  test("events_k_anonymity: one events scan, one distinct-agg pass — " +
    "no join, no window") {
    val p = plan("events_k_anonymity")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1, p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("events_msprt: fact collapses behind the daily checkpoint; " +
    "cumulative windows run on the stub only") {
    val p = plan("events_msprt")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the daily checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 1,
      s"exactly one reader of the daily stub:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("events_bootstrap_ci: one events scan; the 32x Poisson fanout " +
    "feeds straight into partial aggregation — no join, no window") {
    val p = plan("events_bootstrap_ci")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1, p)
    assert(p.contains("Generate"),
      s"replicate fanout must be an explode, not a join:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("events_path_entropy: transition census checkpointed; marginal " +
    "+ entropy join read the stub, join broadcasts") {
    val p = plan("events_path_entropy")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the transition checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"census read twice (fact side + marginal), nothing else:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("corpus_source_gini: one docs pass behind the per-source " +
    "checkpoint; both rank joins are broadcast inequality joins on " +
    "the stub — no window") {
    val p = plan("corpus_source_gini")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the per-source checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 4,
      s"per-source stub read 4x (2 rank fact sides + 2 broadcast):\n$p")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"), p)
  }

  test("doc_chi2_terms: census + source marginal checkpointed, top-5 " +
    "pushes down as WindowGroupLimit") {
    val p = plan("doc_chi2_terms")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=5 must push below the shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents must hide behind the census/marginal checkpoints:\n$p")
  }

  test("dedup_canonical_quality: cluster argmax is a struct-max " +
    "aggregate — no window, no cartesian") {
    val p = plan("dedup_canonical_quality")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Aggregate"), p)
  }

  test("ts_twap: slot collapse precedes the single lead window; " +
    "weighted sums are decimal") {
    val p = plan("ts_twap")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1, p)
    assert("""\(\d+\) Window""".r.findAllIn(p).size == 1,
      s"exactly one window operator:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("ts_ewm_volatility: one events scan; lag + trailing collect " +
    "share the series sort — no join") {
    val p = plan("ts_ewm_volatility")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1, p)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
  }

  test("orders_weibull_fit: orders hide behind the bucketed-rank " +
    "checkpoint; the offsets join broadcasts") {
    val p = plan("orders_weibull_fit")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("orders.parquet")) == 0,
      s"orders leaked past the rank checkpoint:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("events_qte: one fact pass behind the quantile checkpoint; " +
    "both arm readers broadcast-join the stub") {
    val p = plan("events_qte")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the quantile checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"both arm frames must read the one checkpoint:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("embedding_corr_audit: moments + Gram triangle come from the " +
    "one-pass gram_stats checkpoint — no posexplode anywhere; top-10 " +
    "is TakeOrdered") {
    val p = plan("embedding_corr_audit")
    // the single embeddings scan lives inside the gram_stats checkpoint;
    // the visible plan reads the 1-row ExistingRDD twice (dims + cells)
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("embeddings.parquet")) == 0,
      s"embeddings leaked past the gram_stats checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 3,
      s"cells + the two dim broadcasts must all read the one 1-row " +
        s"checkpoint:\n$p")
    assert(!p.contains("posexplode"),
      s"the moment aggregate must not be fed by row explosion:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must not be a global sort:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("gram_stats aggregates the raw embeddings scan directly: a " +
    "single ObjectHashAggregate pair, no Generate between scan and agg") {
    import org.apache.spark.sql.functions.col
    val p = spark.read.parquet(s"$dir/embeddings.parquet")
      .agg(graft.expr.GramStats.gram_stats(col("embedding"), 64).as("g"))
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("gram_stats"), p)
    assert(!p.contains("Generate"),
      s"no explode may feed the gram aggregate:\n$p")
    // partial + final imperative aggregate — the shuffle carries one
    // fixed-size buffer per task, nothing row-shaped
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(p).nonEmpty, p)
  }

  test("bpe_token_length_hist: everything reads the <=5-row census " +
    "checkpoint; totals broadcast") {
    val p = plan("bpe_token_length_hist")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the census checkpoint:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("doc_bm25_topk: one corpus pass behind the checkpoint; df and " +
    "corpus stats broadcast; top-10 is TakeOrdered") {
    val p = plan("doc_bm25_topk")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the tokenize checkpoint:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p)
    // the 1-row stats frame rides a broadcast loop join, never a
    // shuffling cartesian
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must not be a global sort:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("similar_hybrid_rrf: both retrievals stay bounded — lexical " +
    "ranks behind the checkpoint, vector side one arraydot scan; the " +
    "rank windows only ever see the 20-row cuts") {
    val p = plan("similar_hybrid_rrf")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the bm25 checkpoint:\n$p")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("embeddings.parquet")) <= 2,
      s"vector side must be the only embeddings reader(s):\n$p")
    assert(p.contains("arraydot"), s"cosine must be the native dot:\n$p")
    // the rank windows sit ABOVE GlobalLimit 20 cuts (driver-trivial),
    // never over a corpus-scale frame
    assert("""GlobalLimit""".r.findAllIn(p).size >= 2 ||
      p.contains("TakeOrderedAndProject"), p)
    // the fusion join is FULL OUTER (Spark cannot broadcast it) over
    // the two ≤20-row rank frames — the one acceptable SMJ shape; pin
    // that it is the ONLY one and that it joins above both limits
    assert("SortMergeJoin FullOuter".r.findAllIn(p).size <= 1 &&
      !"SortMergeJoin (?!FullOuter)".r.findAllIn(p).hasNext,
      s"only the bounded fusion join may sort-merge:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("doc_inverted_index: the rn<=cap filter sits between the window " +
    "and the collect — the posting buffer is bounded before aggregation") {
    val p = plan("doc_inverted_index")
    assert(p.contains("Window"), s"posting cap needs the rank window:\n$p")
    // WindowGroupLimit pushes the rn<=1000 cut into the window sort
    // itself, so not even the ranked rows materialize past the cap
    assert(p.contains("WindowGroupLimit"),
      s"rn cap must push into the window (bounded collect input):\n$p")
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size <= 2,
      s"window and groupBy must share the token partitioning:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"), p)
  }

  test("dedup_cluster_stats: two chained aggs over the collected " +
    "components — no join, no window") {
    val p = plan("dedup_cluster_stats")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("Aggregate"), p)
  }

  test("corpus_quality_tradeoff: docs hide behind the bucketed-rank " +
    "checkpoint; decile cum-join broadcasts the 10-row frame") {
    val p = plan("corpus_quality_tradeoff")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the rank checkpoint:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("corpus_length_outliers: one tokenize pass; med, dev, and the " +
    "flag pass all read the checkpoint") {
    val p = plan("corpus_length_outliers")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the token checkpoint:\n$p")
    // every reader is the materialized stub (interpByRank's internal
    // count+join passes re-read it, so the exact count is an
    // implementation detail — the invariant is ZERO parquet re-scans)
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size >= 3,
      s"stub readers missing:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  // (the old "posexplode behind a checkpoint" pin for
  // embedding_label_drift is superseded by the gram_diag pin below —
  // the key now aggregates moments in one Gram pass, r13 ask #5)

  test("events_lift_decay: one events scan, one grouped pass — " +
    "no join, no window") {
    val p = plan("events_lift_decay")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1, p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("multimodal_audio_rms: synthesis is hard-cut from the fold " +
    "(one stub read), no join, no window") {
    val p = plan("multimodal_audio_rms")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the synthesis checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("orders_abc_classification: lineitem hides behind the " +
    "prefix-sum checkpoint; the offsets join broadcasts") {
    val p = plan("orders_abc_classification")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("lineitem.parquet")) == 0,
      s"lineitem leaked past the prefix-sum checkpoint:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("orders_churn_labels: one orders pass behind the per-customer " +
    "checkpoint; horizon is a broadcast 1-row derivation") {
    val p = plan("orders_churn_labels")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("orders.parquet")) == 0,
      s"orders leaked past the per-customer checkpoint:\n$p")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"fact side + horizon = exactly two stub readers:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dedup_quality_cross: the 2x2 census is checkpointed; shares " +
    "join broadcasts only") {
    val p = plan("dedup_quality_cross")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the census checkpoint:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("events_peak_concurrency: events hide behind the session " +
    "checkpoint; the running sum is the subsplit, not a global window") {
    val p = plan("events_peak_concurrency")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 0,
      s"events leaked past the session checkpoint:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the subsplit's local window partitions on (g, __slice) — a plan
    // with a window partitioned on nothing would be the single-task
    // global cumsum this key exists to avoid
    assert(!p.linesIterator.exists(l =>
      l.contains("windowspecdefinition(") && !l.contains("__slice") &&
        l.contains("unboundedpreceding") && l.contains("currentrow") &&
        !l.contains("user_id") && !l.contains("g#")),
      s"unpartitioned running-sum window crept in:\n$p")
  }

  test("corpus_lang_mix: bounded census checkpoint; totals broadcast") {
    val p = plan("corpus_lang_mix")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the census checkpoint:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("events_croston: slot collapse then one lag window then the " +
    "bounded per-type collect — no join") {
    val p = plan("events_croston")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("events.parquet")) == 1, p)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
  }

  test("doc_winnowing: pure per-row array lambdas behind the gram " +
    "checkpoint — no join, no window, no explode") {
    val p = plan("doc_winnowing")
    assert(p.linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"documents leaked past the gram checkpoint:\n$p")
    assert(!p.contains("Join") && !p.contains("Window") &&
      !p.contains("Generate"), p)
  }

  test("corpus_source_diversity: census + n both read the joined " +
    "signature checkpoint; n broadcasts back") {
    val p = plan("corpus_source_diversity")
    assert("""\(\d+\) Scan ExistingRDD""".r.findAllIn(p).size == 2,
      s"census + n = exactly two stub readers:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("doc_bm25_topk probes the PERSISTED index — no documents scan, " +
    "term filter pushed into the postings read (SCALE.md's 100 TB " +
    "claim as code, r12 ask #1)") {
    val p = plan("doc_bm25_topk")
    assert(p.linesIterator.count(l =>
        l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"probe plan re-tokenizes the corpus:\n$p")
    assert(p.linesIterator.exists(l =>
        l.contains("Location") && l.contains("postings")),
      s"probe plan does not read the postings artifact:\n$p")
    assert(p.contains("PushedFilters: [In(term,"),
      s"query-term filter not pushed into the postings scan:\n$p")
  }

  test("retrieval_phrase_topk probes ONLY the two terms' postings: " +
    "zero documents.parquet locations, equality filter pushed into " +
    "each postings scan, and the bag-of-words probe never reads the " +
    "positional payload (r13 ask #3)") {
    val p = plan("retrieval_phrase_topk")
    assert(p.linesIterator.count(l =>
        l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"phrase probe re-tokenizes the corpus:\n$p")
    assert("PushedFilters: \\[.*EqualTo\\(term,".r.findFirstIn(p).isDefined,
      s"phrase term filter not pushed into the postings scan:\n$p")
    // the non-positional probe prunes `pos` at the scan
    val bag = plan("doc_bm25_topk")
    assert(!bag.linesIterator.exists(l =>
        l.contains("ReadSchema") && l.contains("pos:")),
      s"bag-of-words probe reads the positional payload:\n$bag")
  }

  test("retrieval_phrase3_topk probes ONLY the three terms' postings: " +
    "zero documents.parquet locations, three pushed term-equality " +
    "postings scans (r14 ask #3)") {
    val p = plan("retrieval_phrase3_topk")
    assert(p.linesIterator.count(l =>
        l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"3-word phrase probe re-tokenizes the corpus:\n$p")
    val pushed = "PushedFilters: \\[[^\\]]*EqualTo\\(term,".r
      .findAllIn(p).size
    assert(pushed >= 3,
      s"expected 3 term-pushed postings scans, got $pushed:\n$p")
  }

  test("retrieval_mixed_topk probes ONLY the referenced terms' " +
    "postings: zero documents.parquet locations, a pushed In(term) " +
    "bag scan AND pushed term-equality phrase scans (r15 ask #6)") {
    val p = plan("retrieval_mixed_topk")
    assert(p.linesIterator.count(l =>
        l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"mixed probe re-tokenizes the corpus:\n$p")
    assert(p.contains("PushedFilters: [In(term,"),
      s"bag-of-words term filter not pushed:\n$p")
    val pushed = "PushedFilters: \\[[^\\]]*EqualTo\\(term,".r
      .findAllIn(p).size
    assert(pushed >= 2,
      s"expected 2 phrase term-pushed postings scans, got $pushed:\n$p")
  }

  test("hybrid rank windows carry a constant partition spec — the " +
    "board emits zero `No Partition Defined for Window` warnings " +
    "(r12 ask #2)") {
    for (key <- Seq("similar_hybrid_rrf", "similar_hybrid_audit")) {
      ExtQueries.clearMemo()
      val df = graft.SparkEntry.queries(key)(spark, dir)
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.forall(_.partitionSpec.nonEmpty),
        s"$key has an unpartitioned window")
    }
  }

  test("MMR family: everything past the TakeOrdered candidate cut is " +
    "bounded — no sort-merge join, no unhinted cartesian anywhere") {
    for (key <- Seq("similar_mmr_rerank", "similar_mmr_audit")) {
      val p = plan(key)
      assert(!p.contains("SortMergeJoin"),
        s"$key grew a shuffle join over the bounded frames:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"$key grew an unhinted cartesian:\n$p")
    }
  }

  test("metrics_correlation runs ONE gram_stats aggregate per group — " +
    "no five-lane decimal moment sums, no extra pass (r12 ask #7: the " +
    "Gram expression as a reusable surface)") {
    val p = plan("metrics_correlation")
    assert(p.contains("gram_stats"),
      s"pearson no longer routes through the Gram aggregate:\n$p")
    assert("gram_stats\\(".r.findAllIn(p).size <= 4, // partial+final × plan sections
      s"gram_stats evaluated more than once per aggregation level:\n$p")
    assert(p.linesIterator.count(l =>
        l.contains("Location") && l.contains("events.parquet")) <= 1,
      s"metrics_correlation scans events more than once:\n$p")
  }

  test("embedding_label_drift feeds its moment aggregate from gram_diag " +
    "directly — no posexplode row blow-up anywhere in the plan (r13 " +
    "ask #5: GramStats generalizes to grouped use)") {
    val p = plan("embedding_label_drift")
    assert(p.contains("gram_stats"),
      s"label drift no longer routes through the Gram aggregate:\n$p")
    assert(!p.contains("posexplode"),
      s"label drift still explodes rows×dim before aggregating:\n$p")
    // the only Generate is the bounded labels×64 dims unroll AFTER the
    // aggregate; the global centroid is a window over that same frame,
    // so the corpus location appears exactly once
    assert(p.linesIterator.count(l =>
        l.contains("Location") && l.contains("embeddings.parquet")) == 1,
      s"label drift scans embeddings more than once (or lost the scan):\n$p")
  }

  test("windowed-stats family: one events scan, one map-side-combinable " +
    "hash aggregation, no join — tumbling and hopping alike (the " +
    "hopping fanout is a bounded per-row window expansion, not a join)") {
    for (key <- Seq("events_windowed_stats", "events_hopping_stats")) {
      val p = plan(key)
      assert(p.linesIterator.count(l =>
          l.contains("Location") && l.contains("events.parquet")) == 1,
        s"$key scans events more than once:\n$p")
      assert(!p.contains("Join"), s"$key grew a join:\n$p")
      assert(p.contains("HashAggregate"), s"$key lost the hash agg:\n$p")
    }
  }

  test("unigram family: training never re-reads the corpus past the " +
    "word-table checkpoint; the encode key pays exactly one live " +
    "corpus scan (the per-doc word counts); no shuffle joins anywhere") {
    val p = plan("unigram_train_vocab")
    assert(p.linesIterator.count(l =>
        l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"unigram fit re-tokenized the corpus past the checkpoint:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"unigram fit grew an unbounded join:\n$p")
    assert(p.contains("unigram_viterbi"),
      s"final E-step doesn't route through the native DP:\n$p")
    val q = plan("unigram_encode_count")
    assert(q.linesIterator.count(l =>
        l.contains("Location") && l.contains("documents.parquet")) == 1,
      s"encode should scan documents exactly once (doc word counts):\n$q")
    assert(!q.contains("SortMergeJoin") && !q.contains("CartesianProduct"),
      s"unigram encode grew an unbounded join:\n$q")
  }

  test("retrieval_eval_metrics never touches the corpus text: the lex " +
    "side rides the persisted index probe, so the whole key reads " +
    "zero documents.parquet locations") {
    val p = plan("retrieval_eval_metrics")
    assert(p.linesIterator.count(l =>
        l.contains("Location") && l.contains("documents.parquet")) == 0,
      s"eval metrics re-tokenized the corpus:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"eval metrics grew an unbounded join:\n$p")
  }
}
