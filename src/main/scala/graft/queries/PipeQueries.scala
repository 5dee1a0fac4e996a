package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.ext.Pipeline
import graft.operators.{IntervalJoin, Ohlc, WindowSuite}

/** Round-3 queries: the training-data pipeline passes a corpus curator
  * runs (decontamination, PII redaction, quality rules) and the
  * relational/window breadth the reference lacks outright (SURVEY §2.E
  * absences: grouping sets, set operations, window functions) plus OHLC
  * resampling and interval-overlap joins. Every key has a
  * byte-deterministic DuckDB oracle.
  */
object PipeQueries {

  private def docs(s: SparkSession, dir: String) =
    Tables.load(s, dir, "documents")

  private val Dec = DecimalType(18, 6)

  /** α=0.05 two-sided critical z for 1..64 remaining hypotheses
    * (Φ⁻¹(1−0.025/m), 6 dp) — one table shared verbatim by the Spark
    * plan and the DuckDB oracle of `events_holm_correction`, so the
    * two engines can never disagree on a normal-CDF evaluation.
    */
  private val HolmZCrit: Seq[Double] = Seq(
    1.959964, 2.241403, 2.39398, 2.497705, 2.575829, 2.638257, 2.69011,
    2.734369, 2.772921, 2.807034, 2.837597, 2.86526, 2.890512, 2.913726,
    2.935199, 2.955167, 2.97382, 2.991316, 3.007787, 3.023341, 3.038074,
    3.052065, 3.065383, 3.078088, 3.090232, 3.101862, 3.113017, 3.123735,
    3.134046, 3.14398, 3.153563, 3.162818, 3.171766, 3.180426, 3.188815,
    3.19695, 3.204845, 3.212514, 3.219968, 3.227218, 3.234277, 3.241152,
    3.247854, 3.254389, 3.260767, 3.266995, 3.273078, 3.279024, 3.284839,
    3.290527, 3.296094, 3.301545, 3.306885, 3.312118, 3.317247, 3.322278,
    3.327213, 3.332056, 3.33681, 3.341479, 3.346065, 3.350571, 3.355,
    3.359354)

  /** The same table as a SQL VALUES list for the DuckDB oracle. */
  private lazy val HolmZCritValuesSql: String =
    HolmZCrit.zipWithIndex
      .map { case (z, i) => s"(${i + 1}, $z)" }.mkString(", ")

  // benchmark split for decontamination: every 97th doc plays the role
  // of the held-out eval set
  private[queries] val BenchMod = 97

  /** Shared end-to-end curation verdict frame: per doc, split label +
    * quality / canonicality / span / decontamination verdicts + kept.
    * Backs both the per-doc key and the per-source observability key.
    */
  private def curateFrame(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val q = Pipeline.qualityRules(d, "text")
      .select(col("doc_id"), col("pass").as("q_pass"))
    val h = d.select(col("doc_id"),
      md5(lower(trim(col("text")))).as("ch"))
    val canon = h.groupBy("ch").agg(min(col("doc_id")).as("cid"))
    val isCanon = h.join(canon, "ch")
      .select(col("doc_id"), (col("doc_id") === col("cid")).as("is_canonical"))
    val span = graft.ext.Dedup.spanDupStats(d, "doc_id", "text", n = 8)
      .select(col("doc_id"), col("keep").as("span_keep"))
    val bench = d.filter(col("doc_id") % BenchMod === 0)
    val corpus = d.filter(col("doc_id") % BenchMod =!= 0)
    val clean = Pipeline
      .decontaminateNgram(corpus, bench, "doc_id", "text", 5)
      .select(col("doc_id"), lit(true).as("decont_ok"))
    d.select(col("doc_id"),
        when(col("doc_id") % BenchMod === 0, lit("eval"))
          .otherwise(lit("train")).as("split"))
      .join(q, "doc_id").join(isCanon, "doc_id").join(span, "doc_id")
      .join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"), col("split"), col("q_pass"),
        col("is_canonical"), col("span_keep"),
        coalesce(col("decont_ok"), lit(false)).as("decontaminated"))
      .withColumn("kept",
        col("split") === "train" && col("q_pass") &&
          col("is_canonical") && col("span_keep") && col("decontaminated"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Seasonal PROFILE decomposition: per (event_type, hour-of-day),
    // the decimal-routed mean and its deviation from the type's
    // overall mean — the seasonal-index table a forecaster subtracts
    // before modeling the residual. Two hash aggregations + one tiny
    // join; both means are exact-decimal sums with ONE fixed-shape
    // double expression at the end.
    "ts_seasonal_profile" -> ((s, dir) => {
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")))
        .select(col("event_type"),
          expr("(sec % 86400) div 3600").as("hour"), col("value"))
      val dec = DecimalType(28, 6)
      val byHour = b.groupBy("event_type", "hour")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).as("hsum"))
      val overall = b.groupBy("event_type")
        .agg(count(lit(1)).as("tn"), sum(col("value").cast(dec)).as("tsum"))
      byHour.join(overall, Seq("event_type"))
        .select(col("event_type"), col("hour"), col("n"),
          graft.ext.TextStats.trunc6(col("hsum").cast("double") / col("n"))
            .as("hour_mean"),
          graft.ext.TextStats.trunc6(
            (col("hsum").cast("double") / col("n")) -
              (col("tsum").cast("double") / col("tn")))
            .as("seasonal_index"))
        .orderBy("event_type", "hour")
    }),

    // SEASONALLY-ADJUSTED anomaly detection: z-score of each event
    // against its OWN (event_type, hour-of-day) population — a value
    // normal at 2 p.m. but wild at 4 a.m. is flagged where the plain
    // z-score washes it out against the all-day mix. Moments are exact
    // decimal sums per seasonal cell (squares multiplied IN decimal —
    // no derived-double cast anywhere); one fixed-shape float pipeline
    // scores, |z| > 3 flags. Two hash aggregations + one cell-key join.
    "ts_anomaly_seasonal" -> ((s, dir) => {
      val dec = DecimalType(18, 6)
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          expr("(sec % 86400) div 3600").as("hour"), col("value"))
      val guarded = when(abs(col("value")) < lit(1e12), col("value"))
      val x = guarded.cast(dec)
      val cells = b.groupBy("event_type", "hour")
        .agg(count(guarded).as("rn"),
          sum(x).cast("double").as("sx"),
          sum(x * x).cast("double").as("sxx"))
      val n = col("rn").cast("double")
      val variance = greatest(
        (col("sxx") - col("sx") * col("sx") / n) / n, lit(0d))
      b.join(cells, Seq("event_type", "hour"))
        .withColumn("z",
          when(col("rn") >= 2 && sqrt(variance) > 0,
            graft.ext.TextStats.trunc6(
              (col("value") - col("sx") / n) / sqrt(variance))))
        .filter(abs(col("z")) > 3)
        .select(col("event_id"), col("event_type"), col("hour"),
          col("value"), col("z"))
        .orderBy("event_id")
    }),

    // SEQUENCE PACKING for training batches: docs concatenated in
    // deterministic (source, doc_id) order and chunked into fixed
    // 512-token bins — the concat-then-chunk shape an LLM batch
    // builder uses. Per doc: its token span's start offset and the
    // bins it lands in. Pure integer prefix sums — one shuffle on
    // source + a per-partition sort; a skewed mega-source can be
    // range-subsplit because prefix sums compose (two-pass), but the
    // per-source window is the right default shape.
    "text_pack_sequences" -> ((s, dir) => {
      val B = 512L
      val t = docs(s, dir).select(col("source"), col("doc_id"),
        graft.ext.TextStats.wsTokens(col("text")).cast("long").as("n_tokens"))
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t.withColumn("start_offset",
          coalesce(sum("n_tokens").over(w), lit(0L)))
        .withColumn("bin_first", expr(s"start_offset div $B"))
        .withColumn("bin_last",
          expr(s"(start_offset + n_tokens - 1) div $B"))
        .withColumn("n_bins", col("bin_last") - col("bin_first") + 1)
        .orderBy("doc_id")
    }),

    // KEY-SKEW observability on the events stream: per event type, how
    // concentrated the per-user key distribution is (max/mean ratio +
    // the hottest key). This is the diagnostic you run BEFORE choosing
    // a salting factor for the hot-key aggregation (events_salted_sum
    // is the remedy; this is the detector). Two map-side-combinable
    // hash aggregations; the argmax is a struct max — no second pass,
    // ties broken to the smallest user_id via negated key.
    "events_key_skew" -> ((s, dir) => {
      val per = TsQueries.base(s, dir)
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
      per.groupBy("event_type")
        .agg(sum("c").as("n_events"), count(lit(1)).as("n_keys"),
          max(struct(col("c").as("c"), (-col("user_id")).as("nu"))).as("m"))
        .select(col("event_type"), col("n_events"), col("n_keys"),
          col("m.c").as("max_per_key"), (-col("m.nu")).as("hot_user"),
          graft.ext.TextStats.trunc6(
            col("n_events").cast("double") / col("n_keys"))
            .as("avg_per_key"),
          graft.ext.TextStats.trunc6(
            (col("m.c") * col("n_keys")).cast("double") / col("n_events"))
            .as("skew_ratio"))
        .orderBy("event_type")
    }),

    // LEVEL-SHIFT (changepoint) detection: at each event, compare the
    // mean of the 12 rows before against the 12 rows from here on —
    // the two-window mean-shift test that needs no recursion (CUSUM
    // does; this is the window-expressible variant). Exact decimal
    // window sums → one fixed-shape float pipeline; full windows only;
    // top-50 by |shift|. Per-type windows — distributed by key. The
    // key cardinality (#event types) caps parallelism, so one mega
    // series can be range-SUBSPLIT: the ±k row frames need only k rows
    // of context either side of any time cut, so each (type, slice)
    // computes with the last/first k rows of its neighbors duplicated
    // in as halo — the existing cl=k AND cr=k full-frame filter then
    // makes slice edges exact for free (halo rows feed frames, only
    // interior rows are emitted). Re-measured 10x ratio is 1.22 (the
    // r6 2.32 was shared-machine load), so the single-exchange plan
    // stays the default shape.
    "ts_level_shift" -> ((s, dir) => {
      val k = 12
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && abs(col("value")) < lit(1e12))
        .select(col("event_id"), col("event_type"), col("sec"),
          col("value"))
      val ord = Window.partitionBy("event_type").orderBy("sec", "event_id")
      val wl = ord.rowsBetween(-k, -1)
      val wr = ord.rowsBetween(0, k - 1)
      val x = col("value").cast(Dec)
      val scored = b
        .withColumn("cl", count(lit(1)).over(wl))
        .withColumn("cr", count(lit(1)).over(wr))
        .withColumn("sl", sum(x).over(wl).cast("double"))
        .withColumn("sr", sum(x).over(wr).cast("double"))
        .filter(col("cl") === k && col("cr") === k)
        .withColumn("shift", graft.ext.TextStats.trunc6(
          col("sr") / k - col("sl") / k))
      scored.select(col("event_id"), col("event_type"), col("sec"),
          col("value"), col("shift"))
        .orderBy(abs(col("shift")).desc, col("event_id"))
        .limit(50)
    }),

    // Lag-1 AUTOCORRELATION per event type — the forecasting primitive
    // (is the series momentum-y or mean-reverting?) behind model choice
    // for q6_forecast/ts_seasonal_naive. The estimator is expanded into
    // pure SUMS (Σx, Σx², Σx·x_next, head/tail sums) so every
    // accumulation is an exact decimal aggregate; the only float math
    // is one fixed-shape expression per group at the end. ONE lead
    // window + ONE hash aggregation, distributed by type.
    "ts_autocorr" -> ((s, dir) => {
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && abs(col("value")) < lit(1e12))
        .select(col("event_type"), col("sec"), col("event_id"), col("value"))
      val ord = Window.partitionBy("event_type").orderBy("sec", "event_id")
      val p = b.withColumn("xnext", lead(col("value"), 1).over(ord))
      val x = col("value").cast(Dec)
      val xn = col("xnext").cast(Dec)
      val agg = p.groupBy("event_type").agg(
        count(col("value")).as("n"),
        sum(x).cast("double").as("s"),
        sum(x * x).cast("double").as("ss"),
        count(col("xnext")).as("n1"),
        sum(when(col("xnext").isNotNull, x * xn)).cast("double").as("c"),
        sum(when(col("xnext").isNotNull, x)).cast("double").as("sh"),
        sum(xn).cast("double").as("st"))
      val mean = col("s") / col("n").cast("double")
      val den = col("ss") - col("n").cast("double") * mean * mean
      val num = col("c") - mean * (col("sh") + col("st")) +
        col("n1").cast("double") * mean * mean
      agg.select(col("event_type"), col("n"),
          when(col("n") >= 2 && den > 0,
            graft.ext.TextStats.trunc6(num / den)).as("r1"))
        .orderBy("event_type")
    }),

    // First-order Markov transition table over each user's event
    // sequence: P(next event type | previous) with exact counts — the
    // behavioral-model / next-event-prediction staple. ONE lag window
    // per user key + one hash aggregation; probability is exact
    // integer division truncated at 6 decimals.
    "events_markov_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"), col("event_id"))
      val b = TsQueries.base(s, dir)
        .select(col("user_id"), col("sec"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
      val trans = b.groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
      val fromTotals = trans.groupBy("prev_type")
        .agg(sum(col("n")).as("n_from"))
      trans.join(fromTotals, Seq("prev_type"))
        .select(col("prev_type"), col("event_type").as("next_type"),
          col("n"), col("n_from"),
          graft.ext.TextStats.trunc6(col("n") / col("n_from")).as("p"))
        .orderBy("prev_type", "next_type")
    }),

    // GRADED decontamination: per corpus doc, the FRACTION of its
    // 5-gram positions found in the eval split's gram set; keep at
    // ≤ 10% (incidental collisions survive, wholesale inclusions die —
    // the fraction-threshold BIG-bench/GPT-3 variant of the exact
    // any-gram key below).
    "decontaminate_overlap_frac" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % BenchMod === 0)
      val corpus = d.filter(col("doc_id") % BenchMod =!= 0)
      Pipeline.decontaminateOverlapFrac(corpus, bench, "doc_id", "text",
          n = 5, maxOverlap = 0.1)
        .orderBy("doc_id")
    }),

    // Winsorized robust statistics: per event_type, clamp values to
    // the exact type-1 [p5, p95] band (integer-rank selection — no
    // float interpolation anywhere) and report clip counts + the
    // decimal-routed clamped mean. The outlier-tolerant aggregation a
    // metrics pipeline uses where plain means are spike-dominated.
    "events_winsorize" -> ((s, dir) => {
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")))
      val qs = graft.operators.Quantiles.exactByRank(
        b, Seq("event_type"), "value", "event_id", Seq(5, 95))
      // qs is #event_types rows — AQE broadcasts it; no forced hint
      b.join(qs, Seq("event_type"))
        .select(col("event_type"), col("value"), col("q5"), col("q95"))
        .withColumn("w", least(greatest(col("value"), col("q5")), col("q95")))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          count(when(col("value") < col("q5"), 1)).as("n_clip_lo"),
          count(when(col("value") > col("q95"), 1)).as("n_clip_hi"),
          (sum(col("w").cast(DecimalType(28, 6))).cast("double") /
            count(lit(1))).as("wmean"))
        .orderBy("event_type")
    }),

    // Mergeable Misra–Gries heavy hitters, END TO END as an oracled
    // key: per (event_type, day) top-8 user partials → merged per
    // event_type with the summed-dropped-mass error bar. The partial/
    // merge algebra SketchesSpec pins, exercised on real data with a
    // DuckDB oracle replicating the exact deterministic cut.
    "events_heavy_hitters_mg" -> ((s, dir) => {
      val b = TsQueries.base(s, dir)
        .select(col("event_type"), expr("sec div 86400").as("day"),
          col("user_id"))
      val partials = graft.operators.Sketches.mgPartials(
        b, Seq("event_type", "day"), "user_id", k = 8)
      graft.operators.Sketches.mgMerge(partials, Seq("event_type"), k = 8)
        .select(col("event_type"), col("key").cast("long").as("user_id"),
          col("count"), col("max_err"), col("n_rows"))
        .orderBy(col("event_type"), col("count").desc, col("user_id"))
    }),

    // COUNT-MIN heavy hitters — the over-counting complement of the
    // Misra–Gries key: 4×4096 counter-matrix partials per day (fixed
    // size regardless of data; entrywise sum IS the merge, exactly),
    // global candidate point-queries against the broadcast-scale
    // merged matrix, est ≥ exact by construction with the overshoot
    // reported per key. Top-10 users by estimate.
    "events_cms_heavy_hitters" -> ((s, dir) => {
      // r18 (r17 advice): the r17 shared-(r,bucket)-exchange variant
      // shuffled the RAW exploded cell stream (d× fact rows) with no
      // map-side combine; reverted to the two bounded-partial
      // exchanges (per-day matrix, then the |days|·d·w merge) —
      // shuffle proxies, not payloads.
      val b = TsQueries.base(s, dir)
        .select(expr("sec div 86400").as("day"), col("user_id"))
      val partials = graft.operators.Sketches.cmsPartials(
        b, Seq("day"), "user_id")
      val est = graft.operators.Sketches.cmsEstimate(
        partials, Seq.empty, b.select("user_id").distinct(), "user_id")
      val exact = b.groupBy("user_id").agg(count(lit(1)).as("exact"))
      est.join(exact, "user_id")
        .select(col("user_id"), col("est"), col("exact"),
          (col("est") - col("exact")).as("overest"))
        .orderBy(col("est").desc, col("user_id"))
        .limit(10)
    }),

    // Benchmark decontamination: drop training docs sharing a 5-gram
    // with the "eval" split (broadcast semi-join on benchmark grams).
    "decontaminate_ngram" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % BenchMod === 0)
      val corpus = d.filter(col("doc_id") % BenchMod =!= 0)
      Pipeline.decontaminateNgram(corpus, bench, "doc_id", "text", 5)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // PII redaction with per-doc match counts (email/phone/digit-run).
    "pii_redact" -> ((s, dir) =>
      Pipeline.redactPii(docs(s, dir), "text")
        .select(col("doc_id"), col("n_emails").cast("long").as("n_emails"),
          col("n_phones").cast("long").as("n_phones"),
          col("n_longnums").cast("long").as("n_longnums"), col("clean"))
        .orderBy("doc_id")),

    // Gopher-style quality-rule chain: per-rule verdicts + stats.
    "quality_rules" -> ((s, dir) =>
      Pipeline.qualityRules(docs(s, dir), "text")
        .select("doc_id", "n_words", "mean_word_len", "distinct_ratio",
          "r_length", "r_word_len", "r_distinct", "pass")
        .orderBy("doc_id")),

    // Duplicate 2-gram repetition audit (boilerplate detector).
    "quality_repetition" -> ((s, dir) =>
      Pipeline.repetitionStats(docs(s, dir), "text")
        .select("doc_id", "n_2grams", "dup_2gram_frac", "r_repetition")
        .orderBy("doc_id")),

    // The END-TO-END curation verdict — the whole corpus-cleaning
    // pipeline as ONE query: per doc, quality-rule pass, exact-dedup
    // canonicality, duplicated-span keep, benchmark decontamination,
    // and the final `kept` conjunction a curator ships. Every stage is
    // the same operator the standalone keys run; the composition costs
    // three broadcast-ish joins over per-doc verdict tables.
    "pipeline_curate" -> ((s, dir) =>
      curateFrame(s, dir).orderBy("doc_id")),

    // Curation OBSERVABILITY: the per-source dashboard a corpus owner
    // watches over the end-to-end curate verdicts — how much each
    // source loses to each filter, and what survives. One doc-scale
    // join (source label) + one tiny aggregation over the shared
    // verdict frame.
    "pipeline_stats_by_source" -> ((s, dir) =>
      curateFrame(s, dir)
        .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("split") === "eval", 1)).as("n_eval"),
          count(when(!col("q_pass"), 1)).as("n_quality_fail"),
          count(when(!col("is_canonical"), 1)).as("n_noncanonical"),
          count(when(!col("span_keep"), 1)).as("n_span_fail"),
          count(when(col("split") === "train" && !col("decontaminated"), 1))
            .as("n_contaminated"),
          count(when(col("kept"), 1)).as("n_kept"))
        .orderBy("source")),

    // Corpus-frequency quality scoring (the unigram-LM proxy in exact
    // integer math): per-doc OOV rate against the corpus's top-10
    // vocabulary and mean token corpus-frequency.
    "quality_vocab" -> ((s, dir) =>
      graft.ext.TextStats.vocabStats(docs(s, dir), "doc_id", "text",
          topK = 10)
        .orderBy("doc_id")),

    // Type-7 interpolated quantiles (percentile_cont semantics) per
    // event type — engine-portable via integer position math + a
    // pinned-shape interpolation expression (see Quantiles.interpByRank).
    "events_quantiles_interp" -> ((s, dir) =>
      graft.operators.Quantiles.interpByRank(
        TsQueries.base(s, dir)
          .filter(col("value").isNotNull && !isnan(col("value"))),
        Seq("event_type"), "value", "event_id", Seq(25, 50, 75, 90))
        .orderBy("event_type")),

    // Retention cohorts: users grouped by first-activity day, counted
    // on each later active day — the product-analytics staple.
    "events_retention_cohorts" -> ((s, dir) => {
      val days = TsQueries.base(s, dir)
        .select(col("user_id"), expr("sec div 86400").as("day"))
        .distinct()
      val cohorts = days.groupBy("user_id")
        .agg(min(col("day")).as("cohort"))
      days.join(cohorts, "user_id")
        .groupBy("cohort", "day")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort", "day")
    }),

    // Funnel conversion: first click → first at-or-after purchase
    // within 7 days, per user. Two aggregations + one join on the
    // user key; no window needed.
    "events_funnel" -> ((s, dir) => {
      val b = TsQueries.base(s, dir)
      val firstClick = b.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("sec")).as("click_sec"))
      val purchases = b.filter(col("event_type") === "purchase")
        .select("user_id", "sec")
      firstClick.join(purchases, Seq("user_id"), "left")
        .groupBy("user_id", "click_sec")
        .agg(min(when(col("sec") >= col("click_sec"), col("sec")))
          .as("purchase_sec"))
        .select(col("user_id"), col("click_sec"), col("purchase_sec"),
          (col("purchase_sec") - col("click_sec")).as("delay_sec"),
          (col("purchase_sec").isNotNull &&
            col("purchase_sec") - col("click_sec") <= 604800L)
            .as("converted"))
        .orderBy("user_id")
    }),

    // Seasonal-naive forecast audit: predict each (user, type, slot)
    // cell from the same slot one day earlier; MAE per event type
    // through decimal sums.
    "ts_seasonal_naive" -> ((s, dir) => {
      val cell = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")))
        .groupBy("user_id", "event_type", "slot")
        .agg(max_by(col("value"), col("event_id")).as("v"))
      val pred = cell.select(col("user_id"), col("event_type"),
        (col("slot") + 86400L).as("slot"), col("v").as("v_pred"))
      cell.join(pred, Seq("user_id", "event_type", "slot"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          graft.ext.TextStats.trunc6(
            sum(abs(col("v") - col("v_pred")).cast(Dec)).cast("double") /
              count(lit(1))).as("mae"))
        .orderBy("event_type")
    }),

    // Tabular CUSUM per event-type series — the RECURSIVE changepoint
    // detector ts_level_shift's window test explicitly is not: s⁺/s⁻
    // accumulate standardized drift (k=0.5σ slack, h=4σ alarm) through
    // one ordered fold per series; the state [s⁺, s⁻, n_alarms, max]
    // is a LIST both engines fold atomically (DETERMINISM.md). μ and σ
    // come from decimal-routed moment sums — identical inputs to the
    // fold everywhere. Per (user, type) like ts_holt_forecast: one key
    // shuffle, task state bounded by one user's series (a recursive
    // stat cannot range-subsplit — bounded series ARE the scale story).
    "ts_cusum" -> ((s, dir) => {
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) < lit(1e12))
      val g = b.groupBy("user_id", "event_type").agg(
        sort_array(collect_list(struct(col("sec"), col("event_id"),
          col("value")))).as("pts"),
        count(lit(1)).as("n"),
        sum(col("value").cast(Dec)).cast("double").as("sv"),
        sum((col("value").cast(Dec)) * (col("value").cast(Dec)))
          .cast("double").as("ss"))
      val nD = col("n").cast("double")
      val mu = col("sv") / nD
      val sigma = sqrt(greatest(lit(0d), col("ss") / nD - mu * mu))
      val vals = transform(col("pts"), p =>
        p.getField("value").cast("double"))
      val zero = array(lit(0d), lit(0d), lit(0d), lit(0d))
      def step(acc: org.apache.spark.sql.Column,
               x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val sp = greatest(lit(0d),
          element_at(acc, 1) + (x - col("_mu") - lit(0.5) * col("_sigma")))
        val sn = greatest(lit(0d),
          element_at(acc, 2) + (col("_mu") - lit(0.5) * col("_sigma") - x))
        val alarm = when(sp > lit(4d) * col("_sigma") ||
          sn > lit(4d) * col("_sigma"), lit(1d)).otherwise(lit(0d))
        array(sp, sn, element_at(acc, 3) + alarm,
          greatest(element_at(acc, 4), sp, sn))
      }
      g.withColumn("_mu", mu).withColumn("_sigma", sigma)
        .withColumn("fit", aggregate(vals, zero, step))
        .select(col("user_id"), col("event_type"), col("n"),
          round(col("_mu"), 6).as("mean"),
          round(col("_sigma"), 6).as("sigma"),
          round(element_at(col("fit"), 4), 6).as("max_stat"),
          element_at(col("fit"), 3).cast("long").as("n_alarms"))
        .orderBy("user_id", "event_type")
    }),

    // Rescaled-range Hurst exponent per event type — the long-memory
    // diagnostic (H≈0.5 random walk, >0.5 trending, <0.5 mean-
    // reverting) a capacity forecaster checks before trusting an
    // extrapolation. Per type, the ordered series splits into FIXED
    // 32- and 128-row blocks; each block folds once through a
    // cumulative-deviation walk (range measured from the origin) and
    // reports R/S; H = Δ mean ln(R/S) / ln(128/32). The collect_list
    // buffer is bounded by the BLOCK size (class-a: 128 rows max
    // regardless of corpus), blocks parallelize freely, and the only
    // full-series op is the row_number window every ts key shares
    // (prefix-split is the documented escape hatch). Cross-block
    // means are t6+DECIMAL-routed.
    "ts_hurst" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) < lit(1e12))
      val win = Window.partitionBy(col("event_type"))
        .orderBy(col("sec"), col("event_id"))
      val ex = b.withColumn("rn", row_number().over(win))
        .select(col("event_type"), col("rn"), col("value"),
          explode(array(lit(32), lit(128))).as("bs"))
      val blocks = ex
        .withColumn("blk", expr("CAST((rn - 1) div bs AS BIGINT)"))
        .groupBy("event_type", "bs", "blk")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(Dec)).cast("double").as("sv"),
          sum((col("value").cast(Dec)) * (col("value").cast(Dec)))
            .cast("double").as("ss"),
          sort_array(collect_list(struct(col("rn"), col("value"))))
            .as("pts"))
        .filter(col("n") === col("bs"))
      val nD = col("n").cast("double")
      val mu = col("sv") / nD
      val sigma = sqrt(greatest(lit(0d), col("ss") / nD - mu * mu))
      val vals = transform(col("pts"), p =>
        p.getField("value").cast("double"))
      val zero = array(lit(0d), lit(0d), lit(0d)) // cum, min, max
      def step(acc: org.apache.spark.sql.Column,
               x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val c = element_at(acc, 1) + (x - col("_mu"))
        array(c, least(element_at(acc, 2), c),
          greatest(element_at(acc, 3), c))
      }
      val rs = blocks.withColumn("_mu", mu).withColumn("_sigma", sigma)
        .withColumn("fit", aggregate(vals, zero, step))
        .select(col("event_type"), col("bs"),
          when(col("_sigma") > 0,
            (element_at(col("fit"), 3) - element_at(col("fit"), 2)) /
              col("_sigma")).as("rs"))
      val perSize = rs
        .select(col("event_type"), col("bs"),
          when(col("rs") > 0, t6(log(col("rs")))).as("lnrs"))
        .groupBy("event_type", "bs")
        .agg(count(col("lnrs")).as("nb"),
          sum(col("lnrs").cast(Dec)).cast("double").as("slnrs"))
        .select(col("event_type"), col("bs"), col("nb"),
          when(col("nb") > 0, col("slnrs") / col("nb")).as("m"))
      perSize.groupBy("event_type")
        .agg(max(when(col("bs") === 32, col("nb"))).as("nb32"),
          max(when(col("bs") === 128, col("nb"))).as("nb128"),
          max(when(col("bs") === 32, col("m"))).as("m32"),
          max(when(col("bs") === 128, col("m"))).as("m128"))
        .select(col("event_type"),
          coalesce(col("nb32"), lit(0L)).as("n_blocks_32"),
          coalesce(col("nb128"), lit(0L)).as("n_blocks_128"),
          t6(col("m32")).as("mean_lnrs_32"),
          t6(col("m128")).as("mean_lnrs_128"),
          when(col("m32").isNotNull && col("m128").isNotNull,
            t6((col("m128") - col("m32")) / log(lit(4.0)))).as("hurst"))
        .orderBy("event_type")
    }),

    // Walk-forward forecast backtest — the evaluation readout that
    // tells a forecaster which of its cheap models to trust: one-step-
    // ahead mean absolute error of last-value (naive) vs EWMA(α=0.3)
    // per event type, measured over every (user, type) series. Each
    // series folds ONCE through a coupled [ewma, Σ|e_naive|, Σ|e_ewma|,
    // n, prev] state (same per-series collect bound as ts_cusum/holt);
    // per-series error sums are t6'd then DECIMAL-routed across users,
    // so the cross-series aggregation is order-independent. Skill =
    // 1 − MAE_ewma/MAE_naive (positive when smoothing helps).
    "ts_forecast_backtest" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) < lit(1e12))
      val g = b.groupBy("user_id", "event_type").agg(
        sort_array(collect_list(struct(col("sec"), col("event_id"),
          col("value")))).as("pts"),
        count(lit(1)).as("n"))
      val vals = transform(col("pts"), p =>
        p.getField("value").cast("double"))
      def step(acc: org.apache.spark.sql.Column,
               x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        array(lit(0.3) * x + lit(0.7) * element_at(acc, 1),
          element_at(acc, 2) + abs(x - element_at(acc, 5)),
          element_at(acc, 3) + abs(x - element_at(acc, 1)),
          element_at(acc, 4) + lit(1.0),
          x)
      val v1 = element_at(col("vals"), 1)
      val fit = aggregate(
        slice(col("vals"), lit(2),
          greatest((col("n") - 1).cast("int"), lit(0))),
        array(v1, lit(0d), lit(0d), lit(0d), v1), step)
      val perSeries = g.withColumn("vals", vals)
        .select(col("event_type"), fit.as("fit"))
        .select(col("event_type"),
          element_at(col("fit"), 4).cast("long").as("n_err"),
          t6(element_at(col("fit"), 2)).as("sae_n"),
          t6(element_at(col("fit"), 3)).as("sae_e"))
      perSeries.groupBy("event_type")
        .agg(count(lit(1)).as("n_series"),
          sum(col("n_err")).as("n_points"),
          sum(col("sae_n").cast(Dec)).cast("double").as("tn"),
          sum(col("sae_e").cast(Dec)).cast("double").as("te"))
        .select(col("event_type"), col("n_series"), col("n_points"),
          when(col("n_points") > 0,
            t6(col("tn") / col("n_points"))).as("mae_naive"),
          when(col("n_points") > 0,
            t6(col("te") / col("n_points"))).as("mae_ewma"),
          when(col("n_points") > 0 && col("tn") > 0,
            t6(lit(1.0) - col("te") / col("tn"))).as("ewma_skill"))
        .orderBy("event_type")
    }),

    // HOLT double-exponential smoothing per (user, type) series — the
    // level+trend forecaster between seasonal-naive and a real model.
    // Each series' ordered values fold once through the coupled
    // (level, trend) recurrence as a STRUCT-state `aggregate` — a
    // sequential model fit, so the right distribution is one series
    // per task: collect the series (sort_array of (sec, id, value)
    // structs — deterministic), fold in order, emit one row. One
    // key-shuffle; state per task is the series, like exact quantiles.
    // α=0.5 (exact power of two), β=0.3 — identical literals and
    // operand order in both engines.
    "ts_holt_forecast" -> ((s, dir) => {
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")))
      val g = b.groupBy("user_id", "event_type")
        .agg(sort_array(collect_list(struct(col("sec"), col("event_id"),
          col("value")))).as("pts"))
      val vals = transform(col("pts"), p =>
        p.getField("value").cast("double"))
      val init = struct(element_at(vals, 1).as("l"), lit(0d).as("b"))
      val rest = when(size(vals) > 1,
        slice(vals, lit(2), size(vals) - 1)).otherwise(
        array().cast("array<double>"))
      def step(acc: org.apache.spark.sql.Column,
               x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val l1 = lit(0.5) * x + lit(0.5) *
          (acc.getField("l") + acc.getField("b"))
        struct(l1.as("l"),
          (lit(0.3) * (l1 - acc.getField("l")) +
            lit(0.7) * acc.getField("b")).as("b"))
      }
      val fit = aggregate(rest, init, step)
      g.select(col("user_id"), col("event_type"),
          size(col("pts")).cast("long").as("n"), fit.as("fit"))
        .select(col("user_id"), col("event_type"), col("n"),
          round(col("fit.l"), 6).as("level"),
          round(col("fit.b"), 6).as("trend"),
          round(col("fit.l") + col("fit.b"), 6).as("forecast"))
        .orderBy("user_id", "event_type")
    }),

    // SRE multi-window burn-rate alert: error fraction over trailing
    // 30-min AND 4-h windows per user; alert when both exceed their
    // thresholds.
    "ts_burn_rate" -> ((s, dir) =>
      graft.read.Rolling.errorBurnRate(TsQueries.base(s, dir),
          Seq("user_id"), "sec",
          col("event_type") === "error",
          shortSec = 1800L, longSec = 14400L,
          shortThreshold = 0.5, longThreshold = 0.3)
        .select("event_id", "user_id", "sec", "err_rate_short",
          "err_rate_long", "alert")
        .orderBy("event_id")),

    // DST-aware LOCAL-day aggregation: the reference serves Madrid-
    // localized dashboards (LOCAL_TZ, `ong_utils`), where a "day" is
    // 23/24/25 UTC-hours across DST transitions — bucketing by
    // `sec div 86400` is simply wrong there. Both engines resolve the
    // same IANA zone rules.
    "tz_daily_local" -> ((s, dir) =>
      TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")))
        .withColumn("day", to_date(from_utc_timestamp(
          timestamp_seconds(col("sec")), "Europe/Madrid")))
        .groupBy("day")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(Dec)).cast("double").as("sum_v"))
        .orderBy("day")),

    // Robust outliers via MAD: median and median-absolute-deviation
    // both by exact rank selection (no float interpolation), robust
    // z = (v - med) / (1.4826 · MAD). Outlier-resistant where the
    // moment-based z-score is not; two tiny exact-quantile aggregates
    // broadcast back onto the stream.
    "events_robust_outliers" -> ((s, dir) => {
      val b = TsQueries.base(s, dir).filter(col("value").isNotNull &&
        !isnan(col("value")))
      val med = graft.operators.Quantiles.exactByRank(b, Seq("event_type"),
        "value", "event_id", Seq(50)).withColumnRenamed("q50", "med")
      val dev = b.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = graft.operators.Quantiles.exactByRank(dev, Seq("event_type"),
        "adev", "event_id", Seq(50)).withColumnRenamed("q50", "mad")
      dev.join(broadcast(mad), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          col("med"), col("mad"),
          when(col("mad") > 0, graft.ext.TextStats.trunc6(
            (col("value") - col("med")) / (lit(1.4826) * col("mad"))))
            .as("robust_z"))
        .withColumn("outlier",
          col("robust_z").isNotNull && abs(col("robust_z")) > 3.5)
        .orderBy("event_id")
    }),

    // Equi-DEPTH histogram: exact type-1 quartile boundaries (rank
    // selection — no float math) broadcast back onto the stream, rows
    // counted per quartile. The composition shape: a tiny exact-
    // quantile aggregate drives a second single-pass aggregation.
    "events_histogram_equidepth" -> ((s, dir) => {
      val b = TsQueries.base(s, dir).filter(col("value").isNotNull)
      val q = graft.operators.Quantiles.exactByRank(b, Seq("event_type"),
        "value", "event_id", Seq(25, 50, 75))
      b.join(broadcast(q), "event_type")
        .withColumn("bucket",
          when(col("value") <= col("q25"), 0L)
            .when(col("value") <= col("q50"), 1L)
            .when(col("value") <= col("q75"), 2L)
            .otherwise(3L))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bucket")
    }),

    // OHLC candlestick resample per event_type over 1h buckets.
    "ts_ohlc" -> ((s, dir) =>
      Ohlc.resample(TsQueries.base(s, dir), Seq("event_type"), "sec",
          "event_id", "value", bucketSec = 3600L)
        .orderBy("event_type", "bucket")),

    // ROLLUP grouping sets: (event_type, day) / (event_type) / () —
    // subtotals + grand total in ONE pass (reference §2.E: absent).
    "events_cube_rollup" -> ((s, dir) =>
      TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")))
        .withColumn("day", expr("sec div 86400"))
        .rollup(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(Dec)).cast("double").as("sum_v"),
          grouping(col("event_type")).cast("long").as("g_et"),
          grouping(col("day")).cast("long").as("g_day"))
        .select(coalesce(col("event_type"), lit("(all)")).as("event_type"),
          coalesce(col("day"), lit(-1L)).as("day"),
          col("g_et"), col("g_day"), col("n"), col("sum_v"))
        .orderBy("g_et", "g_day", "event_type", "day")),

    // Set operations (reference §2.E: absent): INTERSECT and EXCEPT of
    // per-event-type user sets, tagged and unioned.
    "events_set_ops" -> ((s, dir) => {
      val b = TsQueries.base(s, dir)
      def users(et: String) =
        b.filter(col("event_type") === et).select("user_id").distinct()
      val inter = users("click").intersect(users("purchase"))
        .withColumn("op", lit("click_and_purchase"))
      val exc = users("view").except(users("error"))
        .withColumn("op", lit("view_never_error"))
      inter.unionByName(exc).select("op", "user_id")
        .orderBy("op", "user_id")
    }),

    // Window-function suite (reference §2.E: absent): lead/lag, ntile,
    // rank family, percent_rank/cume_dist per series.
    "ts_window_suite" -> ((s, dir) =>
      WindowSuite.navigate(
        TsQueries.base(s, dir)
          .filter(col("value").isNotNull && !isnan(col("value"))),
        Seq("user_id", "event_type"), "sec", "event_id", "value")
        .select("event_id", "user_id", "event_type", "sec", "lead_v",
          "lag_v", "ntile4", "rnk", "drnk", "pct_rank", "cume_d")
        .orderBy("event_id")),

    // Interval-overlap join: user sessions × fixed maintenance windows,
    // bucketed equi-join (never a nested loop).
    "interval_overlap_join" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"), col("event_id"))
      val sess = TsQueries.base(s, dir).filter(col("user_id") < 30)
        .withColumn("prev_sec", lag(col("sec"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_sec").isNull ||
            col("sec") - col("prev_sec") > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_sess"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(min(col("sec")).as("s_start"), max(col("sec")).as("s_end"))
      val maint = s.range(372).select(col("id").as("w_id"),
        (lit(1704067200L) + col("id") * 7200).as("w_start"),
        (lit(1704067200L) + col("id") * 7200 + 1799).as("w_end"))
      IntervalJoin.overlapPairs(sess, col("s_start"), col("s_end"),
          maint, col("w_start"), col("w_end"), bucketWidth = 7200L)
        .select("user_id", "session_id", "w_id")
        .orderBy("user_id", "session_id", "w_id")
    }),

    // STL-style additive decomposition summary per event_type series
    // (trend by centered moving average, seasonal by hour-of-day mean
    // of the detrended values, residual = rest), reported as Hyndman's
    // seasonal-strength statistic 1 − Var(R)/Var(detrended). Scale
    // shape: the raw stream collapses to the 5-min slot grid FIRST
    // (map-side combinable, series-scale thereafter); the 13-slot MA
    // is ONE rows-frame window whose frame sums run in DECIMAL — frame
    // aggregation order differs across engines, so float frame sums
    // would be non-deterministic; decimal sums are exact. Every
    // variance moment routes double→DECIMAL(38,12) before summing.
    "ts_stl_decompose" -> ((s, dir) => {
      val dec = DecimalType(28, 6)
      val d6 = DecimalType(18, 6)
      val d12 = DecimalType(38, 12)
      val t6 = graft.ext.TextStats.trunc6 _
      val ser = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) < lit(1e12))
        .groupBy("event_type", "slot")
        .agg(sum(col("value").cast(dec)).as("vsum"), count(lit(1)).as("vn"))
        .select(col("event_type"), col("slot"),
          t6(col("vsum").cast("double") / col("vn")).as("v"))
      val frame = Window.partitionBy("event_type").orderBy("slot")
        .rowsBetween(-6, 6)
      val det = ser
        .withColumn("trend", t6(
          sum(col("v").cast(d6)).over(frame).cast("double") /
            count(lit(1)).over(frame)))
        .withColumn("hour", expr("(slot % 86400) div 3600"))
        .withColumn("d", col("v") - col("trend"))
        // consumed by the seasonal fit AND the residual join — without
        // the plan cut Spark would inline (and re-scan) the whole
        // series+window pipeline into both consumers
        .localCheckpoint(false)
      val seas = det.groupBy("event_type", "hour")
        .agg((sum(col("d").cast(d12)).cast("double") / count(lit(1)))
          .as("seasonal"))
      det.join(seas, Seq("event_type", "hour"))
        .withColumn("r", col("d") - col("seasonal"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_slots"),
          sum(col("d").cast(d12)).cast("double").as("sd"),
          sum((col("d") * col("d")).cast(d12)).cast("double").as("sdd"),
          sum(col("r").cast(d12)).cast("double").as("sr"),
          sum((col("r") * col("r")).cast(d12)).cast("double").as("srr"))
        .select(col("event_type"), col("n_slots"),
          t6((col("sdd") - col("sd") * col("sd") / col("n_slots")) /
            col("n_slots")).as("var_detrended"),
          t6((col("srr") - col("sr") * col("sr") / col("n_slots")) /
            col("n_slots")).as("var_resid"),
          t6(greatest(lit(0d), lit(1d) -
            ((col("srr") - col("sr") * col("sr") / col("n_slots")) /
              (col("sdd") - col("sd") * col("sd") / col("n_slots")))))
            .as("seasonal_strength"))
        .orderBy("event_type")
    }),

    // SAX symbolic discretization (Lin et al.): each event_type's
    // slot-mean series → 12-slot PAA segments → z-normalized segment
    // means → 4-symbol Gaussian-breakpoint alphabet (±0.6745, 0) →
    // one word per series. The pattern-mining/indexing front door for
    // time series. Scale: slot collapse first; segment means and the
    // per-type moments are decimal-exact sums (the only doubles are
    // fixed-shape per-row expressions); the word assembles from an
    // array_sort over (segment, symbol) structs — no single-partition
    // global window anywhere.
    "ts_sax_symbols" -> ((s, dir) => {
      val dec = DecimalType(28, 6)
      val d6 = DecimalType(18, 6)
      val d12 = DecimalType(38, 12)
      val t6 = graft.ext.TextStats.trunc6 _
      val ser = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) < lit(1e12))
        .groupBy("event_type", "slot")
        .agg(sum(col("value").cast(dec)).as("vsum"), count(lit(1)).as("vn"))
        .select(col("event_type"), col("slot"),
          t6(col("vsum").cast("double") / col("vn")).as("v"))
      val rn = row_number().over(
        Window.partitionBy("event_type").orderBy("slot"))
      val paa = ser.withColumn("seg", ((rn - 1) / lit(12)).cast("long"))
        .groupBy("event_type", "seg")
        .agg(sum(col("v").cast(d6)).as("segsum"), count(lit(1)).as("segn"))
        .select(col("event_type"), col("seg"),
          t6(col("segsum").cast("double") / col("segn")).as("paa"))
        // consumed by the moment fit AND the symbol assignment
        .localCheckpoint(false)
      val stats = paa.groupBy("event_type")
        .agg(count(lit(1)).as("np"),
          sum(col("paa").cast(d6)).cast("double").as("sp"),
          sum((col("paa") * col("paa")).cast(d12)).cast("double").as("spp"))
        .select(col("event_type"), col("np"),
          (col("sp") / col("np")).as("mu"),
          sqrt((col("spp") - col("sp") * col("sp") / col("np")) /
            col("np")).as("sigma"))
      paa.join(broadcast(stats), Seq("event_type"))
        .withColumn("sym",
          when(col("sigma") <= 0, lit("b")).otherwise(
            when((col("paa") - col("mu")) / col("sigma") < -0.6745, "a")
              .when((col("paa") - col("mu")) / col("sigma") < 0, "b")
              .when((col("paa") - col("mu")) / col("sigma") < 0.6745, "c")
              .otherwise("d")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_segments"),
          array_join(transform(
            array_sort(collect_list(struct(col("seg"), col("sym")))),
            x => x.getField("sym")), "").as("sax_word"))
        .orderBy("event_type")
    }),

    // Two-arm experiment readout per event_type (user_id parity splits
    // the arms): counts, decimal-exact means, lift, and the Welch
    // t-statistic — the analytics pass every A/B platform runs. ONE
    // grouped pass with conditional aggregates (never a per-arm scan
    // or a self-join); moments route double→DECIMAL before summing,
    // the t formula is one fixed-shape float expression at the end.
    // Difference-in-differences readout per event_type: arms by
    // user hash (user_id % 2), periods by the integer midpoint of the
    // observed time range (sec·2 ≥ min+max — exact integer compare,
    // no float boundary), DiD = (ā_post − ā_pre) − (b̄_post − b̄_pre)
    // with decimal-routed sums. The panel-data estimate an
    // experimenter reads when treatment rolled out mid-window. ONE
    // grouped pass with conditional aggregates over a broadcast
    // 1-row bounds table.
    "events_diff_in_diff" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val dec = DecimalType(28, 6)
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) < lit(1e12))
        .localCheckpoint(false) // bounds + the grouped pass share it
      val bounds = b.agg(min(col("sec")).as("mn"), max(col("sec")).as("mx"))
      val withArms = b.crossJoin(broadcast(bounds))
        .select(col("event_type"), col("value"),
          (col("user_id") % 2 === 0).as("arm_a"),
          (col("sec") * 2 >= col("mn") + col("mx")).as("post"))
      def cell(arm: org.apache.spark.sql.Column,
               post: org.apache.spark.sql.Column, tag: String) = Seq(
        count(when(arm && post, lit(1))).as(s"n_$tag"),
        sum(when(arm && post, col("value").cast(dec)))
          .cast("double").as(s"s_$tag"))
      val aggs =
        cell(col("arm_a"), col("post"), "a2") ++
          cell(col("arm_a"), !col("post"), "a1") ++
          cell(!col("arm_a"), col("post"), "b2") ++
          cell(!col("arm_a"), !col("post"), "b1")
      def m(tag: String) = col(s"s_$tag") / col(s"n_$tag")
      withArms.groupBy("event_type")
        .agg(aggs.head, aggs.tail: _*)
        .select(col("event_type"),
          col("n_a1"), col("n_a2"), col("n_b1"), col("n_b2"),
          t6((m("a2") - m("a1")) - (m("b2") - m("b1"))).as("did"))
        .orderBy("event_type")
    }),

    // Sample-ratio-mismatch guardrail for the A/B readout: per
    // event_type, DISTINCT-user counts per arm (randomization-unit
    // grain, not event grain — event-count SRM confounds with
    // activity), χ² for the 50/50 design = (n_a−n_b)²/(n_a+n_b)
    // (integer numerator — one double division, deterministic), flag
    // at the 95% cut. The check an experimenter runs BEFORE reading
    // events_ab_lift. One distinct + one agg, no window.
    "events_srm_check" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val users = TsQueries.base(s, dir)
        .select(col("event_type"), col("user_id")).distinct()
      val chi2 = ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
        .cast("double") / (col("n_a") + col("n_b"))
      users.groupBy("event_type")
        .agg(count(when(col("user_id") % 2 === 0, lit(1))).as("n_a"),
          count(when(col("user_id") % 2 =!= 0, lit(1))).as("n_b"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          t6(chi2).as("chi2"), (chi2 > lit(3.841459)).as("srm_flag"))
        .orderBy("event_type")
    }),

    // Power / minimum-detectable-effect readout — the question an
    // experimenter asks BEFORE launch: "how small a lift could this
    // traffic even see?" Per event_type, Welch standard error from
    // the same decimal-routed moments as events_ab_lift, scaled by
    // z_{0.975}+z_{0.80} (two-sided 95% confidence at 80% power);
    // absolute and relative-to-pooled-mean forms. Completes the A/B
    // family (SRM gate → power → lift → CUPED → DiD). ONE grouped
    // pass with conditional aggregates — no join, no window.
    "events_power_mde" -> ((s, dir) => {
      val dec = DecimalType(28, 6)
      val d12 = DecimalType(38, 12)
      val t6 = graft.ext.TextStats.trunc6 _
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) < lit(1e12))
        .select(col("event_type"), col("value"),
          (col("user_id") % 2 === 0).as("arm_a"))
      val g = b.groupBy("event_type").agg(
        count(when(col("arm_a"), lit(1))).as("n_a"),
        sum(when(col("arm_a"), col("value").cast(dec)))
          .cast("double").as("s_a"),
        sum(when(col("arm_a"), (col("value") * col("value")).cast(d12)))
          .cast("double").as("ss_a"),
        count(when(!col("arm_a"), lit(1))).as("n_b"),
        sum(when(!col("arm_a"), col("value").cast(dec)))
          .cast("double").as("s_b"),
        sum(when(!col("arm_a"), (col("value") * col("value")).cast(d12)))
          .cast("double").as("ss_b"))
      val varSum =
        (col("ss_a") - col("s_a") * col("s_a") / col("n_a")) /
          (col("n_a") - 1) / col("n_a") +
        (col("ss_b") - col("s_b") * col("s_b") / col("n_b")) /
          (col("n_b") - 1) / col("n_b")
      val zsum = lit(2.801585) // z_{0.975} + z_{0.80}
      val pooledMean = (col("s_a") + col("s_b")) / (col("n_a") + col("n_b"))
      g.select(col("event_type"), col("n_a"), col("n_b"),
          when(col("n_a") > 1 && col("n_b") > 1 && varSum > 0,
            t6(zsum * sqrt(varSum))).as("mde_abs"),
          when(col("n_a") > 1 && col("n_b") > 1 && varSum > 0 &&
            pooledMean =!= 0,
            t6(zsum * sqrt(varSum) / pooledMean)).as("mde_rel"))
        .orderBy("event_type")
    }),

    // Holm step-down multiple-testing correction over the per-type A/B
    // z-statistics — the guardrail that keeps a 5-metric experiment
    // from cherry-picking its one nominally-significant lift. Welch z
    // per event_type from the same decimal-routed moments as
    // events_ab_lift; the per-rank critical values are a broadcast
    // 10-row z-table literal (α=0.05 two-sided over the remaining
    // hypotheses — a fixed table, the same one practitioners use, so
    // no normal-CDF evaluation has to agree across engines). The arms
    // are hash-random (a true A/A), so a deterministic KNOWN effect is
    // injected — +11 on purchase (clearly significant from sf0.01 up),
    // +5 on signup (significant unadjusted, killed by the correction)
    // — the standard harness that exercises every branch of the
    // step-down instead of only the all-null one. The windows order a
    // #event_types-row aggregate (≤ tens of rows at ANY corpus scale —
    // the fact is reduced first), so the global sort is free; the fact
    // itself is ONE grouped pass.
    "events_holm_correction" -> ((s, dir) => {
      val dec = DecimalType(28, 6)
      val d12 = DecimalType(38, 12)
      val t6 = graft.ext.TextStats.trunc6 _
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) < lit(1e12))
        .select(col("event_type"),
          (col("user_id") % 2 === 0).as("arm_a"), col("value"))
        .select(col("event_type"), col("arm_a"),
          (col("value") +
            when(col("arm_a") && col("event_type") === "purchase",
              lit(11.0)).otherwise(lit(0.0)) +
            when(col("arm_a") && col("event_type") === "signup",
              lit(5.0)).otherwise(lit(0.0))).as("value"))
      val g = b.groupBy("event_type").agg(
        count(when(col("arm_a"), lit(1))).as("n_a"),
        sum(when(col("arm_a"), col("value").cast(dec)))
          .cast("double").as("s_a"),
        sum(when(col("arm_a"), (col("value") * col("value")).cast(d12)))
          .cast("double").as("ss_a"),
        count(when(!col("arm_a"), lit(1))).as("n_b"),
        sum(when(!col("arm_a"), col("value").cast(dec)))
          .cast("double").as("s_b"),
        sum(when(!col("arm_a"), (col("value") * col("value")).cast(d12)))
          .cast("double").as("ss_b"))
      val varSum =
        (col("ss_a") - col("s_a") * col("s_a") / col("n_a")) /
          (col("n_a") - 1) / col("n_a") +
        (col("ss_b") - col("s_b") * col("s_b") / col("n_b")) /
          (col("n_b") - 1) / col("n_b")
      val zRaw = (col("s_a") / col("n_a") - col("s_b") / col("n_b")) /
        sqrt(varSum)
      val valid = col("n_a") > 1 && col("n_b") > 1 && varSum > 0
      val v = g.select(col("event_type"), col("n_a"), col("n_b"),
        when(valid, t6(zRaw)).as("z"),
        when(valid, t6(abs(zRaw))).as("abs_z"))
      // α=0.05 two-sided critical z for 1..64 remaining hypotheses
      // (Φ⁻¹(1−0.025/m), 6 dp — 64 covers any plausible event-type
      // cardinality; a divisor past the table leaves z_crit null and
      // the step-down conservatively stops, same as Holm's rule)
      val zcrit = s.range(1, HolmZCrit.length + 1)
        .select(col("id").as("divisor"),
          element_at(array(HolmZCrit.map(lit): _*),
            col("id").cast("int")).as("z_crit"))
      // the frame is ≤ #event_types rows, so the global rank and the
      // step-down run as broadcast before-or-equal self-joins (the
      // doc_zipf_alpha recipe) — same values as unpartitioned windows,
      // none of the "No Partition Defined" warnings an empty partition
      // spec sprays into every log (Catalyst folds partitionBy(lit))
      val vc = v.localCheckpoint(false) // fact agg runs once, 3 readers
      val ordv = vc.withColumn("ord", coalesce(col("abs_z"), lit(-1.0)))
      val bSide = broadcast(ordv.select(col("ord").as("b_ord"),
        col("event_type").as("b_et")))
      val mRow = broadcast(vc.agg(count(col("abs_z")).as("m")))
      val rked = ordv.join(bSide,
          col("b_ord") > col("ord") ||
            (col("b_ord") === col("ord") && col("b_et") <= col("event_type")))
        .groupBy("event_type", "n_a", "n_b", "z", "abs_z")
        .agg(count(lit(1)).cast("int").as("rk"))
        .crossJoin(mRow)
        .withColumn("divisor",
          when(col("abs_z").isNotNull, col("m") - col("rk") + 1))
      val j = rked.join(broadcast(zcrit), Seq("divisor"), "left")
        .localCheckpoint(false) // step-down + bonferroni share one build
      val jb = broadcast(j.select(col("rk").as("b_rk"),
        col("abs_z").as("b_abs"), col("z_crit").as("b_zc")))
      val bonf = broadcast(j.filter(col("rk") === 1)
        .select(col("z_crit").as("bonf")))
      j.join(jb, col("b_rk") <= col("rk"))
        .groupBy("event_type", "n_a", "n_b", "z", "m", "rk", "z_crit",
          "abs_z")
        .agg(min(when(col("b_abs") >= col("b_zc"), lit(1)).otherwise(lit(0)))
          .as("runmin"))
        .crossJoin(bonf)
        .select(col("event_type"), col("n_a"), col("n_b"), col("z"),
          col("m"),
          when(col("abs_z").isNotNull, col("rk")).cast("long")
            .as("holm_rank"),
          col("z_crit"),
          (col("abs_z") >= lit(1.959964)).as("sig_raw"),
          (col("abs_z") >= col("bonf")).as("sig_bonferroni"),
          when(col("abs_z").isNotNull, col("runmin") === 1).as("sig_holm"))
        .orderBy("event_type")
    }),

    "events_ab_lift" -> ((s, dir) => {
      val dec = DecimalType(28, 6)
      val d12 = DecimalType(38, 12)
      val t6 = graft.ext.TextStats.trunc6 _
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) < lit(1e12))
        .select(col("event_type"), col("value"),
          (col("user_id") % 2 === 0).as("arm_a"))
      val g = b.groupBy("event_type").agg(
        count(when(col("arm_a"), lit(1))).as("n_a"),
        sum(when(col("arm_a"), col("value").cast(dec)))
          .cast("double").as("s_a"),
        sum(when(col("arm_a"), (col("value") * col("value")).cast(d12)))
          .cast("double").as("ss_a"),
        count(when(!col("arm_a"), lit(1))).as("n_b"),
        sum(when(!col("arm_a"), col("value").cast(dec)))
          .cast("double").as("s_b"),
        sum(when(!col("arm_a"), (col("value") * col("value")).cast(d12)))
          .cast("double").as("ss_b"))
      val ma = col("s_a") / col("n_a")
      val mb = col("s_b") / col("n_b")
      val va = (col("ss_a") - col("s_a") * col("s_a") / col("n_a")) /
        (col("n_a") - 1)
      val vb = (col("ss_b") - col("s_b") * col("s_b") / col("n_b")) /
        (col("n_b") - 1)
      val se2 = va / col("n_a") + vb / col("n_b")
      g.select(col("event_type"), col("n_a"), col("n_b"),
          t6(ma).as("mean_a"), t6(mb).as("mean_b"),
          t6(mb - ma).as("lift"),
          when(col("n_a") > 1 && col("n_b") > 1 && se2 > 0,
            t6((mb - ma) / sqrt(se2))).as("t_welch"))
        .orderBy("event_type")
    }),

    // Pareto revenue-concentration curve per priority class: customers
    // ranked by revenue, cumulative share at each rank-decile boundary
    // ("the top 10% of customers carry X% of revenue"). The fact
    // collapses to customer-level revenue FIRST (one hash aggregate,
    // cut with a lazy checkpoint so the two-pass rank doesn't inline
    // it twice); the per-class customer rank comes from the
    // range-partitioned Quantiles.bucketedRank — NO window partitioned
    // on the 5-value priority class ever touches customer-level rows,
    // so no task sorts a whole class at 100 TB. Deciles are the
    // closed-form ntile arithmetic on (rank, n); the cumulative and
    // total revenue then need only ONE tiny window over the ≤ 50
    // (class, decile) aggregate rows.
    "orders_pareto_share" -> ((s, dir) => {
      val rev = Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority", "o_custkey")
        .agg(sum(col("o_totalprice").cast(Dec)).as("crev"))
        .withColumn("__negrev", negate(col("crev")))
        .localCheckpoint(false)
      val ranked = graft.operators.Quantiles.bucketedRank(
        rev, Seq("o_orderpriority"), "__negrev", "o_custkey")
      val byDecile = ranked
        .withColumn("decile", graft.operators.Quantiles
          .ntileFromRank(col("__rank"), col("__n"), 10))
        .groupBy("o_orderpriority", "decile")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("crev")).as("__dsum"))
      val wCum = Window.partitionBy("o_orderpriority").orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wTot = Window.partitionBy("o_orderpriority")
      byDecile
        .withColumn("__cum", sum(col("__dsum")).over(wCum))
        .withColumn("__trev", sum(col("__dsum")).over(wTot))
        .select(col("o_orderpriority"), col("decile"), col("n_cust"),
          graft.ext.TextStats.trunc6(
            col("__cum").cast("double") / col("__trev").cast("double"))
            .as("cum_share"))
        .orderBy("o_orderpriority", "decile")
    }),

    // Decile table per order-priority class: per-class deciles ordered
    // by (totalprice, orderkey), then per-decile count / bounds /
    // decimal-exact mean — the analytic-window surface (§2.E) on the
    // orders fact, computed WITHOUT `ntile(10) OVER (PARTITION BY
    // o_orderpriority ...)`: that window has 5 partitions, i.e. each
    // task sorts billions of rows at 100 TB. Instead the per-class
    // rank comes from Quantiles.bucketedRank (fixed price grid — no
    // extra stats scan; windows partitioned by (class, bucket), 20k+
    // partitions) and the decile is the closed-form ntile arithmetic
    // on (rank, n) — bit-identical to NTILE, then ONE hash aggregate.
    "orders_ntile_deciles" -> ((s, dir) => {
      val ranked = graft.operators.Quantiles.bucketedRank(
        Tables.load(s, dir, "orders")
          .select("o_orderpriority", "o_totalprice", "o_orderkey"),
        Seq("o_orderpriority"), "o_totalprice", "o_orderkey",
        range = Some((0.0, 600000.0)))
      ranked
        .withColumn("decile", graft.operators.Quantiles
          .ntileFromRank(col("__rank"), col("__n"), 10))
        .groupBy("o_orderpriority", "decile")
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"),
          graft.ext.TextStats.trunc6(
            sum(col("o_totalprice").cast(Dec)).cast("double") /
              count(lit(1))).as("mean_price"))
        .orderBy("o_orderpriority", "decile")
    }),

    // RFM customer segmentation — recency / frequency / monetary
    // quartile scores, the CRM workhorse. Customer-grain moments come
    // from ONE hash aggregate over orders; each dimension's GLOBAL
    // quartile comes from Quantiles.bucketedRank with an empty group
    // key (range-partitioned two-pass rank — customer grain is still
    // billions of rows at 100 TB, so no `ntile(4) OVER (ORDER BY …)`
    // single-task window anywhere) + the closed-form ntile arithmetic.
    // Output is the ≤64-cell segment table with decimal-exact means.
    "orders_rfm_segments" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val maxd = Tables.load(s, dir, "orders")
        .agg(max(col("o_orderdate")).as("maxd"))
      val rfm = Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(max(col("o_orderdate")).as("lastd"),
          count(lit(1)).as("freq"),
          sum(col("o_totalprice").cast(Dec)).as("mon"))
        .crossJoin(broadcast(maxd))
        .select(col("o_custkey"),
          datediff(col("maxd"), col("lastd")).cast("long").as("rec"),
          col("freq"), col("mon"),
          (-col("freq")).as("negf"), negate(col("mon")).as("negm"))
        .localCheckpoint(false) // three rank passes share one build
      def q(valueCol: String, rng: (Double, Double), out: String) =
        graft.operators.Quantiles.bucketedRank(
          rfm.select("o_custkey", valueCol), Seq.empty, valueCol,
          "o_custkey", range = Some(rng))
          .select(col("o_custkey"), graft.operators.Quantiles
            .ntileFromRank(col("__rank"), col("__n"), 4).as(out))
      // score 1 = best: most recent / most orders / highest spend
      rfm.join(q("rec", (0.0, 3000.0), "r_score"), "o_custkey")
        .join(q("negf", (-1000.0, 0.0), "f_score"), "o_custkey")
        .join(q("negm", (-1e8, 0.0), "m_score"), "o_custkey")
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_customers"),
          t6(sum(col("mon")).cast("double") / count(lit(1)))
            .as("avg_monetary"))
        .orderBy("r_score", "f_score", "m_score")
    }),

    // DAU / trailing-7-day WAU / stickiness per day. The fact
    // collapses to the (user, day) grain FIRST (one distinct — the
    // only corpus-scale shuffle); the trailing-window distinct is the
    // standard contribution-expansion: each user-day contributes to
    // days d..d+6 (bounded 7× of the DAY-GRAIN rows, not the fact),
    // distinct again, count. No self-join of the fact, no 7-day
    // re-scan per output day.
    "events_dau_wau" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val ud = TsQueries.base(s, dir)
        .select(expr("sec div 86400").as("day"), col("user_id"))
        .distinct()
        .localCheckpoint(false) // dau + expansion share the distinct
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
          col("user_id"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, "day") // inner: only days with observed activity
        .select(col("day"), col("dau"), col("wau"),
          t6(col("dau").cast("double") / col("wau")).as("stickiness"))
        .orderBy("day")
    }),

    // Funnel latency by signup-day cohort: per user the first signup
    // and first subsequent purchase (two filtered min-aggregates — no
    // window over the fact), then conversion counts + interpolated
    // p50/p90 delays per cohort day via the engine-portable
    // interpByRank (cohort-day partitions grow with the time range,
    // not a fixed handful).
    "events_funnel_time" -> ((s, dir) => {
      val b = TsQueries.base(s, dir)
      val sign = b.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("sec")).as("s_sec"))
      val purch = b.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("sec")).as("p_sec"))
      val conv = sign.join(purch, Seq("user_id"), "left")
        .select(col("user_id"), expr("s_sec div 86400").as("signup_day"),
          when(col("p_sec") >= col("s_sec"), col("p_sec") - col("s_sec"))
            .as("delay"))
        .localCheckpoint(false) // counts + quantiles share it
      val qs = graft.operators.Quantiles.interpByRank(
        conv.filter(col("delay").isNotNull),
        Seq("signup_day"), "delay", "user_id", Seq(50, 90))
        .select(col("signup_day"), col("q50").as("p50_delay_sec"),
          col("q90").as("p90_delay_sec"))
      conv.groupBy("signup_day")
        .agg(count(lit(1)).as("n_signups"),
          count(col("delay")).as("n_converted"))
        .join(qs, Seq("signup_day"), "left")
        .orderBy("signup_day")
    }),

    // Top first-3-event paths — the onboarding-flow audit. The fact is
    // cut to 3 rows/user by row_number over the user-partitioned window
    // BEFORE any aggregation buffer exists: a window sort partitioned on
    // the high-cardinality user key spills gracefully (a power user's
    // ten-million-event history never materializes in one collect_list
    // buffer — those don't spill). Only the ≤3 surviving rows per user
    // enter the collect/array_sort, the path is a narrow projection,
    // and the final top-10 is a TakeOrdered over the bounded path-count
    // table. event_id is unique, so ordering by (sec, event_id) is
    // total and the rn-sorted path equals the old full-history slice.
    "events_top_paths" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("sec"), col("event_id"))
      TsQueries.base(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy("user_id")
        .agg(array_sort(collect_list(struct(
          col("rn"), col("event_type")))).as("evs"))
        .select(array_join(transform(col("evs"),
          x => x.getField("event_type")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path")).limit(10)
    }),

    // Per-metric Gini concentration of user activity ("do a few users
    // generate most events?"). User-grain counts from one hash
    // aggregate; the per-metric ascending rank comes from
    // bucketedRank (never a 5-partition window over user rows); the
    // Gini closed form needs only Σrank·cnt — routed through DECIMAL
    // so the billion-user dot product cannot overflow or reorder.
    "events_user_gini" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val dec0 = DecimalType(38, 0)
      val uc = TsQueries.base(s, dir)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("cnt"))
        // the two-pass rank references its input twice (bucket counts +
        // rank join); cut the aggregate so the fact is scanned ONCE
        .localCheckpoint(false)
      graft.operators.Quantiles.bucketedRank(
        uc, Seq("event_type"), "cnt", "user_id",
        range = Some((0.0, 100000.0)))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"),
          sum(col("cnt")).as("tot"),
          sum((col("__rank") * col("cnt")).cast(dec0)).as("rc"))
        .select(col("event_type"), col("n_users"),
          t6((col("rc").cast("double") * 2) /
            (col("n_users").cast("double") * col("tot").cast("double")) -
            (col("n_users") + 1).cast("double") / col("n_users"))
            .as("gini"))
        .orderBy("event_type")
    }),

    // Inter-order gap analytics per market segment: the lag window
    // partitions on o_custkey (high-cardinality — each task holds a
    // customer's short history, never a segment), gaps then roll up
    // through one join + one hash aggregate with decimal mean sums.
    "orders_interorder_gap" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val gaps = Tables.load(s, dir, "orders")
        .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("o_custkey"),
          datediff(col("o_orderdate"), col("prev")).cast("long")
            .as("gap_days"))
      gaps.join(Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
          "o_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_gaps"),
          t6(sum(col("gap_days").cast(Dec)).cast("double") /
            count(lit(1))).as("avg_gap_days"),
          max(col("gap_days")).as("max_gap_days"))
        .orderBy("c_mktsegment")
    }),

    // Kaplan–Meier repeat-purchase survival: the probability a
    // customer has NOT yet reordered by day h, with the last
    // order→observation-end gap entering as a CENSORED observation —
    // the estimator orders_interorder_gap's plain mean cannot give
    // (means over only completed gaps are biased low; KM uses the
    // censored mass correctly). Survival at the fixed horizons
    // {7,14,30,60,90}: S(h) = Π_{t≤h} (1 − d_t/n_t). One lead window
    // on orders; everything after runs on the ≤|distinct gap|
    // aggregate: at-risk counts via a broadcast strictly-before
    // self-join (no global window), the log-product through
    // DECIMAL(38,18), horizons as a broadcast 5-row table.
    "orders_survival_km" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val dec18 = DecimalType(38, 18)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val o = Tables.load(s, dir, "orders")
      val maxd = o.agg(max(col("o_orderdate")).as("maxd"))
      val obs = o
        .withColumn("nxt", lead(col("o_orderdate"), 1).over(w))
        .crossJoin(broadcast(maxd))
        .select(
          when(col("nxt").isNotNull,
            datediff(col("nxt"), col("o_orderdate")))
            .otherwise(datediff(col("maxd"), col("o_orderdate")))
            .cast("long").as("dur"),
          col("nxt").isNotNull.as("event"))
        .filter(col("dur") > 0)
        .localCheckpoint(false) // total + the duration table share it
      val total = obs.agg(count(lit(1)).as("n_total"))
      val times = obs.groupBy("dur")
        .agg(count(when(col("event"), 1)).as("d"),
          count(lit(1)).as("c_all"))
        .localCheckpoint(false) // at-risk self-join reads it twice
      val before = broadcast(times.select(col("dur").as("b_dur"),
        col("c_all").as("b_c")))
      val ev = times
        .join(before, col("b_dur") < col("dur"), "left")
        .groupBy("dur", "d")
        .agg(coalesce(sum(col("b_c")), lit(0L)).as("n_before"))
        .crossJoin(broadcast(total))
        .withColumn("n_risk", col("n_total") - col("n_before"))
        .filter(col("d") > 0 && col("d") < col("n_risk"))
        .select(col("dur"), col("d"), col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk"))
            .cast(dec18).as("lnterm"))
      val horizons = obs.sparkSession.range(1)
        .select(explode(array(lit(7L), lit(14L), lit(30L), lit(60L),
          lit(90L))).as("horizon_days"))
      ev.crossJoin(broadcast(horizons))
        .filter(col("dur") <= col("horizon_days"))
        .groupBy("horizon_days")
        .agg(count(lit(1)).as("n_event_times"), sum(col("d")).as("d_total"),
          sum(col("lnterm")).as("lnsum"))
        .select(col("horizon_days"), col("n_event_times"), col("d_total"),
          t6(exp(col("lnsum").cast("double"))).as("survival"))
        .orderBy("horizon_days")
    }),

    // Cohort LTV triangle: customers bucketed by first-order year, per
    // (cohort, order-year) revenue and the running per-customer LTV.
    // The cohort tag is a customer-partitioned window min (ONE orders
    // scan — high-cardinality partitions, never a cohort-wide sort);
    // the frame is cut with a lazy checkpoint so cohort sizes and the
    // revenue rollup share it; the cumulative window runs over the
    // ≤ |cohorts|·|years| aggregate rows only.
    "orders_cohort_ltv" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val wc = Window.partitionBy("o_custkey")
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), year(col("o_orderdate")).as("order_year"),
          col("o_totalprice"),
          year(min(col("o_orderdate")).over(wc)).as("cohort_year"))
        .localCheckpoint(false) // sizes + revenue rollup share it
      val sizes = o.groupBy("cohort_year")
        .agg(countDistinct(col("o_custkey")).as("n_customers"))
      val rev = o.groupBy("cohort_year", "order_year")
        .agg(sum(col("o_totalprice").cast(Dec)).as("rev"))
      val w = Window.partitionBy("cohort_year").orderBy("order_year")
        .rowsBetween(Window.unboundedPreceding, 0)
      rev.withColumn("cum_rev", sum(col("rev")).over(w))
        .join(broadcast(sizes), "cohort_year")
        .select(col("cohort_year"), col("order_year"), col("n_customers"),
          t6(col("rev").cast("double")).as("rev"),
          t6(col("cum_rev").cast("double") / col("n_customers"))
            .as("ltv_per_customer"))
        .orderBy("cohort_year", "order_year")
    }),

    // Distribution-drift monitor: per day, the total-variation distance
    // between that day's event-type mix and the whole stream's — the
    // alarm a pipeline owner wires before a schema or traffic shift
    // poisons training data. The fact collapses to (day, type) counts
    // FIRST (bounded table; checkpointed for its four consumers); the
    // dense day×type grid comes from a 5-row broadcast cross join so
    // absent types contribute their full |0 − p_global| term; each
    // |p_day − p_global| routes through DECIMAL before summing.
    "events_mix_drift" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val dec12 = DecimalType(38, 12)
      val c = TsQueries.base(s, dir)
        .groupBy(expr("sec div 86400").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(false) // grid + global dist + totals share it
      val grid = c.select("day").distinct()
        .crossJoin(broadcast(c.select("event_type").distinct()))
        .join(c, Seq("day", "event_type"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
      val glob = c.groupBy("event_type").agg(sum(col("n")).as("gn"))
      val gtot = c.agg(sum(col("n")).as("gt"))
      val wd = Window.partitionBy("day")
      grid.withColumn("dn", sum(col("n")).over(wd))
        .join(broadcast(glob), "event_type")
        .crossJoin(broadcast(gtot))
        .withColumn("term",
          abs(col("n").cast("double") / col("dn") -
            col("gn").cast("double") / col("gt")).cast(dec12))
        .groupBy("day")
        .agg(max(col("dn")).as("n_events"),
          t6(sum(col("term")).cast("double") * lit(0.5)).as("tvd"))
        .orderBy("day")
    }),

    // CUPED variance-reduced experiment readout (Deng et al., WSDM
    // 2013): the pre-period covariate absorbs between-user variance so
    // the same traffic detects smaller lifts. User-level pre/post
    // means come from ONE grouped pass (decimal sums; the fixed-shape
    // per-user division is bit-identical across engines, so the
    // user-level terms re-enter DECIMAL for the cross-user moments);
    // θ = cov(pre, post)/var(pre) is pooled, the adjustment is a
    // closed-form projection over the per-arm aggregate. One row out.
    "events_cuped_lift" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val dec12 = DecimalType(38, 12)
      val mid = 1704067200L + 15L * 86400L
      val u = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")))
        .groupBy("user_id")
        .agg(
          count(when(col("sec") < mid, 1)).as("n_pre"),
          sum(when(col("sec") < mid, col("value").cast(Dec))).as("s_pre"),
          count(when(col("sec") >= mid, 1)).as("n_post"),
          sum(when(col("sec") >= mid, col("value").cast(Dec))).as("s_post"))
        .filter(col("n_pre") > 0 && col("n_post") > 0)
        .select(col("user_id"), (col("user_id") % 2 === 0).as("arm_a"),
          (col("s_pre").cast("double") / col("n_pre")).as("x"),
          (col("s_post").cast("double") / col("n_post")).as("y"))
      val g = u.agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec12)).cast("double").as("sx"),
        sum(col("y").cast(dec12)).cast("double").as("sy"),
        sum((col("x") * col("x")).cast(dec12)).cast("double").as("sxx"),
        sum((col("x") * col("y")).cast(dec12)).cast("double").as("sxy"),
        count(when(col("arm_a"), 1)).as("n_a"),
        sum(when(col("arm_a"), col("x").cast(dec12))).cast("double")
          .as("sx_a"),
        sum(when(col("arm_a"), col("y").cast(dec12))).cast("double")
          .as("sy_a"),
        count(when(!col("arm_a"), 1)).as("n_b"),
        sum(when(!col("arm_a"), col("x").cast(dec12))).cast("double")
          .as("sx_b"),
        sum(when(!col("arm_a"), col("y").cast(dec12))).cast("double")
          .as("sy_b"))
      val theta = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      val mxAll = col("sx") / col("n")
      def adj(sy: org.apache.spark.sql.Column,
              sx: org.apache.spark.sql.Column,
              n: org.apache.spark.sql.Column) =
        sy / n - col("theta") * (sx / n - mxAll)
      g.withColumn("theta", theta)
        .select(col("n_a"), col("n_b"),
          t6(col("sy_b") / col("n_b") - col("sy_a") / col("n_a"))
            .as("lift_raw"),
          t6(adj(col("sy_b"), col("sx_b"), col("n_b")) -
            adj(col("sy_a"), col("sx_a"), col("n_a"))).as("lift_cuped"),
          t6(col("theta")).as("theta"))
    }),

    // First-/last-touch attribution: each purchase credits the user's
    // first and most recent non-purchase touchpoints before it. Both
    // touchpoints ride ONE user-partitioned window pass (running
    // first/last with nulls ignored over the preceding frame — no
    // purchase×history join, no per-purchase re-scan); purchases with
    // no prior touch attribute to 'direct'. The marketing-analytics
    // staple, output one row per channel.
    "events_attribution" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("sec"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when(col("event_type") =!= "purchase", col("event_type"))
      val per = TsQueries.base(s, dir)
        .withColumn("ft", first(touch, ignoreNulls = true).over(w))
        .withColumn("lt", last(touch, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(coalesce(col("ft"), lit("direct")).as("ft"),
          coalesce(col("lt"), lit("direct")).as("lt"))
        .localCheckpoint(false) // both credit rollups share the pass
      val f = per.groupBy(col("ft").as("channel"))
        .agg(count(lit(1)).as("n_first"))
      val l = per.groupBy(col("lt").as("channel"))
        .agg(count(lit(1)).as("n_last"))
      f.join(l, Seq("channel"), "outer")
        .select(col("channel"),
          coalesce(col("n_first"), lit(0L)).as("n_first"),
          coalesce(col("n_last"), lit(0L)).as("n_last"))
        .orderBy("channel")
    }),

    // Bot-likeness score: per user, the coefficient of variation of
    // inter-event gaps — timer-driven automation collapses toward
    // cv = 0 while humans are bursty (cv ≥ 1). The lag window
    // partitions on the high-cardinality user key; moments route
    // through DECIMAL; only users with ≥ 20 gaps score (the small-n
    // cv estimate is noise). The abuse/quality screen a training
    // pipeline runs before trusting engagement-derived labels.
    "events_bot_score" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val dec6 = DecimalType(38, 6)
      val dec0 = DecimalType(38, 0)
      val w = Window.partitionBy("user_id")
        .orderBy(col("sec"), col("event_id"))
      val gaps = TsQueries.base(s, dir)
        .withColumn("prev", lag(col("sec"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("user_id"), (col("sec") - col("prev")).as("gap"))
      gaps.groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap").cast(dec6)).cast("double").as("sg"),
          sum((col("gap") * col("gap")).cast(dec0)).cast("double")
            .as("sgg"))
        .filter(col("n_gaps") >= 20)
        .withColumn("mean_gap", col("sg") / col("n_gaps"))
        .withColumn("cv",
          sqrt(greatest(
            (col("sgg") - col("sg") * col("sg") / col("n_gaps")) /
              (col("n_gaps") - 1), lit(0.0))) / col("mean_gap"))
        .select(col("user_id"), col("n_gaps"),
          t6(col("mean_gap")).as("mean_gap_sec"),
          t6(col("cv")).as("gap_cv"),
          (col("cv") < 0.3).as("bot_like"))
        .orderBy("user_id")
    }),

    // Benford first-significant-digit audit over order totals — the
    // standard fabricated-data / ingestion-defect screen for any
    // financial fact. The digit comes from the INTEGER-cast total's
    // string head (double→string formatting differs across engines;
    // bigint→string is byte-identical), expected shares are the
    // log10(1+1/d) law, and each digit row carries its chi-square
    // contribution. One map-side-combinable 9-group agg + a broadcast
    // 1-row total: nothing here changes shape at 100 TB.
    "orders_benford" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      // log10(1+1/d), d=1..9, 9 dp (matches the oracle's literal table)
      val benford = Seq(0.301029996, 0.176091259, 0.124938737,
        0.096910013, 0.079181246, 0.06694679, 0.057991947, 0.051152522,
        0.045757491)
      val byDigit = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") >= 1.0)
        .select(substring(floor(col("o_totalprice")).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
        .localCheckpoint(false) // one fact pass; total reads the 9-row stub
      val tot = broadcast(byDigit.agg(sum(col("n")).as("n_total")))
      byDigit.crossJoin(tot)
        .withColumn("expected",
          col("n_total") * element_at(array(benford.map(lit): _*),
            col("digit")))
        .select(col("digit"), col("n"),
          t6(col("n").cast("double") / col("n_total")).as("obs_share"),
          t6(element_at(array(benford.map(lit): _*), col("digit")))
            .as("exp_share"),
          t6((col("n") - col("expected")) * (col("n") - col("expected")) /
            col("expected")).as("chi2_term"))
        .orderBy("digit")
    }),

    // k-anonymity audit: treat (event_type, props-k decade) as the
    // quasi-identifier and measure each equivalence class's distinct
    // user count — the privacy screen a pipeline runs before releasing
    // behavioral data. Classes under k=5 are re-identification risks.
    // One distinct-agg pass over a narrow projection; class count is
    // bounded by |event_type| × 10 regardless of data volume.
    "events_k_anonymity" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      Tables.load(s, dir, "events")
        .select(col("event_type"), col("user_id"),
          floor(get_json_object(col("props"), "$.k").cast("long") / 10)
            .as("k_decade"))
        .groupBy("event_type", "k_decade")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_rows"))
        .select(col("event_type"), col("k_decade"), col("n_users"),
          col("n_rows"),
          t6(col("n_rows").cast("double") / col("n_users"))
            .as("rows_per_user"),
          (col("n_users") < 5).as("reident_risk"))
        .orderBy("event_type", "k_decade")
    }),

    // Always-valid sequential A/B test (mixture SPRT, normal mixture
    // τ²=1): per event_type and day, the running log mixture-likelihood
    // ratio over the CUMULATIVE day-ordered arm stats, and the
    // always-valid p-value (running min of 1/Λ, capped at 1) a team can
    // peek at daily without inflating false positives — the streaming
    // counterpart of events_holm_correction's fixed-horizon test. The
    // fact collapses to ≤ |event_type|×|day| rows in ONE decimal-routed
    // agg; the cumulative windows run on that tiny checkpointed frame.
    // Λ is reported in log space so a decisive experiment can't
    // overflow the double range.
    "events_msprt" -> ((s, dir) => {
      val dec = DecimalType(28, 6)
      val d12 = DecimalType(38, 12)
      val t6 = graft.ext.TextStats.trunc6 _
      val tau2 = 1.0
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) < lit(1e12))
        .select(col("event_type"),
          (col("sec") - (col("sec") % 86400L)).as("day_slot"),
          (col("user_id") % 2 === 0).as("arm_a"),
          (col("value") +
            when(col("user_id") % 2 === 0 &&
              col("event_type") === "purchase", lit(11.0))
              .otherwise(lit(0.0))).as("value"))
      val daily = b.groupBy("event_type", "day_slot").agg(
        count(when(col("arm_a"), lit(1))).as("d_na"),
        sum(when(col("arm_a"), col("value").cast(dec))).as("d_sa"),
        sum(when(col("arm_a"), (col("value") * col("value")).cast(d12)))
          .as("d_ssa"),
        count(when(!col("arm_a"), lit(1))).as("d_nb"),
        sum(when(!col("arm_a"), col("value").cast(dec))).as("d_sb"),
        sum(when(!col("arm_a"), (col("value") * col("value")).cast(d12)))
          .as("d_ssb"))
        .localCheckpoint(false) // fact agg once; windows read the stub
      val wcum = Window.partitionBy("event_type").orderBy("day_slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = daily
        .withColumn("n_a", sum(col("d_na")).over(wcum))
        .withColumn("s_a", sum(col("d_sa")).over(wcum).cast("double"))
        .withColumn("ss_a", sum(col("d_ssa")).over(wcum).cast("double"))
        .withColumn("n_b", sum(col("d_nb")).over(wcum))
        .withColumn("s_b", sum(col("d_sb")).over(wcum).cast("double"))
        .withColumn("ss_b", sum(col("d_ssb")).over(wcum).cast("double"))
      val vn =
        (col("ss_a") - col("s_a") * col("s_a") / col("n_a")) /
          (col("n_a") - 1) / col("n_a") +
        (col("ss_b") - col("s_b") * col("s_b") / col("n_b")) /
          (col("n_b") - 1) / col("n_b")
      val delta = col("s_a") / col("n_a") - col("s_b") / col("n_b")
      val valid = col("n_a") > 1 && col("n_b") > 1 && vn > 0
      val logLambda = lit(0.5) * log(vn / (vn + lit(tau2))) +
        delta * delta * lit(tau2) / (lit(2.0) * vn * (vn + lit(tau2)))
      val scored = cum.select(col("event_type"), col("day_slot"),
        col("n_a"), col("n_b"),
        when(valid, t6(delta)).as("delta"),
        when(valid, t6(logLambda)).as("log_lambda"),
        when(valid, exp(least(lit(0.0), -logLambda))).as("p_now"))
      val wmin = Window.partitionBy("event_type").orderBy("day_slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      scored
        .withColumn("p_seq", t6(min(coalesce(col("p_now"), lit(1.0)))
          .over(wmin)))
        .select(col("event_type"), col("day_slot"), col("n_a"),
          col("n_b"), col("delta"), col("log_lambda"), col("p_seq"))
        .orderBy("event_type", "day_slot")
    }),

    // Poisson bootstrap CI for the per-event-type mean — THE bootstrap
    // that works at cluster scale: instead of resampling n rows with
    // replacement (needs a global index), every row independently
    // draws a Poisson(1) count per replicate from a hash of
    // (event_id, replicate), so the 32-replicate expansion is map-side
    // and feeds straight into a partially-aggregated (event_type,
    // replicate) grid; nothing but that grid ever shuffles. Counts
    // come from the md5 ladder (first 8 hex chars vs the Poisson CDF
    // thresholds) — the same portable-hash trick corpus_split_assign
    // pins, so Spark and the oracle draw identical resamples.
    "events_bootstrap_ci" -> ((s, dir) => {
      val dec = DecimalType(28, 6)
      val t6 = graft.ext.TextStats.trunc6 _
      val nReps = 32
      // cumulative Poisson(1) thresholds as 8-hex-char strings:
      // floor(CDF(k) · 16^8), k = 0..6; ≥ t6 ⇒ count 7 (P ≈ 8e-5)
      val th = Seq("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797",
        "ff1025f5", "ffd90f3b", "fffa8b71")
      val u = substring(md5(concat(col("event_id").cast("string"),
        lit(":"), col("rep").cast("string"))), 1, 8)
      val cnt = when(u < th(0), 0).when(u < th(1), 1).when(u < th(2), 2)
        .when(u < th(3), 3).when(u < th(4), 4).when(u < th(5), 5)
        .when(u < th(6), 6).otherwise(7)
      val reps = Tables.load(s, dir, "events")
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) < lit(1e12))
        .select(col("event_id"), col("event_type"), col("value"),
          explode(sequence(lit(0), lit(nReps - 1))).as("rep"))
        .select(col("event_type"), col("rep"), col("value"),
          cnt.as("cnt"))
        .groupBy("event_type", "rep")
        .agg(sum(col("cnt")).as("m"),
          sum((col("value") * col("cnt")).cast(dec)).as("sv"),
          count(lit(1)).as("n_rows"),
          sum(col("value").cast(dec)).as("sv_plain"))
      reps
        .withColumn("rep_mean", t6(when(col("m") > 0,
          col("sv").cast("double") / col("m"))))
        .groupBy("event_type")
        .agg(count(col("rep_mean")).as("n_reps"),
          max(col("n_rows")).as("n_rows"),
          t6(max(col("sv_plain")).cast("double") / max(col("n_rows")))
            .as("point_mean"),
          sum(col("rep_mean").cast(dec)).cast("double").as("sr"),
          sum((col("rep_mean") * col("rep_mean"))
            .cast(DecimalType(38, 12))).cast("double").as("srr"))
        .select(col("event_type"), col("n_rows"), col("n_reps"),
          col("point_mean"),
          t6(sqrt(greatest(lit(0.0),
            (col("srr") - col("sr") * col("sr") / col("n_reps")) /
              (col("n_reps") - 1)))).as("boot_se"),
          t6(col("point_mean") - lit(1.959964) *
            sqrt(greatest(lit(0.0),
              (col("srr") - col("sr") * col("sr") / col("n_reps")) /
                (col("n_reps") - 1)))).as("ci_lo"),
          t6(col("point_mean") + lit(1.959964) *
            sqrt(greatest(lit(0.0),
              (col("srr") - col("sr") * col("sr") / col("n_reps")) /
                (col("n_reps") - 1)))).as("ci_hi"))
        .orderBy("event_type")
    }),

    // Next-event entropy per antecedent state — how predictable is the
    // event stream after each event type. The behavioral-sequence
    // counterpart of a language model's per-context entropy: computed
    // from the SAME lag-window transition counts as
    // events_markov_transitions, with the per-row p·ln p terms routed
    // through DECIMAL(38,12) before summing so the 5-term sums are
    // order-independent. Output is |event_type| rows.
    "events_path_entropy" -> ((s, dir) => {
      val d12 = DecimalType(38, 12)
      val t6 = graft.ext.TextStats.trunc6 _
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"), col("event_id"))
      val trans = TsQueries.base(s, dir)
        .select(col("user_id"), col("sec"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(false) // |types|² rows; marginal + join share it
      val fromTotals = trans.groupBy("prev_type")
        .agg(sum(col("n")).as("n_from"))
      trans.join(fromTotals, Seq("prev_type"))
        .withColumn("p", col("n").cast("double") / col("n_from"))
        .groupBy("prev_type")
        .agg(max(col("n_from")).as("n_from"),
          count(lit(1)).as("n_next_types"),
          sum((-col("p") * log(col("p"))).cast(d12)).cast("double")
            .as("h"))
        .select(col("prev_type"), col("n_from"), col("n_next_types"),
          t6(col("h")).as("entropy_nats"),
          t6(when(col("n_next_types") > 1,
            col("h") / log(col("n_next_types").cast("double"))))
            .as("entropy_norm"))
        .orderBy("prev_type")
    }),

    // Weibull fit of the inter-order gap distribution by median-rank
    // regression (Bernard's approximation F̂ᵢ = (i−0.3)/(n+0.4), then
    // OLS of ln(−ln(1−F̂)) on ln(gap)): shape k < 1 means churn risk
    // decays with tenure, k > 1 means it accumulates — the parametric
    // companion to orders_survival_km. The global rank comes from
    // Quantiles.bucketedRank (fixed day-gap grid — no single-task
    // window anywhere); the OLS moments are one DECIMAL-routed agg.
    "orders_weibull_fit" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val d12 = DecimalType(38, 12)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val gaps = Tables.load(s, dir, "orders")
        .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("o_orderkey"),
          datediff(col("o_orderdate"), col("prev")).cast("long")
            .as("gap_days"))
        .filter(col("gap_days") >= 1) // ln needs a positive gap
      val ranked = graft.operators.Quantiles.bucketedRank(
        gaps.withColumn("gd", col("gap_days").cast("double")),
        Seq.empty, "gd", "o_orderkey", range = Some((0.0, 4000.0)))
      val pts = ranked.select(
        log(col("gap_days").cast("double")).as("x"),
        log(-log(lit(1.0) -
          (col("__rank") - lit(0.3)) / (col("__n") + lit(0.4)))).as("y"))
      pts.agg(count(lit(1)).as("n"),
          sum(col("x").cast(d12)).cast("double").as("sx"),
          sum(col("y").cast(d12)).cast("double").as("sy"),
          sum((col("x") * col("x")).cast(d12)).cast("double").as("sxx"),
          sum((col("x") * col("y")).cast(d12)).cast("double").as("sxy"))
        .select(col("n").as("n_gaps"),
          t6((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")))
            .as("shape_k"),
          t6(exp(-(col("sy") / col("n") -
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("sx") / col("n"))) /
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")))))
            .as("scale_days"))
    }),

    // Quantile treatment effects: the arm-quantile differences at
    // p10/p50/p90 — where in the outcome distribution an experiment
    // moves mass (a mean lift that is all p90 is a different product
    // story than a uniform shift). Quantiles come from
    // Quantiles.interpByRank (the pinned-shape interpolation both
    // engines replay byte-identically — built-in `percentile` vs
    // `quantile_cont` diverge by 1 ulp on interpolation boundaries);
    // the per-arm frames are |types|×2 rows and broadcast-join.
    "events_qte" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val b = TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) < lit(1e12))
        .select(col("event_type"), col("event_id"),
          (col("user_id") % 2 === 0).as("arm_a"),
          (col("value") +
            when(col("user_id") % 2 === 0 &&
              col("event_type") === "purchase", lit(11.0))
              .otherwise(lit(0.0))).as("value"))
      val q = graft.operators.Quantiles.interpByRank(
        b, Seq("event_type", "arm_a"), "value", "event_id",
        Seq(10, 50, 90))
        .localCheckpoint(false) // one fact pass; both arm readers share
      val qa = q.filter(col("arm_a")).select(col("event_type"),
        col("q10").as("qa10"), col("q50").as("qa50"),
        col("q90").as("qa90"))
      val qb = q.filter(!col("arm_a")).select(col("event_type"),
        col("q10").as("qb10"), col("q50").as("qb50"),
        col("q90").as("qb90"))
      qa.join(broadcast(qb), "event_type")
        .select(col("event_type"),
          t6(col("qa50")).as("median_a"), t6(col("qb50")).as("median_b"),
          t6(col("qa10") - col("qb10")).as("qte_p10"),
          t6(col("qa50") - col("qb50")).as("qte_p50"),
          t6(col("qa90") - col("qb90")).as("qte_p90"))
        .orderBy("event_type")
    }),

    // Treatment-effect decay: the weekly lift series per event_type —
    // a launch whose lift fades week over week is a novelty effect,
    // not a product win; the fixed-horizon readouts (ab_lift, holm)
    // can't see the difference. One decimal-routed grouped pass to the
    // (type, week) grid; no window, no join.
    "events_lift_decay" -> ((s, dir) => {
      val dec = DecimalType(28, 6)
      val t6 = graft.ext.TextStats.trunc6 _
      TsQueries.base(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) < lit(1e12))
        .select(col("event_type"),
          expr("sec div 604800").as("week"),
          (col("user_id") % 2 === 0).as("arm_a"),
          (col("value") +
            when(col("user_id") % 2 === 0 &&
              col("event_type") === "purchase", lit(11.0))
              .otherwise(lit(0.0))).as("value"))
        .groupBy("event_type", "week")
        .agg(count(when(col("arm_a"), lit(1))).as("n_a"),
          count(when(!col("arm_a"), lit(1))).as("n_b"),
          sum(when(col("arm_a"), col("value").cast(dec)))
            .cast("double").as("s_a"),
          sum(when(!col("arm_a"), col("value").cast(dec)))
            .cast("double").as("s_b"))
        .select(col("event_type"), col("week"), col("n_a"), col("n_b"),
          t6(when(col("n_a") > 0 && col("n_b") > 0,
            col("s_a") / col("n_a") - col("s_b") / col("n_b")))
            .as("lift"))
        .orderBy("event_type", "week")
    }),

    // ABC classification of parts by revenue (A = first 80% of the
    // cumulative revenue curve, B = next 15%, C = tail) — the
    // inventory/catalog segmentation behind stocking and dedup-effort
    // decisions. The EXACT cumulative revenue in rank order comes from
    // Quantiles.bucketedPrefixSum (bucket-grid DECIMAL prefix sums +
    // driver-folded offsets — no global window anywhere), so the curve
    // is bit-identical to `sum() OVER (ORDER BY ...)` at any scale.
    "orders_abc_classification" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val rev = Tables.load(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(Dec)).as("rev"))
        .withColumn("negrev", negate(col("rev").cast("double")))
      val cum = graft.operators.Quantiles.bucketedPrefixSum(
        rev, "negrev", "rev", "l_partkey", range = (-1e7, 0.0))
      val share = col("__cumsum").cast("double") /
        col("__total").cast("double")
      cum
        .withColumn("abc_class",
          when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C"))
        .groupBy("abc_class")
        .agg(count(lit(1)).as("n_parts"),
          sum(col("rev")).as("crev"), max(col("__total")).as("tot"))
        .select(col("abc_class"), col("n_parts"),
          t6(col("crev").cast("double") / col("tot").cast("double"))
            .as("rev_share"))
        .orderBy("abc_class")
    }),

    // Churn label generation: the supervised-learning label a
    // retention model trains on — churned = no order in the dataset's
    // last 90 days — alongside the RFM features at the same grain, so
    // the output IS the training table. One grouped pass + a broadcast
    // 1-row horizon; no window.
    "orders_churn_labels" -> ((s, dir) => {
      val t6 = graft.ext.TextStats.trunc6 _
      val per = Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          max(col("o_orderdate")).as("lastd"),
          sum(col("o_totalprice").cast(Dec)).as("mon"))
        .localCheckpoint(false) // one fact pass; horizon derives from it
      val horizon = broadcast(per.agg(max(col("lastd")).as("maxd")))
      per
        .crossJoin(horizon)
        .select(col("o_custkey"), col("n_orders"),
          datediff(col("maxd"), col("lastd")).cast("long")
            .as("recency_days"),
          t6(col("mon").cast("double")).as("monetary"),
          (datediff(col("maxd"), col("lastd")) > 90).as("churned"))
        .orderBy("o_custkey")
    }),
  )

  // ---- oracles --------------------------------------------------------

  private val BaseCte = TsQueries.BaseCteSql

  /** End-to-end curation verdict oracle (shared: the per-doc key uses
    * it whole; the per-source observability key wraps it as a CTE and
    * aggregates). */
  private val CurateOracle: String =
    s"""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |), q AS (
         |  SELECT doc_id,
         |    (len(w) >= 50 AND len(w) <= 100000)
         |    AND (CAST(length(array_to_string(w, '')) AS DOUBLE) / len(w) >= 3.0
         |         AND CAST(length(array_to_string(w, '')) AS DOUBLE) / len(w) <= 10.0)
         |    AND (CAST(len(list_distinct(w)) AS DOUBLE) / len(w) > 0.3)
         |      AS q_pass
         |  FROM w
         |), h AS (
         |  SELECT doc_id, md5(lower(trim(text))) AS ch FROM documents
         |), canon AS (
         |  SELECT ch, min(doc_id) AS cid FROM h GROUP BY ch
         |), sg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(w) - 6),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
         |           w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' ||
         |           w[i+6] || ' ' || w[i+7])) AS gram
         |  FROM w WHERE len(w) >= 8
         |), pos AS (
         |  SELECT doc_id, gram, count(*) AS positions
         |  FROM sg GROUP BY doc_id, gram
         |), dupg AS (
         |  SELECT gram FROM pos GROUP BY gram HAVING count(*) >= 2
         |), spa AS (
         |  SELECT t.doc_id,
         |    CAST(coalesce(u.n_dup, 0) AS BIGINT) AS n_dup,
         |    CAST(t.n_grams AS BIGINT) AS n_grams
         |  FROM (SELECT doc_id, sum(positions) AS n_grams FROM pos
         |        GROUP BY doc_id) t
         |  LEFT JOIN (SELECT doc_id, sum(positions) AS n_dup
         |             FROM pos JOIN dupg USING (gram) GROUP BY doc_id) u
         |    USING (doc_id)
         |), span AS (
         |  SELECT d.doc_id,
         |    (spa.n_grams IS NULL OR
         |     floor(spa.n_dup / spa.n_grams * 1000000) / 1000000 <= 0.5)
         |      AS span_keep
         |  FROM documents d LEFT JOIN spa USING (doc_id)
         |), g5 AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(w) - 3),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
         |           w[i+3] || ' ' || w[i+4])) AS shingle
         |  FROM w WHERE len(w) >= 5
         |), bench5 AS (
         |  SELECT DISTINCT shingle FROM g5 WHERE doc_id % $BenchMod = 0
         |), bad AS (
         |  SELECT DISTINCT doc_id FROM g5 JOIN bench5 USING (shingle)
         |  WHERE doc_id % $BenchMod <> 0
         |)
         |SELECT d.doc_id,
         |  CASE WHEN d.doc_id % $BenchMod = 0 THEN 'eval' ELSE 'train' END
         |    AS split,
         |  q.q_pass,
         |  (d.doc_id = c.cid) AS is_canonical,
         |  span.span_keep,
         |  (d.doc_id % $BenchMod <> 0 AND
         |   d.doc_id NOT IN (SELECT doc_id FROM bad)) AS decontaminated,
         |  (d.doc_id % $BenchMod <> 0 AND q.q_pass AND (d.doc_id = c.cid)
         |   AND span.span_keep AND
         |   d.doc_id NOT IN (SELECT doc_id FROM bad)) AS kept
         |FROM documents d
         |JOIN q USING (doc_id)
         |JOIN h USING (doc_id)
         |JOIN canon c ON c.ch = h.ch
         |JOIN span USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin

  /** [[CurateOracle]] without its final ORDER BY — legal inside a CTE
    * (DuckDB rejects ORDER BY in a CTE used by an aggregate anyway,
    * and the wrapper imposes its own total order). */
  private val CurateOracleBody: String =
    CurateOracle.stripSuffix("\nORDER BY d.doc_id")

  def oracle: Map[String, String] = Map(

    "decontaminate_ngram" ->
      s"""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |), g AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(w) - 3),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
         |           w[i+3] || ' ' || w[i+4])) AS shingle
         |  FROM w WHERE len(w) >= 5
         |), bench AS (
         |  SELECT DISTINCT shingle FROM g WHERE doc_id % $BenchMod = 0
         |), bad AS (
         |  SELECT DISTINCT doc_id FROM g JOIN bench USING (shingle)
         |  WHERE doc_id % $BenchMod <> 0
         |)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id % $BenchMod <> 0
         |  AND doc_id NOT IN (SELECT doc_id FROM bad)
         |ORDER BY doc_id""".stripMargin,

    "ts_anomaly_seasonal" -> {
      val n = "CAST(rn AS DOUBLE)"
      val variance =
        s"greatest((sxx - sx * sx / $n) / $n, CAST(0.0 AS DOUBLE))"
      s"""$BaseCte, b AS (
         |  SELECT event_id, event_type, (sec % 86400) // 3600 AS hour, value
         |  FROM base WHERE value IS NOT NULL
         |), cells AS (
         |  SELECT event_type, hour,
         |    count(CASE WHEN abs(value) < 1e12 THEN value END) AS rn,
         |    CAST(sum(CAST(CASE WHEN abs(value) < 1e12 THEN value END
         |                  AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         |    CAST(sum(CAST(CASE WHEN abs(value) < 1e12 THEN value END
         |                  AS DECIMAL(18,6))
         |           * CAST(CASE WHEN abs(value) < 1e12 THEN value END
         |                  AS DECIMAL(18,6))) AS DOUBLE) AS sxx
         |  FROM b GROUP BY event_type, hour
         |), scored AS (
         |  SELECT b.event_id, b.event_type, b.hour, b.value,
         |    CASE WHEN rn >= 2 AND sqrt($variance) > 0
         |         THEN floor((value - sx / $n) / sqrt($variance)
         |                * 1000000) / 1000000 END AS z
         |  FROM b JOIN cells USING (event_type, hour)
         |)
         |SELECT event_id, event_type, hour, value, z
         |FROM scored WHERE abs(z) > 3
         |ORDER BY event_id""".stripMargin
    },

    "text_pack_sequences" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), s AS (
        |  SELECT source, doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS start_offset
        |  FROM t
        |)
        |SELECT source, doc_id, n_tokens, start_offset,
        |  start_offset // 512 AS bin_first,
        |  (start_offset + n_tokens - 1) // 512 AS bin_last,
        |  (start_offset + n_tokens - 1) // 512
        |    - start_offset // 512 + 1 AS n_bins
        |FROM s ORDER BY doc_id""".stripMargin,

    "events_key_skew" ->
      """WITH per AS (
        |  SELECT event_type, user_id, count(*) AS c
        |  FROM events GROUP BY 1, 2
        |), agg AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
        |    count(*) AS n_keys, max(c) AS max_per_key
        |  FROM per GROUP BY 1
        |), hot AS (
        |  SELECT p.event_type, min(p.user_id) AS hot_user
        |  FROM per p JOIN agg a
        |    ON p.event_type = a.event_type AND p.c = a.max_per_key
        |  GROUP BY 1
        |)
        |SELECT a.event_type, n_events, n_keys, max_per_key, hot_user,
        |  floor(CAST(n_events AS DOUBLE) / n_keys * 1000000)
        |    / 1000000 AS avg_per_key,
        |  floor(CAST(max_per_key * n_keys AS DOUBLE) / n_events * 1000000)
        |    / 1000000 AS skew_ratio
        |FROM agg a JOIN hot USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "ts_level_shift" ->
      s"""$BaseCte, b AS (
         |  SELECT event_id, event_type, sec, value FROM base
         |  WHERE value IS NOT NULL AND abs(value) < 1e12
         |), scored AS (
         |  SELECT event_id, event_type, sec, value,
         |    count(*) OVER (PARTITION BY event_type ORDER BY sec, event_id
         |      ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING) AS cl,
         |    count(*) OVER (PARTITION BY event_type ORDER BY sec, event_id
         |      ROWS BETWEEN CURRENT ROW AND 11 FOLLOWING) AS cr,
         |    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
         |      PARTITION BY event_type ORDER BY sec, event_id
         |      ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING) AS DOUBLE) AS sl,
         |    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
         |      PARTITION BY event_type ORDER BY sec, event_id
         |      ROWS BETWEEN CURRENT ROW AND 11 FOLLOWING) AS DOUBLE) AS sr
         |  FROM b
         |)
         |SELECT event_id, event_type, sec, value,
         |  floor((sr / 12 - sl / 12) * 1000000) / 1000000 AS shift
         |FROM scored WHERE cl = 12 AND cr = 12
         |ORDER BY abs(floor((sr / 12 - sl / 12) * 1000000) / 1000000) DESC,
         |  event_id LIMIT 50""".stripMargin,

    "ts_autocorr" -> {
      val nD = "CAST(n AS DOUBLE)"
      val mean = s"s / $nD"
      s"""$BaseCte, b AS (
         |  SELECT event_type, sec, event_id, value FROM base
         |  WHERE value IS NOT NULL AND abs(value) < 1e12
         |), p AS (
         |  SELECT event_type, value,
         |    lead(value) OVER (PARTITION BY event_type
         |      ORDER BY sec, event_id) AS xnext
         |  FROM b
         |), agg AS (
         |  SELECT event_type,
         |    count(value) AS n,
         |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
         |    CAST(sum(CAST(value AS DECIMAL(18,6))
         |           * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS ss,
         |    count(xnext) AS n1,
         |    CAST(sum(CASE WHEN xnext IS NOT NULL
         |      THEN CAST(value AS DECIMAL(18,6))
         |         * CAST(xnext AS DECIMAL(18,6)) END) AS DOUBLE) AS c,
         |    CAST(sum(CASE WHEN xnext IS NOT NULL
         |      THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sh,
         |    CAST(sum(CAST(xnext AS DECIMAL(18,6))) AS DOUBLE) AS st
         |  FROM p GROUP BY 1
         |)
         |SELECT event_type, n,
         |  CASE WHEN n >= 2 AND ss - $nD * ($mean) * ($mean) > 0
         |    THEN floor((c - ($mean) * (sh + st) + CAST(n1 AS DOUBLE)
         |           * ($mean) * ($mean))
         |         / (ss - $nD * ($mean) * ($mean)) * 1000000) / 1000000
         |  END AS r1
         |FROM agg ORDER BY event_type""".stripMargin
    },

    "ts_seasonal_profile" ->
      s"""$BaseCte, b AS (
         |  SELECT event_type, (sec % 86400) // 3600 AS hour, value
         |  FROM base WHERE value IS NOT NULL AND NOT isnan(value)
         |), byh AS (
         |  SELECT event_type, hour, count(*) AS n,
         |    sum(CAST(value AS DECIMAL(28,6))) AS hsum
         |  FROM b GROUP BY event_type, hour
         |), ov AS (
         |  SELECT event_type, count(*) AS tn,
         |    sum(CAST(value AS DECIMAL(28,6))) AS tsum
         |  FROM b GROUP BY event_type
         |)
         |SELECT byh.event_type, byh.hour, byh.n,
         |  floor((CAST(hsum AS DOUBLE) / n) * 1000000) / 1000000
         |    AS hour_mean,
         |  floor(((CAST(hsum AS DOUBLE) / n) - (CAST(tsum AS DOUBLE) / tn))
         |        * 1000000) / 1000000 AS seasonal_index
         |FROM byh JOIN ov USING (event_type)
         |ORDER BY event_type, hour""".stripMargin,

    "events_markov_transitions" ->
      s"""$BaseCte, seq AS (
         |  SELECT user_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id
         |                          ORDER BY sec, event_id) AS prev_type
         |  FROM base
         |), tr AS (
         |  SELECT prev_type, event_type AS next_type, count(*) AS n
         |  FROM seq WHERE prev_type IS NOT NULL
         |  GROUP BY prev_type, event_type
         |), ft AS (
         |  SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_from
         |  FROM tr GROUP BY prev_type
         |)
         |SELECT tr.prev_type, tr.next_type, CAST(tr.n AS BIGINT) AS n,
         |  ft.n_from,
         |  floor((tr.n / ft.n_from) * 1000000) / 1000000 AS p
         |FROM tr JOIN ft USING (prev_type)
         |ORDER BY tr.prev_type, tr.next_type""".stripMargin,

    "decontaminate_overlap_frac" ->
      s"""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |), g AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(w) - 3),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
         |           w[i+3] || ' ' || w[i+4])) AS shingle
         |  FROM w WHERE len(w) >= 5
         |), bench AS (
         |  SELECT DISTINCT shingle FROM g WHERE doc_id % $BenchMod = 0
         |), tot AS (
         |  SELECT doc_id, count(*) AS n_grams FROM g
         |  WHERE doc_id % $BenchMod <> 0 GROUP BY doc_id
         |), hit AS (
         |  SELECT g.doc_id, count(*) AS n_hit FROM g JOIN bench USING (shingle)
         |  WHERE g.doc_id % $BenchMod <> 0 GROUP BY g.doc_id
         |), f AS (
         |  SELECT d.doc_id,
         |    CAST(coalesce(t.n_grams, 0) AS BIGINT) AS n_grams,
         |    CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |    CASE WHEN t.n_grams IS NOT NULL THEN
         |      floor((coalesce(h.n_hit, 0) / t.n_grams) * 1000000) / 1000000
         |    END AS overlap_frac
         |  FROM documents d
         |  LEFT JOIN tot t USING (doc_id)
         |  LEFT JOIN hit h USING (doc_id)
         |  WHERE d.doc_id % $BenchMod <> 0
         |)
         |SELECT doc_id, n_grams, n_hit, overlap_frac,
         |  (overlap_frac IS NULL OR overlap_frac <= 0.1) AS keep
         |FROM f ORDER BY doc_id""".stripMargin,

    "events_winsorize" ->
      s"""$BaseCte, b AS (
         |  SELECT event_type, event_id, value FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |), r AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY value, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM b
         |), q AS (
         |  SELECT event_type,
         |    max(CASE WHEN rn = (5 * n + 99) // 100 THEN value END) AS q5,
         |    max(CASE WHEN rn = (95 * n + 99) // 100 THEN value END) AS q95
         |  FROM r GROUP BY event_type
         |)
         |SELECT b.event_type, count(*) AS n,
         |  count(CASE WHEN value < q5 THEN 1 END) AS n_clip_lo,
         |  count(CASE WHEN value > q95 THEN 1 END) AS n_clip_hi,
         |  CAST(sum(CAST(least(greatest(value, q5), q95) AS DECIMAL(28,6)))
         |       AS DOUBLE) / count(*) AS wmean
         |FROM b JOIN q USING (event_type)
         |GROUP BY b.event_type ORDER BY b.event_type""".stripMargin,

    "events_heavy_hitters_mg" ->
      s"""$BaseCte, e AS (
         |  SELECT event_type, sec // 86400 AS day, user_id FROM base
         |), pc AS (
         |  SELECT event_type, day, user_id, count(*) AS c
         |  FROM e GROUP BY event_type, day, user_id
         |), pr AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type, day
         |                               ORDER BY c DESC, user_id) AS r
         |  FROM pc
         |), bounds AS (
         |  SELECT event_type,
         |    CAST(sum(CASE WHEN r > 8 THEN c ELSE 0 END) AS BIGINT) AS max_err,
         |    CAST(sum(c) AS BIGINT) AS n_rows
         |  FROM pr GROUP BY event_type
         |), merged AS (
         |  SELECT event_type, user_id, CAST(sum(c) AS BIGINT) AS count
         |  FROM pr WHERE r <= 8 GROUP BY event_type, user_id
         |), rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type
         |                               ORDER BY count DESC, user_id) AS rr
         |  FROM merged
         |)
         |SELECT k.event_type, k.user_id, k.count, b.max_err, b.n_rows
         |FROM rk k JOIN bounds b USING (event_type)
         |WHERE k.rr <= 8
         |ORDER BY k.event_type, k.count DESC, k.user_id""".stripMargin,

    "events_cms_heavy_hitters" -> {
      // row r's bucket = md5(user_id) hex chars 4r+1..4r+4 → 0..4095
      // (matches Sketches.cmsBucket's conv(hex,16,10) % 4096)
      val byte = (1 to 4).map(i =>
        s"(strpos('0123456789abcdef', substr(hb, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
        .mkString("(", " + ", ") % 4096")
      s"""$BaseCte, e AS (
         |  SELECT user_id FROM base
         |), h AS (
         |  SELECT user_id, CAST(s.r AS INTEGER) AS r,
         |    substr(md5(CAST(user_id AS VARCHAR)),
         |           CAST(s.r * 4 + 1 AS INTEGER), 4) AS hb
         |  FROM e, (SELECT unnest(range(4)) AS r) s
         |), m AS (
         |  SELECT r, $byte AS bucket, CAST(count(*) AS BIGINT) AS cnt
         |  FROM h GROUP BY r, bucket
         |), cand AS (
         |  SELECT DISTINCT user_id, r, $byte AS bucket FROM h
         |), est AS (
         |  SELECT c.user_id, min(m.cnt) AS est
         |  FROM cand c JOIN m USING (r, bucket)
         |  GROUP BY c.user_id
         |), exact AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS exact
         |  FROM e GROUP BY user_id
         |)
         |SELECT user_id, est, exact, est - exact AS overest
         |FROM est JOIN exact USING (user_id)
         |ORDER BY est DESC, user_id LIMIT 10""".stripMargin
    },

    "pii_redact" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${Pipeline.EmailRe}')) AS BIGINT)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${Pipeline.PhoneRe}')) AS BIGINT)
         |    AS n_phones,
         |  CAST(len(regexp_extract_all(text, '${Pipeline.LongNumRe}')) AS BIGINT)
         |    AS n_longnums,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '${Pipeline.EmailRe}', '<EMAIL>', 'g'),
         |    '${Pipeline.PhoneRe}', '<PHONE>', 'g'),
         |    '${Pipeline.LongNumRe}', '<NUM>', 'g') AS clean
         |FROM documents ORDER BY doc_id""".stripMargin,

    "quality_rules" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), st AS (
        |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(length(array_to_string(w, '')) AS DOUBLE) / len(w) AS mean_len,
        |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dratio
        |  FROM w
        |)
        |SELECT doc_id, n_words,
        |  floor(mean_len * 1000000) / 1000000 AS mean_word_len,
        |  floor(dratio * 1000000) / 1000000 AS distinct_ratio,
        |  n_words >= 50 AND n_words <= 100000 AS r_length,
        |  mean_len >= 3.0 AND mean_len <= 10.0 AS r_word_len,
        |  dratio > 0.3 AS r_distinct,
        |  (n_words >= 50 AND n_words <= 100000)
        |    AND (mean_len >= 3.0 AND mean_len <= 10.0)
        |    AND dratio > 0.3 AS pass
        |FROM st ORDER BY doc_id""".stripMargin,

    "quality_repetition" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), g AS (
        |  SELECT doc_id, CAST(len(w) - 1 AS BIGINT) AS n_2grams,
        |    list_transform(range(1, len(w)),
        |      i -> w[i] || ' ' || w[i+1]) AS grams
        |  FROM w WHERE len(w) >= 2
        |)
        |SELECT doc_id, n_2grams,
        |  floor((1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / n_2grams)
        |        * 1000000) / 1000000 AS dup_2gram_frac,
        |  floor((1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / n_2grams)
        |        * 1000000) / 1000000 <= 0.4 AS r_repetition
        |FROM g ORDER BY doc_id""".stripMargin,

    "pipeline_curate" -> CurateOracle,

    "pipeline_stats_by_source" ->
      s"""WITH verdicts AS (
         |${CurateOracleBody}
         |)
         |SELECT d.source, count(*) AS n_docs,
         |  count(CASE WHEN v.split = 'eval' THEN 1 END) AS n_eval,
         |  count(CASE WHEN NOT v.q_pass THEN 1 END) AS n_quality_fail,
         |  count(CASE WHEN NOT v.is_canonical THEN 1 END) AS n_noncanonical,
         |  count(CASE WHEN NOT v.span_keep THEN 1 END) AS n_span_fail,
         |  count(CASE WHEN v.split = 'train' AND NOT v.decontaminated
         |        THEN 1 END) AS n_contaminated,
         |  count(CASE WHEN v.kept THEN 1 END) AS n_kept
         |FROM verdicts v JOIN documents d USING (doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin,


    "quality_vocab" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        |), counts AS (
        |  SELECT w, count(*) AS c FROM tok GROUP BY w
        |), top AS (
        |  SELECT w, TRUE AS in_vocab FROM counts ORDER BY c DESC, w LIMIT 10
        |), per AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |    count(CASE WHEN tp.in_vocab IS NULL THEN 1 END) AS n_oov,
        |    CAST(sum(c.c) AS BIGINT) AS sum_freq
        |  FROM tok t
        |  JOIN counts c USING (w)
        |  LEFT JOIN top tp ON tp.w = t.w
        |  GROUP BY t.doc_id
        |)
        |SELECT doc_id, n_tokens, n_oov,
        |  floor(n_oov / n_tokens * 1000000) / 1000000 AS oov_frac,
        |  floor(sum_freq / n_tokens * 1000000) / 1000000 AS avg_tok_freq
        |FROM per ORDER BY doc_id""".stripMargin,

    "events_quantiles_interp" -> {
      val pcts = Seq(25, 50, 75, 90)
      val aggCols = pcts.map { p =>
        s"""    max(CASE WHEN rn = ($p * (n - 1)) // 100 + 1 THEN value END)
           |      AS lo$p,
           |    max(CASE WHEN rn = ($p * (n - 1)) // 100 + 2 THEN value END)
           |      AS hi$p,
           |    max((($p * (n - 1)) % 100) / CAST(100 AS DOUBLE)) AS f$p"""
          .stripMargin
      }.mkString(",\n")
      val outCols = pcts.map { p =>
        s"  lo$p + (coalesce(hi$p, lo$p) - lo$p) * f$p AS q$p"
      }.mkString(",\n")
      s"""$BaseCte, clean AS (
         |  SELECT event_type, value, event_id FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |), r AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY value, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM clean
         |), a AS (
         |  SELECT event_type,
         |$aggCols
         |  FROM r GROUP BY event_type
         |)
         |SELECT event_type,
         |$outCols
         |FROM a ORDER BY event_type""".stripMargin
    },

    "events_retention_cohorts" ->
      s"""$BaseCte, days AS (
         |  SELECT DISTINCT user_id, sec // 86400 AS day FROM base
         |), coh AS (
         |  SELECT user_id, min(day) AS cohort FROM days GROUP BY user_id
         |)
         |SELECT c.cohort, d.day, count(*) AS n_users
         |FROM days d JOIN coh c USING (user_id)
         |GROUP BY c.cohort, d.day
         |ORDER BY c.cohort, d.day""".stripMargin,

    "events_funnel" ->
      s"""$BaseCte, fc AS (
         |  SELECT user_id, min(sec) AS click_sec FROM base
         |  WHERE event_type = 'click' GROUP BY user_id
         |), fp AS (
         |  SELECT f.user_id, f.click_sec,
         |    min(CASE WHEN b.sec >= f.click_sec THEN b.sec END)
         |      AS purchase_sec
         |  FROM fc f LEFT JOIN base b
         |    ON b.user_id = f.user_id AND b.event_type = 'purchase'
         |  GROUP BY f.user_id, f.click_sec
         |)
         |SELECT user_id, click_sec, purchase_sec,
         |  purchase_sec - click_sec AS delay_sec,
         |  purchase_sec IS NOT NULL
         |    AND purchase_sec - click_sec <= 604800 AS converted
         |FROM fp ORDER BY user_id""".stripMargin,

    "ts_seasonal_naive" ->
      s"""$BaseCte, cell AS (
         |  SELECT user_id, event_type, slot, max_by(value, event_id) AS v
         |  FROM base WHERE value IS NOT NULL AND NOT isnan(value)
         |  GROUP BY user_id, event_type, slot
         |), j AS (
         |  SELECT c.event_type, abs(c.v - p.v) AS e
         |  FROM cell c JOIN cell p
         |    ON p.user_id = c.user_id AND p.event_type = c.event_type
         |   AND p.slot = c.slot - 86400
         |)
         |SELECT event_type, count(*) AS n,
         |  floor(CAST(sum(CAST(e AS DECIMAL(18,6))) AS DOUBLE) / count(*)
         |        * 1000000) / 1000000 AS mae
         |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ts_cusum" ->
      s"""$BaseCte, clean AS (
         |  SELECT user_id, event_type, sec, event_id, value FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |    AND abs(value) < 1e12
         |), g AS (
         |  SELECT user_id, event_type,
         |    list(CAST(value AS DOUBLE) ORDER BY sec, event_id) AS vals,
         |    count(*) AS n,
         |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
         |    CAST(sum(CAST(value AS DECIMAL(18,6)) *
         |             CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS ss
         |  FROM clean GROUP BY user_id, event_type
         |), m AS (
         |  SELECT *, sv / CAST(n AS DOUBLE) AS mu,
         |    sqrt(greatest(CAST(0.0 AS DOUBLE),
         |      ss / CAST(n AS DOUBLE)
         |        - (sv / CAST(n AS DOUBLE)) * (sv / CAST(n AS DOUBLE))))
         |      AS sigma
         |  FROM g
         |), f AS (
         |  SELECT user_id, event_type, n, mu, sigma,
         |    list_reduce(
         |      list_prepend([CAST(0.0 AS DOUBLE), 0.0, 0.0, 0.0],
         |        list_transform(vals, x -> [x, 0.0, 0.0, 0.0])),
         |      (acc, e) -> [
         |        greatest(CAST(0.0 AS DOUBLE),
         |          acc[1] + (e[1] - mu - 0.5 * sigma)),
         |        greatest(CAST(0.0 AS DOUBLE),
         |          acc[2] + (mu - 0.5 * sigma - e[1])),
         |        acc[3] + (CASE WHEN
         |          greatest(CAST(0.0 AS DOUBLE),
         |            acc[1] + (e[1] - mu - 0.5 * sigma)) > 4 * sigma
         |          OR greatest(CAST(0.0 AS DOUBLE),
         |            acc[2] + (mu - 0.5 * sigma - e[1])) > 4 * sigma
         |          THEN 1.0 ELSE 0.0 END),
         |        greatest(acc[4],
         |          greatest(CAST(0.0 AS DOUBLE),
         |            acc[1] + (e[1] - mu - 0.5 * sigma)),
         |          greatest(CAST(0.0 AS DOUBLE),
         |            acc[2] + (mu - 0.5 * sigma - e[1])))]) AS fit
         |  FROM m
         |)
         |SELECT user_id, event_type, CAST(n AS BIGINT) AS n,
         |  round(mu, 6) AS mean, round(sigma, 6) AS sigma,
         |  round(fit[4], 6) AS max_stat,
         |  CAST(fit[3] AS BIGINT) AS n_alarms
         |FROM f ORDER BY user_id, event_type""".stripMargin,

    "ts_hurst" ->
      s"""$BaseCte, clean AS (
         |  SELECT event_type, sec, event_id, value FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |    AND abs(value) < 1e12
         |), rn AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY sec, event_id) AS rn
         |  FROM clean
         |), ex AS (
         |  SELECT event_type, rn, value, bs
         |  FROM rn CROSS JOIN (VALUES (32), (128)) AS sz(bs)
         |), blk AS (
         |  SELECT event_type, bs, (rn - 1) // bs AS blk,
         |    count(*) AS n,
         |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
         |    CAST(sum(CAST(value AS DECIMAL(18,6)) *
         |             CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS ss,
         |    list(CAST(value AS DOUBLE) ORDER BY rn) AS vals
         |  FROM ex GROUP BY 1, 2, 3 HAVING count(*) = bs
         |), m AS (
         |  SELECT *, sv / CAST(n AS DOUBLE) AS mu,
         |    sqrt(greatest(CAST(0.0 AS DOUBLE),
         |      ss / CAST(n AS DOUBLE)
         |        - (sv / CAST(n AS DOUBLE)) * (sv / CAST(n AS DOUBLE))))
         |      AS sigma
         |  FROM blk
         |), f AS (
         |  SELECT event_type, bs, sigma,
         |    list_reduce(
         |      list_prepend([CAST(0.0 AS DOUBLE), 0.0, 0.0],
         |        list_transform(vals, x -> [x, 0.0, 0.0])),
         |      (acc, e) -> [acc[1] + (e[1] - mu),
         |        least(acc[2], acc[1] + (e[1] - mu)),
         |        greatest(acc[3], acc[1] + (e[1] - mu))]) AS fit
         |  FROM m
         |), r AS (
         |  SELECT event_type, bs,
         |    CASE WHEN sigma > 0 THEN (fit[3] - fit[2]) / sigma END AS rs
         |  FROM f
         |), ps AS (
         |  SELECT event_type, bs, count(lnrs) AS nb,
         |    CASE WHEN count(lnrs) > 0 THEN
         |      CAST(sum(CAST(lnrs AS DECIMAL(18,6))) AS DOUBLE)
         |        / count(lnrs) END AS m
         |  FROM (SELECT event_type, bs,
         |      CASE WHEN rs > 0
         |        THEN floor(ln(rs) * 1000000) / 1000000 END AS lnrs
         |    FROM r) q
         |  GROUP BY event_type, bs
         |)
         |SELECT event_type,
         |  coalesce(max(CASE WHEN bs = 32 THEN nb END), 0) AS n_blocks_32,
         |  coalesce(max(CASE WHEN bs = 128 THEN nb END), 0) AS n_blocks_128,
         |  floor(max(CASE WHEN bs = 32 THEN m END) * 1000000) / 1000000
         |    AS mean_lnrs_32,
         |  floor(max(CASE WHEN bs = 128 THEN m END) * 1000000) / 1000000
         |    AS mean_lnrs_128,
         |  CASE WHEN max(CASE WHEN bs = 32 THEN m END) IS NOT NULL
         |    AND max(CASE WHEN bs = 128 THEN m END) IS NOT NULL
         |    THEN floor((max(CASE WHEN bs = 128 THEN m END)
         |      - max(CASE WHEN bs = 32 THEN m END)) / ln(4.0)
         |      * 1000000) / 1000000
         |  END AS hurst
         |FROM ps GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ts_forecast_backtest" ->
      s"""$BaseCte, clean AS (
         |  SELECT user_id, event_type, sec, event_id, value FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |    AND abs(value) < 1e12
         |), g AS (
         |  SELECT user_id, event_type,
         |    list(CAST(value AS DOUBLE) ORDER BY sec, event_id) AS vals,
         |    count(*) AS n
         |  FROM clean GROUP BY user_id, event_type
         |), f AS (
         |  SELECT event_type,
         |    list_reduce(
         |      list_prepend([vals[1], CAST(0.0 AS DOUBLE), 0.0, 0.0,
         |          vals[1]],
         |        list_transform(vals[2:], x -> [x, 0.0, 0.0, 0.0, 0.0])),
         |      (acc, e) -> [0.3 * e[1] + 0.7 * acc[1],
         |        acc[2] + abs(e[1] - acc[5]),
         |        acc[3] + abs(e[1] - acc[1]),
         |        acc[4] + 1.0,
         |        e[1]]) AS fit
         |  FROM g
         |), ps AS (
         |  SELECT event_type, CAST(fit[4] AS BIGINT) AS n_err,
         |    floor(fit[2] * 1000000) / 1000000 AS sae_n,
         |    floor(fit[3] * 1000000) / 1000000 AS sae_e
         |  FROM f
         |), agg AS (
         |  SELECT event_type, count(*) AS n_series,
         |    CAST(sum(n_err) AS BIGINT) AS n_points,
         |    CAST(sum(CAST(sae_n AS DECIMAL(18,6))) AS DOUBLE) AS tn,
         |    CAST(sum(CAST(sae_e AS DECIMAL(18,6))) AS DOUBLE) AS te
         |  FROM ps GROUP BY event_type
         |)
         |SELECT event_type, n_series, n_points,
         |  CASE WHEN n_points > 0
         |    THEN floor(tn / n_points * 1000000) / 1000000 END AS mae_naive,
         |  CASE WHEN n_points > 0
         |    THEN floor(te / n_points * 1000000) / 1000000 END AS mae_ewma,
         |  CASE WHEN n_points > 0 AND tn > 0
         |    THEN floor((1.0 - te / tn) * 1000000) / 1000000
         |  END AS ewma_skill
         |FROM agg ORDER BY event_type""".stripMargin,

    // The fold state is a LIST [level, trend], not a struct: DuckDB's
    // list_reduce evaluates struct_pack fields non-atomically (a later
    // field's acc references can see the earlier field's already-
    // updated value), so a struct-state Holt recurrence silently
    // diverges; list construction is atomic in both engines.
    "ts_holt_forecast" ->
      s"""$BaseCte, clean AS (
         |  SELECT user_id, event_type, sec, event_id, value FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |), g AS (
         |  SELECT user_id, event_type,
         |    list(CAST(value AS DOUBLE) ORDER BY sec, event_id) AS vals
         |  FROM clean GROUP BY user_id, event_type
         |), f AS (
         |  SELECT user_id, event_type, len(vals) AS n,
         |    list_reduce(
         |      list_prepend([vals[1], CAST(0.0 AS DOUBLE)],
         |        list_transform(vals[2:], x -> [x, CAST(0.0 AS DOUBLE)])),
         |      (acc, x) -> [
         |        0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
         |        0.3 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
         |          + 0.7 * acc[2]]) AS fit
         |  FROM g
         |)
         |SELECT user_id, event_type, CAST(n AS BIGINT) AS n,
         |  round(fit[1], 6) AS level, round(fit[2], 6) AS trend,
         |  round(fit[1] + fit[2], 6) AS forecast
         |FROM f ORDER BY user_id, event_type""".stripMargin,

    "tz_daily_local" ->
      s"""$BaseCte
         |SELECT CAST(to_timestamp(sec) AT TIME ZONE 'Europe/Madrid' AS DATE)
         |    AS day,
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v
         |FROM base WHERE value IS NOT NULL AND NOT isnan(value)
         |GROUP BY day ORDER BY day""".stripMargin,

    "events_robust_outliers" ->
      s"""$BaseCte, clean AS (
         |  SELECT event_id, event_type, value FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |), r1 AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY value, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM clean
         |), med AS (
         |  SELECT event_type,
         |    max(CASE WHEN rn = (50 * n + 99) // 100 THEN value END) AS med
         |  FROM r1 GROUP BY event_type
         |), dev AS (
         |  SELECT c.event_id, c.event_type, c.value, m.med,
         |    abs(c.value - m.med) AS adev
         |  FROM clean c JOIN med m ON m.event_type = c.event_type
         |), r2 AS (
         |  SELECT event_type, adev,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY adev, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM dev
         |), mad AS (
         |  SELECT event_type,
         |    max(CASE WHEN rn = (50 * n + 99) // 100 THEN adev END) AS mad
         |  FROM r2 GROUP BY event_type
         |), z AS (
         |  SELECT d.event_id, d.event_type, d.value, d.med, ma.mad,
         |    CASE WHEN ma.mad > 0 THEN
         |      floor((d.value - d.med) / (1.4826 * ma.mad) * 1000000)
         |        / 1000000 END AS robust_z
         |  FROM dev d JOIN mad ma ON ma.event_type = d.event_type
         |)
         |SELECT event_id, event_type, value, med, mad, robust_z,
         |  robust_z IS NOT NULL AND abs(robust_z) > 3.5 AS outlier
         |FROM z ORDER BY event_id""".stripMargin,

    "events_histogram_equidepth" ->
      s"""$BaseCte, ranked AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY value, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM base WHERE value IS NOT NULL
         |), q AS (
         |  SELECT event_type,
         |    max(CASE WHEN rn = (25 * n + 99) // 100 THEN value END) AS q25,
         |    max(CASE WHEN rn = (50 * n + 99) // 100 THEN value END) AS q50,
         |    max(CASE WHEN rn = (75 * n + 99) // 100 THEN value END) AS q75
         |  FROM ranked GROUP BY event_type
         |)
         |SELECT b.event_type,
         |  CAST(CASE WHEN value <= q25 THEN 0 WHEN value <= q50 THEN 1
         |            WHEN value <= q75 THEN 2 ELSE 3 END AS BIGINT) AS bucket,
         |  count(*) AS n
         |FROM base b JOIN q ON q.event_type = b.event_type
         |WHERE value IS NOT NULL
         |GROUP BY b.event_type, bucket
         |ORDER BY b.event_type, bucket""".stripMargin,

    "ts_burn_rate" ->
      s"""$BaseCte
         |SELECT event_id, user_id, sec,
         |  count(CASE WHEN event_type = 'error' THEN 1 END) OVER ws
         |    / count(*) OVER ws AS err_rate_short,
         |  count(CASE WHEN event_type = 'error' THEN 1 END) OVER wl
         |    / count(*) OVER wl AS err_rate_long,
         |  (count(CASE WHEN event_type = 'error' THEN 1 END) OVER ws
         |     / count(*) OVER ws > 0.5)
         |  AND (count(CASE WHEN event_type = 'error' THEN 1 END) OVER wl
         |     / count(*) OVER wl > 0.3) AS alert
         |FROM base
         |WINDOW
         |  ws AS (PARTITION BY user_id ORDER BY sec
         |         RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW),
         |  wl AS (PARTITION BY user_id ORDER BY sec
         |         RANGE BETWEEN 14400 PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin,

    "ts_ohlc" ->
      s"""$BaseCte
         |SELECT event_type, sec - sec % 3600 AS bucket,
         |  arg_min(value, (sec % 3600) * 10000000000 + event_id) AS open,
         |  max(value) AS high, min(value) AS low,
         |  arg_max(value, (sec % 3600) * 10000000000 + event_id) AS close,
         |  count(*) AS n
         |FROM base WHERE value IS NOT NULL AND NOT isnan(value)
         |GROUP BY event_type, bucket
         |ORDER BY event_type, bucket""".stripMargin,

    "events_cube_rollup" ->
      s"""$BaseCte, v AS (
         |  SELECT event_type, sec // 86400 AS day, value FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |)
         |SELECT coalesce(event_type, '(all)') AS event_type,
         |  coalesce(day, -1) AS day,
         |  CAST(GROUPING(event_type) AS BIGINT) AS g_et,
         |  CAST(GROUPING(day) AS BIGINT) AS g_day,
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v
         |FROM v GROUP BY ROLLUP(event_type, day)
         |ORDER BY g_et, g_day, event_type, day""".stripMargin,

    "events_set_ops" ->
      s"""$BaseCte
         |SELECT 'click_and_purchase' AS op, user_id FROM (
         |  SELECT DISTINCT user_id FROM base WHERE event_type = 'click'
         |  INTERSECT
         |  SELECT DISTINCT user_id FROM base WHERE event_type = 'purchase')
         |UNION ALL
         |SELECT 'view_never_error' AS op, user_id FROM (
         |  SELECT DISTINCT user_id FROM base WHERE event_type = 'view'
         |  EXCEPT
         |  SELECT DISTINCT user_id FROM base WHERE event_type = 'error')
         |ORDER BY op, user_id""".stripMargin,

    "ts_window_suite" ->
      s"""$BaseCte
         |SELECT event_id, user_id, event_type, sec,
         |  lead(value) OVER wt AS lead_v,
         |  lag(value) OVER wt AS lag_v,
         |  ntile(4) OVER wv AS ntile4,
         |  rank() OVER wvt AS rnk,
         |  dense_rank() OVER wvt AS drnk,
         |  percent_rank() OVER wvt AS pct_rank,
         |  cume_dist() OVER wvt AS cume_d
         |FROM base WHERE value IS NOT NULL AND NOT isnan(value)
         |WINDOW
         |  wt AS (PARTITION BY user_id, event_type ORDER BY sec, event_id),
         |  wv AS (PARTITION BY user_id, event_type ORDER BY value, event_id),
         |  wvt AS (PARTITION BY user_id, event_type ORDER BY value)
         |ORDER BY event_id""".stripMargin,

    "interval_overlap_join" ->
      s"""$BaseCte, lagged AS (
         |  SELECT user_id, sec, event_id,
         |    lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
         |      AS prev_sec
         |  FROM base WHERE user_id < 30
         |), flagged AS (
         |  SELECT user_id, sec, event_id,
         |    CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM lagged
         |), sess AS (
         |  SELECT user_id, sec,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      AS session_id
         |  FROM flagged
         |), iv AS (
         |  SELECT user_id, session_id,
         |    min(sec) AS s_start, max(sec) AS s_end
         |  FROM sess GROUP BY user_id, session_id
         |), mw AS (
         |  SELECT i AS w_id, 1704067200 + i * 7200 AS w_start,
         |    1704067200 + i * 7200 + 1799 AS w_end
         |  FROM (SELECT unnest(range(0, 372)) AS i)
         |)
         |SELECT iv.user_id, iv.session_id, mw.w_id
         |FROM iv JOIN mw
         |  ON iv.s_start <= mw.w_end AND mw.w_start <= iv.s_end
         |ORDER BY user_id, session_id, w_id""".stripMargin,

    "ts_stl_decompose" ->
      s"""$BaseCte, ser AS (
         |  SELECT event_type, slot,
         |    floor(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
         |          / count(*) * 1000000) / 1000000 AS v
         |  FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |    AND abs(value) < 1e12
         |  GROUP BY event_type, slot
         |), det AS (
         |  SELECT event_type, slot, v,
         |    floor(CAST(sum(CAST(v AS DECIMAL(18,6))) OVER w AS DOUBLE)
         |          / count(*) OVER w * 1000000) / 1000000 AS trend,
         |    (slot % 86400) // 3600 AS hour
         |  FROM ser
         |  WINDOW w AS (PARTITION BY event_type ORDER BY slot
         |               ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
         |), dd AS (
         |  SELECT event_type, slot, hour, v - trend AS d FROM det
         |), seas AS (
         |  SELECT event_type, hour,
         |    CAST(sum(CAST(d AS DECIMAL(38,12))) AS DOUBLE) / count(*)
         |      AS seasonal
         |  FROM dd GROUP BY event_type, hour
         |), rr AS (
         |  SELECT dd.event_type, dd.d, dd.d - seas.seasonal AS r
         |  FROM dd JOIN seas USING (event_type, hour)
         |), m AS (
         |  SELECT event_type, count(*) AS n_slots,
         |    CAST(sum(CAST(d AS DECIMAL(38,12))) AS DOUBLE) AS sd,
         |    CAST(sum(CAST(d * d AS DECIMAL(38,12))) AS DOUBLE) AS sdd,
         |    CAST(sum(CAST(r AS DECIMAL(38,12))) AS DOUBLE) AS sr,
         |    CAST(sum(CAST(r * r AS DECIMAL(38,12))) AS DOUBLE) AS srr
         |  FROM rr GROUP BY event_type
         |)
         |SELECT event_type, n_slots,
         |  floor((sdd - sd * sd / n_slots) / n_slots * 1000000) / 1000000
         |    AS var_detrended,
         |  floor((srr - sr * sr / n_slots) / n_slots * 1000000) / 1000000
         |    AS var_resid,
         |  floor(greatest(CAST(0 AS DOUBLE), 1 -
         |    ((srr - sr * sr / n_slots) / (sdd - sd * sd / n_slots)))
         |    * 1000000) / 1000000 AS seasonal_strength
         |FROM m ORDER BY event_type""".stripMargin,

    "ts_sax_symbols" ->
      s"""$BaseCte, ser AS (
         |  SELECT event_type, slot,
         |    floor(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
         |          / count(*) * 1000000) / 1000000 AS v
         |  FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |    AND abs(value) < 1e12
         |  GROUP BY event_type, slot
         |), segd AS (
         |  SELECT event_type, v,
         |    (row_number() OVER (PARTITION BY event_type ORDER BY slot)
         |     - 1) // 12 AS seg
         |  FROM ser
         |), paa AS (
         |  SELECT event_type, seg,
         |    floor(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
         |          / count(*) * 1000000) / 1000000 AS paa
         |  FROM segd GROUP BY event_type, seg
         |), st AS (
         |  SELECT event_type, count(*) AS np,
         |    CAST(sum(CAST(paa AS DECIMAL(18,6))) AS DOUBLE) AS sp,
         |    CAST(sum(CAST(paa * paa AS DECIMAL(38,12))) AS DOUBLE) AS spp
         |  FROM paa GROUP BY event_type
         |), z AS (
         |  SELECT paa.event_type, paa.seg,
         |    CASE WHEN sqrt((spp - sp * sp / np) / np) <= 0 THEN 'b'
         |         WHEN (paa - sp / np) / sqrt((spp - sp * sp / np) / np)
         |              < -0.6745 THEN 'a'
         |         WHEN (paa - sp / np) / sqrt((spp - sp * sp / np) / np)
         |              < 0 THEN 'b'
         |         WHEN (paa - sp / np) / sqrt((spp - sp * sp / np) / np)
         |              < 0.6745 THEN 'c'
         |         ELSE 'd' END AS sym
         |  FROM paa JOIN st USING (event_type)
         |)
         |SELECT event_type, count(*) AS n_segments,
         |  string_agg(sym, '' ORDER BY seg) AS sax_word
         |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_diff_in_diff" ->
      s"""$BaseCte, f AS (
         |  SELECT event_type, value, user_id, sec FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |    AND abs(value) < 1e12
         |), bounds AS (
         |  SELECT min(sec) AS mn, max(sec) AS mx FROM f
         |), w AS (
         |  SELECT event_type, value, user_id % 2 = 0 AS arm_a,
         |    sec * 2 >= mn + mx AS post
         |  FROM f CROSS JOIN bounds
         |), g AS (
         |  SELECT event_type,
         |    count(CASE WHEN arm_a AND post THEN 1 END) AS n_a2,
         |    CAST(sum(CASE WHEN arm_a AND post
         |      THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS s_a2,
         |    count(CASE WHEN arm_a AND NOT post THEN 1 END) AS n_a1,
         |    CAST(sum(CASE WHEN arm_a AND NOT post
         |      THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS s_a1,
         |    count(CASE WHEN NOT arm_a AND post THEN 1 END) AS n_b2,
         |    CAST(sum(CASE WHEN NOT arm_a AND post
         |      THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS s_b2,
         |    count(CASE WHEN NOT arm_a AND NOT post THEN 1 END) AS n_b1,
         |    CAST(sum(CASE WHEN NOT arm_a AND NOT post
         |      THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS s_b1
         |  FROM w GROUP BY event_type
         |)
         |SELECT event_type, n_a1, n_a2, n_b1, n_b2,
         |  floor(((s_a2 / n_a2 - s_a1 / n_a1) - (s_b2 / n_b2 - s_b1 / n_b1))
         |    * 1000000) / 1000000 AS did
         |FROM g ORDER BY event_type""".stripMargin,

    "events_srm_check" ->
      s"""$BaseCte, u AS (
         |  SELECT DISTINCT event_type, user_id FROM base
         |), g AS (
         |  SELECT event_type,
         |    count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n_a,
         |    count(CASE WHEN user_id % 2 <> 0 THEN 1 END) AS n_b
         |  FROM u GROUP BY event_type
         |)
         |SELECT event_type, n_a, n_b,
         |  floor(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)
         |    * 1000000) / 1000000 AS chi2,
         |  CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)
         |    > 3.841459 AS srm_flag
         |FROM g ORDER BY event_type""".stripMargin,

    "events_power_mde" ->
      s"""$BaseCte, b AS (
         |  SELECT event_type, value, user_id % 2 = 0 AS arm_a
         |  FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |    AND abs(value) < 1e12
         |), g AS (
         |  SELECT event_type,
         |    count(CASE WHEN arm_a THEN 1 END) AS n_a,
         |    CAST(sum(CASE WHEN arm_a
         |      THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS s_a,
         |    CAST(sum(CASE WHEN arm_a
         |      THEN CAST(value * value AS DECIMAL(38,12)) END) AS DOUBLE)
         |      AS ss_a,
         |    count(CASE WHEN NOT arm_a THEN 1 END) AS n_b,
         |    CAST(sum(CASE WHEN NOT arm_a
         |      THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS s_b,
         |    CAST(sum(CASE WHEN NOT arm_a
         |      THEN CAST(value * value AS DECIMAL(38,12)) END) AS DOUBLE)
         |      AS ss_b
         |  FROM b GROUP BY event_type
         |), v AS (
         |  SELECT event_type, n_a, n_b, s_a, s_b,
         |    (ss_a - s_a * s_a / n_a) / (n_a - 1) / n_a +
         |    (ss_b - s_b * s_b / n_b) / (n_b - 1) / n_b AS var_sum
         |  FROM g
         |)
         |SELECT event_type, n_a, n_b,
         |  CASE WHEN n_a > 1 AND n_b > 1 AND var_sum > 0
         |    THEN floor(2.801585 * sqrt(var_sum) * 1000000) / 1000000
         |  END AS mde_abs,
         |  CASE WHEN n_a > 1 AND n_b > 1 AND var_sum > 0
         |    AND (s_a + s_b) / (n_a + n_b) <> 0
         |    THEN floor(2.801585 * sqrt(var_sum)
         |      / ((s_a + s_b) / (n_a + n_b)) * 1000000) / 1000000
         |  END AS mde_rel
         |FROM v ORDER BY event_type""".stripMargin,

    "events_holm_correction" ->
      s"""$BaseCte, b0 AS (
         |  SELECT event_type, user_id % 2 = 0 AS arm_a, value
         |  FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |    AND abs(value) < 1e12
         |), b AS (
         |  SELECT event_type, arm_a,
         |    value +
         |      CASE WHEN arm_a AND event_type = 'purchase'
         |        THEN 11.0 ELSE 0.0 END +
         |      CASE WHEN arm_a AND event_type = 'signup'
         |        THEN 5.0 ELSE 0.0 END AS value
         |  FROM b0
         |), g AS (
         |  SELECT event_type,
         |    count(CASE WHEN arm_a THEN 1 END) AS n_a,
         |    CAST(sum(CASE WHEN arm_a
         |      THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS s_a,
         |    CAST(sum(CASE WHEN arm_a
         |      THEN CAST(value * value AS DECIMAL(38,12)) END) AS DOUBLE)
         |      AS ss_a,
         |    count(CASE WHEN NOT arm_a THEN 1 END) AS n_b,
         |    CAST(sum(CASE WHEN NOT arm_a
         |      THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS s_b,
         |    CAST(sum(CASE WHEN NOT arm_a
         |      THEN CAST(value * value AS DECIMAL(38,12)) END) AS DOUBLE)
         |      AS ss_b
         |  FROM b GROUP BY event_type
         |), vs AS (
         |  SELECT event_type, n_a, n_b, s_a, s_b,
         |    (ss_a - s_a * s_a / n_a) / (n_a - 1) / n_a +
         |    (ss_b - s_b * s_b / n_b) / (n_b - 1) / n_b AS var_sum
         |  FROM g
         |), v AS (
         |  SELECT event_type, n_a, n_b,
         |    CASE WHEN n_a > 1 AND n_b > 1 AND var_sum > 0
         |      THEN floor((s_a / n_a - s_b / n_b) / sqrt(var_sum)
         |        * 1000000) / 1000000 END AS z,
         |    CASE WHEN n_a > 1 AND n_b > 1 AND var_sum > 0
         |      THEN floor(abs((s_a / n_a - s_b / n_b) / sqrt(var_sum))
         |        * 1000000) / 1000000 END AS abs_z
         |  FROM vs
         |), zc AS (
         |  SELECT CAST(divisor AS BIGINT) AS divisor, z_crit
         |  FROM (VALUES $HolmZCritValuesSql)
         |    AS t(divisor, z_crit)
         |), w AS (
         |  SELECT *, count(abs_z) OVER () AS m,
         |    row_number() OVER (ORDER BY abs_z DESC NULLS LAST,
         |      event_type) AS rk
         |  FROM v
         |), j AS (
         |  SELECT w.*, zc.z_crit FROM w
         |  LEFT JOIN zc ON zc.divisor = w.m - w.rk + 1
         |    AND w.abs_z IS NOT NULL
         |), h AS (
         |  SELECT *,
         |    min(CASE WHEN abs_z >= z_crit THEN 1 ELSE 0 END)
         |      OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING) AS runmin,
         |    max(CASE WHEN rk = 1 THEN z_crit END) OVER () AS bonf
         |  FROM j
         |)
         |SELECT event_type, n_a, n_b, z, m,
         |  CASE WHEN abs_z IS NOT NULL THEN rk END AS holm_rank,
         |  z_crit,
         |  abs_z >= 1.959964 AS sig_raw,
         |  abs_z >= bonf AS sig_bonferroni,
         |  CASE WHEN abs_z IS NOT NULL THEN runmin = 1 END AS sig_holm
         |FROM h ORDER BY event_type""".stripMargin,

    "events_ab_lift" ->
      s"""$BaseCte, b AS (
         |  SELECT event_type, value, user_id % 2 = 0 AS arm_a
         |  FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |    AND abs(value) < 1e12
         |), g AS (
         |  SELECT event_type,
         |    count(CASE WHEN arm_a THEN 1 END) AS n_a,
         |    CAST(sum(CASE WHEN arm_a
         |      THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS s_a,
         |    CAST(sum(CASE WHEN arm_a
         |      THEN CAST(value * value AS DECIMAL(38,12)) END) AS DOUBLE)
         |      AS ss_a,
         |    count(CASE WHEN NOT arm_a THEN 1 END) AS n_b,
         |    CAST(sum(CASE WHEN NOT arm_a
         |      THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS s_b,
         |    CAST(sum(CASE WHEN NOT arm_a
         |      THEN CAST(value * value AS DECIMAL(38,12)) END) AS DOUBLE)
         |      AS ss_b
         |  FROM b GROUP BY event_type
         |)
         |SELECT event_type, n_a, n_b,
         |  floor(s_a / n_a * 1000000) / 1000000 AS mean_a,
         |  floor(s_b / n_b * 1000000) / 1000000 AS mean_b,
         |  floor((s_b / n_b - s_a / n_a) * 1000000) / 1000000 AS lift,
         |  CASE WHEN n_a > 1 AND n_b > 1 AND
         |    ((ss_a - s_a * s_a / n_a) / (n_a - 1) / n_a +
         |     (ss_b - s_b * s_b / n_b) / (n_b - 1) / n_b) > 0
         |  THEN floor((s_b / n_b - s_a / n_a) /
         |    sqrt((ss_a - s_a * s_a / n_a) / (n_a - 1) / n_a +
         |         (ss_b - s_b * s_b / n_b) / (n_b - 1) / n_b)
         |    * 1000000) / 1000000 END AS t_welch
         |FROM g ORDER BY event_type""".stripMargin,

    "orders_pareto_share" ->
      """WITH rev AS (
        |  SELECT o_orderpriority, o_custkey,
        |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS crev
        |  FROM orders GROUP BY 1, 2
        |), wnd AS (
        |  SELECT o_orderpriority,
        |    ntile(10) OVER w AS decile,
        |    sum(crev) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |                    AND CURRENT ROW) AS cum,
        |    sum(crev) OVER (PARTITION BY o_orderpriority) AS trev
        |  FROM rev
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY crev DESC, o_custkey)
        |)
        |SELECT o_orderpriority, decile, count(*) AS n_cust,
        |  floor(CAST(max(cum) AS DOUBLE) / CAST(max(trev) AS DOUBLE)
        |        * 1000000) / 1000000 AS cum_share
        |FROM wnd GROUP BY 1, 2
        |ORDER BY o_orderpriority, decile""".stripMargin,

    "orders_ntile_deciles" ->
      """WITH d AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    ntile(10) OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS decile
        |  FROM orders
        |)
        |SELECT o_orderpriority, decile, count(*) AS n,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi,
        |  floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |        / count(*) * 1000000) / 1000000 AS mean_price
        |FROM d GROUP BY o_orderpriority, decile
        |ORDER BY o_orderpriority, decile""".stripMargin,

    "orders_rfm_segments" ->
      """WITH maxd AS (SELECT max(o_orderdate) AS maxd FROM orders),
        |rfm AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
        |                   CAST(maxd AS DATE)) AS BIGINT) AS rec,
        |    count(*) AS freq,
        |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS mon
        |  FROM orders CROSS JOIN maxd GROUP BY o_custkey, maxd
        |), scored AS (
        |  SELECT mon,
        |    ntile(4) OVER (ORDER BY rec, o_custkey) AS r_score,
        |    ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
        |    ntile(4) OVER (ORDER BY mon DESC, o_custkey) AS m_score
        |  FROM rfm
        |)
        |SELECT r_score, f_score, m_score, count(*) AS n_customers,
        |  floor(CAST(sum(mon) AS DOUBLE) / count(*) * 1000000) / 1000000
        |    AS avg_monetary
        |FROM scored GROUP BY 1, 2, 3
        |ORDER BY r_score, f_score, m_score""".stripMargin,

    "events_dau_wau" -> {
      s"""$BaseCte, ud AS (
         |  SELECT DISTINCT sec // 86400 AS day, user_id FROM base
         |), dau AS (
         |  SELECT day, count(*) AS dau FROM ud GROUP BY day
         |), c AS (
         |  SELECT DISTINCT t.day, user_id
         |  FROM ud, unnest(generate_series(ud.day, ud.day + 6)) AS t(day)
         |), wau AS (
         |  SELECT day, count(*) AS wau FROM c GROUP BY day
         |)
         |SELECT d.day, d.dau, w.wau,
         |  floor(CAST(d.dau AS DOUBLE) / w.wau * 1000000) / 1000000
         |    AS stickiness
         |FROM dau d JOIN wau w USING (day) ORDER BY day""".stripMargin
    },

    "events_funnel_time" -> {
      s"""$BaseCte, s AS (
         |  SELECT user_id, min(sec) AS s_sec FROM base
         |  WHERE event_type = 'signup' GROUP BY user_id
         |), p AS (
         |  SELECT user_id, min(sec) AS p_sec FROM base
         |  WHERE event_type = 'purchase' GROUP BY user_id
         |), conv AS (
         |  SELECT s.user_id, s.s_sec // 86400 AS signup_day,
         |    CASE WHEN p.p_sec >= s.s_sec THEN p.p_sec - s.s_sec END
         |      AS delay
         |  FROM s LEFT JOIN p ON s.user_id = p.user_id
         |), r AS (
         |  SELECT signup_day, delay,
         |    row_number() OVER (PARTITION BY signup_day
         |                       ORDER BY delay, user_id) AS rn,
         |    count(*) OVER (PARTITION BY signup_day) AS n
         |  FROM conv WHERE delay IS NOT NULL
         |), q AS (
         |  SELECT signup_day,
         |    max(CASE WHEN rn = (50 * (n - 1)) // 100 + 1 THEN delay END)
         |      AS lo50,
         |    max(CASE WHEN rn = (50 * (n - 1)) // 100 + 2 THEN delay END)
         |      AS hi50,
         |    max(((50 * (n - 1)) % 100) / CAST(100 AS DOUBLE)) AS f50,
         |    max(CASE WHEN rn = (90 * (n - 1)) // 100 + 1 THEN delay END)
         |      AS lo90,
         |    max(CASE WHEN rn = (90 * (n - 1)) // 100 + 2 THEN delay END)
         |      AS hi90,
         |    max(((90 * (n - 1)) % 100) / CAST(100 AS DOUBLE)) AS f90
         |  FROM r GROUP BY signup_day
         |), agg AS (
         |  SELECT signup_day, count(*) AS n_signups,
         |    count(delay) AS n_converted
         |  FROM conv GROUP BY signup_day
         |)
         |SELECT a.signup_day, a.n_signups, a.n_converted,
         |  lo50 + (coalesce(hi50, lo50) - lo50) * f50 AS p50_delay_sec,
         |  lo90 + (coalesce(hi90, lo90) - lo90) * f90 AS p90_delay_sec
         |FROM agg a LEFT JOIN q ON a.signup_day = q.signup_day
         |ORDER BY a.signup_day""".stripMargin
    },

    "events_top_paths" ->
      s"""$BaseCte, paths AS (
         |  SELECT array_to_string(
         |    (list(event_type ORDER BY sec, event_id))[1:3], '>') AS path
         |  FROM base GROUP BY user_id
         |)
         |SELECT path, count(*) AS n_users FROM paths GROUP BY path
         |ORDER BY n_users DESC, path LIMIT 10""".stripMargin,

    "events_user_gini" ->
      s"""$BaseCte, uc AS (
         |  SELECT event_type, user_id, count(*) AS cnt FROM base
         |  GROUP BY event_type, user_id
         |), r AS (
         |  SELECT event_type, cnt,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY cnt, user_id) AS rnk
         |  FROM uc
         |), g AS (
         |  SELECT event_type, count(*) AS n_users, sum(cnt) AS tot,
         |    sum(CAST(rnk * cnt AS DECIMAL(38,0))) AS rc
         |  FROM r GROUP BY event_type
         |)
         |SELECT event_type, n_users,
         |  floor((CAST(rc AS DOUBLE) * 2
         |         / (CAST(n_users AS DOUBLE) * CAST(tot AS DOUBLE))
         |         - CAST(n_users + 1 AS DOUBLE) / n_users)
         |        * 1000000) / 1000000 AS gini
         |FROM g ORDER BY event_type""".stripMargin,

    "orders_interorder_gap" ->
      """WITH gaps AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day',
        |      CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey) AS DATE),
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
        |  FROM orders
        |)
        |SELECT c_mktsegment, count(*) AS n_gaps,
        |  floor(CAST(sum(CAST(gap_days AS DECIMAL(18,6))) AS DOUBLE)
        |        / count(*) * 1000000) / 1000000 AS avg_gap_days,
        |  max(gap_days) AS max_gap_days
        |FROM gaps JOIN customer ON o_custkey = c_custkey
        |WHERE gap_days IS NOT NULL
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "orders_survival_km" ->
      """WITH md AS (SELECT max(o_orderdate) AS maxd FROM orders),
        |nx AS (
        |  SELECT o_orderdate,
        |    lead(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS nxt
        |  FROM orders
        |), obs AS (
        |  SELECT CAST(CASE WHEN nxt IS NOT NULL
        |      THEN date_diff('day', CAST(o_orderdate AS DATE),
        |        CAST(nxt AS DATE))
        |      ELSE date_diff('day', CAST(o_orderdate AS DATE),
        |        CAST(md.maxd AS DATE)) END AS BIGINT) AS dur,
        |    nxt IS NOT NULL AS event
        |  FROM nx CROSS JOIN md
        |), obs2 AS (SELECT * FROM obs WHERE dur > 0),
        |tot AS (SELECT count(*) AS n_total FROM obs2),
        |times AS (
        |  SELECT dur, count(CASE WHEN event THEN 1 END) AS d,
        |    count(*) AS c_all
        |  FROM obs2 GROUP BY dur
        |), ev AS (
        |  SELECT t.dur, t.d,
        |    tot.n_total - coalesce(sum(b.c_all), 0) AS n_risk
        |  FROM times t
        |  LEFT JOIN times b ON b.dur < t.dur
        |  CROSS JOIN tot
        |  GROUP BY t.dur, t.d, tot.n_total
        |), terms AS (
        |  SELECT dur, d, n_risk,
        |    CAST(ln(1.0 - CAST(d AS DOUBLE) / n_risk)
        |      AS DECIMAL(38,18)) AS lnterm
        |  FROM ev WHERE d > 0 AND d < n_risk
        |), hz AS (
        |  SELECT CAST(unnest([7, 14, 30, 60, 90]) AS BIGINT)
        |    AS horizon_days
        |)
        |SELECT h.horizon_days, count(*) AS n_event_times,
        |  CAST(sum(t.d) AS BIGINT) AS d_total,
        |  floor(exp(CAST(sum(t.lnterm) AS DOUBLE)) * 1000000) / 1000000
        |    AS survival
        |FROM terms t CROSS JOIN hz h
        |WHERE t.dur <= h.horizon_days
        |GROUP BY h.horizon_days
        |ORDER BY h.horizon_days""".stripMargin,

    "orders_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey, year(o_orderdate) AS order_year, o_totalprice,
        |    year(min(o_orderdate) OVER (PARTITION BY o_custkey))
        |      AS cohort_year
        |  FROM orders
        |), sizes AS (
        |  SELECT cohort_year, count(DISTINCT o_custkey) AS n_customers
        |  FROM o GROUP BY cohort_year
        |), rev AS (
        |  SELECT cohort_year, order_year,
        |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
        |  FROM o GROUP BY cohort_year, order_year
        |), c AS (
        |  SELECT cohort_year, order_year, rev,
        |    sum(rev) OVER (PARTITION BY cohort_year ORDER BY order_year
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        |  FROM rev
        |)
        |SELECT c.cohort_year, c.order_year, s.n_customers,
        |  floor(CAST(rev AS DOUBLE) * 1000000) / 1000000 AS rev,
        |  floor(CAST(cum_rev AS DOUBLE) / n_customers * 1000000) / 1000000
        |    AS ltv_per_customer
        |FROM c JOIN sizes s USING (cohort_year)
        |ORDER BY c.cohort_year, c.order_year""".stripMargin,

    "events_mix_drift" ->
      s"""$BaseCte, c AS (
         |  SELECT sec // 86400 AS day, event_type, count(*) AS n
         |  FROM base GROUP BY day, event_type
         |), grid AS (
         |  SELECT d.day, t.event_type, coalesce(c.n, 0) AS n
         |  FROM (SELECT DISTINCT day FROM c) d
         |  CROSS JOIN (SELECT DISTINCT event_type FROM c) t
         |  LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
         |), g AS (
         |  SELECT event_type, CAST(sum(n) AS BIGINT) AS gn
         |  FROM c GROUP BY event_type
         |), gt AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS gt FROM c
         |), dd AS (
         |  SELECT day, event_type, n,
         |    CAST(sum(n) OVER (PARTITION BY day) AS BIGINT) AS dn
         |  FROM grid
         |)
         |SELECT dd.day, max(dn) AS n_events,
         |  floor(CAST(sum(CAST(abs(CAST(n AS DOUBLE) / dn
         |                           - CAST(gn AS DOUBLE) / gt.gt)
         |                      AS DECIMAL(38,12))) AS DOUBLE)
         |        * CAST(0.5 AS DOUBLE) * 1000000) / 1000000 AS tvd
         |FROM dd JOIN g USING (event_type) CROSS JOIN gt
         |GROUP BY dd.day ORDER BY dd.day""".stripMargin,

    "events_cuped_lift" -> {
      val mid = 1704067200L + 15L * 86400L
      s"""$BaseCte, u AS (
         |  SELECT user_id, user_id % 2 = 0 AS arm_a,
         |    CAST(sum(CASE WHEN sec < $mid
         |                  THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
         |      / count(CASE WHEN sec < $mid THEN 1 END) AS x,
         |    CAST(sum(CASE WHEN sec >= $mid
         |                  THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
         |      / count(CASE WHEN sec >= $mid THEN 1 END) AS y
         |  FROM base WHERE value IS NOT NULL AND NOT isnan(value)
         |  GROUP BY user_id
         |  HAVING count(CASE WHEN sec < $mid THEN 1 END) > 0
         |     AND count(CASE WHEN sec >= $mid THEN 1 END) > 0
         |), g AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         |    CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         |    CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         |    count(CASE WHEN arm_a THEN 1 END) AS n_a,
         |    CAST(sum(CASE WHEN arm_a
         |                  THEN CAST(x AS DECIMAL(38,12)) END) AS DOUBLE)
         |      AS sx_a,
         |    CAST(sum(CASE WHEN arm_a
         |                  THEN CAST(y AS DECIMAL(38,12)) END) AS DOUBLE)
         |      AS sy_a,
         |    count(CASE WHEN NOT arm_a THEN 1 END) AS n_b,
         |    CAST(sum(CASE WHEN NOT arm_a
         |                  THEN CAST(x AS DECIMAL(38,12)) END) AS DOUBLE)
         |      AS sx_b,
         |    CAST(sum(CASE WHEN NOT arm_a
         |                  THEN CAST(y AS DECIMAL(38,12)) END) AS DOUBLE)
         |      AS sy_b
         |  FROM u
         |), t AS (
         |  SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta
         |  FROM g
         |)
         |SELECT n_a, n_b,
         |  floor((sy_b / n_b - sy_a / n_a) * 1000000) / 1000000
         |    AS lift_raw,
         |  floor(((sy_b / n_b - theta * (sx_b / n_b - sx / n))
         |         - (sy_a / n_a - theta * (sx_a / n_a - sx / n)))
         |        * 1000000) / 1000000 AS lift_cuped,
         |  floor(theta * 1000000) / 1000000 AS theta
         |FROM t""".stripMargin
    },

    "events_attribution" ->
      s"""$BaseCte, t AS (
         |  SELECT event_type,
         |    first_value(CASE WHEN event_type <> 'purchase'
         |                     THEN event_type END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY sec, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS ft,
         |    last_value(CASE WHEN event_type <> 'purchase'
         |                    THEN event_type END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY sec, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS lt
         |  FROM base
         |), per AS (
         |  SELECT coalesce(ft, 'direct') AS ft, coalesce(lt, 'direct') AS lt
         |  FROM t WHERE event_type = 'purchase'
         |), f AS (
         |  SELECT ft AS channel, count(*) AS n_first FROM per GROUP BY ft
         |), l AS (
         |  SELECT lt AS channel, count(*) AS n_last FROM per GROUP BY lt
         |)
         |SELECT coalesce(f.channel, l.channel) AS channel,
         |  coalesce(n_first, CAST(0 AS BIGINT)) AS n_first,
         |  coalesce(n_last, CAST(0 AS BIGINT)) AS n_last
         |FROM f FULL OUTER JOIN l ON f.channel = l.channel
         |ORDER BY channel""".stripMargin,

    "events_bot_score" ->
      s"""$BaseCte, gaps AS (
         |  SELECT user_id, sec - lag(sec) OVER (PARTITION BY user_id
         |    ORDER BY sec, event_id) AS gap
         |  FROM base
         |), g AS (
         |  SELECT user_id, count(*) AS n_gaps,
         |    CAST(sum(CAST(gap AS DECIMAL(38,6))) AS DOUBLE) AS sg,
         |    CAST(sum(CAST(gap * gap AS DECIMAL(38,0))) AS DOUBLE) AS sgg
         |  FROM gaps WHERE gap IS NOT NULL GROUP BY user_id
         |  HAVING count(*) >= 20
         |), f AS (
         |  SELECT user_id, n_gaps, sg / n_gaps AS mean_gap,
         |    sqrt(greatest((sgg - sg * sg / n_gaps) / (n_gaps - 1),
         |                  CAST(0 AS DOUBLE))) / (sg / n_gaps) AS cv
         |  FROM g
         |)
         |SELECT user_id, n_gaps,
         |  floor(mean_gap * 1000000) / 1000000 AS mean_gap_sec,
         |  floor(cv * 1000000) / 1000000 AS gap_cv,
         |  cv < 0.3 AS bot_like
         |FROM f ORDER BY user_id""".stripMargin,

    "orders_benford" ->
      """WITH e(digit, exp_share) AS (VALUES
        |  (1, 0.301029996), (2, 0.176091259), (3, 0.124938737),
        |  (4, 0.096910013), (5, 0.079181246), (6, 0.06694679),
        |  (7, 0.057991947), (8, 0.051152522), (9, 0.045757491)
        |), d AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM orders WHERE o_totalprice >= 1.0
        |), g AS (
        |  SELECT digit, count(*) AS n FROM d GROUP BY digit
        |), t AS (SELECT sum(n) AS n_total FROM g)
        |SELECT g.digit, g.n,
        |  floor(CAST(g.n AS DOUBLE) / t.n_total * 1000000) / 1000000
        |    AS obs_share,
        |  floor(e.exp_share * 1000000) / 1000000 AS exp_share,
        |  floor((g.n - t.n_total * e.exp_share)
        |    * (g.n - t.n_total * e.exp_share)
        |    / (t.n_total * e.exp_share) * 1000000) / 1000000 AS chi2_term
        |FROM g CROSS JOIN t JOIN e ON e.digit = g.digit
        |ORDER BY g.digit""".stripMargin,

    "events_k_anonymity" ->
      """WITH b AS (
        |  SELECT event_type, user_id,
        |    CAST(floor(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)
        |      / 10) AS BIGINT) AS k_decade
        |  FROM events
        |), g AS (
        |  SELECT event_type, k_decade,
        |    count(DISTINCT user_id) AS n_users, count(*) AS n_rows
        |  FROM b GROUP BY 1, 2
        |)
        |SELECT event_type, k_decade, n_users, n_rows,
        |  floor(CAST(n_rows AS DOUBLE) / n_users * 1000000) / 1000000
        |    AS rows_per_user,
        |  n_users < 5 AS reident_risk
        |FROM g ORDER BY event_type, k_decade""".stripMargin,

    "events_msprt" ->
      s"""$BaseCte, v AS (
         |  SELECT event_type, sec - (sec % 86400) AS day_slot,
         |    user_id % 2 = 0 AS arm_a,
         |    value + CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
         |                 THEN 11.0 ELSE 0.0 END AS value
         |  FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |    AND abs(value) < 1e12
         |), daily AS (
         |  SELECT event_type, day_slot,
         |    count(CASE WHEN arm_a THEN 1 END) AS d_na,
         |    sum(CASE WHEN arm_a THEN CAST(value AS DECIMAL(28,6)) END)
         |      AS d_sa,
         |    sum(CASE WHEN arm_a
         |             THEN CAST(value * value AS DECIMAL(38,12)) END)
         |      AS d_ssa,
         |    count(CASE WHEN NOT arm_a THEN 1 END) AS d_nb,
         |    sum(CASE WHEN NOT arm_a
         |             THEN CAST(value AS DECIMAL(28,6)) END) AS d_sb,
         |    sum(CASE WHEN NOT arm_a
         |             THEN CAST(value * value AS DECIMAL(38,12)) END)
         |      AS d_ssb
         |  FROM v GROUP BY 1, 2
         |), cum AS (
         |  SELECT event_type, day_slot,
         |    CAST(sum(d_na) OVER w AS BIGINT) AS n_a,
         |    CAST(sum(d_sa) OVER w AS DOUBLE) AS s_a,
         |    CAST(sum(d_ssa) OVER w AS DOUBLE) AS ss_a,
         |    CAST(sum(d_nb) OVER w AS BIGINT) AS n_b,
         |    CAST(sum(d_sb) OVER w AS DOUBLE) AS s_b,
         |    CAST(sum(d_ssb) OVER w AS DOUBLE) AS ss_b
         |  FROM daily
         |  WINDOW w AS (PARTITION BY event_type ORDER BY day_slot
         |               ROWS UNBOUNDED PRECEDING)
         |), sc AS (
         |  SELECT event_type, day_slot, n_a, n_b,
         |    (ss_a - s_a * s_a / n_a) / (n_a - 1) / n_a +
         |    (ss_b - s_b * s_b / n_b) / (n_b - 1) / n_b AS vn,
         |    s_a / n_a - s_b / n_b AS delta
         |  FROM cum
         |), sc2 AS (
         |  SELECT event_type, day_slot, n_a, n_b, delta, vn,
         |    n_a > 1 AND n_b > 1 AND vn > 0 AS valid,
         |    0.5 * ln(vn / (vn + 1.0)) +
         |      delta * delta * 1.0 / (2.0 * vn * (vn + 1.0)) AS ll
         |  FROM sc
         |), sc3 AS (
         |  SELECT event_type, day_slot, n_a, n_b,
         |    CASE WHEN valid
         |         THEN floor(delta * 1000000) / 1000000 END AS delta,
         |    CASE WHEN valid
         |         THEN floor(ll * 1000000) / 1000000 END AS log_lambda,
         |    CASE WHEN valid THEN exp(least(0.0, -ll)) END AS p_now
         |  FROM sc2
         |)
         |SELECT event_type, day_slot, n_a, n_b, delta, log_lambda,
         |  floor(min(coalesce(p_now, 1.0)) OVER (
         |    PARTITION BY event_type ORDER BY day_slot
         |    ROWS UNBOUNDED PRECEDING) * 1000000) / 1000000 AS p_seq
         |FROM sc3 ORDER BY event_type, day_slot""".stripMargin,

    "events_bootstrap_ci" ->
      """WITH reps AS (
        |  SELECT event_type, rep, value,
        |    CASE WHEN u < '5e2d58d8' THEN 0 WHEN u < 'bc5ab1b1' THEN 1
        |         WHEN u < 'eb715e1d' THEN 2 WHEN u < 'fb239797' THEN 3
        |         WHEN u < 'ff1025f5' THEN 4 WHEN u < 'ffd90f3b' THEN 5
        |         WHEN u < 'fffa8b71' THEN 6 ELSE 7 END AS cnt
        |  FROM (
        |    SELECT e.event_type, r.rep, e.value,
        |      substr(md5(CAST(e.event_id AS VARCHAR) || ':' ||
        |        CAST(r.rep AS VARCHAR)), 1, 8) AS u
        |    FROM events e
        |    CROSS JOIN (SELECT unnest(range(0, 32)) AS rep) r
        |    WHERE e.value IS NOT NULL AND NOT isnan(e.value)
        |      AND abs(e.value) < 1e12
        |  )
        |), g AS (
        |  SELECT event_type, rep, sum(cnt) AS m,
        |    sum(CAST(value * cnt AS DECIMAL(28,6))) AS sv,
        |    count(*) AS n_rows,
        |    sum(CAST(value AS DECIMAL(28,6))) AS sv_plain
        |  FROM reps GROUP BY 1, 2
        |), rm AS (
        |  SELECT event_type, n_rows, sv_plain,
        |    CASE WHEN m > 0 THEN floor(CAST(sv AS DOUBLE) / m * 1000000)
        |      / 1000000 END AS rep_mean
        |  FROM g
        |), o AS (
        |  SELECT event_type, count(rep_mean) AS n_reps,
        |    max(n_rows) AS n_rows,
        |    floor(CAST(max(sv_plain) AS DOUBLE) / max(n_rows) * 1000000)
        |      / 1000000 AS point_mean,
        |    CAST(sum(CAST(rep_mean AS DECIMAL(28,6))) AS DOUBLE) AS sr,
        |    CAST(sum(CAST(rep_mean * rep_mean AS DECIMAL(38,12)))
        |      AS DOUBLE) AS srr
        |  FROM rm GROUP BY event_type
        |)
        |SELECT event_type, n_rows, n_reps, point_mean,
        |  floor(sqrt(greatest(0.0, (srr - sr * sr / n_reps)
        |    / (n_reps - 1))) * 1000000) / 1000000 AS boot_se,
        |  floor((point_mean - 1.959964 * sqrt(greatest(0.0,
        |    (srr - sr * sr / n_reps) / (n_reps - 1)))) * 1000000)
        |    / 1000000 AS ci_lo,
        |  floor((point_mean + 1.959964 * sqrt(greatest(0.0,
        |    (srr - sr * sr / n_reps) / (n_reps - 1)))) * 1000000)
        |    / 1000000 AS ci_hi
        |FROM o ORDER BY event_type""".stripMargin,

    "events_path_entropy" ->
      s"""$BaseCte, seq AS (
         |  SELECT user_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY sec, event_id) AS prev_type
         |  FROM base
         |), trans AS (
         |  SELECT prev_type, event_type, count(*) AS n
         |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
         |), ft AS (
         |  SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_from
         |  FROM trans GROUP BY 1
         |), terms AS (
         |  SELECT t.prev_type, ft.n_from,
         |    CAST(t.n AS DOUBLE) / ft.n_from AS p
         |  FROM trans t JOIN ft ON t.prev_type = ft.prev_type
         |), h AS (
         |  SELECT prev_type, max(n_from) AS n_from,
         |    count(*) AS n_next_types,
         |    CAST(sum(CAST(-p * ln(p) AS DECIMAL(38,12))) AS DOUBLE) AS h
         |  FROM terms GROUP BY prev_type
         |)
         |SELECT prev_type, n_from, n_next_types,
         |  floor(h * 1000000) / 1000000 AS entropy_nats,
         |  CASE WHEN n_next_types > 1
         |       THEN floor(h / ln(CAST(n_next_types AS DOUBLE))
         |         * 1000000) / 1000000 END AS entropy_norm
         |FROM h ORDER BY prev_type""".stripMargin,

    "orders_weibull_fit" ->
      """WITH gaps AS (
        |  SELECT o_orderkey,
        |    CAST(datediff('day', prev, o_orderdate) AS BIGINT)
        |      AS gap_days
        |  FROM (SELECT o_orderkey, o_orderdate,
        |          lag(o_orderdate) OVER (PARTITION BY o_custkey
        |            ORDER BY o_orderdate, o_orderkey) AS prev
        |        FROM orders)
        |  WHERE prev IS NOT NULL
        |    AND datediff('day', prev, o_orderdate) >= 1
        |), rk AS (
        |  SELECT gap_days,
        |    row_number() OVER (ORDER BY CAST(gap_days AS DOUBLE),
        |      o_orderkey) AS r,
        |    count(*) OVER () AS n
        |  FROM gaps
        |), pts AS (
        |  SELECT ln(CAST(gap_days AS DOUBLE)) AS x,
        |    ln(-ln(1.0 - (r - 0.3) / (n + 0.4))) AS y
        |  FROM rk
        |), m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy
        |  FROM pts
        |)
        |SELECT n AS n_gaps,
        |  floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000)
        |    / 1000000 AS shape_k,
        |  floor(exp(-(sy / n - (n * sxy - sx * sy)
        |      / (n * sxx - sx * sx) * (sx / n))
        |    / ((n * sxy - sx * sy) / (n * sxx - sx * sx))) * 1000000)
        |    / 1000000 AS scale_days
        |FROM m""".stripMargin,

    "events_qte" -> {
      val pcts = Seq(10, 50, 90)
      val aggCols = pcts.map { p =>
        s"""    max(CASE WHEN rn = ($p * (n - 1)) // 100 + 1 THEN value END)
           |      AS lo$p,
           |    max(CASE WHEN rn = ($p * (n - 1)) // 100 + 2 THEN value END)
           |      AS hi$p,
           |    max((($p * (n - 1)) % 100) / CAST(100 AS DOUBLE)) AS f$p"""
          .stripMargin
      }.mkString(",\n")
      val outCols = pcts.map { p =>
        s"  lo$p + (coalesce(hi$p, lo$p) - lo$p) * f$p AS q$p"
      }.mkString(",\n")
      s"""$BaseCte, v AS (
         |  SELECT event_type, event_id, user_id % 2 = 0 AS arm_a,
         |    value + CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
         |                 THEN 11.0 ELSE 0.0 END AS value
         |  FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |    AND abs(value) < 1e12
         |), r AS (
         |  SELECT event_type, arm_a, value,
         |    row_number() OVER (PARTITION BY event_type, arm_a
         |                       ORDER BY value, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type, arm_a) AS n
         |  FROM v
         |), a AS (
         |  SELECT event_type, arm_a,
         |$aggCols
         |  FROM r GROUP BY event_type, arm_a
         |), q AS (
         |  SELECT event_type, arm_a,
         |$outCols
         |  FROM a
         |)
         |SELECT qa.event_type,
         |  floor(qa.q50 * 1000000) / 1000000 AS median_a,
         |  floor(qb.q50 * 1000000) / 1000000 AS median_b,
         |  floor((qa.q10 - qb.q10) * 1000000) / 1000000 AS qte_p10,
         |  floor((qa.q50 - qb.q50) * 1000000) / 1000000 AS qte_p50,
         |  floor((qa.q90 - qb.q90) * 1000000) / 1000000 AS qte_p90
         |FROM q qa JOIN q qb
         |  ON qa.event_type = qb.event_type AND qa.arm_a AND NOT qb.arm_a
         |ORDER BY qa.event_type""".stripMargin
    },

    "events_lift_decay" ->
      s"""$BaseCte, v AS (
         |  SELECT event_type, sec // 604800 AS week,
         |    user_id % 2 = 0 AS arm_a,
         |    value + CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
         |                 THEN 11.0 ELSE 0.0 END AS value
         |  FROM base
         |  WHERE value IS NOT NULL AND NOT isnan(value)
         |    AND abs(value) < 1e12
         |), g AS (
         |  SELECT event_type, week,
         |    count(CASE WHEN arm_a THEN 1 END) AS n_a,
         |    count(CASE WHEN NOT arm_a THEN 1 END) AS n_b,
         |    CAST(sum(CASE WHEN arm_a
         |             THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE)
         |      AS s_a,
         |    CAST(sum(CASE WHEN NOT arm_a
         |             THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE)
         |      AS s_b
         |  FROM v GROUP BY 1, 2
         |)
         |SELECT event_type, week, n_a, n_b,
         |  CASE WHEN n_a > 0 AND n_b > 0
         |       THEN floor((s_a / n_a - s_b / n_b) * 1000000) / 1000000
         |  END AS lift
         |FROM g ORDER BY event_type, week""".stripMargin,

    "orders_abc_classification" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,6))) AS rev
        |  FROM lineitem GROUP BY l_partkey
        |), c AS (
        |  SELECT l_partkey, rev,
        |    sum(rev) OVER (ORDER BY -CAST(rev AS DOUBLE), l_partkey
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(rev) OVER () AS tot
        |  FROM rev
        |), cl AS (
        |  SELECT rev, tot,
        |    CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.8
        |           THEN 'A'
        |         WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.95
        |           THEN 'B'
        |         ELSE 'C' END AS abc_class
        |  FROM c
        |)
        |SELECT abc_class, count(*) AS n_parts,
        |  floor(CAST(sum(rev) AS DOUBLE) / CAST(max(tot) AS DOUBLE)
        |    * 1000000) / 1000000 AS rev_share
        |FROM cl GROUP BY abc_class ORDER BY abc_class""".stripMargin,

    "orders_churn_labels" ->
      """WITH h AS (SELECT max(o_orderdate) AS maxd FROM orders),
        |g AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    max(o_orderdate) AS lastd,
        |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS mon
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT o_custkey, n_orders,
        |  CAST(datediff('day', lastd, maxd) AS BIGINT) AS recency_days,
        |  floor(CAST(mon AS DOUBLE) * 1000000) / 1000000 AS monetary,
        |  datediff('day', lastd, maxd) > 90 AS churned
        |FROM g CROSS JOIN h ORDER BY o_custkey""".stripMargin,
  )
}
