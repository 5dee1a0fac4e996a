package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants of the analytic/curation keys that the
  * hash-vs-oracle compare cannot express (the oracle replicates the
  * computation, so a shared misconception would pass both sides;
  * these assert what the STATISTIC itself must satisfy).
  * Run on sf0.001.
  */
class InvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("pareto shares are nondecreasing in decile and end at 1.0") {
    val rows = run("orders_pareto_share")
      .select("o_orderpriority", "decile", "cum_share").collect()
      .groupBy(_.getString(0))
    rows.foreach { case (prio, rs) =>
      val shares = rs.sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
        s"$prio shares not monotone: ${shares.mkString(",")}")
      // the last decile's cumulative share is the whole class (trunc6
      // floors, so exactly 1.0 - at most 1e-6)
      assert(shares.last >= 1.0 - 1e-6 && shares.last <= 1.0,
        s"$prio final share ${shares.last}")
    }
  }

  test("loss weights sum to ~1 per cluster with exactly one canonical") {
    val g = run("dedup_loss_weights")
      .groupBy("canonical_id")
      .agg(sum(col("loss_weight")).as("wsum"),
        count(when(col("is_canonical"), lit(1))).as("n_canon"),
        count(lit(1)).as("n"),
        min(col("doc_id")).as("min_id"))
      .collect()
    g.foreach { r =>
      val (wsum, nCanon, n, minId) =
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // n * floor(1e6/n)/1e6 ∈ (1 - n·1e-6, 1]
      assert(wsum <= 1.0 + 1e-9 && wsum > 1.0 - n * 1e-6,
        s"cluster ${r.getLong(0)}: weight sum $wsum over $n docs")
      assert(nCanon == 1L, s"cluster ${r.getLong(0)}: $nCanon canonicals")
      assert(r.getLong(0) == minId,
        s"canonical ${r.getLong(0)} is not the min doc_id $minId")
    }
  }

  test("sax words use the 4-letter alphabet and match their length") {
    run("ts_sax_symbols").collect().foreach { r =>
      val (n, word) = (r.getLong(1), r.getString(2))
      assert(word.length == n, s"${r.getString(0)}: |$word| != $n")
      assert(word.forall("abcd".contains(_)),
        s"${r.getString(0)}: bad symbol in $word")
    }
  }

  test("ab lift equals the mean difference; arms partition the rows") {
    val rows = run("events_ab_lift").collect()
    rows.foreach { r =>
      val (na, nb) = (r.getLong(1), r.getLong(2))
      val (ma, mb, lift) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // each reported stat is floor-truncated separately — the lift can
      // differ from mb - ma by at most two truncation steps
      assert(math.abs(lift - (mb - ma)) <= 2e-6 + 1e-9,
        s"${r.getString(0)}: lift $lift vs ${mb - ma}")
      assert(na > 0 && nb > 0)
    }
    val total = graft.queries.TsQueries.base(spark, dir)
      .filter(col("value").isNotNull && !isnan(col("value")) &&
        abs(col("value")) < lit(1e12)).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total,
      "arms must partition the filtered stream")
  }

  test("stl seasonal strength is a [0,1] variance ratio") {
    run("ts_stl_decompose").collect().foreach { r =>
      val (vd, vr, st) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(vd >= 0 && vr >= 0, s"${r.getString(0)}: negative variance")
      assert(st >= 0 && st <= 1.0,
        s"${r.getString(0)}: strength $st outside [0,1]")
      // residual variance cannot exceed detrended variance by more than
      // the truncation the strength formula already absorbed at 0
      if (st > 0) assert(vr < vd, s"${r.getString(0)}: vr $vr >= vd $vd")
    }
  }

  test("ood scores are valid cosine distances and exactly top-20") {
    val rows = run("similar_ood_score").collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(s => s >= -1e-9 && s <= 2.0 + 1e-9),
      s"ood outside [0,2]: ${scores.mkString(",")}")
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "top-20 not sorted by descending outlierness")
  }

  // ---- round 9 --------------------------------------------------------

  test("gini is a [0,1) concentration index") {
    run("events_user_gini").collect().foreach { r =>
      val g = r.getDouble(2)
      assert(g >= -1e-6 && g < 1.0,
        s"${r.getString(0)}: gini $g outside [0,1)")
      assert(r.getLong(1) > 0)
    }
  }

  test("rfm scores are quartiles; cells partition the customer base") {
    val rows = run("orders_rfm_segments").collect()
    rows.foreach { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).foreach(s =>
        assert(s >= 1 && s <= 4, s"score $s outside 1..4"))
    }
    val total = rows.map(_.getLong(3)).sum
    val nCust = graft.core.Tables.load(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(total == nCust, s"cells hold $total of $nCust customers")
    // SQL-standard ntile: per dimension the four quartile populations
    // differ by at most one
    Seq(0, 1, 2).foreach { d =>
      val marg = rows.groupBy(_.getInt(d)).view
        .mapValues(_.map(_.getLong(3)).sum).values.toSeq
      assert(marg.max - marg.min <= 1,
        s"dimension $d quartiles unbalanced: $marg")
    }
  }

  test("wau dominates dau; stickiness is a (0,1] ratio") {
    run("events_dau_wau").collect().foreach { r =>
      val (dau, wau, st) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(wau >= dau, s"day ${r.getLong(0)}: wau $wau < dau $dau")
      assert(st > 0 && st <= 1.0 + 1e-9,
        s"day ${r.getLong(0)}: stickiness $st")
    }
  }

  test("funnel conversions never exceed signups; p50 <= p90") {
    run("events_funnel_time").collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"day ${r.getLong(0)}: converted > signups")
      if (!r.isNullAt(3) && !r.isNullAt(4))
        assert(r.getDouble(3) <= r.getDouble(4) + 1e-9,
          s"day ${r.getLong(0)}: p50 > p90")
    }
  }

  test("drawdowns are nonnegative; bollinger breakouts are bounded") {
    run("ts_drawdown").collect().foreach { r =>
      assert(r.getDouble(2) >= 0, s"${r.getString(0)}: negative drawdown")
      assert(r.getLong(1) > 0)
    }
    run("ts_bollinger").collect().foreach { r =>
      val (n, above, below) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(above + below <= n,
        s"${r.getString(0)}: breakouts exceed windows")
      assert(r.getDouble(4) >= 0,
        s"${r.getString(0)}: negative bandwidth")
    }
  }

  test("ols r-squared is a [0,1] fit quality") {
    run("ts_ols_trend").collect().foreach { r =>
      val r2 = r.getDouble(4)
      assert(r2 >= -1e-6 && r2 <= 1.0 + 1e-6,
        s"${r.getString(0)}: r2 $r2 outside [0,1]")
      assert(r.getLong(1) > 1)
    }
  }

  test("hhi lies between perfect competition (1/n) and monopoly (1)") {
    run("supplier_share_hhi").collect().foreach { r =>
      val (n, hhi) = (r.getLong(1), r.getDouble(2))
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-9,
        s"${r.getString(0)}: hhi $hhi with $n suppliers")
    }
  }

  test("mix drift is a [0,1] total-variation distance") {
    run("events_mix_drift").collect().foreach { r =>
      val tvd = r.getDouble(2)
      assert(tvd >= -1e-9 && tvd <= 1.0 + 1e-9,
        s"day ${r.getLong(0)}: tvd $tvd outside [0,1]")
    }
  }

  test("cluster purity is a (0,1] majority fraction; cells cover the corpus") {
    val rows = run("similar_cluster_purity").collect()
    rows.foreach { r =>
      val p = r.getDouble(3)
      assert(p > 0 && p <= 1.0 + 1e-9, s"cluster ${r.getInt(0)}: purity $p")
    }
    val covered = rows.map(_.getLong(1)).sum
    val nVecs = graft.core.Tables.load(spark, dir, "embeddings").count()
    assert(covered == nVecs, s"cells hold $covered of $nVecs vectors")
  }

  test("token budget fill is monotone and consumes exactly the budget") {
    val rows = run("corpus_token_budget").collect()
      .sortBy(_.getLong(1)) // src_rank
    val fracs = rows.map(_.getDouble(4))
    assert(fracs.forall(f => f >= 0 && f <= 1.0 + 1e-9))
    // once the budget runs out every later source takes nothing, and
    // before the boundary every source is fully taken
    val firstPartial = fracs.indexWhere(f => f < 1.0)
    if (firstPartial >= 0)
      assert(fracs.drop(firstPartial + 1).forall(_ == 0.0),
        s"take fractions not monotone: ${fracs.mkString(",")}")
    val cums = rows.map(_.getLong(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b },
      "cumulative tokens not monotone in rank")
    // taken tokens ≈ min(budget, total) up to the one truncation step
    val taken = rows.map(r => r.getDouble(4) * r.getLong(2)).sum
    val total = rows.map(_.getLong(2)).sum
    val budget = total / 2
    assert(math.abs(taken - math.min(budget, total)) <= 1.0 + 1e-6 * total,
      s"taken $taken vs budget $budget")
  }

  test("dedup threshold curve is nonincreasing in the threshold") {
    val rows = run("dedup_threshold_curve").collect()
      .sortBy(_.getDouble(0))
    val pairs = rows.map(_.getLong(1))
    val docs = rows.map(_.getLong(2))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b },
      s"pair counts increase with threshold: ${pairs.mkString(",")}")
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b },
      s"doc counts increase with threshold: ${docs.mkString(",")}")
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1),
      "distinct docs cannot exceed pair count"))
  }

  test("source vocabulary jaccard is a [0,1] symmetric matrix half") {
    val rows = run("doc_jaccard_sources").collect()
    assert(rows.length == 190) // C(20,2) upper-triangle pairs
    rows.foreach { r =>
      val j = r.getDouble(3)
      assert(j >= 0 && j <= 1.0 + 1e-9,
        s"${r.getString(0)}~${r.getString(1)}: jaccard $j")
      assert(r.getString(0) < r.getString(1), "not upper-triangle")
    }
  }

  test("attribution conserves credit: first and last totals both equal " +
    "the purchase count") {
    val rows = run("events_attribution").collect()
    val purchases = graft.core.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == purchases,
      "first-touch credits do not sum to the purchases")
    assert(rows.map(_.getLong(2)).sum == purchases,
      "last-touch credits do not sum to the purchases")
    rows.foreach(r => assert(r.getString(0) != "purchase",
      "a purchase cannot be its own touchpoint"))
  }

  test("m4 envelope: min <= first,last <= max in every bucket") {
    run("downsample_m4").collect().foreach { r =>
      val (mn, mx, f, l) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mn <= mx && mn <= f && f <= mx && mn <= l && l <= mx,
        s"${r.getString(0)}/${r.getLong(1)}: envelope violated " +
          s"($mn, $f, $l, $mx)")
    }
  }

  test("fertility is at least one token per word; chars per token positive") {
    run("bpe_fertility").collect().foreach { r =>
      assert(r.getDouble(3) >= 1.0 - 1e-6,
        s"${r.getString(0)}: fertility ${r.getDouble(3)} < 1")
      assert(r.getDouble(4) > 0,
        s"${r.getString(0)}: chars/token not positive")
    }
  }

  test("hill alpha is a >1 tail index; bot cv is nonnegative") {
    run("doc_hill_tail").collect().foreach { r =>
      if (!r.isNullAt(2))
        assert(r.getDouble(2) > 1.0,
          s"${r.getString(0)}: hill alpha ${r.getDouble(2)} <= 1")
    }
    run("events_bot_score").collect().foreach { r =>
      assert(r.getDouble(3) >= 0, s"user ${r.getLong(0)}: negative cv")
      assert(r.getDouble(2) > 0, s"user ${r.getLong(0)}: nonpositive gap")
    }
  }

  test("cuped reports a finite theta and both lifts") {
    val r = run("events_cuped_lift").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
    Seq(2, 3, 4).foreach(i =>
      assert(!row.isNullAt(i) &&
        !row.getDouble(i).isNaN && !row.getDouble(i).isInfinite,
        s"cuped col $i not finite"))
  }

  test("cohort ltv is nondecreasing within a cohort; years are ordered") {
    val rows = run("orders_cohort_ltv").collect()
      .groupBy(_.getInt(0))
    rows.foreach { case (cohort, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      sorted.foreach(r => assert(r.getInt(1) >= cohort,
        s"cohort $cohort sells in year ${r.getInt(1)} before existing"))
      val ltvs = sorted.map(_.getDouble(4))
      assert(ltvs.zip(ltvs.tail).forall { case (a, b) => a <= b + 1e-6 },
        s"cohort $cohort ltv not monotone: ${ltvs.mkString(",")}")
    }
  }

  test("benford shares each sum to ~1 and chi2 terms are nonnegative") {
    val rows = run("orders_benford").collect()
    assert(rows.map(_.getInt(0)).toSeq.sorted == (1 to 9),
      "all nine leading digits must appear")
    val obs = rows.map(_.getDouble(2)).sum
    val exp = rows.map(_.getDouble(3)).sum
    assert(obs > 1.0 - 9e-6 && obs <= 1.0 + 1e-9, s"obs shares sum $obs")
    assert(exp > 1.0 - 9e-6 && exp <= 1.0 + 1e-9, s"exp shares sum $exp")
    rows.foreach(r => assert(r.getDouble(4) >= 0, "negative chi2 term"))
  }

  test("bootstrap CI brackets the point mean; se is nonnegative") {
    run("events_bootstrap_ci").collect().foreach { r =>
      val (pm, se, lo, hi) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(se >= 0, s"${r.getString(0)}: negative se")
      // lo/hi are pm -/+ 1.96·se, each floor-truncated separately
      assert(lo <= pm + 1e-6 && pm <= hi + 1e-6,
        s"${r.getString(0)}: CI [$lo,$hi] does not bracket $pm")
    }
  }

  test("always-valid p is nonincreasing per event_type and in (0,1]") {
    run("events_msprt").collect()
      .groupBy(_.getString(0)).foreach { case (et, rs) =>
        val ps = rs.sortBy(_.getLong(1)).map(_.getDouble(6))
        ps.foreach(p => assert(p >= 0.0 && p <= 1.0, s"$et: p=$p"))
        assert(ps.zip(ps.tail).forall { case (a, b) => b <= a + 1e-9 },
          s"$et: p_seq not nonincreasing: ${ps.mkString(",")}")
      }
  }

  test("path entropy is bounded by ln(branching); norm in [0,1]") {
    run("events_path_entropy").collect().foreach { r =>
      val (k, h) = (r.getLong(2), r.getDouble(3))
      assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-6,
        s"${r.getString(0)}: H=$h outside [0, ln($k)]")
      if (k > 1) {
        val hn = r.getDouble(4)
        assert(hn >= -1e-9 && hn <= 1.0 + 1e-9,
          s"${r.getString(0)}: norm=$hn")
      }
    }
  }

  test("source ginis are in [0,1) and totals are positive") {
    val r = run("corpus_source_gini").collect().head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0 && r.getLong(2) > 0)
    Seq(3, 4).foreach { i =>
      val g = r.getDouble(i)
      assert(g >= -1e-6 && g < 1.0, s"gini col $i = $g")
    }
  }

  test("quality canonical has the most words in its cluster") {
    val m = run("dedup_canonical_quality").collect()
    m.foreach { r =>
      assert(r.getLong(1) >= 2, "singleton cluster leaked in")
      // differs ⇒ the quality canonical is not the naive min id
      if (r.getBoolean(5))
        assert(r.getLong(2) != r.getLong(3))
      else
        assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("twap and plain mean agree on dense days; nulls only when no " +
    "interval exists") {
    run("ts_twap").collect().foreach { r =>
      val (nSlots, nIvl) = (r.getLong(2), r.getLong(3))
      assert(nIvl <= nSlots - 1 || (nIvl == 0 && nSlots >= 1))
      if (nIvl == 0) assert(r.isNullAt(4), "twap must be null w/o intervals")
      else assert(!r.isNullAt(4))
    }
  }

  test("ewm volatility is nonnegative and eod never exceeds the day max") {
    run("ts_ewm_volatility").collect().foreach { r =>
      val (eod, mx, mean) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(eod >= 0 && mx >= 0 && mean >= 0, s"negative sigma in $r")
      assert(eod <= mx + 1e-6 && mean <= mx + 1e-6,
        s"eod/mean above day max: $r")
    }
  }

  test("weibull fit yields positive shape and scale") {
    val r = run("orders_weibull_fit").collect().head
    assert(r.getLong(0) > 100, "too few gaps to fit")
    assert(r.getDouble(1) > 0, s"shape ${r.getDouble(1)}")
    assert(r.getDouble(2) > 0, s"scale ${r.getDouble(2)}")
  }

  test("qte sees the injected purchase lift at the median") {
    val rows = run("events_qte").collect()
    val p = rows.find(_.getString(0) == "purchase").get
    assert(p.getDouble(5) > 5.0,
      s"purchase median QTE ${p.getDouble(5)} misses the +11 lift")
    // (no bound on the other types: at sf0.001 the per-arm samples are
    // small enough that genuine median gaps exceed the lift size)
  }

  test("embedding correlations are in [-1,1], upper triangle, 10 rows") {
    val rows = run("embedding_corr_audit").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getInt(0) < r.getInt(1), s"not upper triangle: $r")
      assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-6, s"corr out of range: $r")
    }
  }

  test("bpe token-length shares each sum to ~1") {
    val rows = run("bpe_token_length_hist").collect()
    rows.foreach(r => assert(r.getLong(0) >= 1 && r.getLong(0) <= 5))
    val ws = rows.map(_.getDouble(3)).sum
    val os = rows.map(_.getDouble(4)).sum
    assert(ws > 1.0 - 5e-6 && ws <= 1.0 + 1e-9, s"word shares $ws")
    assert(os > 1.0 - 5e-6 && os <= 1.0 + 1e-9, s"occ shares $os")
  }

  test("cluster stats are internally consistent") {
    run("dedup_cluster_stats").collect().foreach { r =>
      val (sz, nc, nd, rem) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(sz >= 2, "singleton cluster leaked in")
      assert(nd == sz * nc, s"docs $nd != $sz x $nc")
      assert(rem == nd - nc, s"removable $rem != $nd - $nc")
    }
  }

  test("quality tradeoff: decile means nonincreasing, cum share ends ~1") {
    val rows = run("corpus_quality_tradeoff").collect()
      .sortBy(_.getInt(0))
    val means = rows.map(_.getDouble(2))
    assert(means.zip(means.tail).forall { case (a, b) => b <= a + 2e-6 },
      s"decile quality not nonincreasing: ${means.mkString(",")}")
    val cums = rows.map(_.getDouble(4))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b + 1e-9 },
      s"cum share not monotone: ${cums.mkString(",")}")
    assert(cums.last >= 1.0 - 1e-5 && cums.last <= 1.0)
  }

  test("length outliers: fractions bounded, mad nonnegative") {
    run("corpus_length_outliers").collect().foreach { r =>
      assert(r.getDouble(3) >= 0, s"negative MAD: $r")
      val frac = r.getDouble(5)
      assert(frac >= 0 && frac < 0.5, s"implausible outlier frac: $r")
      assert(r.getLong(4) <= r.getLong(1))
    }
  }

  test("label drift cosines are in [-1,1] with positive norms") {
    run("embedding_label_drift").collect().foreach { r =>
      assert(r.getDouble(2) >= 0, s"negative norm: $r")
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-6, s"cos out of range: $r")
    }
  }

  test("audio rms matches a direct recomputation of the sample formula") {
    run("multimodal_audio_rms").collect().foreach { r =>
      val id = r.getLong(0)
      if (id % 7 == 0) assert(r.isNullAt(1), s"truncated $id must be null")
      else {
        val samples = (0 until 64).map(i => (id * 31 + i * 17) % 4096)
        val rms = math.sqrt(samples.map(s => s * s).sum.toDouble / 64)
        assert(r.getLong(1) == 64)
        assert(math.abs(r.getDouble(2) - rms) <= 1e-6,
          s"$id: rms ${r.getDouble(2)} != $rms")
        assert(r.getLong(3) == samples.max, s"$id: peak mismatch")
      }
    }
  }

  test("abc classes cover the catalog and shares sum to ~1") {
    val rows = run("orders_abc_classification").collect()
    assert(rows.map(_.getString(0)).toSet == Set("A", "B", "C"))
    val s = rows.map(_.getDouble(2)).sum
    assert(s > 1.0 - 3e-6 && s <= 1.0 + 1e-9, s"shares sum $s")
    // A's revenue share dominates by construction of the 80% cut
    val a = rows.find(_.getString(0) == "A").get.getDouble(2)
    assert(a >= 0.5, s"A share $a implausibly small")
  }

  test("churn labels: churned iff recency exceeds 90 days") {
    run("orders_churn_labels").collect().foreach { r =>
      assert(r.getBoolean(4) == (r.getLong(2) > 90), s"label mismatch: $r")
      assert(r.getLong(1) > 0 && r.getDouble(3) > 0)
    }
  }

  test("dup-quality census shares are consistent") {
    val rows = run("dedup_quality_cross").collect()
    val overall = rows.map(_.getDouble(4)).sum
    assert(overall > 1.0 - 4e-6 && overall <= 1.0 + 1e-9,
      s"overall shares sum $overall")
    rows.groupBy(_.getBoolean(0)).foreach { case (g, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(s > 1.0 - 2e-6 && s <= 1.0 + 1e-9, s"group $g shares $s")
    }
  }

  test("winnowing density is near 2/(w+1) and bounded by the guarantee") {
    val rows = run("doc_winnowing").collect()
    assert(rows.nonEmpty)
    var dsum = 0.0
    rows.foreach { r =>
      val (ng, nw, nf, d) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nw == ng - 3)
      // at least one fingerprint per window-disjoint block; at most
      // one per window
      assert(nf >= 1 && nf <= nw, s"${r.getLong(0)}: $nf of $nw")
      dsum += d
    }
    val mean = dsum / rows.length
    // expected density 2/(w+1) = 0.4 for w=4 (random hashes)
    assert(mean > 0.25 && mean < 0.55, s"mean density $mean off 0.4")
  }

  test("croston components are positive; rate = size/interval") {
    run("events_croston").collect().foreach { r =>
      val (z, p, rate) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(z > 0 && p >= 1.0 - 1e-6,
        s"${r.getString(0)}: size $z interval $p")
      // z and p are truncated separately from the reported rate: the
      // propagated truncation error scales with z/p², not a constant
      assert(math.abs(rate - z / p) <= 1e-5 * (1 + z),
        s"${r.getString(0)}: rate $rate != $z/$p")
    }
  }

  test("source diversity estimates are valid Jaccard expectations") {
    run("corpus_source_diversity").collect().foreach { r =>
      if (!r.isNullAt(2)) {
        val e = r.getDouble(2)
        assert(e >= 0 && e <= 1.0 + 1e-9, s"${r.getString(0)}: est $e")
      }
    }
  }

  test("peak concurrency is within [1, n_sessions]") {
    val r = run("events_peak_concurrency").collect().head
    val (ns, peak) = (r.getLong(0), r.getLong(2))
    assert(ns > 0 && peak >= 1 && peak <= ns,
      s"peak $peak outside [1, $ns]")
    assert(r.getLong(3) > 0, "peak_sec must be a real boundary second")
  }

  test("lang mix: majority dominates uniform; entropy <= ln(n_langs)") {
    run("corpus_lang_mix").collect().foreach { r =>
      val (k, share, h) = (r.getLong(2), r.getDouble(4), r.getDouble(5))
      assert(share >= 1.0 / k - 1e-6, s"majority below uniform: $r")
      assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-6,
        s"entropy out of bounds: $r")
    }
  }

  test("lift decay sees the constant purchase lift in well-fed weeks") {
    val rows = run("events_lift_decay").collect()
      .filter(_.getString(0) == "purchase")
    assert(rows.nonEmpty)
    // per-week means are noisy when a boundary week has a handful of
    // rows — the lift signal is only asserted where both arms have mass
    rows.filter(r => r.getLong(2) >= 200 && r.getLong(3) >= 200)
      .foreach(r =>
        assert(r.getDouble(4) > 3.0,
          s"week ${r.getLong(1)}: purchase lift ${r.get(4)} lost the +11"))
  }
}
