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
}
