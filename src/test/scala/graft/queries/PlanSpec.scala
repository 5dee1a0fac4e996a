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

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(FormattedMode)

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
}
