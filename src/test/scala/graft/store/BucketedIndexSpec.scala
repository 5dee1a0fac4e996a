package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the large-batch probe path of the persisted dedup index: a
  * bucketed at-rest corpus table joins on its bucket key with ZERO
  * exchange on the corpus side (the catalog layout satisfies the
  * join's distribution), and the result equals the broadcast path
  * bit-for-bit — bucketing changes execution, never values.
  */
class BucketedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 2000L)
    .map(i => (i % 37, i, s"v$i")).toDF("cell", "corpus_id", "payload")

  private def batch = (0L until 200L)
    .map(i => (i % 41, i)).toDF("cell", "b_id")

  test("bucketed corpus join: one exchange total, on the probe side " +
    "only; corpus scan has no shuffle above it") {
    BucketedIndex.write(corpus, "graft_test_cells", "cell", nBuckets = 8)
    val joined = BucketedIndex.probeJoin(spark, "graft_test_cells",
      batch, "cell")
    val p = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly the probe-side exchange:\n$p")
    // the corpus side must read the bucketed layout in place: its scan
    // line reports the bucket count and no Exchange sits between the
    // scan and the join on that side
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      s"corpus scan is not bucket-aware:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"large-batch path must not broadcast:\n$p")
  }

  test("bucketed path result equals the broadcast path bit-for-bit") {
    BucketedIndex.write(corpus, "graft_test_cells2", "cell", nBuckets = 8)
    val bucketed = BucketedIndex.probeJoin(spark, "graft_test_cells2",
        batch, "cell")
      .select("cell", "corpus_id", "b_id", "payload")
    val broadcasted = corpus.join(broadcast(batch), Seq("cell"))
      .select("cell", "corpus_id", "b_id", "payload")
    assert(bucketed.exceptAll(broadcasted).count() == 0)
    assert(broadcasted.exceptAll(bucketed).count() == 0)
    assert(bucketed.count() == broadcasted.count())
  }

  test("per-cell aggregation over the bucketed table needs no exchange") {
    BucketedIndex.write(corpus, "graft_test_cells3", "cell", nBuckets = 8)
    val agg = spark.table("graft_test_cells3")
      .groupBy("cell").agg(count(lit(1)).as("n"))
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed layout should satisfy the aggregation distribution:\n$p")
    assert(agg.count() == 37)
  }
}
