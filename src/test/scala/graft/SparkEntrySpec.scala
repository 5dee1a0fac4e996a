package graft

/** The flagship-entry fallback contract: `entry` may only degrade to
  * the relational flagship when the failure is the nanos-parquet
  * capability gap — any other exception must propagate, so a real
  * regression in `scan_time_range` can't silently smoke-pass
  * (r11 verdict "What's wrong" #3).
  */
class SparkEntrySpec extends SparkSpec {

  test("entry runs the ts flagship and returns rows in this session") {
    val df = SparkEntry.entry(spark)
    // the ts flagship carries the events scan schema, not lineitem's
    // aggregate — proves the fallback did NOT trigger here
    assert(df.columns.contains("event_type") && df.columns.contains("sec"),
      s"entry fell back to q1_pricing in a nanos-capable session: " +
        df.columns.mkString(","))
    assert(df.head() != null)
  }

  test("isNanosReadFailure matches the historical illegal-parquet-type " +
    "shapes (top-level and nested cause)") {
    val wrapped = new org.apache.spark.SparkException(
      "Job aborted due to stage failure",
      new UnsupportedOperationException(
        "Illegal Parquet type: INT64 (TIMESTAMP(NANOS,true))"))
    assert(SparkEntry.isNanosReadFailure(wrapped))
    assert(SparkEntry.isNanosReadFailure(new UnsupportedOperationException(
      "Unsupported parquet type: TIMESTAMP(NANOS)")))
  }

  test("isNanosReadFailure rejects everything else — analysis errors, " +
    "arbitrary runtime failures, nulls in the chain") {
    // a real AnalysisException with no parquet context (missing column)
    val analysis = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT definitely_not_a_column FROM range(1)").collect()
    }
    assert(!SparkEntry.isNanosReadFailure(analysis),
      "a plain analysis regression must propagate, not smoke-pass")
    assert(!SparkEntry.isNanosReadFailure(
      new RuntimeException("Illegal Parquet type"))) // wrong class
    assert(!SparkEntry.isNanosReadFailure(
      new org.apache.spark.SparkException("executor lost"))) // wrong msg
    assert(!SparkEntry.isNanosReadFailure(
      new IllegalStateException((null: String))))
  }
}
