package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** nansum/isclose semantics (reference `database.py:484-485,770-786`,
  * `fileutils.py:687-693`).
  */
class RowChecksumSpec extends SparkSpec {

  test("nansum treats NaN/null as 0; all-missing row is NULL") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(2.0)),
      (Some(Double.NaN), Some(3.0)),
      (None, Some(4.0)),
      (None, None),
      (Some(Double.NaN), Some(Double.NaN)))
      .toDF("a", "b")
      .select(RowChecksum.nansum(Seq(col("a"), col("b"))).as("s"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 3.0)
    assert(rows(1).getDouble(0) == 3.0)
    assert(rows(2).getDouble(0) == 4.0)
    assert(rows(3).isNullAt(0))
    assert(rows(4).isNullAt(0))
  }

  test("isClose honors atol + rtol") {
    import spark.implicits._
    val df = Seq((100.0005, 100.0), (100.5, 100.0))
      .toDF("a", "b")
      .select(RowChecksum.isClose(col("a"), col("b"),
        rtol = 0.0, atol = 1e-3).as("ok"))
    val rows = df.collect()
    assert(rows(0).getBoolean(0))
    assert(!rows(1).getBoolean(0))
  }
}
