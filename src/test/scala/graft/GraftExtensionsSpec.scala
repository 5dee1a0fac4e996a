package graft

import graft.SparkSpec

/** SQL-surface registration of graft's native expressions. */
class GraftExtensionsSpec extends SparkSpec {

  test("array_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT array_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head()
    assert(r.getDouble(0) == 32.0)
    // float arrays too (the storage element type)
    val rf = spark.sql(
      "SELECT array_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
      .head()
    assert(rf.getDouble(0) == 3.0)
    // null element → null (zip_with parity)
    val rn = spark.sql(
      "SELECT array_dot(array(1.0D, NULL), array(1.0D, 1.0D)) AS d").head()
    assert(rn.isNullAt(0))
  }

  test("hamming_distance is callable from SQL; length mismatch → null") {
    GraftFunctions.register(spark)
    assert(spark.sql(
      "SELECT hamming_distance('1010', '1001') AS d").head().getInt(0) == 2)
    assert(spark.sql(
      "SELECT hamming_distance('abc', 'abc') AS d").head().getInt(0) == 0)
    assert(spark.sql(
      "SELECT hamming_distance('10', '100') AS d").head().isNullAt(0))
  }
}
