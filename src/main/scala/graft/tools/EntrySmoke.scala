package graft.tools

import org.apache.spark.sql.SparkSession

/** Local mimic of the driver's t1 smoke: run SparkEntry.entry and
  * assert rows > 0. Usage: sbt "runMain graft.tools.EntrySmoke".
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n schema=${df.schema.simpleString}")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
