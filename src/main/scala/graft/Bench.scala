package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: runs every declared query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  * A warm-up pass (table footers + a trivial job) runs before timing so
  * the numbers measure query execution, not JVM/session start-up.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // graft's native SQL functions (array_dot, hamming_distance);
      // the queries' output sorts vanish under .count() via Catalyst's
      // own EliminateSorts — no custom rule needed
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: scheduler + codegen + parquet footers for every table
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.core.Tables.All.foreach { t =>
      try graft.core.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
