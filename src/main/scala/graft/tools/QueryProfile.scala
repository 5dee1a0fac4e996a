package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query profiling: runs each named query `reps` times and prints
  * first-run vs best time, separating one-off cost (codegen compile,
  * cache materialization) from steady-state execution.
  * Usage: sbt "runMain graft.tools.QueryProfile <sfDir> <reps> [names...]"
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s first=${times.head}%6.2fs best=${times.min}%6.2fs all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
