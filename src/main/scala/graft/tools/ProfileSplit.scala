package graft.tools

import org.apache.spark.sql.SparkSession

/** Splits a query key's wall time into the three phases the bench's
  * timed region actually contains (guide §1: know where the time goes
  * before touching the plan):
  *   construct — the `fn(spark, dir)` call itself (eager model fits /
  *               index gate probes execute Spark jobs here);
  *   plan      — analysis + optimization + physical planning
  *               (`queryExecution.executedPlan`), driver-side;
  *   exec      — the `count()` action.
  * Each phase is timed on a FRESH DataFrame per rep so codegen/footer
  * caches warm across reps exactly like consecutive bench passes.
  * Usage: sbt "runMain graft.tools.ProfileSplit <sfDir> <reps> <keys...>"
  */
object ProfileSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_AQE_BHJ", "64m"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_AQE_SHJ", "64m"))
      .config("spark.sql.extensions", classOf[graft.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.core.Tables.All.foreach { t =>
      // NonFatal only (r17 advice): swallowing OOM/linkage errors here
      // silently skipped table warm-ups and warped the measured split
      try graft.core.Tables.load(spark, sfDir, t).count()
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[profile] warm-up of table $t failed: $e")
      }
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val trip = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val c = trip.map(_._1).min
      val p = trip.map(_._2).min
      val e = trip.map(_._3).min
      println(f"[split] $name%-30s construct=$c%6.3f plan=$p%6.3f exec=$e%6.3f total=${c + p + e}%6.3f")
    }
    spark.stop()
  }
}
