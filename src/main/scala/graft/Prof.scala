package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the engine surface):
  * `runMain graft.Prof q1 q2 ...` runs each named query N times
  * (SPARK_GRAFT_PROF_RUNS, default 4) against SPARK_GRAFT_SF_DIR
  * (default sf0.1) and prints per-run times — separates real plan cost
  * from this VM's multi-second stalls, which medians can't.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "4").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries
    args.foreach { name =>
      val fn = q.getOrElse(name, sys.error(s"unknown query $name"))
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime - t0) / 1e9
      }
      println(f"PROF $name: ${times.map(t => f"$t%.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}
