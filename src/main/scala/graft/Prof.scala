package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the engine surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"PROF $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val q = SparkEntry.queries
    def run(name: String, label: String): Unit = {
      time(label)(q(name)(spark, dir).write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    (1 to 4).foreach(i => run("dedup_minhash_lsh", s"minhash #$i"))
    (1 to 4).foreach(i => run("dedup_ngram_jaccard", s"ngram #$i"))
    (1 to 3).foreach(i => run("j1_grid_align", s"j1 #$i"))
    (1 to 2).foreach(i => run("j2_interval_join", s"j2 #$i"))
    spark.stop()
  }
}
