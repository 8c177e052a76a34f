package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-bench (not part of the engine surface): the bounded
  * TopKAgg at large k. The buffer is a mutable ArrayBuffer with in-place
  * 2k-trim sorts (amortized O(log k) per element); this main demonstrates
  * the k=1000 case stays within ~2× of k=50 on the same scored set —
  * the regression the old immutable `b :+ a` append (O(k) per element)
  * would fail by an order of magnitude.
  *
  * `runMain graft.TopKBench` against SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    val corpus = emb.filter(col("vec_id") >= 10)
    val queries = emb.filter(col("vec_id") < 10)
    def time(k: Int): Double = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime
        graft.ops.EmbeddingOps.bruteForceTopK(corpus, queries,
            "vec_id", "embedding", k)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime - t0) / 1e9
      }.sorted
      times(times.size / 2)
    }
    time(50) // warm-up (codegen + JIT)
    val t50 = time(50)
    val t1000 = time(1000)
    println(f"""{"metric":"topk_scaling","k50_sec":$t50%.3f,"k1000_sec":$t1000%.3f,"ratio":${t1000 / t50}%.2f,"sf":"$dir"}""")
    spark.stop()
  }
}
