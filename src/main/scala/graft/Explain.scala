package graft

/** Plan inspection: `runMain graft.Explain <sfDir> <query...>` prints the
  * formatted physical plan of each named SparkEntry query (or all with no
  * names) — the `.explain("formatted")` feedback loop for shuffle /
  * pushdown / broadcast auditing.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate("graft-explain")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
