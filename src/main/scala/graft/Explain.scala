package graft

/** Plan inspection: `runMain graft.Explain <sfDir> [--out=<dir>]
  * [--suffix=<sfx>] <query...>` prints the formatted physical plan of
  * each named SparkEntry query (or all with no names) — the
  * `.explain("formatted")` feedback loop for shuffle / pushdown /
  * broadcast auditing. With `--out=` each plan is ALSO written to
  * `<dir>/<query><sfx>.txt` (bare files, no sbt log decoration) — the
  * round-evidence path (plans/rNN/<query>_before|after.txt).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rest = args.drop(1)
    val outDir = rest.collectFirst { case a if a.startsWith("--out=") =>
      a.stripPrefix("--out=") }
    val suffix = rest.collectFirst { case a if a.startsWith("--suffix=") =>
      a.stripPrefix("--suffix=") }.getOrElse("")
    val names0 = rest.filterNot(_.startsWith("--")).toSeq
    val names = if (names0.nonEmpty) names0
      else SparkEntry.queries.keys.toSeq.sorted
    outDir.foreach(d => java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(d)))
    val spark = GraftSession.getOrCreate("graft-explain")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      outDir.foreach { d =>
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"$n$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.stop()
  }
}
