package graft.ops

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Partition pruning — the scan posture that matters most at 100 TB:
  * a language-partitioned layout must let a language filter skip every
  * non-matching directory at PLANNING time, and the pruned layout must
  * not change a single row.
  */
class PartitionPruneSpec extends SparkSuite {

  test("language filter reaches the scan as a PartitionFilter") {
    val df = SparkEntry.queries("src_partition_prune")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    // the filter must be a partition filter on the scan node, not a
    // post-scan Filter over all rows
    assert(p.contains("PartitionFilters") &&
      p.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("lang")),
      s"lang filter did not reach PartitionFilters:\n${p.take(3000)}")
  }

  test("the scan reads ONLY the matching partition directories") {
    // force the write, then compare the PHYSICAL scan's selected
    // partition count against the table's full partition count — the
    // pruned plan must touch 2 of the 5 language directories
    val df = SparkEntry.queries("src_partition_prune")(spark, sf("sf0.001"))
    df.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(df.queryExecution.executedPlan).headOption
    assert(scan.isDefined, "no file scan in the plan")
    val selected = scan.get.selectedPartitions.partitionCount
    val all = scan.get.relation.location.listFiles(Nil, Nil).length
    assert(all == 5, s"expected 5 language partitions, table has $all")
    assert(selected == 2,
      s"pruned scan selected $selected of $all partitions (want 2)")
  }

  test("partitioned layout returns identical rows to the plain table") {
    import graft.Tables
    val want = Tables.documents(spark, sf("sf0.001"))
      .filter(col("lang").isin("en", "de"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))
      .collect().map(_.toString).toSeq
    val got = SparkEntry.queries("src_partition_prune")(spark, sf("sf0.001"))
      .collect().map(_.toString).toSeq
    assert(got == want)
  }
}
