package graft.vesc

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Golden parity: annotation interval-join + exclusivity rules vs the
  * reference's shipped ride_102_labeled.csv (SURVEY §5). The shipped file
  * was labeled against absolute ts_pst timestamps.
  */
class AnnotationsGoldenSpec extends SparkSuite {

  private val dir = "/root/reference/Sample_VESC_Logs_pipeline_testing/ride log 102"

  lazy val labeled = {
    val processed = spark.read.parquet(s"$dir/2025-09-30_11-08-03_processed.parquet")
      .withColumn("ts_pst", expr("timestamp_micros(ts_pst div 1000)"))
      .withColumn("ts_utc", expr("timestamp_micros(ts_utc div 1000)"))
    VescPipeline.applyAnnotations(spark, processed, s"$dir/ride_102_annotations.csv")
      .orderBy(col("sample_idx")).collect()
  }
  lazy val labeledCols = {
    val processed = spark.read.parquet(s"$dir/2025-09-30_11-08-03_processed.parquet")
      .withColumn("ts_pst", expr("timestamp_micros(ts_pst div 1000)"))
    VescPipeline.applyAnnotations(spark, processed, s"$dir/ride_102_annotations.csv").columns
  }

  lazy val golden = spark.read.option("header", "true").csv(s"$dir/ride_102_labeled.csv")
    .select(col("sample_idx").cast("long").as("sample_idx") +:
      VescSchema.ConfidenceCols.map(c => col(c).cast("double").as(c)): _*)
    .orderBy(col("sample_idx")).collect()
  lazy val goldenCols = Seq("sample_idx") ++ VescSchema.ConfidenceCols

  test("row counts match") {
    assert(labeled.length == golden.length)
  }

  test("cf_* columns match the shipped labeled file") {
    val oIdx = labeledCols.zipWithIndex.toMap
    val gIdx = goldenCols.zipWithIndex.toMap
    var mismatches = List.empty[String]
    labeled.zip(golden).foreach { case (o, g) =>
      val sid = g.getLong(gIdx("sample_idx"))
      for (c <- VescSchema.ConfidenceCols) {
        val ov = if (o.isNullAt(oIdx(c))) Double.NaN else o.getDouble(oIdx(c))
        val gv = if (g.isNullAt(gIdx(c))) Double.NaN else g.getDouble(gIdx(c))
        val ok = (ov.isNaN && gv.isNaN) || math.abs(ov - gv) <= 1e-6
        if (!ok) mismatches ::= s"sample=$sid col=$c ours=$ov golden=$gv"
      }
    }
    assert(mismatches.isEmpty,
      s"${mismatches.length} mismatches; first 10:\n${mismatches.take(10).mkString("\n")}")
  }
}
