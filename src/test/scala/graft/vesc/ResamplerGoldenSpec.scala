package graft.vesc

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Golden parity: our raw-CSV → 10 Hz pipeline vs the reference's shipped
  * processed parquet for ride log 101
  * (Sample_VESC_Logs_pipeline_testing/ride log 101/, the reference's
  * de-facto end-to-end oracle — SURVEY §5).
  */
class ResamplerGoldenSpec extends SparkSuite {

  private val dir = "/root/reference/Sample_VESC_Logs_pipeline_testing/ride log 101"
  private val rawCsv = s"$dir/2025-09-30_11-07-12.csv"
  private val goldenParquet = s"$dir/2025-09-30_11-07-12_processed.parquet"

  lazy val ours = VescPipeline
    .preprocessTraining(spark, Seq(rawCsv), rideId = Some("ride_101"))
    .orderBy(col("sample_idx"))
    .collect()

  lazy val golden = {
    // pandas wrote ns timestamps; nanosAsLong reads them as long nanos
    spark.read.parquet(goldenParquet).orderBy(col("sample_idx")).collect()
  }
  lazy val goldenCols = spark.read.parquet(goldenParquet).columns
  lazy val ourCols = VescPipeline
    .preprocessTraining(spark, Seq(rawCsv), rideId = Some("ride_101")).columns

  test("row count matches golden") {
    assert(ours.length == golden.length, s"ours=${ours.length} golden=${golden.length}")
  }

  test("column set matches golden") {
    assert(ourCols.toSet == goldenCols.toSet,
      s"missing=${goldenCols.toSet -- ourCols.toSet} extra=${ourCols.toSet -- goldenCols.toSet}")
  }

  test("numeric channels match golden within 1e-6") {
    val numeric = VescSchema.TrainingChannels.drop(1) ++ Seq("_elapsed_ms")
    val gIdx = goldenCols.zipWithIndex.toMap
    val oIdx = ourCols.zipWithIndex.toMap
    var checked = 0
    for (c <- numeric; gi <- gIdx.get(c); oi <- oIdx.get(c)) {
      ours.zip(golden).zipWithIndex.foreach { case ((o, g), r) =>
        val ov = if (o.isNullAt(oi)) Double.NaN else o.getDouble(oi)
        val gv = if (g.isNullAt(gi)) Double.NaN else g.getDouble(gi)
        val ok = (ov.isNaN && gv.isNaN) || math.abs(ov - gv) <= 1e-6
        assert(ok, s"col=$c row=$r ours=$ov golden=$gv")
      }
      checked += 1
    }
    assert(checked >= 25, s"only $checked numeric columns compared")
  }

  test("ms_today / sample_idx / dt_ms / _on_grid match exactly") {
    val gIdx = goldenCols.zipWithIndex.toMap
    val oIdx = ourCols.zipWithIndex.toMap
    ours.zip(golden).zipWithIndex.foreach { case ((o, g), r) =>
      assert(o.getLong(oIdx("ms_today")) == g.getLong(gIdx("ms_today")), s"ms_today row $r")
      assert(o.getLong(oIdx("sample_idx")) == g.getLong(gIdx("sample_idx")), s"sample_idx row $r")
      assert(o.getBoolean(oIdx("_on_grid")) == g.getBoolean(gIdx("_on_grid")), s"_on_grid row $r")
    }
  }

  test("ts_utc matches golden (ns → ms)") {
    val gIdx = goldenCols.zipWithIndex.toMap
    val oIdx = ourCols.zipWithIndex.toMap
    ours.zip(golden).zipWithIndex.foreach { case ((o, g), r) =>
      val oursUs = o.getTimestamp(oIdx("ts_utc")).getTime // millis
      val goldenMs = g.getLong(gIdx("ts_utc")) / 1000000L
      assert(oursUs == goldenMs, s"ts_utc row $r ours=$oursUs golden=$goldenMs")
    }
  }

  test("cf_* all null like golden pre-annotation output") {
    val oIdx = ourCols.zipWithIndex.toMap
    for (c <- VescSchema.ConfidenceCols) {
      assert(ours.forall(_.isNullAt(oIdx(c))), s"$c should be all null")
    }
  }
}
