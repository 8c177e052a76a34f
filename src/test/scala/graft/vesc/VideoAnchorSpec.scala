package graft.vesc

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** W13 golden parity: the full raw-CSV → 10 Hz → video-anchor pipeline run
  * with `--vid_time "00:00:30.7" --log_time "2025-09-30 11:07:17.5"` on
  * ride log 101 must reproduce the reference's
  * insert_video_timestamp_anchor_point output
  * (training_preprocessing.py:238-279), independently re-derived in pandas
  * by tools/golden_video_anchor.py → golden_video_anchor.csv.
  */
class VideoAnchorSpec extends SparkSuite {

  private val dir = "/root/reference/Sample_VESC_Logs_pipeline_testing/ride log 101"
  private val rawCsv = s"$dir/2025-09-30_11-07-12.csv"

  private def goldenCsv: Map[Long, String] = {
    val url = getClass.getResource("/golden_video_anchor.csv")
    require(url != null, "golden_video_anchor.csv missing — run tools/golden_video_anchor.py")
    scala.io.Source.fromURL(url).getLines().drop(1).map { line =>
      val Array(idx, ts) = line.split(",")
      idx.toLong -> ts
    }.toMap
  }

  test("pipeline --vid_time/--log_time reproduces the reference anchors") {
    val out = VescPipeline.preprocessTraining(spark, Seq(rawCsv),
        rideId = Some("ride_101"),
        vidTime = Some("00:00:30.7"), logTime = Some("2025-09-30 11:07:17.5"))
      .select(col("sample_idx"), col("video_ts_anchor"))
      .collect()
    val golden = goldenCsv
    assert(out.length == golden.size, s"rows ours=${out.length} golden=${golden.size}")
    out.foreach { r =>
      val idx = r.getLong(0)
      assert(r.getString(1) == golden(idx),
        s"sample_idx=$idx ours=${r.getString(1)} golden=${golden(idx)}")
    }
  }

  test("negative offsets format with python divmod semantics") {
    import spark.implicits._
    val df = Seq(-3700000L, -10000L, 0L, 3599900L).toDF("ms")
    val got = df.select(VideoAnchor.formatVideoTs(col("ms")).as("v"))
      .collect().map(_.getString(0)).toSeq
    // python: -3700000ms → secs=-3700 → h=-2, m=58, s=20.0
    assert(got == Seq("-2:58:20.0", "-1:59:50.0", "00:00:00.0", "00:59:59.9"))
  }
}
