package graft.vesc

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSuite

/** Operator edge cases from SURVEY §5: gap exactly at the 250 ms boundary
  * (strict `>`), duplicate timestamps keep-first, single-row log.
  */
class ResamplerEdgeSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("ride_id", StringType),
    StructField("ms_today", LongType),
    StructField("sample_idx", LongType),
    StructField("v", DoubleType)))

  private def mk(rows: Seq[(String, Long, Long, Double)]) = {
    val list = new java.util.ArrayList[Row]()
    rows.foreach { case (r, ms, i, v) => list.add(Row(r, Long.box(ms), Long.box(i), Double.box(v))) }
    spark.createDataFrame(list, schema)
  }

  test("gap of exactly 250 ms interpolates; 260 ms voids (strict >)") {
    // ride A: samples at 0 and 250 (span 250, NOT voided)
    // ride B: samples at 0 and 260 (span 260 > 250 → grid rows 100,200 voided)
    val df = mk(Seq(
      ("A", 0L, 0L, 0.0), ("A", 250L, 1L, 250.0),
      ("B", 0L, 0L, 0.0), ("B", 260L, 1L, 260.0)))
    val out = Resampler.resample10Hz(df, Seq("v"), Nil)
      .select("ride_id", "ms_today", "v").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(out == Set(
      ("A", 0L, Some(0.0)), ("A", 100L, Some(100.0)), ("A", 200L, Some(200.0)),
      ("B", 0L, Some(0.0)), ("B", 100L, None), ("B", 200L, None)))
  }

  test("duplicate timestamps keep the first row in file order") {
    val df = mk(Seq(
      ("A", 0L, 0L, 1.0), ("A", 0L, 1L, 999.0), ("A", 100L, 2L, 2.0)))
    val out = Resampler.resample10Hz(df, Seq("v"), Nil)
      .select("ms_today", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out == Set((0L, 1.0), (100L, 2.0)))
  }

  test("single-row log survives") {
    val df = mk(Seq(("A", 500L, 0L, 7.0)))
    val out = Resampler.resample10Hz(df, Seq("v"), Nil)
      .select("ms_today", "v", "_elapsed_ms").collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 500L && out(0).getDouble(1) == 7.0)
    assert(out(0).getDouble(2) == 0.0)
  }

  test("out-of-order input is sorted by time before gridding") {
    val df = mk(Seq(
      ("A", 200L, 0L, 20.0), ("A", 0L, 1L, 0.0), ("A", 100L, 2L, 10.0)))
    val out = Resampler.resample10Hz(df, Seq("v"), Nil)
      .orderBy("ms_today").select("ms_today", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((0L, 0.0), (100L, 10.0), (200L, 20.0)))
  }

  test("window assembler: stride, EOF drop, validity boundary and label means") {
    // 40-row ride: windows at 0,5,10 (40-30=10 last valid start)
    val rows = new java.util.ArrayList[Row]()
    (0 until 40).foreach { i =>
      rows.add(Row("A", Long.box(i * 100L), Long.box(i.toLong),
        Double.box(i.toDouble), if (i < 20) Double.box(1.0) else null))
    }
    val sch = StructType(Seq(
      StructField("ride_id", StringType),
      StructField("ms_today", LongType),
      StructField("sample_idx", LongType),
      StructField("f1", DoubleType),
      StructField("cf_idle", DoubleType)))
    val df = spark.createDataFrame(rows, sch)
    val out = WindowAssembler.assemble(df,
      featureCols = Seq("f1"), confCols = Seq("cf_idle"),
      windowSteps = 30, strideSteps = 5, minValidRatio = 0.7)
      .orderBy("window_start").collect()
    assert(out.map(_.getAs[Long]("window_start")).toSeq == Seq(0L, 5L, 10L))
    // label mean of window starting at 0: 20 labeled rows of 1.0, 10 null → 20/20=1.0
    val y0 = out(0).getAs[Double]("y_cf_idle")
    assert(math.abs(y0 - 1.0) <= 1e-12)
    // window at 10: rows 10..39 → 10 labeled → mean 1.0
    val y2 = out(2).getAs[Double]("y_cf_idle")
    assert(math.abs(y2 - 1.0) <= 1e-12)
    // t_mid of window 0: median of 0..2900 = (1400+1500)/2
    assert(out(0).getAs[Double]("t_mid") == 1450.0)
  }

  test("window below min_valid_ratio is dropped") {
    val rows = new java.util.ArrayList[Row]()
    (0 until 30).foreach { i =>
      // 20 of 30 cells valid → ratio 0.667 < 0.7
      val v: java.lang.Double = if (i < 20) Double.box(1.0) else null
      rows.add(Row("A", Long.box(i * 100L), Long.box(i.toLong), v))
    }
    val sch = StructType(Seq(
      StructField("ride_id", StringType),
      StructField("ms_today", LongType),
      StructField("sample_idx", LongType),
      StructField("f1", DoubleType)))
    val df = spark.createDataFrame(rows, sch)
    val out = WindowAssembler.assemble(df, featureCols = Seq("f1"),
      confCols = Nil, windowSteps = 30, strideSteps = 5)
    assert(out.count() == 0)
    // exactly 0.7 passes (>= boundary): 21 valid
    val rows2 = new java.util.ArrayList[Row]()
    (0 until 30).foreach { i =>
      val v: java.lang.Double = if (i < 21) Double.box(1.0) else null
      rows2.add(Row("A", Long.box(i * 100L), Long.box(i.toLong), v))
    }
    val out2 = WindowAssembler.assemble(spark.createDataFrame(rows2, sch),
      featureCols = Seq("f1"), confCols = Nil, windowSteps = 30, strideSteps = 5)
    assert(out2.count() == 1)
  }
}
