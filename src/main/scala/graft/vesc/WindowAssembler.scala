package graft.vesc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding feature-window assembly (reference W11/A2/A3/P9:
  * model/vesc_dataset.py:103-160): 30-step windows, 5-step stride, per ride,
  * windows crossing end-of-log dropped, windows below 70% finite cells
  * dropped, per-window null-ignoring label means (all-null → 0.0).
  *
  * One WindowExec pass per ride builds the (30 × C) matrix, the validity
  * ratio, the label sums and the median timestamp together: every windowed
  * aggregate shares the same (ride_id, sample_idx, rows 0..29) frame.
  * Windows never cross `ride_id`, so the only shuffle is the partition by
  * ride — the same layout the resampler already produced, which AQE reuses.
  */
object WindowAssembler {

  def assemble(df: DataFrame,
               featureCols: Seq[String] = VescSchema.FeatureCols,
               confCols: Seq[String] = VescSchema.ConfidenceCols,
               windowSteps: Int = 30, strideSteps: Int = 5,
               minValidRatio: Double = VescSchema.MinValidRatio): DataFrame = {
    val feats = featureCols.filter(df.columns.contains)
    val confs = confCols.filter(df.columns.contains)
    val w = Window.partitionBy(col("ride_id")).orderBy(col("sample_idx"))
      .rowsBetween(0, windowSteps - 1)
    val wAll = Window.partitionBy(col("ride_id"))

    val validPerRow = feats.map(c =>
      when(col(c).isNotNull && !isnan(col(c)), 1).otherwise(0)).reduce(_ + _)

    val confAggs = confs.flatMap(c => Seq(
      sum(when(isnan(col(c)), lit(null)).otherwise(col(c))).over(w).as(s"__sum_$c"),
      count(when(isnan(col(c)), lit(null)).otherwise(col(c))).over(w).as(s"__cnt_$c")))

    val base = df.select(
      Seq(col("ride_id"), col("sample_idx"), col("ms_today")) ++
        Seq(
          collect_list(array(feats.map(c => col(c).cast("double")): _*)).over(w).as("__feat"),
          collect_list(col("ms_today")).over(w).as("__ms"),
          sum(validPerRow).over(w).as("__valid"),
          count(lit(1)).over(w).as("__n"),
          count(lit(1)).over(wAll).as("__total")) ++ confAggs: _*)

    val cells = lit(windowSteps * feats.size)
    val sortedMs = array_sort(col("__ms"))
    val med =
      if (windowSteps % 2 == 0)
        (element_at(sortedMs, windowSteps / 2).cast("double") +
          element_at(sortedMs, windowSteps / 2 + 1).cast("double")) / 2.0
      else element_at(sortedMs, windowSteps / 2 + 1).cast("double")

    val labelMeans = confs.map(c =>
      (coalesce(col(s"__sum_$c"), lit(0.0)) /
        greatest(col(s"__cnt_$c"), lit(1L)).cast("double")).as("y_" + c))

    base
      .filter(pmod(col("sample_idx"), lit(strideSteps)) === 0)
      .filter(col("sample_idx") + windowSteps <= col("__total"))
      .filter(col("__n") === windowSteps)
      .withColumn("valid_ratio", col("__valid").cast("double") / cells)
      .filter(col("valid_ratio") >= minValidRatio)
      .select(
        Seq(col("ride_id"), col("sample_idx").as("window_start"),
          med.as("t_mid"), col("valid_ratio"), col("__feat").as("features")) ++
          labelMeans: _*)
  }

  /** `collect_list` skips nulls, which would silently misalign a window
    * matrix with missing cells — so features are collected as fixed-width
    * per-row arrays (array() never drops elements) and `collect_list` only
    * ever sees non-null arrays. The ffill+zero-fill of the reference's
    * __getitem__ (model/vesc_dataset.py:134-137) happens in the scorer,
    * where the matrix is already materialized per window.
    */
}
