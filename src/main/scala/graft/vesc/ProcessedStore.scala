package graft.vesc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Processed-log storage layout (SURVEY §4.3): parquet partitioned by
  * `ride_id`, so "analyze one ride" is served by static partition pruning
  * and per-ride operators start from co-located files. At fleet scale the
  * same layout makes compaction, retention, and incremental annotation
  * per-ride metadata operations instead of table rewrites.
  */
object ProcessedStore {

  def write(df: DataFrame, path: String): Unit =
    df.write
      .mode("overwrite")
      .partitionBy("ride_id")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readRide(spark: SparkSession, path: String, rideId: String): DataFrame =
    read(spark, path).filter(org.apache.spark.sql.functions.col("ride_id") === rideId)
}
