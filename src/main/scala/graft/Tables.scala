package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the synthetic relational test tables (see TESTDATA.md).
  *
  * One parquet file per table under `dir`; schemas are stable across scale
  * factors so operators written against sf0.001 run unchanged at sf0.1 (and,
  * by design, on a partitioned multi-file layout at cluster scale — the
  * loaders take any path glob Spark's parquet source accepts).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two physical layouts across testdata
    * generations, and the loader must accept both without a config switch:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's reader rejects it outright, so the
    *    `nanosAsLong` legacy conf (set unconditionally — it is inert for
    *    non-nanos files) surfaces it as raw `LongType` nanos, and we rebuild
    *    a microsecond timestamp with integer division (a double division
    *    would lose precision at 1e18 nanos);
    *  - parquet `timestamp[us]` (the current generation): Spark loads it as
    *    `TimestampNTZType` (isAdjustedToUTC=false) or `TimestampType`
    *    (=true). NTZ is cast to the session-zone `TimestampType` — sessions
    *    here run UTC, so the wall-clock is preserved and downstream
    *    `unix_micros`/window arithmetic sees the exact same instants the
    *    nanos path produced.
    *
    * Branching on the LOADED schema (not a flag) means a future testdata
    * regeneration in either layout keeps every events-backed operator green.
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts loaded as unsupported type $other (expected nanos-long, timestamp_ntz, or timestamp)")
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = eventsRaw(spark, dir)
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
