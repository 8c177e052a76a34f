package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named set of driver-checkable queries: each key has a Spark
  * implementation over the synthetic tables plus (where SQL-expressible) an
  * equivalent DuckDB oracle statement. Column names/aliases MUST match
  * between the two — the driver sorts columns by name and hash-compares
  * values. Double-valued aggregates are rounded to 4 decimals on BOTH sides
  * so summation-order noise can't flip the hash.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
