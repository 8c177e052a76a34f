package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's own bloom-filter expression pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind AQE's injected runtime filters, spark/sql/catalyst
  * expressions/BloomFilter*.scala), exposed as callable functions so an
  * operator can build the filter on a dimension's keys and prune a fact
  * scan BEFORE the join shuffle, deterministically, without relying on the
  * optimizer choosing to inject one.
  *
  *  - `bloom_agg(xxhash64(key), estimatedItems, numBits)` → binary sketch
  *  - `might_contain(sketch, xxhash64(key))` → boolean (no false negatives)
  */
object BloomExprs {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("bloom_agg")))
      reg.createOrReplaceTempFunction(
        "bloom_agg", es => BloomFilterAggregate(es(0), es(1), es(2), 0, 0), "built-in")
    if (!reg.functionExists(FunctionIdentifier("might_contain")))
      reg.createOrReplaceTempFunction(
        "might_contain", es => BloomFilterMightContain(es(0), es(1)), "built-in")
  }
}
