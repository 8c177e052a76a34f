package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Bucketed co-located join: both sides bucketed by the join key join with
  * NO shuffle exchange — the layout that makes repeated fact-to-fact joins
  * affordable at 100 TB (shuffle once at write time, never again).
  */
class BucketingSpec extends SparkSuite {

  test("bucketed tables join without a shuffle exchange") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val o = Tables.orders(spark, sf("sf0.001"))
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    // force a non-broadcast join so the bucketed sort-merge path is what's
    // being proven (at real scale neither side broadcasts anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))

    // correctness vs the unbucketed join
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expected)

    // the join keys must never be reshuffled — bucketing already co-located
    // them (the aggregation's own exchange on o_orderpriority is expected)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(l_orderkey") &&
      !plan.contains("hashpartitioning(o_orderkey"),
      s"join keys were reshuffled despite bucketing:\n$plan")
    assert(plan.contains("Bucketed: true"), s"bucketed scan missing:\n$plan")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
