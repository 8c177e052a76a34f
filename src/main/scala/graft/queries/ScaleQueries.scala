package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{SkewOps, TimeSeriesOps}

/** Scale-pattern operators: gap sessionization (session windows in batch
  * form) and salting for skewed joins — verified against plain-join / plain
  * window oracles so the rewrites are provably equivalence-preserving.
  */
object ScaleQueries extends QueryPack {

  private val GAP_US = 30L * 60 * 1000000 // 30 min

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Session windows (gap > 30 min): per (user, session) count + bounds.
    "w15_sessionize" -> ((s, dir) => {
      val ev = Tables.events(s, dir).withColumn("us", unix_micros(col("ts")))
      TimeSeriesOps.sessionize(ev, Seq("user_id"), "us", GAP_US)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n"), min(col("us")).as("start_us"),
          max(col("us")).as("end_us"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Salted join — must produce exactly the plain-join aggregate (the
    // oracle IS the plain join, so the equivalence is machine-checked).
    "j_salted_join" -> ((s, dir) => {
      val probe = Tables.lineitem(s, dir)
        .withColumnRenamed("l_partkey", "p_partkey")
      val build = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))
      SkewOps.saltedJoin(probe, build, Seq("p_partkey"), saltFactor = 8)
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_quantity")), 4).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }))

  override val oracle: Map[String, String] = Map(
    "w15_sessionize" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
        |      AS prev_us
        |  FROM events),
        |f AS (SELECT user_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM t),
        |g AS (SELECT user_id, us,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, count(*) AS n, min(us) AS start_us,
        |  max(us) AS end_us
        |FROM g GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,
    "j_salted_join" ->
      """SELECT p_brand, round(sum(l_quantity),4) AS sum_qty, count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin
  )
}
