package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator coverage (SURVEY.md §2.2–§2.8) expressed over the
  * driver's synthetic tables with DuckDB oracles.
  *
  * Per-operator mapping: A-ids = aggregations (§2.4), J = joins (§2.3),
  * P/U = predicates & set ops (§2.2/§2.7), O = sorts/top-k (§2.6),
  * W = window functions (§2.5), F = scalar functions (§2.8).
  */
object RelationalQueries extends QueryPack {

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A13/F12 + P-filters: TPC-H-Q1-shaped pricing summary (partial
    // aggregation + filter pushdown to the parquet scan).
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A1: per-group mean/stddev_pop (the normalization-stats aggregation,
    // reference model/normalize.py:37-56 — null-ignoring, partial+final agg).
    "a1_stats_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(avg(col("l_quantity")), 4).as("mean_qty"),
          round(stddev_pop(col("l_quantity")), 4).as("std_qty"),
          round(avg(col("l_extendedprice")), 4).as("mean_price"),
          round(stddev_pop(col("l_extendedprice")), 4).as("std_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // A4: exact median per group (reference window median,
    // application/app.py:151).
    "a4_median" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(round(median(col("value")), 4).as("med_value"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // A5: global min/max (t0 lookup, reference application/app.py:157).
    "a5_minmax" -> ((s, dir) => {
      Tables.events(s, dir)
        .agg(
          min(col("ts")).as("ts_min"), max(col("ts")).as("ts_max"),
          round(min(col("value")), 4).as("value_min"),
          round(max(col("value")), 4).as("value_max"))
    }),

    // A6: block downsample — mean of consecutive blocks of 10 rows per
    // series (reference display downsample, application/app.py:221-243).
    "a6_downsample" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w) - 1)
        .withColumn("block", expr("rn div 10"))
        .groupBy(col("user_id"), col("block"))
        .agg(round(avg(col("value")), 4).as("block_avg"), count(lit(1)).as("n"))
        .orderBy(col("user_id"), col("block"))
    }),

    // A7/A8: masked MAE vs a reference level (reference model/eval.py:35-43).
    "a7_mae" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val gm = ev.agg(avg(col("value")).as("gmean"))
      ev.crossJoin(broadcast(gm))
        .groupBy(col("event_type"))
        .agg(round(avg(abs(col("value") - col("gmean"))), 4).as("mae"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // A9/M4: masked BCE-with-logits aggregation (reference
    // model/model_training.py:43-50) — numerically-stable expression, null
    // targets masked out.
    "a9_masked_bce" -> ((s, dir) => {
      val l = col("value") / 10 - 1
      val t = when(col("event_type") === "purchase", 1.0)
        .when(col("event_type") === "click", 0.0)
      val bce = greatest(l, lit(0)) - l * t + log(lit(1) + exp(-abs(l)))
      Tables.events(s, dir)
        .withColumn("bce", when(t.isNotNull, bce))
        .groupBy(col("user_id"))
        .agg(round(avg(col("bce")), 4).as("mean_bce"), count(col("bce")).as("n_labeled"))
        .orderBy(col("user_id"))
    }),

    // A11: reliability-diagram decile binning (reference
    // model/plot_metrics.py:28-43), with F10 sigmoid.
    "a11_reliability_bins" -> ((s, dir) => {
      val p = lit(1) / (lit(1) + exp(-(col("value") / 10 - 1)))
      val y = when(col("event_type") === "purchase", 1.0).otherwise(0.0)
      Tables.events(s, dir)
        .withColumn("p", p).withColumn("y", y)
        .withColumn("bin", least(floor(col("p") * 10), lit(9)).cast("long"))
        .groupBy(col("bin"))
        .agg(round(avg(col("p")), 4).as("mean_p"),
          round(avg(col("y")), 4).as("frac_pos"), count(lit(1)).as("n"))
        .orderBy(col("bin"))
    }),

    // J-equi: multi-way star join, small dims broadcast (revenue per nation).
    "j_equi_revenue_by_nation" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"))
    }),

    // TPC-H-Q3-shaped: segment filter → 3-way join → top-10 revenue orders
    // (filter pushdown on both fact scans, deterministic tie-break).
    "q3_shipping_priority" -> ((s, dir) => {
      val cutoff = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H-Q5-shaped: region → nation → customer+supplier co-nation join,
    // revenue per nation (brings region/supplier into the join graph).
    "q5_local_supplier" -> ((s, dir) => {
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("n_name"))
    }),

    // J-broadcast: fact × broadcast dim enrichment (J3-style stats lookup).
    "j_broadcast_enrich" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(avg(col("p_retailprice")), 4).as("avg_retail"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }),

    // P11/U3: anti-join split membership (reference model/data_utils.py:20-52).
    "p11_anti_join" -> ((s, dir) => {
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
      Tables.customer(s, dir)
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Semi-join (EXISTS) membership.
    "semi_join" -> ((s, dir) => {
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 250000)
      Tables.customer(s, dir)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // U1: union + distinct (reference np.union1d, training_preprocessing.py:139).
    "u1_union_distinct" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "view").select(col("user_id"))
        .union(ev.filter(col("event_type") === "click").select(col("user_id")))
        .distinct()
        .orderBy(col("user_id"))
    }),

    // O3: top-k per group with deterministic tie-break (reference top-3
    // labels, model/model_training.py:187-189).
    "o3_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      Tables.part(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("p_brand"), col("rk"), col("p_partkey"), col("p_retailprice"))
        .orderBy(col("p_brand"), col("rk"))
    }),

    // O6/J4: nearest-timestamp lookup per series (reference anchor lookup,
    // training_preprocessing.py:238-248).
    "o6_nearest_lookup" -> ((s, dir) => {
      val target = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      val diff = abs(unix_micros(col("ts")) - unix_micros(target))
      val w = Window.partitionBy(col("user_id")).orderBy(diff.asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("ts"))
        .orderBy(col("user_id"))
    }),

    // F1/F2: regex extraction + printf-style formatting (reference
    // filename/ride-id inference, training_preprocessing.py:9-38).
    "f1_regex_extract" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("src_num", regexp_extract(col("source"), "src(\\d+)", 1).cast("long"))
        .withColumn("src_tag", format_string("ride_%02d", col("src_num")))
        .groupBy(col("src_num"), col("src_tag"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("src_num"))
    }),

    // F9: JSON field extraction (reference annotation JSON parse,
    // training_apply_behavior_annotations.py:17-26).
    "f9_json_get" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n"))
        .orderBy(col("event_type"))
    }),

    // F4: timestamp formatting/truncation (reference ts_pst derivation,
    // training_preprocessing.py:80-86 — UTC flavour).
    "f4_time_format" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("day_hour", date_format(col("ts"), "yyyy-MM-dd HH:00"))
        .groupBy(col("day_hour"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("day_hour"))
    }),

    // F7: seconds → "HH:MM:SS.t" video-timestamp formatting (reference
    // format_video_ts, training_preprocessing.py:269-278) — pure integer
    // arithmetic on elapsed micros per series.
    "f7_format_hms" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")) - min(unix_micros(col("ts"))).over(w))
        .withColumn("vts", expr(
          "printf('%02d:%02d:%02d.%d', us div 3600000000, (us div 60000000) % 60, (us div 1000000) % 60, (us div 100000) % 10)"))
        .select(col("event_id"), col("user_id"), col("vts"))
        .orderBy(col("event_id"))
    }),

    // F10/F12: sigmoid + math-function family per group.
    "f10_sigmoid" -> ((s, dir) => {
      val z = col("value") / 10 - 1
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(avg(lit(1) / (lit(1) + exp(-z))), 4).as("mean_sigmoid"),
          round(avg(sqrt(abs(col("value")))), 4).as("mean_sqrt_abs"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }))

  override val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),4) AS sum_qty,
        |  round(sum(l_extendedprice),4) AS sum_base_price,
        |  round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        |  round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  round(avg(l_extendedprice),4) AS avg_price,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a1_stats_agg" ->
      """SELECT l_returnflag, round(avg(l_quantity),4) AS mean_qty,
        |  round(stddev_pop(l_quantity),4) AS std_qty,
        |  round(avg(l_extendedprice),4) AS mean_price,
        |  round(stddev_pop(l_extendedprice),4) AS std_price, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a4_median" ->
      """SELECT event_type, round(median(value),4) AS med_value, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a5_minmax" ->
      """SELECT min(ts) AS ts_min, max(ts) AS ts_max,
        |  round(min(value),4) AS value_min, round(max(value),4) AS value_max
        |FROM events""".stripMargin,
    "a6_downsample" ->
      """WITH t AS (SELECT user_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS rn
        |  FROM events)
        |SELECT user_id, rn // 10 AS block, round(avg(value),4) AS block_avg,
        |  count(*) AS n
        |FROM t GROUP BY user_id, rn // 10 ORDER BY user_id, block""".stripMargin,
    "a7_mae" ->
      """WITH g AS (SELECT avg(value) AS gmean FROM events)
        |SELECT event_type, round(avg(abs(value - gmean)),4) AS mae, count(*) AS n
        |FROM events, g GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a9_masked_bce" ->
      """WITH t AS (SELECT user_id, value/10 - 1 AS l,
        |  CASE WHEN event_type='purchase' THEN 1.0
        |       WHEN event_type='click' THEN 0.0 END AS tgt
        |  FROM events)
        |SELECT user_id,
        |  round(avg(CASE WHEN tgt IS NOT NULL
        |    THEN greatest(l,0) - l*tgt + ln(1+exp(-abs(l))) END),4) AS mean_bce,
        |  count(CASE WHEN tgt IS NOT NULL
        |    THEN greatest(l,0) - l*tgt + ln(1+exp(-abs(l))) END) AS n_labeled
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a11_reliability_bins" ->
      """WITH t AS (SELECT 1/(1+exp(-(value/10 - 1))) AS p,
        |  CASE WHEN event_type='purchase' THEN 1.0 ELSE 0.0 END AS y
        |  FROM events)
        |SELECT CAST(least(floor(p*10),9) AS BIGINT) AS bin,
        |  round(avg(p),4) AS mean_p, round(avg(y),4) AS frac_pos, count(*) AS n
        |FROM t GROUP BY 1 ORDER BY bin""".stripMargin,
    "j_equi_revenue_by_nation" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |  round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "j_broadcast_enrich" ->
      """SELECT p_brand, round(sum(l_quantity),4) AS sum_qty,
        |  round(avg(p_retailprice),4) AS avg_retail, count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "p11_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,
    "u1_union_distinct" ->
      """SELECT user_id FROM events WHERE event_type='view'
        |UNION
        |SELECT user_id FROM events WHERE event_type='click'
        |ORDER BY user_id""".stripMargin,
    "o3_topk_per_group" ->
      """WITH t AS (SELECT p_brand, p_partkey, p_retailprice,
        |  row_number() OVER (PARTITION BY p_brand
        |    ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
        |  FROM part)
        |SELECT p_brand, rk, p_partkey, p_retailprice FROM t
        |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "o6_nearest_lookup" ->
      """WITH t AS (SELECT user_id, event_id, ts,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY abs(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-15 00:00:00')) ASC,
        |             event_id ASC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, ts FROM t WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "f1_regex_extract" ->
      """SELECT CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT) AS src_num,
        |  printf('ride_%02d', CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT)) AS src_tag,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2 ORDER BY src_num""".stripMargin,
    "f9_json_get" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(json_extract_string(props, '$.k')) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "f4_time_format" ->
      """SELECT strftime(ts, '%Y-%m-%d %H:00') AS day_hour, count(*) AS n,
        |  round(sum(value),4) AS sum_value
        |FROM events GROUP BY 1 ORDER BY day_hour""".stripMargin,
    "f7_format_hms" ->
      """WITH t AS (SELECT event_id, user_id,
        |  epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id) AS us
        |  FROM events)
        |SELECT event_id, user_id,
        |  printf('%02d:%02d:%02d.%d', us // 3600000000, (us // 60000000) % 60,
        |         (us // 1000000) % 60, (us // 100000) % 10) AS vts
        |FROM t ORDER BY event_id""".stripMargin,
    "f10_sigmoid" ->
      """SELECT event_type,
        |  round(avg(1/(1+exp(-(value/10 - 1)))),4) AS mean_sigmoid,
        |  round(avg(sqrt(abs(value))),4) AS mean_sqrt_abs, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
