package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.SketchOps

/** Mergeable-sketch operators (HyperLogLog cardinality, Count-Min
  * frequency, histogram quantiles) with DuckDB oracles that recompute
  * every register independently — md5-derived hashing makes the sketch
  * CONTENTS engine-independent, so the driver hash-compares estimates
  * exactly, not within-epsilon.
  */
object SketchQueries extends QueryPack {

  private val CM_PROBES = Seq(0L, 7L, 21L, 46L, 137L)

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HLL(p=6) distinct users per event type, next to the exact count the
    // sketch approximates. Two-level partial agg; raw keys never shuffle.
    "sketch_hll_distinct" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val est = SketchOps.hllDistinct(ev, "event_type", "user_id", p = 6)
      val exact = ev.filter(col("user_id").isNotNull)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      est.join(exact, "event_type").orderBy(col("event_type"))
    }),

    // Count-Min (4×32) point estimates for five probe users vs exact
    // counts — the min-over-rows upper bound, pure integer arithmetic.
    "sketch_countmin" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val table = SketchOps.countMinTable(ev, "user_id")
      val probes = CM_PROBES.toDF("user_id")
      val est = SketchOps.countMinEstimate(table, probes, "user_id")
      val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_count"))
      est.join(exact, Seq("user_id"), "left")
        .select(col("user_id"), col("est_count"),
          coalesce(col("exact_count"), lit(0L)).as("exact_count"))
        .orderBy(col("user_id"))
    }),

    // 128-bin equi-width histogram p95 of `value` per event type — the
    // two-aggregation-pass quantile estimate (no sort of raw values).
    "sketch_hist_quantile" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      SketchOps.histQuantile(ev, "event_type", "value", q = 0.95, bins = 128)
        .orderBy(col("event_type"))
    }),

    // EXACT top-10 tokens with bounded memory (SketchOps.heavyHitters):
    // Misra-Gries candidate pass (≤cap counters per task ever shuffle)
    // + exact broadcast recount, with the MG sufficiency bound
    // machine-checked so the answer is provably the true top-k. Oracle
    // is the plain exact top-k — determinism of the two-pass form is
    // the point under test. cap sizes to the SUPPORT you care about
    // (~1/φ for frequency ≥ φ·N): 4096 covers the top-token support of
    // this corpus through the 10× ScaleUp derivation, whose ×k-distinct
    // suffixing flattens the distribution relative to N — the check
    // fired at cap=256/sf1 exactly as designed (real Zipf corpora grow
    // top counts WITH N; the synthetic ×k derivation deliberately
    // doesn't).
    "sketch_heavy_hitters" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
      SketchOps.heavyHitters(toks, "token", k = 10, cap = 4096)
        .orderBy(col("cnt").desc, col("token").asc)
    }),

    // KMV (theta-style) set-overlap estimation between two corpus
    // slices — the "how much does snapshot B re-crawl of snapshot A"
    // QA signal at sketch cost: two k=64 bounded aggregations, never a
    // corpus-wide distinct or join. Estimates sit NEXT TO the exact
    // counts in the same row, and the oracle recomputes sketches and
    // estimator arithmetic (HUGEINT-widened (k−1)·2⁶⁰ numerator)
    // independently.
    "sketch_kmv_intersect" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val a = docs.filter(col("doc_id") % 3 =!= 0)
      val b = docs.filter(col("doc_id") % 2 === 0)
      val est = SketchOps.kmvIntersect(a, b, "doc_id", k = 64, salt = "kmv:")
      val exact = docs.agg(
        sum(when(col("doc_id") % 3 =!= 0, 1L).otherwise(0L)).as("exact_a"),
        sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("exact_b"),
        sum(when(col("doc_id") % 3 =!= 0 && col("doc_id") % 2 === 0, 1L)
          .otherwise(0L)).as("exact_intersect"))
      est.crossJoin(exact)
    }),

    // Theta-sketch A-NOT-B / B-NOT-A (SketchOps.kmvSetOps) — the
    // incremental-crawl "what's NEW this snapshot" estimator at sketch
    // cost, next to the exact differences; the oracle rebuilds both
    // sketches and replays all three match fractions.
    "sketch_kmv_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val a = docs.filter(col("doc_id") % 3 =!= 0)
      val b = docs.filter(col("doc_id") % 2 === 0)
      val est = SketchOps.kmvSetOps(a, b, "doc_id", k = 64, salt = "kmv:")
      val exact = docs.agg(
        sum(when(col("doc_id") % 3 =!= 0 && col("doc_id") % 2 =!= 0, 1L)
          .otherwise(0L)).as("exact_a_not_b"),
        sum(when(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0, 1L)
          .otherwise(0L)).as("exact_b_not_a"))
      est.crossJoin(exact)
    })
  )

  private val h60hll = "('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"
  private val h60cm = "('0x' || substr(md5('cm' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"

  override val oracle: Map[String, String] = Map(
    // independent sketch rebuild: distinct salted hashes, ORDER BY h
    // LIMIT k per slice, union-of-sketches re-limited, match count via
    // membership in BOTH sketches, then the same integral estimator in
    // HUGEINT ((k−1)·2⁶⁰ wraps int64 at k = 9; `//` floor == Spark
    // `div` on the all-positive operands)
    "sketch_kmv_intersect" ->
      """WITH ka AS (
        |  SELECT DISTINCT ('0x' || substr(md5('kmv:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents WHERE doc_id % 3 <> 0 ORDER BY h LIMIT 64),
        |kb AS (
        |  SELECT DISTINCT ('0x' || substr(md5('kmv:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents WHERE doc_id % 2 = 0 ORDER BY h LIMIT 64),
        |ku AS (
        |  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) u
        |  ORDER BY h LIMIT 64),
        |ea AS (SELECT CASE WHEN count(*) < 64 THEN CAST(count(*) AS BIGINT)
        |    ELSE CAST((CAST(63 AS HUGEINT) * 1152921504606846976)
        |      // greatest(max(h), 1) AS BIGINT) END AS est_a FROM ka),
        |eb AS (SELECT CASE WHEN count(*) < 64 THEN CAST(count(*) AS BIGINT)
        |    ELSE CAST((CAST(63 AS HUGEINT) * 1152921504606846976)
        |      // greatest(max(h), 1) AS BIGINT) END AS est_b FROM kb),
        |eu AS (SELECT count(*) AS nu,
        |    CASE WHEN count(*) < 64 THEN CAST(count(*) AS BIGINT)
        |    ELSE CAST((CAST(63 AS HUGEINT) * 1152921504606846976)
        |      // greatest(max(h), 1) AS BIGINT) END AS est_union FROM ku),
        |m AS (SELECT count(*) AS mm FROM ku
        |  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
        |ex AS (SELECT
        |    CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS exact_a,
        |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS exact_b,
        |    CAST(sum(CASE WHEN doc_id % 3 <> 0 AND doc_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS exact_intersect
        |  FROM documents)
        |SELECT ea.est_a, eb.est_b, eu.est_union,
        |  CAST((CAST(m.mm AS HUGEINT) * eu.est_union)
        |    // greatest(eu.nu, 1) AS BIGINT) AS est_intersect,
        |  ex.exact_a, ex.exact_b, ex.exact_intersect
        |FROM ea, eb, eu, m, ex""".stripMargin,
    "sketch_kmv_diff" ->
      """WITH ka AS (
        |  SELECT DISTINCT ('0x' || substr(md5('kmv:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents WHERE doc_id % 3 <> 0 ORDER BY h LIMIT 64),
        |kb AS (
        |  SELECT DISTINCT ('0x' || substr(md5('kmv:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents WHERE doc_id % 2 = 0 ORDER BY h LIMIT 64),
        |ku AS (
        |  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) u
        |  ORDER BY h LIMIT 64),
        |ea AS (SELECT CASE WHEN count(*) < 64 THEN CAST(count(*) AS BIGINT)
        |    ELSE CAST((CAST(63 AS HUGEINT) * 1152921504606846976)
        |      // greatest(max(h), 1) AS BIGINT) END AS est_a FROM ka),
        |eb AS (SELECT CASE WHEN count(*) < 64 THEN CAST(count(*) AS BIGINT)
        |    ELSE CAST((CAST(63 AS HUGEINT) * 1152921504606846976)
        |      // greatest(max(h), 1) AS BIGINT) END AS est_b FROM kb),
        |eu AS (SELECT count(*) AS nu,
        |    CASE WHEN count(*) < 64 THEN CAST(count(*) AS BIGINT)
        |    ELSE CAST((CAST(63 AS HUGEINT) * 1152921504606846976)
        |      // greatest(max(h), 1) AS BIGINT) END AS est_union FROM ku),
        |mi AS (SELECT count(*) AS m FROM ku
        |  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
        |ma AS (SELECT count(*) AS m FROM ku
        |  WHERE h IN (SELECT h FROM ka) AND h NOT IN (SELECT h FROM kb)),
        |mb AS (SELECT count(*) AS m FROM ku
        |  WHERE h NOT IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
        |ex AS (SELECT
        |    CAST(sum(CASE WHEN doc_id % 3 <> 0 AND doc_id % 2 <> 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS exact_a_not_b,
        |    CAST(sum(CASE WHEN doc_id % 3 = 0 AND doc_id % 2 = 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS exact_b_not_a
        |  FROM documents)
        |SELECT ea.est_a, eb.est_b, eu.est_union,
        |  CAST((CAST(mi.m AS HUGEINT) * eu.est_union)
        |    // greatest(eu.nu, 1) AS BIGINT) AS est_intersect,
        |  CAST((CAST(ma.m AS HUGEINT) * eu.est_union)
        |    // greatest(eu.nu, 1) AS BIGINT) AS est_a_not_b,
        |  CAST((CAST(mb.m AS HUGEINT) * eu.est_union)
        |    // greatest(eu.nu, 1) AS BIGINT) AS est_b_not_a,
        |  ex.exact_a_not_b, ex.exact_b_not_a
        |FROM ea, eb, eu, mi, ma, mb, ex""".stripMargin,
    "sketch_hll_distinct" ->
      s"""WITH ev AS (SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL),
         |h AS (SELECT event_type, $h60hll AS h FROM ev),
         |r AS (SELECT event_type, h & 63 AS b,
         |        CASE WHEN (h >> 6) = 0 THEN 55
         |             ELSE CAST(floor(log2((h >> 6) & (-(h >> 6))) + 0.5) AS INT) + 1
         |        END AS rho
         |      FROM h),
         |m AS (SELECT event_type, b, max(rho) AS mr FROM r GROUP BY 1, 2),
         |s AS (SELECT event_type, sum(pow(2.0, -mr)) AS s, count(*) AS present
         |      FROM m GROUP BY 1),
         |est AS (SELECT event_type,
         |  CASE WHEN (0.709 * 64 * 64) / (s + (64.0 - present)) <= 160.0
         |            AND (64 - present) > 0
         |       THEN 64.0 * ln(64.0 / (64 - present))
         |       ELSE (0.709 * 64 * 64) / (s + (64.0 - present)) END AS e
         |  FROM s),
         |ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
         |         AS exact_distinct FROM ev GROUP BY 1)
         |SELECT est.event_type,
         |  floor(est.e * 1e4 + 0.5) / 1e4 AS est_distinct, ex.exact_distinct
         |FROM est JOIN ex USING (event_type) ORDER BY est.event_type""".stripMargin,
    "sketch_countmin" ->
      s"""WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
         |d4 AS (SELECT unnest(generate_series(0, 3)) AS d),
         |cells AS (
         |  SELECT d4.d,
         |    ((xor($h60cm, d4.d * 1099511628211) % 32) + 32) % 32 AS bucket,
         |    count(*) AS c
         |  FROM ev CROSS JOIN d4 GROUP BY 1, 2),
         |probes AS (SELECT unnest([${CM_PROBES.mkString(", ")}]) AS user_id),
         |pb AS (SELECT user_id, d4.d,
         |    ((xor($h60cm, d4.d * 1099511628211) % 32) + 32) % 32 AS bucket
         |  FROM probes CROSS JOIN d4),
         |est AS (SELECT pb.user_id, min(coalesce(cells.c, 0)) AS est_count
         |  FROM pb LEFT JOIN cells ON cells.d = pb.d AND cells.bucket = pb.bucket
         |  GROUP BY 1),
         |ex AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count
         |  FROM ev GROUP BY 1)
         |SELECT est.user_id, CAST(est.est_count AS BIGINT) AS est_count,
         |  coalesce(ex.exact_count, 0) AS exact_count
         |FROM est LEFT JOIN ex USING (user_id) ORDER BY est.user_id""".stripMargin,
    "sketch_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents)
        |SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |FROM t GROUP BY token
        |ORDER BY cnt DESC, token ASC LIMIT 10""".stripMargin,
    "sketch_hist_quantile" ->
      """WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |b AS (SELECT event_type, min(value) AS lo, max(value) AS hi,
        |        count(*) AS n FROM ev GROUP BY 1),
        |hist AS (
        |  SELECT ev.event_type, b.n, b.lo, b.hi,
        |    least(CAST(floor((ev.value - b.lo) / ((b.hi - b.lo) / 128.0))
        |      AS BIGINT), 127) AS bin,
        |    count(*) AS c
        |  FROM ev JOIN b USING (event_type)
        |  GROUP BY 1, 2, 3, 4, 5),
        |cum AS (SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY bin)
        |          AS cumc FROM hist),
        |qual AS (SELECT * FROM cum
        |  WHERE CAST(cumc AS DOUBLE) >= 0.95 * CAST(n AS DOUBLE)),
        |tgt AS (SELECT event_type, min(bin) AS bin FROM qual GROUP BY 1)
        |SELECT q.event_type,
        |  floor((CASE WHEN q.hi = q.lo THEN q.lo
        |    ELSE q.lo + (CAST(q.bin AS DOUBLE) +
        |      least(greatest((0.95 * CAST(q.n AS DOUBLE)
        |          - CAST(q.cumc - q.c AS DOUBLE)) / CAST(q.c AS DOUBLE),
        |        0.0), 1.0)) * ((q.hi - q.lo) / 128.0) END) * 1e4 + 0.5) / 1e4
        |    AS est_q
        |FROM tgt JOIN qual q ON q.event_type = tgt.event_type AND q.bin = tgt.bin
        |ORDER BY q.event_type""".stripMargin
  )
}
