package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Estimator guarantees of the mergeable sketches (the oracle checks
  * cross-engine determinism; this checks the sketches actually estimate).
  */
class SketchOpsSpec extends SparkSuite {

  private lazy val keys = {
    import spark.implicits._
    // 400 distinct keys, skewed frequencies (key i appears i%7+1 times)
    (0 until 400).flatMap(i => Seq.fill(i % 7 + 1)(("g" + (i % 2), i.toLong)))
      .toDF("grp", "k")
  }

  test("HLL estimate lands within the expected error band") {
    val est = SketchOps.hllDistinct(keys, "grp", "k", p = 6).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = keys.groupBy("grp").agg(countDistinct(col("k")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, d) =>
      val rel = math.abs(est(g) - d) / d.toDouble
      // m=64 → standard error ~1.04/sqrt(64) = 13%; allow 3 sigma
      assert(rel < 0.40, s"group $g: est ${est(g)} vs exact $d (rel $rel)")
    }
  }

  test("Count-Min estimates are upper bounds and exact for heavy keys") {
    val ks = keys.select(col("k"))
    val table = SketchOps.countMinTable(ks, "k", d = 4, w = 32)
    import spark.implicits._
    val probes = Seq(6L, 13L, 20L, 398L).toDF("k")
    val est = SketchOps.countMinEstimate(table, probes, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = ks.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == Set(6L, 13L, 20L, 398L), "every probe gets an estimate")
    est.foreach { case (k, e) =>
      assert(e >= exact.getOrElse(k, 0L),
        s"CM estimate must never undercount (key $k)")
    }
  }

  test("Count-Min probe with an empty cell estimates 0, not the min of non-empty cells") {
    import spark.implicits._
    // 3 keys in a wide (4×4096) table: an absent probe almost surely maps to
    // at least one untouched bucket in some row — min over cells must treat
    // that as 0 (the sketch's upper-bound contract for absent keys)
    val ks = Seq(1L, 2L, 3L).toDF("k")
    val table = SketchOps.countMinTable(ks, "k", d = 4, w = 4096)
    val est = SketchOps.countMinEstimate(table, Seq(999999L).toDF("k"), "k",
        d = 4, w = 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est == Map(999999L -> 0L), s"absent probe must estimate 0: $est")
  }

  test("histogram p50 of a uniform ramp is near the true median") {
    import spark.implicits._
    val vals = (0 until 1000).map(i => ("a", i.toDouble)).toDF("grp", "v")
    val est = SketchOps.histQuantile(vals, "grp", "v", q = 0.5, bins = 128)
      .head().getDouble(1)
    // true median 499.5; one 7.8-wide bin of slack
    assert(math.abs(est - 499.5) < 10.0, s"est $est")
  }

  test("sketch registers merge: union of halves == whole (HLL)") {
    import spark.implicits._
    val half1 = keys.filter(col("k") < 200)
    val half2 = keys.filter(col("k") >= 200)
    val whole = SketchOps.hllDistinct(keys, "grp", "k").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val merged = SketchOps.hllDistinct(half1.union(half2), "grp", "k").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // register max() is order/partition-insensitive, so the estimate is too
    assert(whole == merged)
  }

  test("heavyHitters is EXACT top-k under real MG eviction (cap << distinct)") {
    import spark.implicits._
    // 10 heavy keys (800+i occurrences — distinct counts, so the exact
    // ranking is unique) over 490 tail keys × 5: N ≈ 10500, bound
    // N/(cap+1) ≈ 318 < 800, so MG with cap 32 must retain every heavy
    // key through constant eviction pressure from the tail
    val heavy = (0 until 10).flatMap(i => Seq.fill(800 + i)(f"h$i%02d"))
    val tail = (0 until 490).flatMap(i => Seq.fill(5)(f"t$i%03d"))
    val rows = heavy ++ tail
    val df = rows.toDF("key").repartition(8)
    val got = SketchOps.heavyHitters(df, "key", k = 10, cap = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toList
      .sortBy { case (k, c) => (-c, k) }.take(10)
    assert(got.sortBy(t => (-t._2, t._1)) == exact, s"got $got want $exact")
  }

  test("heavyHitters fails loudly when the distribution is too flat for cap") {
    import spark.implicits._
    // 400 keys, all equal frequency 5: k-th count (5) <= N/(cap+1) for
    // cap 32 (2000/33 = 60) — the sufficiency check must throw, never
    // return a silently arbitrary "top"-k
    val flat = (0 until 400).flatMap(i => Seq.fill(5)(s"f$i")).toDF("key")
    val e = intercept[IllegalArgumentException] {
      SketchOps.heavyHitters(flat, "key", k = 10, cap = 32).collect()
    }
    assert(e.getMessage.contains("sufficiency"), e.getMessage)
  }

  test("heavyHitters on zero rows returns an empty frame, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("key")
    val got = SketchOps.heavyHitters(empty, "key", k = 5, cap = 32)
    assert(got.columns.toSeq == Seq("key", "cnt"))
    assert(got.count() == 0L)
  }

  test("heavyHitters ignores null keys instead of NPE-ing in the MG pass") {
    import spark.implicits._
    // nulls outnumber everything; they must neither crash Ordering[String]
    // in MisraGriesAgg.finish nor appear in the output
    val rows = Seq.fill(50)(Option.empty[String]) ++
      (0 until 20).flatMap(i => Seq.fill(30 + i)(Option(s"k$i")))
    val df = rows.toDF("key").repartition(4)
    val got = SketchOps.heavyHitters(df, "key", k = 5, cap = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    val exact = rows.flatten.groupBy(identity).view.mapValues(_.size.toLong)
      .toList.sortBy { case (k, c) => (-c, k) }.take(5)
    assert(got.sortBy(t => (-t._2, t._1)) == exact)
    assert(got.forall(_._1 != null))
  }

  test("kmv: exact below k, deterministic estimates near truth at k=64") {
    import spark.implicits._
    // 40 distinct ids < k: the sketch never fills, estimate is EXACT
    val small = (0L until 40L).toDF("id")
    val exact = SketchOps.kmvIntersect(small, small, "id", k = 64, salt = "kt:")
      .collect()(0)
    assert(exact.getAs[Long]("est_a") == 40L)
    assert(exact.getAs[Long]("est_union") == 40L)
    assert(exact.getAs[Long]("est_intersect") == 40L)

    // identical 500-distinct sets: union sketch == per-set sketch, every
    // union value matches both, so est_intersect == est_union == est_a
    val big = (0L until 500L).toDF("id")
    val same = SketchOps.kmvIntersect(big, big, "id", k = 64, salt = "kt:")
      .collect()(0)
    assert(same.getAs[Long]("est_a") == same.getAs[Long]("est_union"))
    assert(same.getAs[Long]("est_intersect") == same.getAs[Long]("est_union"))
    // deterministic md5 hashes: the estimate sits near truth (not a
    // flaky tolerance - the value is pinned by the hash function)
    val est = same.getAs[Long]("est_a")
    assert(est > 350 && est < 700, s"est_a $est implausible for 500 distinct")

    // disjoint sets: zero matches => intersect estimate 0
    val b = (1000L until 1500L).toDF("id")
    val disj = SketchOps.kmvIntersect(big, b, "id", k = 64, salt = "kt:")
      .collect()(0)
    assert(disj.getAs[Long]("est_intersect") == 0L)
  }
}
