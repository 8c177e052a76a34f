package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch operators — the aggregation shapes that make
  * cardinality / frequency / quantile estimation tractable at 100 TB:
  * every sketch here is a two-level hash-aggregate (per-partition partial
  * registers merged by max / sum), never a distinct or a sort over raw
  * rows. Hashes are md5-derived (like [[TextOps.tokenHash60]]) so an
  * independent SQL engine can reproduce every register bit-for-bit — the
  * correctness gate hash-compares the sketch CONTENTS, not just the
  * estimates.
  *
  * These deliberately trade the last few % of accuracy of the
  * tuned-constant variants (HLL++ bias correction, conservative-update
  * CM) for cross-engine determinism; the register layout and merge
  * algebra — the part that matters for scale — is the standard one.
  */
object SketchOps {

  /** 60-bit stable hash of any column's string form, salted. */
  private def h60(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** HyperLogLog distinct-count estimate of `keyCol` per `groupCol`, with
    * m = 2^p registers. Register index = low p bits; rho = (trailing zeros
    * of the remaining bits) + 1 — `x & -x` isolates the lowest set bit,
    * an exact power of two, so `log2` of it is exact in any IEEE engine.
    * Includes the standard linear-counting small-range correction.
    *
    * Plan shape: groupBy(group, bucket).max(rho) → groupBy(group).sum —
    * partial aggregation on both levels, no shuffle of raw keys.
    */
  def hllDistinct(df: DataFrame, groupCol: String, keyCol: String,
                  p: Int = 6): DataFrame = {
    val m = 1 << p
    val h = h60(col(keyCol), "hll:")
    val bucket = h.bitwiseAND(lit((m - 1).toLong))
    val w = shiftright(h, p) // 60-p bits of randomness
    val maxRho = lit(60 - p + 1)
    val rho = when(w === 0, maxRho).otherwise(
      floor(log2(w.bitwiseAND(-w)) + lit(0.5)).cast("int") + lit(1))

    val registers = df
      .filter(col(keyCol).isNotNull)
      .select(col(groupCol), bucket.as("__b"), rho.as("__rho"))
      .groupBy(col(groupCol), col("__b"))
      .agg(max(col("__rho")).as("__m"))

    // alpha_m for m >= 64 (standard HLL constant family)
    val alpha = if (m >= 128) 0.7213 / (1.0 + 1.079 / m) else if (m == 64) 0.709 else 0.673
    registers.groupBy(col(groupCol))
      .agg(sum(pow(lit(2.0), -col("__m"))).as("__s"), count(lit(1)).as("__present"))
      .select(col(groupCol), {
        val s = col("__s") + (lit(m.toDouble) - col("__present")) // absent registers = 0
        val v = lit(m.toLong) - col("__present") // zero-valued registers
        val raw = lit(alpha * m * m) / s
        val est = when(raw <= lit(2.5 * m) && v > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / v)).otherwise(raw)
        (floor(est * 1e4 + lit(0.5)) / 1e4).as("est_distinct")
      })
  }

  /** Count-Min frequency table: d salted hash rows × w buckets of exact
    * counters (one groupBy over (row, bucket) — pure integer arithmetic,
    * bit-identical in any engine). `estimate` probes it with the classic
    * min-over-rows upper bound.
    */
  def countMinTable(df: DataFrame, keyCol: String, d: Int = 4, w: Int = 32): DataFrame = {
    val rows = explode(sequence(lit(0), lit(d - 1))).as("__d")
    df.select(col(keyCol), rows)
      .select(col("__d"),
        pmod(h60(col(keyCol), "cm").bitwiseXOR(col("__d").cast("long") * lit(1099511628211L)),
          lit(w.toLong)).as("__bucket"))
      .groupBy(col("__d"), col("__bucket"))
      .agg(count(lit(1)).as("__c"))
  }

  /** Point estimates for `probes`: min over the d rows of the probed
    * counters, with a MISSING cell counting as 0 — a probe absent from the
    * stream gets the correct Count-Min estimate 0 instead of an inflated
    * min over only its non-empty cells (or vanishing entirely, as an
    * inner join would do). Left join FROM the probes with the counter
    * table broadcast: the table is d·w counters by construction, orders of
    * magnitude below the stream it sketches.
    */
  def countMinEstimate(table: DataFrame, probes: DataFrame, keyCol: String,
                       d: Int = 4, w: Int = 32): DataFrame = {
    val probed = probes.select(col(keyCol),
      explode(sequence(lit(0), lit(d - 1))).as("__d"))
      .select(col(keyCol), col("__d"),
        pmod(h60(col(keyCol), "cm").bitwiseXOR(col("__d").cast("long") * lit(1099511628211L)),
          lit(w.toLong)).as("__bucket"))
    probed.join(broadcast(table), Seq("__d", "__bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("__c"), lit(0L))).as("est_count"))
  }

  /** Misra-Gries partial state: at most `cap` counters. Decrement-all on
    * overflow preserves the MG guarantee under arbitrary merge order:
    * any item with true count > N/(cap+1) survives to the final keys.
    */
  class MisraGriesAgg(cap: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, Map[String, Long], Seq[String]] {
    private def offer(m: Map[String, Long], k: String, c: Long): Map[String, Long] = {
      val updated = m.updated(k, m.getOrElse(k, 0L) + c)
      if (updated.size <= cap) updated
      else {
        val dec = updated.values.min
        updated.collect { case (key, v) if v > dec => key -> (v - dec) }
      }
    }
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      offer(b, a, 1L)
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      y.foldLeft(x) { case (acc, (k, c)) => offer(acc, k, c) }
    override def finish(r: Map[String, Long]): Seq[String] = r.keys.toSeq.sorted
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** EXACT top-`k` heavy hitters with bounded memory — the two-pass
    * classic: (1) one Misra-Gries pass with `cap` counters produces a
    * candidate SUPERSET (each task ships ≤ cap counters, raw keys never
    * shuffle for the sketch); (2) candidates broadcast back and counted
    * EXACTLY in a second scan, then (count desc, key asc) top-k. The MG
    * internals are merge-order-dependent, but the recount makes the
    * OUTPUT deterministic — provided the true k-th count exceeds
    * N/(cap+1), MG's retention bound. That sufficiency condition is
    * MACHINE-CHECKED per call (same philosophy as connectedComponents'
    * convergence check): a distribution too flat for the cap fails
    * loudly instead of returning a silently wrong top-k.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int,
                   cap: Int = 256): DataFrame = {
    require(k >= 1 && cap >= k, s"need cap ($cap) >= k ($k)")
    val spark = df.sparkSession
    import spark.implicits._
    // nulls carry no frequency information and would NPE MisraGriesAgg's
    // finish (Ordering[String] on a null key) — drop them up front
    val keys = df.filter(col(keyCol).isNotNull).select(col(keyCol).cast("string")).as[String]
    val n = keys.count()
    if (n == 0L) return keys.toDF(keyCol).withColumn("cnt", lit(0L)).limit(0)
    val candidates = keys
      .select(udaf(new MisraGriesAgg(cap)).apply(col(keyCol)).as("cands"))
      .select(explode(col("cands")).as(keyCol))
    val top = keys.toDF(keyCol)
      .join(broadcast(candidates), keyCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(k)
      .localCheckpoint(true)
    // MG can legitimately end with an empty counter map (decrement-all on a
    // perfectly flat stream) — that's a sufficiency failure, not an NPE
    val kthRow = top.agg(min(col("cnt"))).head
    require(!kthRow.isNullAt(0),
      s"heavyHitters sufficiency violated: no candidate survived the " +
        s"Misra-Gries pass (distribution too flat for cap=$cap) — raise cap")
    val kth = kthRow.getLong(0)
    require(kth > n / (cap + 1L),
      s"heavyHitters sufficiency violated: k-th count $kth <= N/(cap+1) = " +
        s"${n / (cap + 1L)} — raise cap (distribution too flat for exactness)")
    top
  }

  /** Equi-width histogram quantile estimate of `valueCol` per `groupCol`:
    * `bins` buckets between the group's min/max, cumulative counts, linear
    * interpolation inside the bucket containing rank q·n. Two aggregation
    * passes (bounds, then histogram) — never a sort of the raw values,
    * which is what makes it viable where an exact percentile isn't.
    */
  def histQuantile(df: DataFrame, groupCol: String, valueCol: String,
                   q: Double, bins: Int = 128): DataFrame = {
    val bounds = df.groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"),
        count(col(valueCol)).as("__n"))

    val width = (col("__hi") - col("__lo")) / lit(bins.toDouble)
    val binIdx = least(
      floor((col(valueCol) - col("__lo")) / width).cast("long"), lit((bins - 1).toLong))

    val hist = df.join(broadcast(bounds), groupCol)
      .select(col(groupCol), col("__n"), col("__lo"), col("__hi"),
        binIdx.as("__bin"))
      .groupBy(col(groupCol), col("__n"), col("__lo"), col("__hi"), col("__bin"))
      .agg(count(lit(1)).as("__c"))

    // cumulative count per bin; the target bin is the first with cum >= rank
    val cum = hist.withColumn("__cum",
      sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
          .orderBy(col("__bin"))))

    val rank = lit(q) * col("__n").cast("double")
    val inBin = (rank - (col("__cum") - col("__c")).cast("double")) / col("__c").cast("double")
    val frac = least(greatest(inBin, lit(0.0)), lit(1.0))
    val est = when(col("__hi") === col("__lo"), col("__lo")).otherwise(
      col("__lo") + (col("__bin").cast("double") + frac) * width)

    val qualifying = cum.filter(col("__cum").cast("double") >= rank)
    val target = qualifying.groupBy(col(groupCol))
      .agg(min(col("__bin")).as("__bin"))
    target.join(qualifying, Seq(groupCol, "__bin"))
      .select(col(groupCol),
        (floor(est * 1e4 + lit(0.5)) / 1e4).as("est_q"))
  }

  /** Bounded K-MINIMUM-VALUES partial: a sorted DISTINCT Seq of the k
    * smallest longs — ≤ 2k values per task partial on the wire, the
    * [[SamplingOps.MinKDoubleAgg]] shape with set semantics (KMV is
    * defined over distinct hash values, so dedup happens inside the
    * partial instead of as a corpus-wide `distinct()` shuffle).
    */
  class MinKDistinctLongAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Seq[Long], Seq[Long]] {
    private def trim(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)
    override def zero: Seq[Long] = Seq.empty
    override def reduce(b: Seq[Long], a: Long): Seq[Long] = {
      val appended = b :+ a
      if (appended.size >= 2 * k) trim(appended) else appended
    }
    override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = trim(x ++ y)
    override def finish(r: Seq[Long]): Seq[Long] = trim(r)
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** KMV sketch of `keyCol`: ONE row holding the k smallest distinct
    * salted 60-bit hashes, ascending (Beyer et al. 2007 — the theta-
    * sketch family's base estimator). Mergeable by concat+resort; the
    * estimate for a full sketch is `(k−1)·2⁶⁰ / h_k`.
    */
  def kmvSketch(df: DataFrame, keyCol: String, k: Int,
                salt: String): DataFrame = {
    val minK = udaf(new MinKDistinctLongAgg(k))
    df.select(h60(col(keyCol), salt).as("__h"))
      .agg(minK(col("__h")).as("sketch"))
  }

  /** KMV distinct-cardinality estimate of a sketch column (array of
    * ascending hashes): exact size when the sketch never filled, else
    * `(k−1)·2⁶⁰ / h_k` — numerator in DECIMAL(38,0), since
    * (k−1)·2⁶⁰ wraps int64 already at k = 9.
    */
  private def kmvEst(name: String, k: Int): Column =
    when(size(col(name)) < k, size(col(name)).cast("long")).otherwise(expr(
      s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976) div " +
        s"greatest(element_at($name, $k), 1) AS BIGINT)"))

  /** Distinct-set overlap of two keyed inputs from two k-bounded
    * sketches (theta-sketch intersection): the union sketch is the k
    * smallest of the merged hash sets; the match fraction of union-
    * sketch values present in BOTH input sketches scales the union
    * estimate. ONE row out: est_a, est_b, est_union, est_intersect.
    *
    * Scale shape: two bounded aggregations (≤ 2k-value partials), one
    * single-row cross join, array arithmetic on ≤ k elements — the
    * corpus is never shuffled, only scanned.
    */
  def kmvIntersect(a: DataFrame, b: DataFrame, keyCol: String, k: Int,
                   salt: String): DataFrame = {
    val sa = kmvSketch(a, keyCol, k, salt).withColumnRenamed("sketch", "sk_a")
    val sb = kmvSketch(b, keyCol, k, salt).withColumnRenamed("sketch", "sk_b")
    val u = slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, k)
    val matches = size(filter(u, v =>
      array_contains(col("sk_a"), v) && array_contains(col("sk_b"), v)))
    sa.crossJoin(sb)
      .withColumn("__u", u)
      .withColumn("__m", matches.cast("long"))
      .withColumn("est_a", kmvEst("sk_a", k))
      .withColumn("est_b", kmvEst("sk_b", k))
      .withColumn("est_union", kmvEst("__u", k))
      // match-fraction × union estimate, DECIMAL-widened (est_union is
      // corpus-sized; ×k would wrap int64 near 10^17 distinct)
      .withColumn("est_intersect", expr(
        "CAST((CAST(__m AS DECIMAL(38,0)) * est_union) div " +
          "greatest(size(__u), 1) AS BIGINT)"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        col("est_intersect"))
  }

  /** Theta-sketch set algebra — [[kmvIntersect]] plus the A-NOT-B and
    * B-NOT-A estimates (the "how much of this snapshot is NEW"
    * incremental-crawl signal at sketch cost): the union sketch's
    * match fractions for in-A-only and in-B-only values scale the
    * union estimate, exactly like the intersection fraction. Same
    * scale shape: two k-bounded aggregations, one single-row join,
    * array arithmetic on ≤ k elements.
    */
  def kmvSetOps(a: DataFrame, b: DataFrame, keyCol: String, k: Int,
                salt: String): DataFrame = {
    val sa = kmvSketch(a, keyCol, k, salt).withColumnRenamed("sketch", "sk_a")
    val sb = kmvSketch(b, keyCol, k, salt).withColumnRenamed("sketch", "sk_b")
    val u = slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, k)
    def frac(name: String, m: Column) =
      expr(s"CAST((CAST($name AS DECIMAL(38,0)) * est_union) div " +
        "greatest(size(__u), 1) AS BIGINT)")
    sa.crossJoin(sb)
      .withColumn("__u", u)
      .withColumn("__mi", size(filter(col("__u"), v =>
        array_contains(col("sk_a"), v) && array_contains(col("sk_b"), v)))
        .cast("long"))
      .withColumn("__ma", size(filter(col("__u"), v =>
        array_contains(col("sk_a"), v) && !array_contains(col("sk_b"), v)))
        .cast("long"))
      .withColumn("__mb", size(filter(col("__u"), v =>
        !array_contains(col("sk_a"), v) && array_contains(col("sk_b"), v)))
        .cast("long"))
      .withColumn("est_a", kmvEst("sk_a", k))
      .withColumn("est_b", kmvEst("sk_b", k))
      .withColumn("est_union", kmvEst("__u", k))
      .withColumn("est_intersect", frac("__mi", col("__mi")))
      .withColumn("est_a_not_b", frac("__ma", col("__ma")))
      .withColumn("est_b_not_a", frac("__mb", col("__mb")))
      .select(col("est_a"), col("est_b"), col("est_union"),
        col("est_intersect"), col("est_a_not_b"), col("est_b_not_a"))
  }
}
