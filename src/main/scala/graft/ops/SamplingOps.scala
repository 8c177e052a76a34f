package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus-scale data. Both operators avoid the
  * two classic scale failures: RNG sampling (irreproducible across
  * retries/engines) and per-stratum sort windows (every row shuffles into
  * #strata partitions — a few-reducer bottleneck when strata are few and
  * rows are billions).
  */
object SamplingOps {

  /** Salted 60-bit md5 hash of a column's string form — the shared
    * deterministic randomness source (reproducible in any engine).
    */
  def hash60(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Keep ~`percent`% of rows: hash-threshold at the scan, no shuffle. */
  def hashSample(df: DataFrame, keyCol: Column, percent: Int,
                 salt: String = "smp:"): DataFrame =
    df.filter(pmod(hash60(keyCol, salt), lit(100L)) < percent)

  /** Bounded min-k aggregate over (hash, id, payload) triples, ordered by
    * (hash asc, id asc): each task keeps only its k best rows per group
    * (map-side partial), so the shuffle moves ≤ k·tasks rows per stratum
    * instead of the whole stratum — the same bounded-buffer shape as
    * [[EmbeddingOps.TopKAgg]].
    */
  class MinKAgg(k: Int)
      extends Aggregator[(Long, Long, Long), Seq[(Long, Long, Long)], Seq[(Long, Long, Long)]] {
    private def trim(s: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
      s.sortBy(t => (t._1, t._2)).take(k)
    override def zero: Seq[(Long, Long, Long)] = Seq.empty
    override def reduce(b: Seq[(Long, Long, Long)], a: (Long, Long, Long)): Seq[(Long, Long, Long)] = {
      val appended = b :+ a
      if (appended.size >= 2 * k) trim(appended) else appended
    }
    override def merge(x: Seq[(Long, Long, Long)], y: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
      trim(x ++ y)
    override def finish(r: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = trim(r)
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()
  }

  /** Exactly `k` rows per stratum, chosen by hash order: one aggregation
    * with O(k) per-task state. Output: (stratum, id, payload, pick) where
    * pick = 1..k in hash order.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       payloadCol: String, k: Int,
                       salt: String = "str:"): DataFrame = {
    val minK = udaf(new MinKAgg(k))
    df.select(col(stratumCol), hash60(col(idCol), salt).as("__h"),
        col(idCol).cast("long").as("__id"), col(payloadCol).cast("long").as("__p"))
      .groupBy(col(stratumCol))
      .agg(minK(col("__h"), col("__id"), col("__p")).as("__top"))
      .select(col(stratumCol), posexplode(col("__top")).as(Seq("__pos", "__item")))
      .select(col(stratumCol), col("__item._2").as(idCol),
        col("__item._3").as(payloadCol),
        (col("__pos") + 1).cast("long").as("pick"))
  }

  /** Bounded min-k over (key: Double, id: Long) pairs, ordered by
    * (key asc, id asc) — the Double-keyed sibling of [[MinKAgg]], same
    * O(k)-per-task partial shape.
    */
  class MinKDoubleAgg(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy(t => (t._1, t._2)).take(k)
    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
      val appended = b :+ a
      if (appended.size >= 2 * k) trim(appended) else appended
    }
    override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(x ++ y)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Dataset-mixture sampling: each source is re-weighted to its
    * configured rate (the "mix Wikipedia at 3×, CommonCrawl at 0.2×" step
    * of every pre-training recipe). Rates BELOW 1 down-sample by the
    * deterministic hash threshold ([[hashSample]] mechanics — scan-level
    * filter, no RNG); rates ABOVE 1 up-sample by replication:
    * `floor(rate)` copies of every row plus one more for the hash-chosen
    * fractional share, with a `copy` index (1..n) distinguishing the
    * replicas downstream. Sources absent from `rates` drop entirely.
    */
  def mixtureSample(df: DataFrame, keyCol: Column, srcCol: Column,
                    rates: Map[String, Double],
                    salt: String = "mix:"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // integer ppm thresholds for the FRACTIONAL part, rounded ONCE on the
    // driver — `0.3 * 1e6` truncates to 299999 under double-then-cast,
    // while decimal engines get 300000; rounding here keeps every engine
    // on the same threshold
    val rdf = rates.toSeq.map { case (s, r) =>
      require(r >= 0, s"negative rate for $s")
      (s, math.floor(r).toLong, math.round((r - math.floor(r)) * 1e6))
    }.toDF("__src", "__base", "__thr")
    df.join(broadcast(rdf), srcCol === col("__src"))
      .withColumn("__n", col("__base") +
        when(pmod(hash60(keyCol, salt), lit(1000000L)) < col("__thr"), 1L)
          .otherwise(0L))
      .filter(col("__n") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("__n"))))
      .drop("__src", "__base", "__thr", "__n")
  }

  /** TEMPERATURE-scaled mixture sampling (the T5/LLaMA-family source
    * re-balancing step): per-source keep probabilities derived FROM the
    * corpus itself — p_src ∝ n_src^α with α = 0.5 — so over-represented
    * sources are down-sampled toward a `targetRows`-sized mix and rare
    * sources keep proportionally more. α is fixed at 0.5 because sqrt
    * is the one fractional power IEEE 754 defines correctly rounded:
    * every engine computes the identical weight, where a generic
    * `pow(n, α)` could drift in the last ulp. All downstream arithmetic
    * is INTEGER (milli-sqrt weights, ppm thresholds via integer
    * division), so the rates — not just the sampled set — are
    * engine-exact.
    *
    * Scale shape: one tiny per-source aggregate (≤ #sources rows,
    * broadcast back), then the same scan-side hash-threshold filter as
    * [[hashSample]] — no shuffle of the corpus, prunable at the scan.
    * The ppm ratio is computed in DECIMAL(38,0): the int64 route
    * overflows much earlier than it looks (numerator targetRows·√n·10⁹
    * — the milli-sqrt weight already carries a 10³ — wraps at
    * n ≈ 8.5·10⁹ rows for targetRows = 10⁵, and the denominator
    * sumw·n wraps even sooner), and Spark long multiplication wraps
    * SILENTLY into a garbage sample. 38 digits hold the numerator
    * through targetRows ≈ 10¹⁸ at n ≈ 10¹⁹; if either product ever
    * exceeds that, the explicit null-guard fails the job loudly
    * instead of sampling from wrapped rates.
    */
  def temperatureMixture(df: DataFrame, keyCol: Column, srcCol: Column,
                         targetRows: Long, salt: String = "tmp:"): DataFrame = {
    val counts = df.groupBy(srcCol.as("__src"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n")) * 1000 + lit(0.5)).cast("long"))
    val tot = counts.agg(sum(col("__w")).as("__sumw"))
    val ppmRaw = expr(
      s"(CAST($targetRows AS DECIMAL(38,0)) * __w * 1000000) div " +
        "(CAST(__sumw AS DECIMAL(38,0)) * __n)")
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("__ppm", least(lit(1000000L),
        when(ppmRaw.isNull, raise_error(lit(
          "temperatureMixture: ppm ratio overflowed DECIMAL(38,0)")))
          .otherwise(ppmRaw)))
      .select(col("__src"), col("__n"), col("__ppm"))
    df.join(broadcast(rates), srcCol === col("__src"))
      .filter(pmod(hash60(keyCol, salt), lit(1000000L)) < col("__ppm"))
      .withColumnRenamed("__ppm", "ppm")
      .withColumnRenamed("__n", "src_total")
      .drop("__src")
  }

  /** UniMax epoch-capped language sampling (Chung et al. 2023) — the
    * published successor to temperature mixing for multilingual
    * corpora: instead of a power-law compromise, give every language
    * an EQUAL share of the row budget, capped at `maxEpochs` passes
    * over its data (so a tiny language is never repeated into
    * memorization, and the budget it can't absorb flows to the
    * remaining languages). The greedy: sources ascending by size
    * (name-tie-broken), each takes min(maxEpochs·n, remaining budget /
    * remaining sources).
    *
    * The greedy runs on the driver over the per-source count table —
    * BOUNDED at one row per source (`maxSources` guard fails loudly on
    * a non-categorical source column), the KMeansOps/pageRank
    * driver-model posture — in BigInt, so nothing wraps. Sampling is
    * then the scan-side integer idiom shared with [[mixtureSample]]:
    * rate_ppm = alloc·10⁶ div n, whole epochs as copies, the
    * fractional epoch as a salted-hash ppm threshold — every rate an
    * exact integer a SQL oracle replays (the greedy unrolls as a
    * recursive CTE).
    *
    * Output: input rows (possibly repeated with `copy` = 1..epochs)
    * plus `src_total`, `alloc_rows`, `rate_ppm`.
    */
  def unimaxSample(df: DataFrame, keyCol: Column, srcCol: Column,
                   budgetRows: Long, maxEpochs: Int, salt: String = "umx:",
                   maxSources: Int = 10000): DataFrame = {
    require(budgetRows >= 0, s"negative budget $budgetRows")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(srcCol.as("__src"))
      .agg(count(lit(1)).as("__n"))
      .limit(maxSources + 1).collect()
    require(counts.length <= maxSources,
      s"unimaxSample saw more than $maxSources sources — the source " +
        "column looks non-categorical; the greedy is a driver-side " +
        "per-source table by design (raise maxSources deliberately)")
    val sorted = counts.map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (s, n) => (n, s) }
    var rem = BigInt(budgetRows)
    var left = sorted.length
    val rates = sorted.map { case (s, n) =>
      val quota = if (left == 0) BigInt(0) else rem / left
      val alloc = (BigInt(maxEpochs) * n).min(quota)
      rem -= alloc
      left -= 1
      (s, n, alloc.toLong, (alloc * 1000000 / n).toLong)
    }.toSeq.toDF("__src", "src_total", "alloc_rows", "rate_ppm")
    df.join(broadcast(rates), srcCol === col("__src"))
      .withColumn("__copies", expr("rate_ppm div 1000000") +
        when(pmod(hash60(keyCol, salt), lit(1000000L)) <
          col("rate_ppm") % 1000000L, 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__src", "__copies")
  }

  /** LEAKAGE-SAFE train/valid/test assignment: the split key is the
    * registered DOMAIN, not the page — near-duplicate pages from one
    * site (boilerplate, mirrored articles, template families) land in
    * the SAME split, the published domain-disjoint eval-hygiene
    * practice for web corpora. Deterministic ppm thresholds over the
    * salted domain hash; disjointness holds BY CONSTRUCTION (one hash
    * per domain), and the query layer re-asserts it as a zero
    * cross-split count. Scan-side expression — no shuffle.
    */
  def splitByDomain(df: DataFrame, domainCol: Column, validPpm: Long,
                    testPpm: Long, salt: String = "split:"): DataFrame = {
    require(validPpm >= 0 && testPpm >= 0 && validPpm + testPpm <= 1000000L)
    val h = pmod(hash60(domainCol, salt), lit(1000000L))
    df.withColumn("split",
      when(h < testPpm, "test")
        .when(h < testPpm + validPpm, "valid")
        .otherwise("train"))
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis 2006),
    * derandomized: key_i = −ln(u_i)/w_i with u_i ∈ (0,1] derived from the
    * salted hash — the k smallest keys ARE the weighted sample, so the
    * whole thing is one bounded aggregation (O(k) per-task partials, no
    * global sort, no RNG state). Reproducible on any engine via the md5
    * idiom, exactly like [[hashSample]]. Weights must be positive —
    * enforced loudly: a zero/negative/null weight fails the job instead of
    * silently producing a -Inf/NaN key that scrambles the sample.
    *
    * Output: (id, pick) with pick = 1..k in key order.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
                     salt: String = "wsmp:"): DataFrame = {
    val minK = udaf(new MinKDoubleAgg(k))
    val u = (hash60(col(idCol), salt) + lit(1L)).cast("double") / lit(1.152921504606846976e18)
    val w = col(weightCol).cast("double")
    val wChecked = when(w > 0d, w).otherwise(raise_error(concat(
      lit(s"weightedSample: non-positive weight in '$weightCol' for id="),
      col(idCol).cast("string"))))
    df.select(col(idCol).cast("long").as("__id"),
        (-log(u) / wChecked).as("__key"))
      .agg(minK(col("__key"), col("__id")).as("__top"))
      .select(posexplode(col("__top")).as(Seq("__pos", "__item")))
      .select(col("__item._2").as(idCol),
        (col("__pos") + 1).cast("long").as("pick"))
  }
}
