package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics over the crawl: distributed PageRank with EXACT
  * INTEGER state — the standard page/domain quality signal (the original
  * use of the link graph in web curation) computed so that any engine
  * replays it bit-for-bit.
  *
  * Every rank lives in integer micro-units. Per iteration:
  *  - each node sends `⌊p·d / (100·outdeg)⌋` along each out-edge
  *    (d = damping in percent; all-positive integer division, so
  *    truncation == floor on any engine);
  *  - dangling mass (nodes with no out-edges) is pooled and shared:
  *    `⌊Σp_dangling·d / (100·N)⌋` to every node — ONE driver scalar per
  *    iteration, the [[KMeansOps]] "driver holds the scalar" posture;
  *  - every node restarts with `⌊10⁶·(100−d)/100⌋` teleport mass.
  *
  * Rounding leaks a few micro-units of mass per node per iteration
  * (floor) — deliberately: exactness of the replay beats exact mass
  * conservation for a RANKING signal.
  *
  * Scale shape: one shuffle keyed by src (rank join), one keyed by dst
  * (inflow agg), one bounded scalar agg per iteration; ranks persist
  * per iteration and the previous iteration unpersists — lineage stays
  * flat. No window, no collect beyond the dangling scalar.
  */
object GraphOps {

  /** @param edges (srcCol, dstCol) — multi-edges count multiply, self
    *   loops allowed
    * @return (node, p) for every node appearing as src or dst; p in
    *   micro-units, initial mass 10⁶ per node
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 5, dampingPct: Int = 85): DataFrame = {
    require(dampingPct > 0 && dampingPct < 100, "damping is a percentage")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).persist()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).persist()
    val teleport = 1000000L * (100 - dampingPct) / 100
    var p = nodes.withColumn("p", lit(1000000L)).persist()
    (1 to iters).foreach { _ =>
      val contribs = e
        .join(p.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst"),
          expr(s"(p * $dampingPct) div (100 * outdeg)").as("c"))
      val inflow = contribs.groupBy(col("dst")).agg(sum(col("c")).as("in"))
      val dangling = p
        .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("p")), lit(0L)).as("d")).head.getLong(0)
      val share = dangling * dampingPct / (100L * n)
      val next = nodes
        .join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(teleport + share) + coalesce(col("in"), lit(0L))).as("p"))
        .persist()
      next.count() // materialize before dropping the previous iteration
      p.unpersist()
      p = next
    }
    e.unpersist(); outdeg.unpersist()
    p
  }

  /** HITS (Kleinberg 1999) hubs & authorities with EXACT INTEGER state
    * — the second classic link-quality signal (authorities ≈ good
    * content pages, hubs ≈ good link pages; curation uses the authority
    * side much like PageRank). Per iteration:
    *  - raw authority `Σ hub(u)` over in-edges, then rescale to
    *    `⌊a_raw · 10⁶ / max a_raw⌋` (L∞ normalization — scale-free like
    *    the classic L2 but exactly replayable in integers);
    *  - raw hub `Σ auth(v)` over out-edges, rescaled the same way.
    * The rescale ratio is computed in DECIMAL(38,0): a_raw is bounded
    * by n·10⁶, so the ×10⁶ numerator would wrap int64 silently past
    * n ≈ 9·10⁶ nodes (the temperatureMixture lesson).
    *
    * Scale shape: per iteration one shuffle keyed by dst (authority
    * agg), one keyed by src (hub agg), and ONE driver scalar (the max)
    * each — the [[pageRank]] posture; state persists per iteration
    * with flat lineage.
    *
    * @return (node, auth, hub) in micro-units, hub init 10⁶
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 4): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).persist()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    def rescale(raw: DataFrame, keyCol: String, valCol: String): DataFrame = {
      val m = raw.agg(coalesce(max(col(valCol)), lit(1L))).head.getLong(0)
      nodes.join(raw.withColumnRenamed(keyCol, "node"), Seq("node"), "left")
        .select(col("node"), coalesce(
          expr(s"CAST((CAST($valCol AS DECIMAL(38,0)) * 1000000) div $m AS BIGINT)"),
          lit(0L)).as(valCol))
    }
    var h = nodes.withColumn("h", lit(1000000L)).persist()
    var a = nodes.withColumn("a", lit(0L)).persist()
    (1 to iters).foreach { _ =>
      val araw = e.join(h.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("h")).as("a"))
      val aNext = rescale(araw, "dst", "a").persist()
      // no explicit materialization action: the NEXT rescale's max-
      // scalar head computes through aNext and materializes its cache
      // before the previous generation unpersists
      val hraw = e.join(aNext.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src")).agg(sum(col("a")).as("h"))
      val hNext = rescale(hraw, "src", "h").persist()
      a.unpersist(); h.unpersist()
      a = aNext; h = hNext
    }
    val out = nodes.join(a, Seq("node")).join(h, Seq("node"))
      .select(col("node"), col("a").as("auth"), col("h").as("hub"))
    e.unpersist()
    out
  }
}
