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
}
