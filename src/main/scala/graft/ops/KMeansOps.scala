package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF coarse-quantizer training: deterministic Lloyd's k-means over the
  * embedding column. [[EmbeddingOps.ivfTopK]] probes a cluster id — this
  * is the operator that PRODUCES that id at scale, completing the ANN
  * story in-engine.
  *
  * Two deliberate design choices make it reproducible on any engine:
  *
  *  - '''derandomized init''': seeds are the k rows with the smallest
  *    salted md5 hash of their id (the [[SamplingOps.hash60]] source) —
  *    no RNG, same seeds everywhere.
  *  - '''integer arithmetic''': vectors and centroids are quantized to
  *    1e-6 grid longs, so distances are EXACT integer sums — immune to
  *    float summation order, which differs between Spark's ordered
  *    `aggregate` fold and SQL engines' unordered `sum` and would
  *    otherwise flip argmin ties. Centroid update keeps the sum an exact
  *    long and divides once (correctly rounded while per-cluster mass
  *    stays below 2^53) and re-quantizes.
  *
  * Scale shape: per iteration, one broadcast of k·dim longs to the
  * assignment scan (map-side, no shuffle), one hash aggregation of
  * (cid, dim) partial sums, and a k·dim collect to the driver — the same
  * driver-holds-model / data-parallel pattern as
  * [[graft.vesc.HeadTrainer]]. The assignment itself is a FUSED argmin
  * projection: distances to all k centroids and the argmin are computed
  * per row by HOF expressions over the centroid array literal, so no
  * n·k (id, cid, dist) intermediate ever materializes and the assign
  * step plans ZERO exchanges (the previous formulation exploded n·k
  * rows through a groupBy-min shuffle per iteration).
  */
object KMeansOps {

  private val Q = 1e6

  /** Final cluster assignment (idCol, cid) after `iters` Lloyd rounds
    * (assign → update, then one final assign against the last centroids).
    * An emptied cluster keeps its previous centroid.
    */
  def assignments(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                  iters: Int, salt: String = "km:"): DataFrame = {
    require(k > 0 && iters >= 0)
    val spark = emb.sparkSession
    import spark.implicits._
    // the hashed+quantized projection feeds every scan of every iteration
    // (seeds, 2 scans per round, final assign) — persist it once instead of
    // re-running md5 + per-element quantization each time
    val q = emb.select(col(idCol).cast("long").as("__id"),
      transform(col(vecCol), x => floor(x.cast("double") * Q + lit(0.5)).cast("long"))
        .as("__qv"),
      SamplingOps.hash60(col(idCol), salt).as("__h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var cents: Seq[(Int, Seq[Long])] = q.orderBy(col("__h"), col("__id")).limit(k)
      .select(col("__qv")).collect().toSeq
      .map(_.getSeq[Long](0)).zipWithIndex.map { case (v, i) => (i, v) }

    def assign(c: Seq[(Int, Seq[Long])]): DataFrame = {
      // centroids ordered by cid as one array literal; per-row distances
      // via transform + the integer dot idiom, argmin via array_position
      // of the min (FIRST position → ties break to the smallest cid,
      // identical to the previous min(struct(dist, cid)) semantics)
      val cents = array(c.sortBy(_._1).map { case (_, v) =>
        array(v.map(lit): _*)
      }: _*)
      q.withColumn("__ds", transform(cents, cv =>
          aggregate(zip_with(col("__qv"), cv, (a, b) => (a - b) * (a - b)),
            lit(0L), (s, x) => s + x)))
        .select(col("__id"),
          (array_position(col("__ds"), array_min(col("__ds"))) - 1)
            .cast("int").as("cid"))
    }

    (1 to iters).foreach { _ =>
      val updated = q.join(assign(cents), "__id")
        .select(col("cid"), posexplode(col("__qv")).as(Seq("__i", "__x")))
        .groupBy(col("cid"), col("__i"))
        .agg(floor(sum(col("__x")).cast("double") / count(lit(1)) + lit(0.5))
          .cast("long").as("__cx"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
        }
      cents = cents.map { case (cid, old) => (cid, updated.getOrElse(cid, old)) }
    }
    // materialize the (id, cid) result eagerly so q can be unpersisted here
    // rather than leaking the cache until the caller's first action
    val out = assign(cents).select(col("__id").as(idCol), col("cid"))
      .localCheckpoint(true)
    q.unpersist()
    out
  }
}
