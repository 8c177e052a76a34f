package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The hashed+quantized projection every scan of every iteration reads
    * (seeds, 2 scans per round, final assign): 1e-6 grid longs + the
    * derandomized seed hash. `vec` is a Column so a SLICE of the embedding
    * works too — [[PqOps]] trains one codebook per subspace this way.
    */
  private def quantized(emb: DataFrame, idCol: String, vec: Column,
                        salt: String): DataFrame =
    emb.select(col(idCol).cast("long").as("__id"),
      transform(vec, x => floor(x.cast("double") * Q + lit(0.5)).cast("long"))
        .as("__qv"),
      SamplingOps.hash60(col(idCol), salt).as("__h"))

  /** Fused argmin assignment of every row of `q` to its nearest centroid:
    * distances to all k centroids and the argmin are computed per row by
    * HOF expressions over the centroid array literal (ties break to the
    * smallest cid via FIRST position of the min), planning zero exchanges.
    */
  private def assignTo(q: DataFrame, c: Seq[(Int, Seq[Long])]): DataFrame = {
    val cents = array(c.sortBy(_._1).map { case (_, v) =>
      array(v.map(lit): _*)
    }: _*)
    q.withColumn("__ds", transform(cents, cv =>
        aggregate(zip_with(col("__qv"), cv, (a, b) => (a - b) * (a - b)),
          lit(0L), (s, x) => s + x)))
      .select(col("__id"),
        (array_position(col("__ds"), array_min(col("__ds"))) - 1)
          .cast("int").as("cid"),
        array_min(col("__ds")).as("__dist"))
  }

  /** Seed selection + `iters` Lloyd rounds over the persisted projection;
    * returns the final (cid, centroid) pairs. An emptied cluster keeps its
    * previous centroid.
    */
  private def lloyd(q: DataFrame, k: Int, iters: Int): Seq[(Int, Seq[Long])] = {
    var cents: Seq[(Int, Seq[Long])] = q.orderBy(col("__h"), col("__id")).limit(k)
      .select(col("__qv")).collect().toSeq
      .map(_.getSeq[Long](0)).zipWithIndex.map { case (v, i) => (i, v) }
    (1 to iters).foreach { _ =>
      val updated = q.join(assignTo(q, cents), "__id")
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
    cents
  }

  /** Final cluster assignment (idCol, cid) after `iters` Lloyd rounds
    * (assign → update, then one final assign against the last centroids).
    */
  def assignments(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                  iters: Int, salt: String = "km:"): DataFrame = {
    require(k > 0 && iters >= 0)
    val q = quantized(emb, idCol, col(vecCol), salt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = lloyd(q, k, iters)
    // materialize the (id, cid) result eagerly so q can be unpersisted here
    // rather than leaking the cache until the caller's first action
    val out = assignTo(q, cents).select(col("__id").as(idCol), col("cid"))
      .localCheckpoint(true)
    q.unpersist()
    out
  }

  /** [[assignments]] plus the squared distance to the chosen centroid
    * (1e-6 integer grid, Long-exact) — the PROTOTYPICALITY signal:
    * distance-to-centroid is the standard embedding-space outlier score
    * (mislabeled, off-distribution, or junk rows sit far from every
    * cluster), and because the whole k-means path is integer, the
    * outlier gate replays exactly.
    */
  def assignmentsWithDist(emb: DataFrame, idCol: String, vecCol: String,
                          k: Int, iters: Int,
                          salt: String = "km:"): DataFrame = {
    require(k > 0 && iters >= 0)
    val q = quantized(emb, idCol, col(vecCol), salt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = lloyd(q, k, iters)
    val out = assignTo(q, cents)
      .select(col("__id").as(idCol), col("cid"), col("__dist").as("dist"))
      .localCheckpoint(true)
    q.unpersist()
    out
  }

  /** The trained codebook itself, cid-ordered, on the 1e-6 integer grid —
    * what a product quantizer ([[PqOps]]) or an IVF index build wants:
    * k·dim longs on the driver, broadcastable as a literal into any
    * assignment or ADC scan. `vec` is a Column so callers can train on a
    * `slice()` of the embedding (one codebook per PQ subspace).
    */
  def trainCentroids(emb: DataFrame, idCol: String, vec: Column, k: Int,
                     iters: Int, salt: String): Seq[Seq[Long]] = {
    require(k > 0 && iters >= 0)
    val q = quantized(emb, idCol, vec, salt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = lloyd(q, k, iters)
    q.unpersist()
    cents.sortBy(_._1).map(_._2)
  }
}
