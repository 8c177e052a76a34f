package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity-search operators over an `array<float>` embedding
  * column: brute-force cosine top-k as the exact baseline, and an
  * IVF-style bucketed variant as the scale path (probe only the coarse
  * cluster(s) instead of the full corpus).
  *
  * All arithmetic is higher-order-function expressions (`zip_with` +
  * `aggregate`) over double-cast elements — codegen'd, no UDFs. The
  * brute-force path broadcasts the (small) query set so the corpus is
  * scanned exactly once with no shuffle; the top-k is a per-query window
  * over (corpus × queries) rows, which partial-aggregates before the
  * final shuffle when expressed as `min_by`-style selection. At 100 TB the
  * bucketed variant turns the cross product into an equi-join on the
  * cluster id, cutting the scanned fraction to 1/clusters per query.
  */
object EmbeddingOps {

  /** Σ aᵢ·bᵢ over double-cast elements, sequential left fold — identical
    * evaluation order in any engine that folds arrays left-to-right.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact brute-force cosine top-k: for every query row, the k nearest
    * corpus rows (query set must be small — it is broadcast).
    * Deterministic tie-break on (score desc, corpus id asc) after rounding
    * `score` to `roundDigits` so float noise can't reorder ranks.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, roundDigits: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scale = math.pow(10, roundDigits)
    val scored = corpus.join(broadcast(q))
      .withColumn("score",
        floor(cosine(col("__qv"), col(vecCol)) * scale + lit(0.5)) / scale)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol).as("neighbor_id"), col("score"))
  }

  /** IVF-style approximate top-k: identical scoring, but candidates are
    * restricted to the query's coarse cluster (`clusterCol`), turning the
    * broadcast cross product into an equi-join on the cluster id.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, clusterCol: String, k: Int,
              roundDigits: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      col(clusterCol).as("__qc"))
    val scale = math.pow(10, roundDigits)
    val scored = corpus.join(broadcast(q), col(clusterCol) === col("__qc"))
      .withColumn("score",
        floor(cosine(col("__qv"), col(vecCol)) * scale + lit(0.5)) / scale)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol).as("neighbor_id"), col("score"))
  }
}
