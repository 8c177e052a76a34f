package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN — the 100 TB MEMORY lever the scalar-int8
  * path ([[EmbeddingOps.quantizedTopK]]) cannot reach. The embedding is
  * split into `m` contiguous subspaces; each subspace gets its own k-entry
  * codebook ([[KMeansOps.trainCentroids]] on a `slice()` of the vector);
  * every corpus vector is then stored as `m` SMALL INTEGER CODES (m bytes
  * at k ≤ 256) instead of `dim` floats — 64 × 4-byte floats become 4 codes,
  * a 64× reduction, which is what makes a trillion-vector index fit in
  * cluster memory at all (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011 — public literature, the method FAISS
  * popularized).
  *
  * Query scoring is classic ADC (asymmetric distance computation): per
  * query, ONE lookup table of m × k inner products against the codebook
  * (m·k sub-dim dots = the cost of scoring k full vectors), after which
  * every candidate scores in m ARRAY LOOKUPS + m adds — no per-candidate
  * float vector is ever read. Composed with the IVF cluster restriction
  * exactly like [[EmbeddingOps.ivfQuantizedTopK]]: the candidate join is
  * an equi-join on the coarse cluster id BELOW the bounded top-k
  * aggregate, so the scan touches nprobe/clusters of the corpus AND reads
  * m bytes per row — both scale levers compose. Exact float cosine reruns
  * only on the k·oversample shortlist.
  *
  * Engine-exactness (the repo-wide discipline): vectors quantize to the
  * 1e-6 integer grid ([[KMeansOps]]'s grid), codebook training is the
  * derandomized integer Lloyd's, codes are integer argmins (ties → lowest
  * cid), ADC scores are exact integer sums, and both top-k selections
  * tie-break on id — a SQL oracle replays the identical shortlist,
  * rerank, and ranking (the `embed_ann_ivf_pq` driver row does, at
  * iters=0 where the codebook is the hash-seeded subvectors themselves).
  *
  * Reference anchor: the reference has no ANN at all (SURVEY.md §2.10 —
  * its similarity surface is the CNN scoring path); this family is part
  * of the beyond-reference LLM-data-pipeline mandate.
  */
object PqOps {

  /** Must match [[KMeansOps]]'s quantization grid — codebooks train there. */
  private val Q = 1e6

  private def qz(v: Column): Column =
    transform(v, x => floor(x.cast("double") * Q + lit(0.5)).cast("long"))

  /** One codebook per subspace: subspace `s` covers dims
    * [s·dim/m, (s+1)·dim/m) and trains its own k centroids with its own
    * seed salt (`"pq<s>:"`), so the m codebooks are independent. Result is
    * m × k × (dim/m) longs on the driver — k·dim total, broadcastable as
    * literals into any scan regardless of corpus size.
    */
  def codebooks(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
                m: Int, k: Int, iters: Int,
                salt: String = "pq"): Seq[Seq[Seq[Long]]] = {
    require(m > 0 && dim % m == 0, s"dim $dim must split into $m subspaces")
    val sub = dim / m
    (0 until m).map { s =>
      KMeansOps.trainCentroids(corpus, idCol,
        slice(col(vecCol), s * sub + 1, sub), k, iters, s"$salt$s:")
    }
  }

  /** The m-length code array for one vector column: per subspace, the
    * fused integer-argmin against that subspace's codebook literal (the
    * [[KMeansOps]] assignment shape — no n·k intermediate, zero
    * exchanges, ties to the lowest code). This IS the compressed index
    * representation: store this array, drop the floats.
    */
  def encode(vecCol: String, books: Seq[Seq[Seq[Long]]], dim: Int): Column = {
    val m = books.size
    val sub = dim / m
    array((0 until m).map { s =>
      val cents = array(books(s).map(v => array(v.map(lit): _*)): _*)
      val sv = qz(slice(col(vecCol), s * sub + 1, sub))
      val ds = transform(cents, cv =>
        aggregate(zip_with(sv, cv, (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
      (array_position(ds, array_min(ds)) - 1).cast("int")
    }: _*)
  }

  /** The per-query ADC lookup table: m × k exact integer inner products
    * of the query's quantized subvectors against the codebook. Computed
    * once per QUERY (m·k·(dim/m) = k·dim multiplies — the cost of scoring
    * k full vectors), amortized over every candidate it meets.
    */
  private def adcLut(vecCol: String, books: Seq[Seq[Seq[Long]]],
                     dim: Int): Column = {
    val m = books.size
    val sub = dim / m
    array((0 until m).map { s =>
      val sv = qz(slice(col(vecCol), s * sub + 1, sub))
      array(books(s).map { cv =>
        aggregate(zip_with(sv, array(cv.map(lit): _*), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x)
      }: _*)
    }: _*)
  }

  /** The ADC-ranked shortlist: codebook training, corpus encoding, the
    * cluster-restricted candidate join, ADC scoring, and the bounded
    * top-`width` selection — everything in the compressed domain.
    *
    *  - candidates: equi-join corpus codes × broadcast queries on the
    *    coarse `clusterCol` (scan fraction 1/clusters, like
    *    [[EmbeddingOps.ivfTopK]]);
    *  - ADC score: `Σ_s lut[s][code_s]` — m element_at lookups + m adds
    *    per candidate, an exact integer (zip_with over the code array and
    *    the LUT, both length m);
    *  - selection: bounded [[EmbeddingOps.TopKAgg]] at `width`
    *    (score desc, id asc).
    *
    * Output (query_id, rank, neighbor_id, score): `rank` is the ADC rank,
    * which is what the recall curve rank-filters per oversample setting —
    * the ADC scan runs ONCE at the widest shortlist.
    */
  def adcShortlist(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, clusterCol: String, dim: Int, m: Int,
                   codebookK: Int, iters: Int, width: Int): DataFrame = {
    val books = codebooks(corpus, idCol, vecCol, dim, m, codebookK, iters)
    val enc = corpus.select(col(idCol), col(clusterCol).as("__cc"),
      encode(vecCol, books, dim).as("__codes"))
    val q = queries.select(col(idCol).as("query_id"),
      col(clusterCol).as("__qc"), adcLut(vecCol, books, dim).as("__lut"))
    val scored = enc.join(broadcast(q), col("__cc") === col("__qc"))
      .withColumn("score",
        aggregate(zip_with(col("__codes"), col("__lut"),
            (code, row) => element_at(row, code + 1)),
          lit(0L), (acc, x) => acc + x).cast("double"))
    EmbeddingOps.takeTopK(scored, idCol, width)
  }

  /** Exact float-cosine rerank of a (query_id, neighbor_id) shortlist:
    * joins the float vectors back for the SHORTLIST ONLY (k·oversample
    * rows per query — the only point in the PQ path that touches a float
    * vector per candidate), scores rounded to `roundDigits`, final
    * bounded top-k. Same tail as the scalar-quantized path.
    */
  def rerankExact(shortlist: DataFrame, corpus: DataFrame,
                  queries: DataFrame, idCol: String, vecCol: String,
                  k: Int, roundDigits: Int = 4): DataFrame = {
    val scale = math.pow(10, roundDigits)
    val rerank = shortlist.select(col("query_id"), col("neighbor_id"))
      .join(corpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("__cv")), "neighbor_id")
      .join(broadcast(queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("__qv"))), "query_id")
      .withColumn("score",
        floor(EmbeddingOps.cosine(col("__qv"), col("__cv")) * scale + lit(0.5)) / scale)
    EmbeddingOps.takeTopK(rerank, "neighbor_id", k)
  }

  /** IVF + PQ top-k — the full compressed-index query path as one lazy
    * plan: [[adcShortlist]] at k·oversample, then [[rerankExact]] down
    * to the final rank ≤ k.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, clusterCol: String, dim: Int, m: Int,
                codebookK: Int, iters: Int, k: Int, oversample: Int = 3,
                roundDigits: Int = 4): DataFrame = {
    val shortlist = adcShortlist(corpus, queries, idCol, vecCol, clusterCol,
      dim, m, codebookK, iters, width = k * oversample)
    rerankExact(shortlist, corpus, queries, idCol, vecCol, k, roundDigits)
  }
}
