package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Product-quantization ANN: code-range invariants, trained-codebook
  * recall against the exact within-cluster search, rerank exactness, and
  * the plan-shape guarantees (no cartesian, cluster equi-join below the
  * bounded shortlist aggregate).
  */
class PqOpsSpec extends SparkSuite {

  private val dim = 64

  private def split(df: org.apache.spark.sql.DataFrame) =
    (df.filter(col("vec_id") >= 10), df.filter(col("vec_id") < 10))

  test("codes are m-length arrays in [0, k) and codebooks have k entries of dim/m") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val (corpus, _) = split(emb)
    val books = PqOps.codebooks(corpus, "vec_id", "embedding", dim,
      m = 4, k = 8, iters = 1)
    assert(books.size == 4)
    assert(books.forall(b => b.size == 8 && b.forall(_.size == dim / 4)))
    val codes = corpus.select(
      PqOps.encode("embedding", books, dim).as("codes")).collect()
    assert(codes.forall { r =>
      val c = r.getSeq[Int](0)
      c.size == 4 && c.forall(x => x >= 0 && x < 8)
    })
  }

  test("trained IVF+PQ: rerank scores are exact cosine and recall@3 beats chance") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val (corpus, queries) = split(emb)
    val pq = PqOps.ivfPqTopK(corpus, queries, "vec_id", "embedding", "label",
      dim, m = 4, codebookK = 8, iters = 1, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // ground truth: the EXACT top-3 within the same cluster restriction
    val exact = EmbeddingOps.ivfTopK(corpus, queries, "vec_id", "embedding",
      "label", k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // every PQ score must equal the exact cosine for that pair (rerank is
    // exact on the shortlist; only MEMBERSHIP is approximate)
    pq.foreach { case ((q, n), s) =>
      exact.get((q, n)).foreach(es => assert(es == s,
        s"rerank score for ($q,$n) is $s but exact is $es"))
    }
    // shortlist membership recall: 4×8-entry codebooks are 12 bits/vector
    // over ~50-member clusters of near-random synthetic embeddings — hard
    // mode for PQ. Chance recall for a random 9-wide shortlist is ~0.18;
    // require clearly above that, and require the REAL quality lever
    // (oversample) to move it: a 30-wide shortlist must recall more.
    val recall = exact.keySet.count(pq.contains).toDouble / exact.size
    assert(recall >= 0.4, s"trained IVF+PQ recall@3 $recall below 0.4")
    val pqWide = PqOps.ivfPqTopK(corpus, queries, "vec_id", "embedding",
      "label", dim, m = 4, codebookK = 8, iters = 1, k = 3, oversample = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recallWide = exact.keySet.count(pqWide.contains).toDouble / exact.size
    assert(recallWide > recall && recallWide >= 0.7,
      s"oversample 3→10 must lift recall: $recall → $recallWide")
  }

  test("PQ recall curve is monotone in oversample per query and rises on average") {
    val df = graft.SparkEntry.queries("embed_pq_recall")(spark, sf("sf0.001"))
    val rows = df.collect().map(r =>
      (r.getAs[Number]("query_id").longValue,
        r.getAs[Number]("oversample").intValue, r.getAs[Double]("recall")))
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rs) =>
      val byOs = rs.map(r => r._2 -> r._3).toMap
      assert(byOs.keySet == Set(1, 3, 10), s"query $q missing oversample rows")
      assert(byOs(1) <= byOs(3) && byOs(3) <= byOs(10),
        s"query $q recall not monotone in oversample: $byOs")
    }
    val avg1 = rows.filter(_._2 == 1).map(_._3).sum / byQuery.size
    val avg10 = rows.filter(_._2 == 10).map(_._3).sum / byQuery.size
    assert(avg10 > avg1,
      s"oversample must buy recall: avg@1 $avg1 vs avg@10 $avg10")
  }

  test("ivfPqTopK plans the cluster equi-join below the shortlist aggregate, no cartesian") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val (corpus, queries) = split(emb)
    val df = PqOps.ivfPqTopK(corpus, queries, "vec_id", "embedding", "label",
      dim, m = 4, codebookK = 8, iters = 0, k = 3)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"PQ path plans an unbucketed product:\n${p.take(2000)}")
    assert(!p.contains("Window"), "shortlist must stay the bounded aggregate")
    val lines = p.linesIterator.toVector
    val joinIdx = lines.indexWhere(l =>
      l.contains("BroadcastHashJoin") && l.contains("__qc"))
    assert(joinIdx >= 0, s"cluster equi-join missing:\n${p.take(3000)}")
    val aggIdx = lines.indexWhere(_.contains("Aggregate"))
    assert(aggIdx >= 0 && aggIdx < joinIdx,
      "the ADC shortlist aggregation must sit above the cluster equi-join")
  }
}
