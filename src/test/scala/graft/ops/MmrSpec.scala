package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** MMR diversification properties over hand-built candidate pools:
  * pure-relevance first pick, redundancy penalty actually reorders
  * (the near-duplicate of the top hit is NOT second despite second-best
  * relevance), integer score arithmetic, per-query independence.
  */
class MmrSpec extends SparkSuite {
  import spark.implicits._

  test("near-duplicate of the top hit is deferred; diverse hit promoted") {
    // rel: d1=900, d2=890 (near-dup of d1, sim 980), d3=700 (diverse)
    val cands = Seq((0L, 1L, 900L), (0L, 2L, 890L), (0L, 3L, 700L))
      .toDF("query_id", "vec_id", "rel_milli")
    val sims = Seq(
      (0L, 1L, 2L, 980L), (0L, 2L, 1L, 980L),
      (0L, 1L, 3L, 100L), (0L, 3L, 1L, 100L),
      (0L, 2L, 3L, 120L), (0L, 3L, 2L, 120L))
      .toDF("query_id", "id_a", "id_b", "sim_milli")
    val out = EmbeddingOps.mmrSelect(cands, sims, "query_id", "vec_id",
        "rel_milli", "sim_milli", k = 3)
      .orderBy("rank").collect()
    // rank 1: d1 pure relevance, mmr = 7·900
    assert(out(0).getLong(2) == 1L && out(0).getLong(3) == 6300L)
    // rank 2: d2 scores 7·890−3·980 = 3290 < d3's 7·700−3·100 = 4600
    assert(out(1).getLong(2) == 3L && out(1).getLong(3) == 4600L)
    // rank 3: the near-dup finally enters
    assert(out(2).getLong(2) == 2L && out(2).getLong(3) == 3290L)
  }

  test("queries are independent; ties break by id ascending") {
    val cands = Seq(
      (0L, 5L, 500L), (0L, 4L, 500L),
      (1L, 9L, 800L), (1L, 8L, 100L))
      .toDF("query_id", "vec_id", "rel_milli")
    val sims = Seq(
      (0L, 4L, 5L, 0L), (0L, 5L, 4L, 0L),
      (1L, 8L, 9L, 0L), (1L, 9L, 8L, 0L))
      .toDF("query_id", "id_a", "id_b", "sim_milli")
    val out = EmbeddingOps.mmrSelect(cands, sims, "query_id", "vec_id",
        "rel_milli", "sim_milli", k = 2)
      .orderBy("query_id", "rank").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq((0L, 1, 4L), (0L, 2, 5L), (1L, 1, 9L), (1L, 2, 8L)))
  }

  test("missing pair similarity means no penalty, not disqualification") {
    // d3 has NO sims row against anything — an incomplete pool. It must
    // be treated as maximally diverse (penalty 0) and still selectable,
    // and the result must have all k rows.
    val cands = Seq((0L, 1L, 900L), (0L, 2L, 890L), (0L, 3L, 200L))
      .toDF("query_id", "vec_id", "rel_milli")
    val sims = Seq((0L, 1L, 2L, 980L), (0L, 2L, 1L, 980L))
      .toDF("query_id", "id_a", "id_b", "sim_milli")
    val out = EmbeddingOps.mmrSelect(cands, sims, "query_id", "vec_id",
        "rel_milli", "sim_milli", k = 3)
      .orderBy("rank").collect()
    assert(out.length == 3)
    // rank 2: d3 scores 7·200−3·0 = 1400 < d2's 7·890−3·980 = 3290 —
    // d2 wins round 2 on score, but d3 is PRESENT and lands rank 3
    // with zero penalty (the old inner join dropped it entirely).
    assert(out(1).getLong(2) == 2L && out(1).getLong(3) == 3290L)
    assert(out(2).getLong(2) == 3L && out(2).getLong(3) == 1400L)
  }
}
