package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Min-label propagation vs a local union-find on the same edge sets. */
class ConnectedComponentsSpec extends SparkSuite {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  private def run(edges: Seq[(Long, Long)], checkEvery: Int = 8,
                  maxRounds: Int = 64): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    DedupOps.connectedComponents(df, "a", "b", checkEvery, maxRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two cliques and a chain resolve to union-find components") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (1, 3),            // triangle
      (10, 11), (11, 12),                // path
      (20, 21), (21, 22), (22, 23), (23, 24), (24, 25)) // chain, diameter 5
    assert(run(edges) == unionFind(30, edges))
  }

  test("bridge edge merges two cliques into one component") {
    val cliqueA = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val cliqueB = for (i <- 30L to 33L; j <- (i + 1) to 33L) yield (i, j)
    val edges = cliqueA ++ cliqueB ++ Seq((3L, 30L))
    val got = run(edges)
    assert(got.values.toSet == Set(0L), "all vertices collapse to min id 0")
  }

  test("propagation is converged: extra rounds change nothing") {
    val edges = Seq[(Long, Long)]((5, 6), (6, 7), (8, 9))
    assert(run(edges, checkEvery = 4) == run(edges, checkEvery = 9))
  }

  test("chain longer than the check batch still merges fully (convergence guard)") {
    // a 21-node path: diameter 20 > checkEvery=8 — the old fixed-8-round
    // implementation left the far end labeled > min; the convergence check
    // must keep propagating until one component remains
    val edges = (100L until 120L).map(i => (i, i + 1))
    val got = run(edges, checkEvery = 8, maxRounds = 64)
    assert(got.values.toSet == Set(100L), s"single component expected: $got")
    assert(got == unionFind(121, edges))
  }

  test("maxRounds too small for the diameter fails loudly, not wrongly") {
    val edges = (200L until 215L).map(i => (i, i + 1)) // diameter 15
    val ex = intercept[IllegalArgumentException] {
      run(edges, checkEvery = 4, maxRounds = 4)
    }
    assert(ex.getMessage.contains("converge"))
  }

  private def runStar(edges: Seq[(Long, Long)],
                      maxRounds: Int = 32): (Map[Long, Long], Int) = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    val (labels, rounds) =
      DedupOps.connectedComponentsStarCounted(df, "a", "b", maxRounds)
    (labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("star contraction matches union-find and label propagation on mixed graphs") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (1, 3),            // triangle
      (10, 11), (11, 12),                // path
      (20, 21), (21, 22), (22, 23), (23, 24), (24, 25), // chain
      (40, 41))                          // isolated pair
    val (got, _) = runStar(edges)
    assert(got == unionFind(50, edges))
    assert(got == run(edges))
  }

  test("star contraction: diameter-50 chain converges in O(log n) rounds") {
    // 51-node path, diameter 50: label propagation needs ~50 rounds; star
    // contraction must stay within ceil(log2 n) + c alternations
    val edges = (300L until 350L).map(i => (i, i + 1))
    val (got, rounds) = runStar(edges)
    assert(got.values.toSet == Set(300L), s"single component expected: $got")
    assert(got == unionFind(351, edges))
    val bound = math.ceil(math.log(51.0) / math.log(2.0)).toInt + 3
    assert(rounds <= bound, s"took $rounds rounds, O(log n) bound is $bound")
  }

  test("star contraction: ids out of order and duplicate edges are handled") {
    val edges = Seq[(Long, Long)]((9, 1), (1, 9), (9, 5), (5, 1), (7, 7), (2, 7))
    val (got, _) = runStar(edges)
    assert(got == unionFind(10, edges.filter(e => e._1 != e._2)))
  }

  test("star contraction on an empty edge set returns empty labels") {
    val (got, rounds) = runStar(Seq.empty)
    assert(got.isEmpty && rounds == 0)
  }

  test("star contraction: a vertex appearing only in a self-loop labels itself") {
    val edges = Seq[(Long, Long)]((5, 5), (1, 2))
    val (got, _) = runStar(edges)
    assert(got == Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
    assert(got == run(edges), "must match the propagation path")
  }
}
