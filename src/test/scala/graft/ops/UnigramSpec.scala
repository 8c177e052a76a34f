package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Unigram (SentencePiece-family) hard-EM trainer unit properties:
  * Viterbi optimality and tie-breaks, single-char cover guarantee,
  * M-step pruning, quantized score arithmetic.
  */
class UnigramSpec extends AnyFunSuite {

  test("viterbi picks the higher-scoring segmentation") {
    // 'ab' as one piece scores better than a+b
    val sc = Map("a" -> -3000L, "b" -> -3000L, "ab" -> -4000L)
    assert(UnigramTrainer.viterbi("ab", sc, 4) == Seq("ab"))
    // and worse when the pieces are cheap
    val sc2 = Map("a" -> -1000L, "b" -> -1000L, "ab" -> -4000L)
    assert(UnigramTrainer.viterbi("ab", sc2, 4) == Seq("a", "b"))
  }

  test("viterbi tie-break prefers the larger last piece") {
    // equal totals: a+bc vs ab+c vs a+b+c — with all pieces at the
    // same score, fewer pieces wins; among 2-piece splits the larger
    // LAST piece (smaller split point) wins at the final DP cell
    val sc = Map("a" -> -1000L, "b" -> -1000L, "c" -> -1000L,
      "ab" -> -2000L, "bc" -> -2000L)
    assert(UnigramTrainer.viterbi("abc", sc, 4) == Seq("a", "bc"))
  }

  test("unreachable words return null; cover holds with singles") {
    assert(UnigramTrainer.viterbi("xy", Map("x" -> -1L), 4) == null)
    val rows = UnigramTrainer.learn(Array(("zq", 3L)), emIters = 2)
    // singles survive even if the full word dominates
    assert(rows.map(_._1).toSet.intersect(Set("z", "q", "zq")).nonEmpty)
    assert(rows.exists(_._1 == "zq"))
  }

  test("M-step prunes unused multi-char pieces, keeps singles at floor 1") {
    val rows = UnigramTrainer.learn(
      Array(("aaaa", 10L), ("ab", 1L)), maxPieceLen = 4, emIters = 2)
    val m = rows.map(r => r._1 -> r._2).toMap
    // 'aaaa' segments as one piece; 'aa'/'aaa' become unused and drop
    assert(m.contains("aaaa"))
    assert(!m.contains("aa") && !m.contains("aaa"))
    // 'a' is only used via... singles floor keeps it >= 1
    assert(m("a") >= 1L)
    // scores are the quantized ln of count/total
    val total = rows.map(_._2).sum
    rows.foreach { case (_, c, s) =>
      assert(s == math.floor(math.log(c.toDouble / total) * 1000 + 0.5).toLong)
    }
  }
}
