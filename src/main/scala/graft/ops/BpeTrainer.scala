package graft.ops

import scala.collection.mutable

/** Driver-side incremental BPE learner over a compressed (word, freq)
  * vocabulary — the merge-loop half of [[TextOps.trainBpeMerges]].
  *
  * Classic subword-nmt `learn_bpe` bookkeeping:
  *
  *  - `counts` holds the EXACT corpus-weighted count of every adjacent
  *    symbol pair (adjacent occurrences count with multiplicity, matching
  *    the oracle's position-explode);
  *  - `occurs` maps a pair to the word indices that (possibly) contain
  *    it — a lazily-validated inverted index, so adopting a merge touches
  *    only the words that actually changed;
  *  - per adopted merge, each affected word's old pairs are subtracted,
  *    the word is re-encoded with ONE left-to-right non-overlapping pass,
  *    and its new pairs are added — the exact delta, so `counts` stays
  *    equal to what a from-scratch recount would produce (the DuckDB
  *    oracle IS that recount, replayed per round).
  *
  * Cost: init O(total symbols); per round O(distinct pairs) for the
  * argmax scan + O(affected word lengths) for the delta. 256 rounds over
  * a real vocabulary is milliseconds; the corpus is never touched again.
  * Selection order (count desc, then pair lexicographic asc) is a strict
  * total order, so results are independent of hash iteration order.
  */
object BpeTrainer {

  def learn(vocab: Array[(String, Long)],
            nMerges: Int): Seq[(String, String, Long)] =
    learnSymbols(vocab.map { case (w, f) =>
      (w.toCharArray.map(String.valueOf), f) }, nMerges)

  /** The same merge loop over PRE-SPLIT initial symbol sequences — the
    * seam that lets byte-level training (symbols = UTF-8 bytes as hex
    * pairs, [[TextOps.trainBpeMergesBytes]]) share every line of the
    * incremental bookkeeping with character-level training.
    */
  def learnSymbols(vocab: Array[(Array[String], Long)],
                   nMerges: Int): Seq[(String, String, Long)] = {
    val words: Array[Array[String]] = vocab.map(_._1)
    val freqs: Array[Long] = vocab.map(_._2)

    val counts = mutable.HashMap.empty[(String, String), Long]
    val occurs = mutable.HashMap.empty[(String, String), mutable.BitSet]

    def addPairs(wi: Int, sign: Long): Unit = {
      val s = words(wi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = counts.getOrElse(p, 0L) + sign * freqs(wi)
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0) occurs.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        i += 1
      }
    }

    var wi = 0
    while (wi < words.length) { addPairs(wi, 1L); wi += 1 }

    /** One left-to-right non-overlapping merge pass (the `replace`-chain
      * semantics); returns null when the word doesn't contain the pair.
      */
    def mergeWord(s: Array[String], a: String, b: String): Array[String] = {
      val out = new mutable.ArrayBuffer[String](s.length)
      var i = 0
      var changed = false
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          out += a + b; i += 2; changed = true
        } else { out += s(i); i += 1 }
      }
      if (changed) out.toArray else null
    }

    val out = mutable.ArrayBuffer.empty[(String, String, Long)]
    var round = 0
    var exhausted = counts.isEmpty
    while (round < nMerges && !exhausted) {
      // argmax by (count desc, pair asc) — a full scan; `counts` is
      // vocab-pair-sized, not corpus-sized
      var best: (String, String) = null
      var bestCnt = 0L
      counts.foreach { case (p, c) =>
        if (best == null || c > bestCnt ||
            (c == bestCnt && (p._1 < best._1 ||
              (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestCnt = c
        }
      }
      if (best == null) exhausted = true
      else {
        out += ((best._1, best._2, bestCnt))
        // the occurs set may hold stale indices (a word can lose a pair
        // when an overlapping merge rewrites it); mergeWord returning
        // null filters them — counts stays exact either way
        val affected = occurs.getOrElse(best, mutable.BitSet.empty)
        affected.foreach { w =>
          val merged = mergeWord(words(w), best._1, best._2)
          if (merged != null) {
            addPairs(w, -1L)
            words(w) = merged
            addPairs(w, 1L)
          }
        }
        occurs.remove(best)
        // the merged pair must be gone: every occurrence was rewritten
        assert(!counts.contains(best),
          s"incremental count drift on $best — delta update is broken")
        exhausted = counts.isEmpty
        round += 1
      }
    }
    out.toSeq
  }
}
