package graft.ops

import scala.collection.mutable

/** Unigram-LM tokenizer (the SentencePiece family — Kudo 2018) as a
  * DETERMINISTIC hard-EM variant, completing the tokenizer triad next
  * to [[BpeTrainer]] (GPT) and [[WordPieceTrainer]] (BERT):
  *
  *  - SEED: every substring (length ≤ `maxPieceLen`) of the capped
  *    (word, freq) vocabulary, counted with corpus frequency weights,
  *    capped deterministically at `maxPieces` by (count desc, piece
  *    asc) — single characters always kept (the cover guarantee);
  *  - SCORE: milli-quantized log-probability
  *    `⌊1000·ln(count/total) + 0.5⌋` (coarse enough that libm ulp
  *    differences between engines cannot flip a comparison — the
  *    established float-tolerance posture, applied BEFORE any argmax);
  *  - E-step: VITERBI segmentation of every vocab word under the
  *    current scores (hard EM — the deterministic counterpart of
  *    SentencePiece's soft EM; ties break by larger last-piece length,
  *    a strict total order since the piece is determined by its span);
  *  - M-step: integer recount of piece usage over the Viterbi
  *    segmentations (freq-weighted), unused multi-char pieces dropped,
  *    single chars retained, scores recomputed from the new total.
  *
  * `emIters` rounds of E+M, then the surviving (piece, count, score)
  * table. Everything after the one distributed vocab pass is
  * driver-side and bounded by `maxPieces` — the [[BpeTrainer]] cost
  * shape. Every arithmetic step (substring counts, caps, quantized
  * scores, Viterbi argmax, recounts) is exactly replayable in SQL.
  */
object UnigramTrainer {

  /** Viterbi segmentation of `w` under `score` (milli log-probs);
    * pieces absent from the map are unusable. Returns null when no
    * segmentation covers the word (cannot happen while single chars
    * are retained). Tie-break: higher total score, then larger last
    * piece (smaller split point), applied at every DP cell.
    */
  def viterbi(w: String, score: collection.Map[String, Long],
              maxPieceLen: Int): Seq[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Long.MinValue)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      // iterate j ascending: larger pieces first in tie-break means
      // prefer the SMALLEST j on equal score — strictly-greater test
      // after ascending scan keeps the first (smallest-j) maximum
      while (j < i) {
        if (best(j) != Long.MinValue) {
          score.get(w.substring(j, i)) match {
            case Some(s) =>
              val cand = best(j) + s
              if (cand > best(i)) { best(i) = cand; back(i) = j }
            case None => ()
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(n) == Long.MinValue) return null
    val out = mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { out += w.substring(back(p), p); p = back(p) }
    out.reverse.toSeq
  }

  /** Train on the capped (word, freq) vocabulary; returns the final
    * (piece, count, score_milli) rows sorted (count desc, piece asc).
    */
  def learn(vocab: Array[(String, Long)], maxPieceLen: Int = 4,
            maxPieces: Int = 2048, emIters: Int = 2): Seq[(String, Long, Long)] = {
    // seed substring counts (corpus-weighted, all occurrences)
    val counts = mutable.HashMap.empty[String, Long]
    vocab.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          counts(p) = counts.getOrElse(p, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    // deterministic cap; single chars always survive
    val singles = counts.keysIterator.filter(_.length == 1).toSet
    val capped = counts.toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(maxPieces).map(_._1).toSet ++ singles
    var cur: Map[String, Long] =
      counts.filter { case (p, _) => capped.contains(p) }.toMap

    def scores(tbl: Map[String, Long]): Map[String, Long] = {
      val total = tbl.valuesIterator.sum
      tbl.map { case (p, c) =>
        p -> math.floor(math.log(c.toDouble / total) * 1000 + 0.5).toLong
      }
    }

    var it = 0
    while (it < emIters) {
      val sc = scores(cur)
      val next = mutable.HashMap.empty[String, Long]
      vocab.foreach { case (w, f) =>
        viterbi(w, sc, maxPieceLen).foreach { p =>
          next(p) = next.getOrElse(p, 0L) + f
        }
      }
      // unused multi-char pieces drop; single chars retain count 0 → 1
      // floor so ln stays finite and cover holds
      cur = cur.keysIterator.flatMap { p =>
        val c = next.getOrElse(p, 0L)
        if (c > 0) Some(p -> c)
        else if (p.length == 1) Some(p -> 1L)
        else None
      }.toMap
      it += 1
    }
    val sc = scores(cur)
    cur.toSeq.map { case (p, c) => (p, c, sc(p)) }
      .sortBy { case (p, c, _) => (-c, p) }
  }
}
