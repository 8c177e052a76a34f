package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Denoising-objective preparation — the T5/UL2 span-corruption
  * transform: replace token spans with numbered sentinels in the
  * encoder input and emit the spans behind their sentinels as the
  * decoder target, closing with a final sentinel.
  *
  * DERANDOMIZED span schedule (the house posture — the weighted
  * sampler's −ln(u)/w keys and the FIM pivots are derandomized the
  * same way): tokens partition into fixed windows of
  * `window = round(spanLen / density)` tokens; each FULL window
  * corrupts exactly one `spanLen`-token span whose offset is the
  * salted 60-bit hash of (id, window) mod the legal positions. Exact
  * corruption density on full windows, non-overlapping spans by
  * construction, zero RNG — a SQL oracle replays every offset.
  *
  * Sentinel accounting identities (machine-checked in the spec and
  * restated by the oracle): with n tokens and w full windows,
  * `|inputs| = n − w·spanLen + w` and `|targets| = w·(spanLen+1) + 1`.
  *
  * Scale shape: one scan-side projection of array HOFs — no explode,
  * no shuffle, no state. Short docs (< one window) pass through
  * uncorrupted with a bare final sentinel as target.
  */
object DenoisingOps {

  /** Append `inputs`, `targets` (token arrays), `n_spans` to `df`. */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  spanLen: Int = 3, window: Int = 20,
                  salt: String = "t5:"): DataFrame = {
    require(spanLen >= 1 && window > spanLen,
      s"need window > spanLen >= 1, got $window/$spanLen")
    val legal = window - spanLen + 1
    val toks = TextOps.tokens(col(textCol))
    val nw = (size(toks) / window).cast("int")
    def off(w: Column): Column =
      pmod(SamplingOps.hash60(
        concat(col(idCol).cast("string"), lit(":"), w.cast("string")), salt),
        lit(legal.toLong)).cast("int")
    def sentinel(k: Column): Column =
      concat(lit("<extra_id_"), k.cast("string"), lit(">"))
    // per full window: prefix ++ [sentinel_w] ++ suffix
    val inputPieces = transform(sequence(lit(0), nw - 1), w => {
      val base = w * window
      val o = off(w)
      concat(
        slice(toks, base + 1, o),
        array(sentinel(w)),
        slice(toks, base + o + spanLen + 1, lit(window) - o - spanLen))
    })
    val tail = slice(toks, nw * window + 1, size(toks) - nw * window)
    val inputs = when(nw > 0, concat(flatten(inputPieces), tail))
      .otherwise(toks)
    val targetPieces = transform(sequence(lit(0), nw - 1), w =>
      concat(array(sentinel(w)),
        slice(toks, w * window + off(w) + 1, lit(spanLen))))
    val targets = when(nw > 0,
      concat(flatten(targetPieces), array(sentinel(nw))))
      .otherwise(array(sentinel(lit(0))))
    df.withColumn("n_spans", coalesce(nw, lit(0)).cast("long"))
      .withColumn("inputs", inputs)
      .withColumn("targets", targets)
  }
}
