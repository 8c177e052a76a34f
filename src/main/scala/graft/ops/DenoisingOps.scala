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

  private def sentinel(k: Column): Column =
    concat(lit("<extra_id_"), k.cast("string"), lit(">"))

  /** (n_spans, inputs, targets) columns for one span-corruption
    * configuration over `idCol`/`textCol`.
    */
  private def corruptCols(idCol: String, textCol: String, spanLen: Int,
                          window: Int, salt: String)
      : (Column, Column, Column) = {
    require(spanLen >= 1 && window > spanLen,
      s"need window > spanLen >= 1, got $window/$spanLen")
    val legal = window - spanLen + 1
    val toks = TextOps.tokens(col(textCol))
    val nw = (size(toks) / window).cast("int")
    def off(w: Column): Column =
      pmod(SamplingOps.hash60(
        concat(col(idCol).cast("string"), lit(":"), w.cast("string")), salt),
        lit(legal.toLong)).cast("int")
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
    (coalesce(nw, lit(0)).cast("long"), inputs, targets)
  }

  /** Append `inputs`, `targets` (token arrays), `n_spans` to `df`. */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  spanLen: Int = 3, window: Int = 20,
                  salt: String = "t5:"): DataFrame = {
    val (n, in, tg) = corruptCols(idCol, textCol, spanLen, window, salt)
    df.withColumn("n_spans", n)
      .withColumn("inputs", in)
      .withColumn("targets", tg)
  }

  /** UL2 mixture-of-denoisers: each document draws a deterministic
    * denoiser class from its id hash —
    *
    *   - `R` (regular): span 3 per 20-token window (the T5 recipe),
    *   - `X` (extreme): span 8 per 16-token window (half the tokens
    *     masked — the long-infill objective),
    *   - `S` (sequential): prefix-LM split at a hash pivot — inputs
    *     are the prefix plus a sentinel, targets the sentinel, the
    *     suffix, and the closing sentinel.
    *
    * Same derandomized posture throughout; one scan-side projection
    * (the CASE evaluates only the drawn branch per row).
    */
  def ul2Mixture(df: DataFrame, idCol: String, textCol: String,
                 salt: String = "ul2:"): DataFrame = {
    val d = pmod(SamplingOps.hash60(col(idCol), salt), lit(3L))
    val (rn, rin, rtg) = corruptCols(idCol, textCol, 3, 20, salt + "r:")
    val (xn, xin, xtg) = corruptCols(idCol, textCol, 8, 16, salt + "x:")
    val toks = TextOps.tokens(col(textCol))
    val n = size(toks)
    // prefix pivot in [1, n-1]; single-token/empty docs pass whole as prefix
    val p = when(n >= 2,
      (pmod(SamplingOps.hash60(col(idCol), salt + "s:"),
        (n - 1).cast("long")) + 1).cast("int")).otherwise(n)
    val sin = concat(slice(toks, lit(1), p), array(sentinel(lit(0))))
    val stg = concat(array(sentinel(lit(0))), slice(toks, p + 1, n - p),
      array(sentinel(lit(1))))
    df.withColumn("denoiser",
        when(d === 0, "R").when(d === 1, "X").otherwise("S"))
      .withColumn("n_spans",
        when(d === 0, rn).when(d === 1, xn).otherwise(lit(1L)))
      .withColumn("inputs",
        when(d === 0, rin).when(d === 1, xin).otherwise(sin))
      .withColumn("targets",
        when(d === 0, rtg).when(d === 1, xtg).otherwise(stg))
  }
}
