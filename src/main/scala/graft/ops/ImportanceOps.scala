package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): rank
  * every raw-corpus document by how much more likely its text is under a
  * TARGET distribution (the high-quality slice you want more of) than
  * under the RAW distribution, using hashed n-gram bag-of-words models —
  * the published, embarrassingly-parallel recipe for "give me the 10% of
  * the crawl that looks most like Wikipedia".
  *
  * Both models live on `numBuckets` hashed features (the paper's hashed
  * n-grams; the hash is the engine's shared salted-md5
  * [[SamplingOps.hash60]] so any engine replays it), add-one smoothed.
  * Per document: `log_ratio = (1/n) Σ_tokens log p_target(b(t)) /
  * p_raw(b(t))` — the average per-token log importance weight.
  *
  * Scale shape: both models are ONE pass over the corpus (a groupBy on
  * the bucket id — at most `numBuckets` groups, map-side partials bound
  * each task's contribution), materialized at `numBuckets` rows and
  * broadcast; scoring is a second pass joining each token's bucket to
  * the broadcast table and averaging per doc. Nothing corpus-sized is
  * ever collected or shuffled wide — the same bounded-LM posture as
  * [[TextQualityOps.unigramLogProb]].
  */
object ImportanceOps {

  /** Bucket id of a token: salted 60-bit md5 mod `numBuckets` (replayable
    * in any engine with md5 — the determinism contract of the sampling
    * family).
    */
  def bucketOf(token: Column, numBuckets: Int, salt: String = "dsir:"): Column =
    pmod(SamplingOps.hash60(token, salt), lit(numBuckets.toLong))

  /** Per-document average log importance weight.
    *
    * @param df corpus
    * @param isTarget row predicate marking the target slice (its docs
    *   still get scores — the model just also learns from them)
    * @return (docId, n_tokens, log_ratio) — log_ratio floored to 4dp
    *   for engine-portable hashing; docs with no tokens are absent (no
    *   evidence either way)
    */
  def dsirLogRatio(df: DataFrame, docId: String, textCol: String,
                   isTarget: Column, numBuckets: Int = 128): DataFrame = {
    val tok = df.select(col(docId), isTarget.as("__t"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .select(col(docId), col("__t"), bucketOf(col("token"), numBuckets).as("b"))
    // both bucket models in ONE corpus pass: conditional counts per bucket
    val model = tok.groupBy(col("b")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val totals = tok.agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
      count(lit(1)).as("__nr"))
    val b = numBuckets.toLong
    tok.join(broadcast(model), Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .groupBy(col(docId))
      .agg(count(lit(1)).as("n_tokens"),
        (floor(avg(
          log((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double")
            / (col("__nt") + lit(b)).cast("double"))
            - log((coalesce(col("cr"), lit(0L)) + lit(1L)).cast("double")
              / (col("__nr") + lit(b)).cast("double"))) * 1e4 + lit(0.5)) / 1e4)
          .as("log_ratio"))
  }

  /** The selection step: importance-weighted top slice — keep documents
    * whose log_ratio clears `minLogRatio` (the paper resamples
    * proportionally to the weights; a threshold is the deterministic,
    * rank-free variant — no global sort, each row decides locally).
    */
  def dsirSelect(df: DataFrame, docId: String, textCol: String,
                 isTarget: Column, minLogRatio: Double,
                 numBuckets: Int = 128): DataFrame =
    df.join(
      dsirLogRatio(df, docId, textCol, isTarget, numBuckets)
        .filter(col("log_ratio") >= minLogRatio)
        .select(col(docId), col("log_ratio")),
      Seq(docId))
}
