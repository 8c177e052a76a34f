package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Instruction-tuning (SFT) data assembly — the last mile between a
  * curated corpus and a fine-tuning run: multi-turn conversations are
  * rendered through a ChatML-style template
  * (`<|im_start|>role\ntext\n<|im_end|>\n` per turn), laid out as one
  * token stream per conversation, and annotated with the
  * assistant-only LOSS MASK every SFT trainer needs (the model learns
  * to produce assistant turns, not to parrot prompts).
  *
  * Token accounting is exact by construction: turn text must be
  * single-spaced (the caller normalizes — the engine's ptoks
  * convention), so the rendered conversation's whitespace tokens are
  * precisely `wordcount(text) + 2` per turn (the glued
  * `<|im_start|>role` header and `<|im_end|>` trailer are one token
  * each). Offsets, masks and totals are therefore all integers a SQL
  * oracle replays.
  */
object SftOps {

  /** Per-turn layout of each conversation: token start offset, length,
    * trainable-token count (assistant content + end marker — the role
    * header is never trained on), conversation totals, and the md5 of
    * the fully rendered conversation (the reassembly certificate).
    * Conversations over `maxTokens` are DROPPED whole (the
    * deterministic alternative to tail truncation; a split
    * conversation teaches the model to answer without its context).
    *
    * `turnCol` must be UNIQUE within a conversation — it is the only
    * ordering key, so duplicate turn ids would make the running
    * offsets engine-dependent (the same contract every keyed window
    * here carries).
    *
    * Scale shape: one window partitioned by conversation (bounded
    * partitions — a conversation is turns, not a corpus) + one
    * per-conversation aggregate; no global sort.
    */
  def assembleChat(turns: DataFrame, convCol: String, turnCol: String,
                   roleCol: String, textCol: String,
                   maxTokens: Long): DataFrame = {
    require(maxTokens > 0)
    val wc = when(col(textCol) === "", 0L)
      .otherwise(size(split(col(textCol), "\\s+")).cast("long"))
    val seg = concat(lit("<|im_start|>"), col(roleCol), lit("\n"),
      col(textCol), lit("\n<|im_end|>\n"))
    val base = turns
      .select(col(convCol), col(turnCol), col(roleCol), col(textCol))
      .withColumn("__nt", wc + 2L)
      .withColumn("__seg", seg)
    val w = Window.partitionBy(col(convCol)).orderBy(col(turnCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = base.withColumn("start_tok",
      coalesce(sum(col("__nt")).over(w), lit(0L)))
    val conv = base.groupBy(col(convCol)).agg(
      sum(col("__nt")).as("conv_tokens"),
      md5(array_join(transform(
        array_sort(collect_list(struct(col(turnCol), col("__seg")))),
        s => s.getField("__seg")), "").cast("binary")).as("rendered_md5"))
    offs.join(conv, Seq(convCol))
      .filter(col("conv_tokens") <= maxTokens)
      .select(col(convCol), col(turnCol), col(roleCol).as("role"),
        col("start_tok"), col("__nt").as("n_tok"),
        when(col(roleCol) === "assistant", col("__nt") - 1L).otherwise(0L)
          .as("n_trainable"),
        col("conv_tokens"), col("rendered_md5"))
  }

  /** PREFERENCE-PAIR mining for reward-model / DPO bootstrapping: per
    * hash bucket, the best-scoring document becomes `chosen` and the
    * worst `rejected`, with the integer score margin — the
    * quality-signal-to-preference-data step published pipelines use to
    * seed a reward model before human labels exist. Tie-breaks are
    * OPPOSED on purpose (best: score desc + id ASC; worst: score asc +
    * id DESC), so an all-tied bucket still yields a deterministic,
    * distinct pair; single-document buckets drop.
    *
    * Scale shape: two rank-1 windows partitioned by the hash bucket —
    * partitions are corpus/buckets-sized by construction (pick buckets
    * ≈ pairs wanted), and rank-1 selection bounds each partition's
    * output at one row.
    */
  def preferencePairs(scored: DataFrame, idCol: String, scoreCol: String,
                      buckets: Int, salt: String = "pref:"): DataFrame = {
    require(buckets > 0)
    val based = scored.select(col(idCol),
      col(scoreCol).cast("long").as("__q"),
      pmod(SamplingOps.hash60(col(idCol), salt), lit(buckets.toLong))
        .as("bucket"))
    val wTop = Window.partitionBy(col("bucket"))
      .orderBy(col("__q").desc, col(idCol).asc)
    val wBot = Window.partitionBy(col("bucket"))
      .orderBy(col("__q").asc, col(idCol).desc)
    val ranked = based
      .withColumn("__rt", row_number().over(wTop))
      .withColumn("__rb", row_number().over(wBot))
    val top = ranked.filter(col("__rt") === 1)
      .select(col("bucket"), col(idCol).as("chosen_id"),
        col("__q").as("__qc"))
    val bot = ranked.filter(col("__rb") === 1)
      .select(col("bucket"), col(idCol).as("rejected_id"),
        col("__q").as("__qr"))
    top.join(bot, "bucket")
      .filter(col("chosen_id") =!= col("rejected_id"))
      .select(col("bucket"), col("chosen_id"), col("rejected_id"),
        (col("__qc") - col("__qr")).as("margin"))
  }

  /** Best-of-n / rejection-sampling assembly (the published RFT data
    * path): per prompt, keep the top-1 of its n sampled completions by
    * the integer quality score — rank-1 window with the opposed
    * deterministic tie-breaks of [[preferencePairs]] — and emit the
    * SFT-ready row with its MARGIN OVER THE GROUP MEDIAN (how far the
    * kept completion clears the typical sample, the acceptance signal
    * rejection sampling thresholds on). Median = the lower median
    * (⌈n/2⌉-th smallest, id-ascending tie-break), exact integer.
    *
    * Output: (prompt, best_id, best_q, margin_med, n).
    *
    * Scale shape: windows carry the prompt key — partitions are
    * n-completions-sized by construction, never corpus-wide; rank-1 and
    * the single median row bound each partition's output at one row.
    */
  def bestOfN(scored: DataFrame, idCol: String, promptCol: String,
              scoreCol: String): DataFrame = {
    val based = scored.select(col(promptCol).as("prompt"), col(idCol),
      col(scoreCol).cast("long").as("__q"))
    val wTop = Window.partitionBy(col("prompt"))
      .orderBy(col("__q").desc, col(idCol).asc)
    val wAsc = Window.partitionBy(col("prompt"))
      .orderBy(col("__q").asc, col(idCol).asc)
    val ranked = based
      .withColumn("__rt", row_number().over(wTop))
      .withColumn("__ra", row_number().over(wAsc))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col("prompt"))))
    val best = ranked.filter(col("__rt") === 1)
      .select(col("prompt"), col(idCol).as("best_id"),
        col("__q").as("best_q"), col("__n").as("n"))
    val median = ranked.filter(expr("__ra = (__n + 1) div 2"))
      .select(col("prompt"), col("__q").as("__qm"))
    best.join(median, "prompt")
      .select(col("prompt"), col("best_id"), col("best_q"),
        (col("best_q") - col("__qm")).as("margin_med"), col("n"))
  }
}
