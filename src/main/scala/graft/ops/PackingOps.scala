package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: lay documents out as one deterministic token
  * stream and cut it at `budget`-token boundaries (the GPT-style
  * concatenate-then-chunk layout) — every LLM pre-training pipeline ends
  * with this step, and done naively it is a global sort + global running
  * sum, i.e. a single-partition window.
  *
  * Scale shape: documents are first salted into `shards` independent
  * streams by id hash, and the running sum runs PER SHARD — so the only
  * window in the plan is partitioned `shards` wide (pick shards ≈ a few ×
  * cores/executors), and packing 100 TB is `shards` independent
  * linear passes. Pack ids are globally unique (`shard · 2⁴⁰ + local`).
  * Everything is deterministic: same ids → same shards, same order, same
  * packs, on any engine.
  */
object PackingOps {

  /** Assign each document a pack and an offset within it:
    * `pack_id = shard·2⁴⁰ + floor(start_offset / budget)` where
    * `start_offset` is the running token count of all earlier docs in the
    * shard (id order). A document straddling a boundary belongs to the
    * pack its first token lands in — the concatenate-then-chunk
    * convention, where chunk boundaries may split a document.
    */
  def packTokenStream(df: DataFrame, idCol: String, tokenCountCol: String,
                      budget: Long, shards: Int = 64,
                      salt: String = "pack:"): DataFrame = {
    require(budget > 0 && shards > 0)
    val sharded = df.select(col(idCol), col(tokenCountCol).cast("long").as("__n"),
      pmod(SamplingOps.hash60(col(idCol), salt), lit(shards.toLong)).as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("__start", coalesce(sum(col("__n")).over(w), lit(0L)))
      .select(col(idCol), col("shard"),
        (col("shard") * lit(1L << 40) + floor(col("__start") / budget).cast("long"))
          .as("pack_id"),
        pmod(col("__start"), lit(budget)).as("pack_offset"),
        col("__n").as("n_tokens"))
  }
}
