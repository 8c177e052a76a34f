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

  /** CLUSTER-ORDERED packing — the in-context-pretraining layout
    * (related documents adjacent in the training stream, so attention
    * sees coherent context instead of random concatenation): identical
    * to [[packTokenStream]] except the per-shard stream orders by
    * (cluster, id) — documents from one semantic cluster become
    * CONTIGUOUS runs, and chunk boundaries mostly fall inside a
    * cluster's run. Same scale contract: the only window is
    * shard-partitioned, the cluster ordering is local to a shard.
    */
  def packClustered(df: DataFrame, idCol: String, tokenCountCol: String,
                    clusterCol: String, budget: Long, shards: Int = 64,
                    salt: String = "iclp:"): DataFrame = {
    require(budget > 0 && shards > 0)
    val sharded = df.select(col(idCol), col(clusterCol),
      col(tokenCountCol).cast("long").as("__n"),
      pmod(SamplingOps.hash60(col(idCol), salt), lit(shards.toLong))
        .as("shard"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(clusterCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("__start", coalesce(sum(col("__n")).over(w), lit(0L)))
      .select(col(idCol), col(clusterCol), col("shard"),
        (col("shard") * lit(1L << 40) +
          floor(col("__start") / budget).cast("long")).as("pack_id"),
        pmod(col("__start"), lit(budget)).as("pack_offset"),
        col("__n").as("n_tokens"))
  }

  /** NO-SPLIT sequence packing by sorted-fold pairing — the
    * document-boundary-respecting layout the truncation-averse packing
    * line advocates (concatenate-then-chunk splits documents across
    * examples; attention across the cut is noise): at most TWO
    * sequences share a pack, documents longer than `budget` are capped
    * and flagged, and pairing is the fold heuristic on the
    * length-sorted order — rank r (length desc, id asc) pairs with
    * rank N−1−r when the two fit a budget together, so long documents
    * take the shortest partners and mid-length documents pair among
    * themselves. Chosen over best-fit-decreasing deliberately: the
    * fold is ONE window + one rank-keyed self-join — fully
    * deterministic, fully SQL-replayable — where true BFD is a
    * sequential bin state no engine parallelizes.
    *
    * Scale shape: same sharding contract as [[packTokenStream]] — the
    * sort exists only INSIDE a shard (window partitioned `shards`
    * wide), the partner lookup is an equi-join on (shard, rank), and
    * pack ids are globally unique (`shard·2⁴⁰ + pair rank`).
    *
    * Output per document: (idCol, shard, pack_id, slot ∈ 0|1,
    * n_tokens capped, truncated, pack_tokens).
    */
  def packFoldPairs(df: DataFrame, idCol: String, tokenCountCol: String,
                    budget: Long, shards: Int = 64,
                    salt: String = "pfp:"): DataFrame = {
    require(budget > 0 && shards > 0)
    val sharded = df.select(col(idCol),
      least(col(tokenCountCol).cast("long"), lit(budget)).as("__n"),
      (col(tokenCountCol).cast("long") > budget).as("truncated"),
      pmod(SamplingOps.hash60(col(idCol), salt), lit(shards.toLong))
        .as("shard"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__n").desc, col(idCol).asc)
    val ranked = sharded
      .withColumn("__r", row_number().over(w).cast("long") - 1L)
      .withColumn("__sz",
        count(lit(1)).over(Window.partitionBy(col("shard"))))
    val partners = ranked.select(col("shard").as("__ps"),
      col("__r").as("__pr"), col("__n").as("__pn"))
    ranked
      .join(partners, col("shard") === col("__ps") &&
        col("__pr") === col("__sz") - 1L - col("__r"), "left")
      .withColumn("__pair", col("__pr") =!= col("__r") &&
        col("__n") + col("__pn") <= budget)
      .select(col(idCol), col("shard"),
        (col("shard") * lit(1L << 40) +
          when(col("__pair"), least(col("__r"), col("__pr")))
            .otherwise(col("__r"))).as("pack_id"),
        when(col("__pair") && col("__r") > col("__pr"), 1L).otherwise(0L)
          .as("slot"),
        col("__n").as("n_tokens"), col("truncated"),
        when(col("__pair"), col("__n") + col("__pn")).otherwise(col("__n"))
          .as("pack_tokens"))
  }

  /** LENGTH-BUCKETED BATCHING — the inference-serving layout (also the
    * eval-harness one): sequences batch with near-equal lengths so
    * per-batch padding-to-max wastes almost nothing (random batching
    * pads every short sequence to the batch's longest — at serving
    * scale that is most of the FLOPs). Documents land in
    * `bucketWidth`-token buckets, fill `batchSize`-row batches in id
    * order, and each row learns its batch's pad target and its own
    * waste (pad_to − n_tok), so the padding bill is a one-line
    * aggregate downstream.
    *
    * Scale shape: the [[packTokenStream]] posture — every window is
    * keyed by (hash shard, bucket), so no partition is ever
    * corpus-wide; batch ids compose (shard, bucket, batch-in-bucket)
    * into one collision-free long.
    */
  def lengthBuckets(df: DataFrame, idCol: String, tokenCountCol: String,
                    bucketWidth: Long, batchSize: Int, shards: Int = 64,
                    salt: String = "lbb:"): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0 && shards > 0 &&
      shards <= (1 << 19), "shards must fit the 19-bit field above bit 44")
    val based = df.select(col(idCol),
      col(tokenCountCol).cast("long").as("n_tok"),
      expr(s"cast($tokenCountCol as bigint) div $bucketWidth").as("bucket"),
      pmod(SamplingOps.hash60(col(idCol), salt), lit(shards.toLong))
        .as("shard"))
    val batched = based
      .withColumn("__bin",
        expr(s"(row_number() over (partition by shard, bucket " +
          s"order by ${idCol}) - 1) div $batchSize"))
    val wb = Window.partitionBy(col("shard"), col("bucket"), col("__bin"))
    // Field widths: shard<2^20 (require above caps shards), bucket<2^20,
    // bin<2^24 — guard the unbounded two so an overflow refuses loudly
    // instead of silently aliasing batch ids.
    val bucketOk = when(col("bucket") < lit(1L << 20), col("bucket"))
      .otherwise(raise_error(concat(
        lit("lengthBuckets: bucket field overflow (n_tok div bucketWidth >= 2^20): "),
        col("bucket").cast("string"))))
    val binOk = when(col("__bin") < lit(1L << 24), col("__bin"))
      .otherwise(raise_error(concat(
        lit("lengthBuckets: batch-in-bucket field overflow (>= 2^24 batches): "),
        col("__bin").cast("string"))))
    batched
      .withColumn("pad_to", max(col("n_tok")).over(wb))
      .select(col(idCol), col("n_tok"), col("bucket"),
        (col("shard") * lit(1L << 44) + bucketOk * lit(1L << 24) +
          binOk).as("batch_id"),
        col("pad_to"), (col("pad_to") - col("n_tok")).as("waste"))
  }
}
