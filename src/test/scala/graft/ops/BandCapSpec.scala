package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The anti-quadratic band-block cap (DedupOps.cappedBandPairs): oversized
  * blocks — a crawl's boilerplate cliques — must cost O(m) edges while
  * leaving downstream connected components bit-identical to the uncapped
  * all-pairs join.
  */
class BandCapSpec extends SparkSuite {

  test("10k-doc identical-text clique completes with O(m log m) edges, not m^2/2") {
    import spark.implicits._
    val m = 10000
    // every doc shares every band key -> one block of 10k per band;
    // uncapped this is ~50M pairs per band and would not finish here
    val docs = (0 until m).map(i =>
      (i.toLong, "the same boilerplate license header text repeated verbatim"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.minhashCandidates(docs, "doc_id", "text",
      shingleN = 3, numHashes = 8, bands = 4, maxBandBlock = 256)
    // all 4 bands produce the same ascending-id chain + doubling
    // skip-links -> distinct leaves Σ (m - o) over offsets 1,2,4,…
    val expected = (1 +: (1 to 30).map(1 << _)).filter(_ < m)
      .map(o => (m - o).toLong).sum
    assert(pairs.count() == expected)
    assert(expected < 15L * m, "edge count must stay O(m log m)")
    // skip-links cut the block's diameter to O(log m) — components still
    // run star contraction (O(log n) rounds on ANY shape), but now the
    // adversarial clique converges in the uniform-input round count
    val comp = DedupOps.connectedComponentsStar(pairs, "id_a", "id_b")
    val labels = comp.select(col("component")).distinct().collect()
    assert(labels.length == 1)
  }

  test("capped pairs give IDENTICAL connected components to uncapped all-pairs") {
    import spark.implicits._
    // 3 dup groups: sizes 50 (over the cap of 10), 8 (under), 2; plus
    // 20 singletons that must produce no pairs at all
    val texts = Map(
      "g1" -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "g2" -> "one two three four five six seven eight nine ten eleven",
      "g3" -> "red orange yellow green blue indigo violet ultraviolet infrared")
    val rows =
      (0 until 50).map(i => (100L + i, texts("g1"))) ++
      (0 until 8).map(i => (500L + i, texts("g2"))) ++
      (0 until 2).map(i => (700L + i, texts("g3"))) ++
      // singletons share NO tokens with anything (minhash bands over
      // partially-shared shingles can legitimately collide)
      (0 until 20).map(i => (900L + i,
        (0 until 10).map(j => s"w${i}x$j").mkString(" ")))
    val docs = rows.toDF("doc_id", "text")
    def components(maxBlock: Int): Map[Long, Long] =
      DedupOps.connectedComponentsStar(
          DedupOps.minhashCandidates(docs, "doc_id", "text",
            maxBandBlock = maxBlock), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val capped = components(10)
    val uncapped = components(Int.MaxValue)
    assert(capped == uncapped)
    // sanity on the shape: three components, labeled by min id
    assert(uncapped.values.toSet == Set(100L, 500L, 700L))
  }

  test("blocks at or below the cap emit the exact all-pairs set") {
    import spark.implicits._
    val banded = Seq(
      (1L, 0, "k1"), (2L, 0, "k1"), (3L, 0, "k1"),   // block of 3
      (7L, 0, "k2"), (8L, 0, "k2"),                  // block of 2
      (9L, 1, "k1")                                  // lone row, no pairs
    ).toDF("id", "band_idx", "band_key")
    val got = DedupOps.cappedBandPairs(banded, "id",
        Seq("band_idx", "band_key"), payload = Nil, maxBlock = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (7L, 8L)))
  }

  test("oversized block emits chain + doubling skips and carries both payloads") {
    import spark.implicits._
    val banded = Seq(
      (5L, 0, "k", 50L), (1L, 0, "k", 10L), (3L, 0, "k", 30L),
      (2L, 0, "k", 20L), (4L, 0, "k", 40L)
    ).toDF("id", "band_idx", "band_key", "fp")
    val got = DedupOps.cappedBandPairs(banded, "id",
        Seq("band_idx", "band_key"), payload = Seq("fp"), maxBlock = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    // offset 1 (chain) + offset 2 + offset 4 skip-links, each with the
    // correct payload pair
    assert(got == Set(
      (1L, 2L, 10L, 20L), (2L, 3L, 20L, 30L),
      (3L, 4L, 30L, 40L), (4L, 5L, 40L, 50L),
      (1L, 3L, 10L, 30L), (2L, 4L, 20L, 40L), (3L, 5L, 30L, 50L),
      (1L, 5L, 10L, 50L)))
    // id_a < id_b everywhere — block order is ascending by construction
    assert(got.forall { case (a, b, _, _) => a < b })
  }

  test("cosinePairs: one giant embedding cluster costs O(m log m) edges, not m^2/2") {
    import spark.implicits._
    // SemDeDup's failure input: near-dups CONCENTRATE in one cluster, so
    // m boilerplate embeddings share a bucket — uncapped that is
    // ~12.5M pairs each shuffling two full vectors
    val m = 5000
    val emb = (0 until m).map(i => (i.toLong, 0, Seq(1.0f, 2.0f, 3.0f, 4.0f)))
      .toDF("vec_id", "bucket", "embedding")
    val pairs = EmbeddingOps.cosinePairs(emb, "vec_id", "embedding",
      "bucket", minCos = 0.9, maxBlock = 256)
    // identical vectors -> every chain + skip edge passes the cosine filter
    val expected = (1 +: (1 to 30).map(1 << _)).filter(_ < m)
      .map(o => (m - o).toLong).sum
    assert(pairs.count() == expected)
    val comp = DedupOps.connectedComponentsStar(pairs, "id_a", "id_b")
    assert(comp.select(col("component")).distinct().count() == 1)
  }

  test("cosinePairs: capped components identical to uncapped all-pairs") {
    import spark.implicits._
    val dim = 24
    def basis(k: Int): Seq[Float] =
      (0 until dim).map(j => if (j == k) 1.0f else 0.0f)
    // dup groups of 50 (over the cap of 10), 8, 2 — each its own bucket —
    // plus 20 mutually-ORTHOGONAL rows sharing one oversized bucket: its
    // chain edges must all FAIL the cosine filter (no false merges from
    // capping)
    val rows =
      (0 until 50).map(i => (100L + i, 1, basis(0))) ++
      (0 until 8).map(i => (500L + i, 2, basis(1))) ++
      (0 until 2).map(i => (700L + i, 3, basis(2))) ++
      (0 until 20).map(i => (900L + i, 4, basis(3 + i)))
    val emb = rows.toDF("vec_id", "bucket", "embedding")
    def components(maxBlock: Int): Map[Long, Long] =
      DedupOps.connectedComponentsStar(
          EmbeddingOps.cosinePairs(emb, "vec_id", "embedding", "bucket",
            minCos = 0.9, maxBlock = maxBlock), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val capped = components(10)
    val uncapped = components(Int.MaxValue)
    assert(capped == uncapped)
    assert(uncapped.values.toSet == Set(100L, 500L, 700L))
    // the orthogonal bucket contributed no vertices at all
    assert(!uncapped.keySet.exists(_ >= 900L))
  }

  test("10k-video viral clip: frame-hash bands cost a chain, not m^2/2") {
    import spark.implicits._
    // the mm_video_dedup / mm_audio_dedup banding over cappedBandPairs:
    // 10k videos whose sampled frames all hash identically (the viral
    // re-upload clique) — one block of 10k per (band, value); uncapped
    // ~50M pairs per band and would not finish here
    val m = 10000
    val fhash = 0x1234abcd5678ef01L
    val banded = (0 until m).flatMap(i => (0 until 4).map(b =>
        (i.toLong, 0, fhash, b, (fhash >> (b * 16)) & 0xffffL)))
      .toDF("doc_id", "frame_idx", "fhash", "band_idx", "band_val")
    val pairs = DedupOps.cappedBandPairs(banded, "doc_id",
      Seq("band_idx", "band_val"), Seq("fhash", "frame_idx"),
      maxBlock = 256)
    val verified = pairs
      .filter(bit_count(col("fhash_a").bitwiseXOR(col("fhash_b"))) <= 6)
      .select(col("id_a"), col("id_b"), col("frame_idx_a"),
        col("frame_idx_b"))
      .distinct()
    val expected = (1 +: (1 to 30).map(1 << _)).filter(_ < m)
      .map(o => (m - o).toLong).sum
    assert(verified.count() == expected)
    assert(expected < 15L * m, "edge count must stay O(m log m)")
    // and the clique still resolves to ONE component downstream
    val comp = DedupOps.connectedComponentsStar(
      verified.select(col("id_a"), col("id_b")), "id_a", "id_b")
    assert(comp.select(col("component")).distinct().count() == 1)
  }
}
