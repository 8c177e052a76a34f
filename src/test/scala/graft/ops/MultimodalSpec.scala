package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Multimodal plumbing: binary columns, metadata struct, partition-wise
  * stub decode — schema and batch shape are the real contract under test.
  */
class MultimodalSpec extends SparkSuite {

  lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "hello world"),
      (2L, ""),
      (3L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
      .withColumn("blob", encode(col("text"), "UTF-8").cast("binary"))
  }

  test("media metadata: byte length, hash, mime fallback") {
    val out = MultimodalOps.withMediaMeta(docs, "blob")
      .select(col("id"), col("blob_meta.n_bytes"), col("blob_meta.mime"),
        col("blob_meta.sha_hex"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out.map(t => (t._1, t._2)) == Set((1L, 11L), (2L, 0L), (3L, 43L)))
    assert(out.forall(_._3 == "application/octet-stream"))
  }

  test("jpeg magic bytes detected") {
    import spark.implicits._
    val jpeg = Seq((1L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0x01, 0x02)))
      .toDF("id", "blob")
    val mime = MultimodalOps.withMediaMeta(jpeg, "blob")
      .select(col("blob_meta.mime")).collect()(0).getString(0)
    assert(mime == "image/jpeg")
  }

  test("stub decode produces deterministic fixed-dim features") {
    val out = MultimodalOps.decodeFeatures(docs, "blob", dim = 8)
      .select(col("id"), col("blob_features"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[scala.collection.Seq[Float]](1))).toMap
    assert(out(1L).get.length == 8)
    assert(out(2L).get.forall(_ == 0f))
    // deterministic: decoding twice gives identical vectors
    val again = MultimodalOps.decodeFeatures(docs, "blob", dim = 8)
      .select(col("id"), col("blob_features"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1)).toMap
    assert(out(1L).get == again(1L))
    assert(out(3L).get == again(3L))
  }
}
