package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Random-hyperplane SimHash semantics: determinism, the angle↔hamming
  * monotone relationship on crafted vectors, and refusal paths.
  */
class EmbedSimHashSpec extends SparkSuite {

  private def hashOf(vecs: Seq[Array[Float]], dim: Int = 8): Seq[Option[Long]] = {
    EmbedSimHash.register(spark, bits = 60, dim = dim)
    import spark.implicits._
    vecs.toDF("embedding")
      .selectExpr("embed_simhash(embedding) AS h")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
  }

  test("identical and scaled vectors hash identically; opposite vectors far") {
    val v = Array(0.5f, -1.2f, 3.3f, 0.01f, -2.0f, 1.1f, 0.7f, -0.3f)
    val scaled = v.map(_ * 2.0f)
    val opposite = v.map(-_)
    val Seq(Some(h1), Some(h2), Some(h3)) = hashOf(Seq(v, scaled, opposite))
    assert(h1 == h2, "positive scaling preserves every projection sign")
    val ham = java.lang.Long.bitCount(h1 ^ h3)
    // sign flip negates every non-zero projection: hamming ≈ bits
    assert(ham > 45, s"opposite vector only $ham bits away")
  }

  test("hamming grows with angle") {
    val base = Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)
    def rot(eps: Float) = Array(1f + eps, 1f - eps, 1f, 1f, 1f, 1f, 1f, 1f)
    val Seq(Some(h0), Some(hSmall), Some(hBig)) =
      hashOf(Seq(base, rot(0.1f), base.map(_ * -0.5f)))
    val dSmall = java.lang.Long.bitCount(h0 ^ hSmall)
    val dBig = java.lang.Long.bitCount(h0 ^ hBig)
    assert(dSmall < dBig, s"small-angle $dSmall !< large-angle $dBig")
    assert(dSmall <= 10, s"0.1-perturbation moved $dSmall of 60 bits")
  }

  test("wrong dimensionality and null elements refuse with null") {
    assert(hashOf(Seq(Array(1f, 2f, 3f))) == Seq(None)) // dim 3 != 8
  }

  test("matches the oracle's md5-parity plane convention bit-for-bit") {
    // replicate plane (i=0) host-side and check bit 0 by hand for a vector
    // aligned with that plane's signs: projection strictly positive → bit set
    val planes = EmbedSimHash.planeMatrix(60, 8)
    val aligned = planes(0).map(s => s.toFloat) // +1/-1 pattern itself
    val Seq(Some(h)) = hashOf(Seq(aligned))
    assert((h & 1L) == 1L, "self-aligned vector must set plane-0's bit")
  }
}
