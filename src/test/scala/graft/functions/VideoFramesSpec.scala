package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSuite

/** Frame sampling from AVI movi chunks: exact mean luma on known frames,
  * the every-k stride over ALL frame chunks (including unsampled
  * compressed ones), skipping non-movi LISTs, and the refusal paths
  * (sampled compressed frame, ragged triples, truncation, no movi).
  */
class VideoFramesSpec extends SparkSuite {

  /** Build an AVI: frames as (id, payload) chunks inside LIST movi,
    * preceded by an empty hdrl LIST the walk must skip.
    */
  private def avi(frames: Seq[(String, Array[Byte])]): Array[Byte] = {
    val movi = ByteBuffer.allocate(4096).order(ByteOrder.LITTLE_ENDIAN)
    movi.put("movi".getBytes)
    frames.foreach { case (id, payload) =>
      movi.put(id.getBytes).putInt(payload.length).put(payload)
      if (payload.length % 2 == 1) movi.put(0.toByte)
    }
    val m = movi.position()
    val out = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(0).put("AVI ".getBytes)
    out.put("LIST".getBytes).putInt(4).put("hdrl".getBytes)
    out.put("LIST".getBytes).putInt(m).put(movi.array(), 0, m)
    val n = out.position()
    val res = new Array[Byte](n)
    out.flip(); out.get(res)
    // fix the RIFF size so bounds checks see a consistent container
    ByteBuffer.wrap(res).order(ByteOrder.LITTLE_ENDIAN).putInt(4, n - 8)
    res
  }

  /** npx gray pixels (r=g=b=v) as a BGR24 payload. */
  private def gray(vs: Int*): Array[Byte] =
    vs.flatMap(v => Seq(v.toByte, v.toByte, v.toByte)).toArray

  private def sample(b: Array[Byte], k: Int): Option[Seq[(Int, Int)]] =
    Option(VideoFrames.sample(b, k)).map { ad =>
      (0 until ad.numElements()).map { i =>
        val r = ad.getStruct(i, 2)
        (r.getInt(0), r.getInt(1))
      }
    }

  test("every-k sampling with exact integer mean luma") {
    val b = avi(Seq(
      "00db" -> gray(10, 20),       // frame 0: mean 15
      "00db" -> gray(200, 201),     // frame 1 (unsampled at k=2)
      "01db" -> gray(7, 8),         // frame 2: mean 7 (floor)
      "00db" -> gray(0, 255)))      // frame 3 (unsampled)
    assert(sample(b, 2) == Some(Seq(0 -> 15, 2 -> 7)))
    assert(sample(b, 1).map(_.size) == Some(4))
    assert(sample(b, 4) == Some(Seq(0 -> 15)))
  }

  test("unsampled compressed frames stride the index; sampled ones refuse") {
    val b = avi(Seq(
      "00db" -> gray(100),
      "00dc" -> Array[Byte](1, 2),  // compressed, unsampled at k=2 — fine
      "00db" -> gray(50)))
    assert(sample(b, 2) == Some(Seq(0 -> 100, 2 -> 50)))
    val bad = avi(Seq("00dc" -> Array[Byte](1, 2, 3)))
    assert(sample(bad, 1).isEmpty, "sampled compressed frame must refuse")
  }

  test("null, never garbage: ragged triples, truncation, no movi, bad k") {
    val ragged = avi(Seq("00db" -> Array[Byte](1, 2, 3, 4)))
    assert(sample(ragged, 1).isEmpty, "non-triple payload must refuse")
    val ok = avi(Seq("00db" -> gray(9)))
    assert(sample(ok.dropRight(2), 1).isEmpty, "truncated container must refuse")
    // byte 32 is the movi LIST's type fourcc (12 RIFF hdr + 12 hdrl + 8)
    val noMovi = avi(Seq.empty).patch(32, "xxxx".getBytes.toSeq, 4).toArray
    assert(sample(noMovi, 1).isEmpty, "no movi LIST must refuse")
    assert(sample(ok, 0).isEmpty, "k < 1 must refuse")
    assert(sample("RIFF0000AVI ".getBytes, 1).isEmpty)
  }

  test("codegen path agrees through the SQL surface") {
    VideoFrames.register(spark)
    import spark.implicits._
    val rows = Seq((1L, avi(Seq("00db" -> gray(10, 20), "00db" -> gray(30, 40)))))
      .toDF("id", "blob")
      .selectExpr("id", "explode(video_frame_sample(blob, 2)) AS fr")
      .selectExpr("id", "fr.frame_idx", "fr.mean_luma")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(rows == Set((1L, 0, 15)))
  }
}
