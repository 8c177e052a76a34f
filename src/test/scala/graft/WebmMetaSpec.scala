package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WebmMeta

/** EBML walk vs committed fixtures from the INDEPENDENT python
  * generator (tools/gen_webm_fixtures.py — its own vint packer and
  * element writer): known and UNKNOWN Segment sizes, 4/8-byte Duration
  * floats, non-default TimecodeScale, NUL-padded codec strings, Void
  * elements skipped, Cluster stopping the walk — plus the refusal
  * matrix.
  */
class WebmMetaSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/webm_fixtures/$name")
    assert(in != null, s"missing fixture $name")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  test("vp9+opus webm: both tracks, 8-byte duration, Void + Cluster handled") {
    val r = WebmMeta.parse(fixture("vp9_opus.webm"))
    assert(r != null)
    assert(r.getString(0) == "webm")
    assert(r.getLong(1) == 12345L) // ticks * 1e6 ns / 1e6 = ms
    assert(r.getString(2) == "V_VP9")
    assert(r.getInt(3) == 1920 && r.getInt(4) == 1080)
    assert(r.getString(5) == "A_OPUS")
    assert(r.getInt(6) == 48000 && r.getInt(7) == 2)
  }

  test("vp8+vorbis: unknown segment size runs to EOF; f32 duration; 0.5ms ticks") {
    val r = WebmMeta.parse(fixture("vp8_vorbis_unksize.webm"))
    assert(r != null)
    assert(r.getLong(1) == 1000L) // 2000 ticks * 500000 ns / 1e6
    assert(r.getString(2) == "V_VP8")
    assert(r.getInt(3) == 640 && r.getInt(4) == 360)
    assert(r.getString(5) == "A_VORBIS")
    assert(r.getInt(6) == 44100 && r.getInt(7) == 1)
  }

  test("matroska video-only: NUL-padded codec trimmed, audio fields null, no duration") {
    val r = WebmMeta.parse(fixture("h264_videoonly.mkv"))
    assert(r != null)
    assert(r.getString(0) == "matroska")
    assert(r.isNullAt(1), "no Duration element -> null")
    assert(r.getString(2) == "V_MPEG4/ISO/AVC")
    assert(r.getInt(3) == 1280 && r.getInt(4) == 720)
    assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
  }

  test("audio-only webm: video fields null") {
    val r = WebmMeta.parse(fixture("opus_audioonly.webm"))
    assert(r != null)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    assert(r.getString(5) == "A_OPUS")
    assert(r.getInt(6) == 24000 && r.getInt(7) == 1)
    assert(r.getLong(1) == 500L)
  }

  test("refusal matrix: container violations null, never garbage") {
    val good = fixture("vp9_opus.webm")
    assert(WebmMeta.parse(good) != null)
    // bad EBML magic
    val badMagic = good.clone(); badMagic(0) = 0x42.toByte
    assert(WebmMeta.parse(badMagic) == null)
    // truncated mid-element
    assert(WebmMeta.parse(good.take(40)) == null)
    // doctype outside webm/matroska ("webp")
    val badDt = good.clone()
    val i = indexOfSeq(badDt, "webm".getBytes)
    badDt(i + 3) = 'p'.toByte
    assert(WebmMeta.parse(badDt) == null)
    // empty / non-EBML
    assert(WebmMeta.parse(Array.emptyByteArray) == null)
    assert(WebmMeta.parse("RIFF0000AVI LIST".getBytes) == null)
    // vint with no marker bit in 4 bytes (0x0F first byte is legal ID
    // length 4, but 0x00 is not)
    assert(WebmMeta.parse(Array[Byte](0x00, 0x01, 0x02, 0x03)) == null)
  }

  private def indexOfSeq(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      if (needle.indices.forall(j => hay(i + j) == needle(j))) return i
      i += 1
    }
    -1
  }
}
