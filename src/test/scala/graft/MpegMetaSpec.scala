package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MpegMeta

/** MPEG audio frame-header walk vs committed fixtures from the
  * INDEPENDENT python generator (tools/gen_mp3_fixtures.py — its own
  * copy of the ISO 11172-3 tables): VBR bitrate changes, padding bits,
  * ID3v2 with footer + ID3v1 tag, all version/layer families — plus the
  * refusal matrix (free format, reserved codes, truncation, junk).
  */
class MpegMetaSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/mp3_fixtures/$name.mp3")
    assert(in != null, s"missing fixture $name")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  // (name, version, layer, sample_rate, bitrate_kbps, channels, n_frames,
  // duration_ms) pinned from the generator's own arithmetic
  private val expected = Seq(
    ("vbr_v1l3", "1", 3, 44100, 128, 2, 6, 156L),
    ("id3_v25l3", "2.5", 3, 12000, 48, 1, 4, 192L),
    ("cbr_v2l2", "2", 2, 22050, 96, 2, 5, 261L),
    ("pad_v1l1", "1", 1, 32000, 96, 2, 3, 36L))

  for ((name, ver, lay, sr, kbps, ch, nf, dur) <- expected) {
    test(s"walks generator fixture $name to the pinned metadata") {
      val r = MpegMeta.parse(fixture(name))
      assert(r != null, s"$name refused")
      assert(r.getString(0) == ver)
      assert(r.getInt(1) == lay)
      assert(r.getInt(2) == sr)
      assert(r.getInt(3) == kbps)
      assert(r.getInt(4) == ch)
      assert(r.getInt(5) == nf)
      assert(r.getLong(6) == dur)
    }
  }

  test("adts: frame walk across versions/profiles, multi-block duration, CRC headers") {
    // hand-built headers (independent arithmetic from the query helper)
    def frame(mpeg2: Boolean, profIdx: Int, srIdx: Int, chCfg: Int,
        blocks: Int, payload: Int, crc: Boolean = false): Array[Byte] = {
      val len = (if (crc) 9 else 7) + payload
      val out = new Array[Byte](len)
      out(0) = 0xff.toByte
      out(1) = (0xf0 | (if (mpeg2) 8 else 0) | (if (crc) 0 else 1)).toByte
      out(2) = ((profIdx << 6) | (srIdx << 2) | (chCfg >> 2)).toByte
      out(3) = (((chCfg & 3) << 6) | ((len >> 11) & 3)).toByte
      out(4) = ((len >> 3) & 0xff).toByte
      out(5) = (((len & 7) << 5) | 0x1f).toByte
      out(6) = (0xfc | (blocks - 1)).toByte
      out
    }
    // MPEG-4 LC 44100 stereo, 3 single-block frames
    val lc = Array.fill(3)(frame(mpeg2 = false, 1, 4, 2, 1, 50)).flatten
    val r1 = MpegMeta.adtsParse(lc)
    assert(r1 != null && r1.getInt(0) == 4 && r1.getInt(1) == 2 &&
      r1.getInt(2) == 44100 && r1.getInt(3) == 2 && r1.getInt(4) == 3 &&
      r1.getLong(5) == 3L * 1024 * 1000 / 44100)
    // MPEG-2 with CRC header and 2 raw data blocks per frame
    val crc2 = Array.fill(2)(frame(mpeg2 = true, 0, 7, 1, 2, 40, crc = true)).flatten
    val r2 = MpegMeta.adtsParse(crc2)
    assert(r2 != null && r2.getInt(0) == 2 && r2.getInt(1) == 1 &&
      r2.getInt(2) == 22050 && r2.getInt(4) == 2 &&
      r2.getLong(5) == 2L * 2048 * 1000 / 22050)
    // refusals: forbidden freq index, PCE channel config, truncation,
    // layer bits set, cross-frame rate change
    assert(MpegMeta.adtsParse(frame(mpeg2 = false, 1, 15, 2, 1, 10)) == null)
    assert(MpegMeta.adtsParse(frame(mpeg2 = false, 1, 4, 0, 1, 10)) == null)
    assert(MpegMeta.adtsParse(lc.dropRight(1)) == null)
    val badLayer = lc.clone(); badLayer(1) = (badLayer(1) | 0x02).toByte
    assert(MpegMeta.adtsParse(badLayer) == null)
    assert(MpegMeta.adtsParse(
      frame(mpeg2 = false, 1, 4, 2, 1, 10) ++ frame(mpeg2 = false, 1, 5, 2, 1, 10)) == null)
  }

  test("refusal matrix: free format, reserved codes, truncation, junk") {
    val good = fixture("cbr_v2l2")
    // free-format bitrate index (0): frame size undefined -> refuse
    assert(MpegMeta.parse(Array(0xFF, 0xFB, 0x04, 0x00).map(_.toByte)) == null)
    // invalid bitrate index (15)
    assert(MpegMeta.parse(Array(0xFF, 0xFB, 0xF0, 0x00).map(_.toByte)) == null)
    // reserved version (bits 01)
    assert(MpegMeta.parse(Array(0xFF, 0xEB, 0x90, 0x00).map(_.toByte)) == null)
    // reserved layer (bits 00)
    assert(MpegMeta.parse(Array(0xFF, 0xF9, 0x90, 0x00).map(_.toByte)) == null)
    // reserved sample-rate index (11)
    assert(MpegMeta.parse(Array(0xFF, 0xFB, 0x9C, 0x00).map(_.toByte)) == null)
    // broken sync
    assert(MpegMeta.parse("not an mpeg stream at all".getBytes) == null)
    // truncated final frame
    assert(MpegMeta.parse(good.dropRight(1)) == null)
    // trailing junk that is not a 128-byte TAG block
    assert(MpegMeta.parse(good ++ Array[Byte](0, 0, 0)) == null)
    // empty input
    assert(MpegMeta.parse(Array.emptyByteArray) == null)
    // ID3v2 whose declared size runs past the buffer
    assert(MpegMeta.parse(("ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 7, 0x7f))) == null)
    // cross-frame sample-rate change (mixed families) must refuse
    val f1 = fixture("pad_v1l1")
    assert(MpegMeta.parse(good ++ f1) == null)
  }
}
