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

  // ------------------------------------------------- id3_tags

  // hand-rolled container builder, independent of the query fixture
  // helper: explicit byte layout per the informal ID3v2.x specs
  private def ss(v: Int): Array[Byte] = Array(
    ((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
    ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
  private def be(v: Int, n: Int): Array[Byte] =
    (n - 1 to 0 by -1).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
  private def tag(major: Int, flags: Int, body: Array[Byte]): Array[Byte] =
    "ID3".getBytes("ISO-8859-1") ++ Array(major.toByte, 0.toByte,
      flags.toByte) ++ ss(body.length) ++ body
  private def fr3(id: String, body: Array[Byte]): Array[Byte] =
    id.getBytes("ISO-8859-1") ++ be(body.length, 4) ++ be(0, 2) ++ body
  private def fr4(id: String, body: Array[Byte]): Array[Byte] =
    id.getBytes("ISO-8859-1") ++ ss(body.length) ++ be(0, 2) ++ body
  private def fr2(id: String, body: Array[Byte]): Array[Byte] =
    id.getBytes("ISO-8859-1") ++ be(body.length, 3) ++ body
  private def kv(r: org.apache.spark.sql.catalyst.InternalRow)
      : (String, Seq[(String, String)]) = {
    val arr = r.getArray(1)
    (r.getString(0), (0 until arr.numElements()).map { i =>
      val t = arr.getStruct(i, 2)
      (t.getString(0), t.getString(1))
    })
  }

  test("id3: v2.3 latin-1 frames, trailing NUL stripped, padding walked") {
    val body = fr3("TIT2", 0.toByte +: "Song A\u0000".getBytes("ISO-8859-1")) ++
      fr3("TLAN", 0.toByte +: "eng".getBytes("ISO-8859-1")) ++
      new Array[Byte](12) // padding
    val r = MpegMeta.id3Tags(tag(3, 0, body))
    assert(r != null)
    assert(kv(r) == ("2.3", Seq("TIT2" -> "Song A", "TLAN" -> "eng")))
  }

  test("id3: v2.3 UTF-16 needs a BOM; both byte orders decode") {
    def utf16le(s: String) = Array[Byte](1, 0xff.toByte, 0xfe.toByte) ++
      s.getBytes("UTF-16LE")
    def utf16be(s: String) = Array[Byte](1, 0xfe.toByte, 0xff.toByte) ++
      s.getBytes("UTF-16BE")
    val r = MpegMeta.id3Tags(tag(3, 0,
      fr3("TPE1", utf16le("Artist №9")) ++ fr3("TALB", utf16be("Álbum"))))
    assert(kv(r)._2 == Seq("TPE1" -> "Artist №9", "TALB" -> "Álbum"))
    // no BOM → refuse whole
    val noBom = fr3("TPE1", 1.toByte +: "xx".getBytes("UTF-16BE"))
    assert(MpegMeta.id3Tags(tag(3, 0, noBom)) == null)
  }

  test("id3: v2.4 syncsafe frame sizes, UTF-8/UTF-16BE, non-text skipped") {
    val body = fr4("TIT2", 3.toByte +: "Track ☃".getBytes("UTF-8")) ++
      fr4("WOAR", 0.toByte +: "http://x".getBytes("ISO-8859-1")) ++
      fr4("TCON", 2.toByte +: "field".getBytes("UTF-16BE"))
    val r = MpegMeta.id3Tags(tag(4, 0, body))
    assert(kv(r) == ("2.4", Seq("TIT2" -> "Track ☃", "TCON" -> "field")))
    // a 0x80 bit in a v2.4 frame size is non-syncsafe → refuse
    val bad = body.clone()
    bad(4) = (bad(4) | 0x80).toByte
    assert(MpegMeta.id3Tags(tag(4, 0, bad)) == null)
    // encodings 2/3 are v2.4-only
    assert(MpegMeta.id3Tags(tag(3, 0,
      fr3("TIT2", 3.toByte +: "x".getBytes("UTF-8")))) == null)
  }

  test("id3: v2.2 three-byte ids and 24-bit sizes") {
    val body = fr2("TT2", 0.toByte +: "Old".getBytes("ISO-8859-1")) ++
      fr2("TLA", 0.toByte +: "jpn".getBytes("ISO-8859-1"))
    assert(kv(MpegMeta.id3Tags(tag(2, 0, body))) ==
      ("2.2", Seq("TT2" -> "Old", "TLA" -> "jpn")))
  }

  test("id3: extended headers are stepped over, v2.3 vs v2.4 sizing") {
    val f = fr3("TLAN", 0.toByte +: "deu".getBytes("ISO-8859-1"))
    // v2.3: 4-byte size EXCLUDING itself (6) + flags + padding size
    val ext3 = be(6, 4) ++ be(0, 2) ++ be(0, 4)
    assert(kv(MpegMeta.id3Tags(tag(3, 0x40, ext3 ++ f)))._2 ==
      Seq("TLAN" -> "deu"))
    // v2.4: syncsafe size INCLUDING itself
    val f4 = fr4("TLAN", 0.toByte +: "deu".getBytes("ISO-8859-1"))
    val ext4 = ss(6) ++ Array[Byte](1, 0)
    assert(kv(MpegMeta.id3Tags(tag(4, 0x40, ext4 ++ f4)))._2 ==
      Seq("TLAN" -> "deu"))
  }

  test("id3: 31-bit sizes that wrap Int arithmetic refuse, never crash") {
    // v2.3 extended-header size near Int.MaxValue: pos + 4 + es would
    // wrap negative in Int and slip past `pos > end`; must null
    val extBomb = be(0x7ffffff0, 4) ++ be(0, 2) ++ be(0, 4)
    assert(MpegMeta.id3Tags(tag(3, 0x40,
      extBomb ++ fr3("TIT2", 0.toByte +: "x".getBytes("ISO-8859-1")))) == null)
    // v2.3 frame size near Int.MaxValue: pos + headLen + fsz wraps
    val frameBomb = "TIT2".getBytes("ISO-8859-1") ++ be(0x7ffffff8, 4) ++
      be(0, 2) ++ (0.toByte +: "x".getBytes("ISO-8859-1"))
    assert(MpegMeta.id3Tags(tag(3, 0, frameBomb)) == null)
    // v2.2 24-bit frame size overrunning the tag end also refuses
    val frameBomb2 = "TT2".getBytes("ISO-8859-1") ++ be(0xfffff0, 3) ++
      (0.toByte +: "x".getBytes("ISO-8859-1"))
    assert(MpegMeta.id3Tags(tag(2, 0, frameBomb2)) == null)
  }

  test("id3v1: trailing fixed block, v1.1 track carve-out, padding strip") {
    def block(title: String, artist: String, album: String, year: String,
        comment: Array[Byte], genre: Int): Array[Byte] = {
      def f(s: String, len: Int): Array[Byte] =
        java.util.Arrays.copyOf(s.getBytes("ISO-8859-1"), len)
      "TAG".getBytes("ISO-8859-1") ++ f(title, 30) ++ f(artist, 30) ++
        f(album, 30) ++ f(year, 4) ++
        java.util.Arrays.copyOf(comment, 30) :+ genre.toByte
    }
    // v1.1: comment[28]=0 marker, comment[29]=track
    val c11 = java.util.Arrays.copyOf("great ride".getBytes("ISO-8859-1"), 30)
    c11(29) = 12
    val audio = Array.fill(64)(0x55.toByte) // tag parses from the END
    val r = MpegMeta.id3v1Tags(
      audio ++ block("Song X", "Artist Y  ", "", "1991", c11, 17))
    assert(r != null)
    assert(r.getString(0) == "Song X" && r.getString(1) == "Artist Y" &&
      r.getString(2) == "" && r.getString(3) == "1991" &&
      r.getString(4) == "great ride" && r.getInt(5) == 12 &&
      r.getInt(6) == 17)
    // v1.0: comment byte 28 nonzero → no track
    val c10 = java.util.Arrays.copyOf(
      ("x" * 30).getBytes("ISO-8859-1"), 30)
    val r0 = MpegMeta.id3v1Tags(block("t", "a", "b", "2001", c10, 1))
    assert(r0.getInt(5) == -1 && r0.getString(4) == "x" * 30)
    // no TAG block / short buffer → null
    assert(MpegMeta.id3v1Tags(audio) == null)
    assert(MpegMeta.id3v1Tags(Array[Byte](1, 2, 3)) == null)
  }

  test("id3: seeded mutation fuzz — tag list or null, never a crash") {
    val rnd = new scala.util.Random(4242)
    val bases = Seq(
      tag(3, 0, fr3("TIT2", 0.toByte +: "Song".getBytes("ISO-8859-1")) ++
        fr3("TPE1", Array[Byte](1, 0xff.toByte, 0xfe.toByte) ++
          "Aé".getBytes("UTF-16LE"))),
      tag(4, 0, fr4("TALB", 3.toByte +: "Al ☃".getBytes("UTF-8"))),
      tag(2, 0, fr2("TT2", 0.toByte +: "Old".getBytes("ISO-8859-1"))))
    var i = 0
    while (i < 3000) {
      val b = bases(i % bases.length).clone()
      var k = 0
      val flips = 1 + rnd.nextInt(3)
      while (k < flips) {
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        k += 1
      }
      MpegMeta.id3Tags(b) // null or rows — must not throw
      MpegMeta.id3v1Tags(b)
      i += 1
    }
    // random garbage behind a plausible header prefix
    i = 0
    while (i < 1000) {
      val b = new Array[Byte](10 + rnd.nextInt(200))
      rnd.nextBytes(b)
      b(0) = 'I'; b(1) = 'D'; b(2) = '3'
      MpegMeta.id3Tags(b)
      val t = new Array[Byte](128 + rnd.nextInt(64))
      rnd.nextBytes(t)
      t(t.length - 128) = 'T'; t(t.length - 127) = 'A'; t(t.length - 126) = 'G'
      val r = MpegMeta.id3v1Tags(t)
      assert(r != null) // fixed block: always decodes (fields are bytes)
      i += 1
    }
  }

  test("id3: refusal matrix — truncation, unsync flag, bad encoding, junk id") {
    val f = fr3("TIT2", 0.toByte +: "x".getBytes("ISO-8859-1"))
    // frame size past the tag end
    val trunc = fr3("TIT2", new Array[Byte](3))
    val cut = trunc.clone(); cut(7) = 99 // declared 3 → 99
    assert(MpegMeta.id3Tags(tag(3, 0, cut)) == null)
    // unsynchronisation flag
    assert(MpegMeta.id3Tags(tag(3, 0x80, f)) == null)
    // reserved encoding byte
    assert(MpegMeta.id3Tags(tag(3, 0,
      fr3("TIT2", 9.toByte +: "x".getBytes("ISO-8859-1")))) == null)
    // lowercase frame id is outside the grammar
    assert(MpegMeta.id3Tags(tag(3, 0,
      fr3("tit2", 0.toByte +: "x".getBytes("ISO-8859-1")))) == null)
    // not an ID3 container at all
    assert(MpegMeta.id3Tags("RIFF".getBytes("ISO-8859-1")) == null)
    // v2.3 compressed-frame flag refuses
    val cf = f.clone(); cf(9) = 0x80.toByte
    assert(MpegMeta.id3Tags(tag(3, 0, cf)) == null)
  }
}
