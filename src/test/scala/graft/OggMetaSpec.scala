package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.OggMeta

/** Ogg container walk vs committed fixtures from the INDEPENDENT
  * python generator (tools/gen_ogg_fixtures.py — its own CRC table and
  * page packer): Vorbis + Opus id headers, 255-split lacing, granule
  * duration arithmetic — plus the refusal matrix (bad CRC, truncation,
  * non-BOS start, version byte, sequence gaps, second serial, missing
  * EOS, unknown first packet, trailing junk).
  */
class OggMetaSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/ogg_fixtures/$name.ogg")
    assert(in != null, s"missing fixture $name")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  // (name, codec, ch, rate, brNom, preSkip, nPages, durMs) pinned from
  // the generator's own arithmetic:
  //   vorbis_44k_mono: last granule 3*44100 -> 3000 ms
  //   opus_48k_stereo: last granule 312 + 4*960, minus pre-skip 312 -> 80 ms
  //   vorbis_lacing255: one 600-byte packet page, granule 48000 -> 1000 ms
  //   opus_zero_duration: granule == pre-skip -> 0 ms
  private val expected = Seq(
    ("vorbis_44k_mono", "vorbis", 1, 44100, 128000, -1, 4, 3000L),
    ("opus_48k_stereo", "opus", 2, 48000, -1, 312, 5, 80L),
    ("vorbis_lacing255", "vorbis", 2, 48000, 192000, -1, 2, 1000L),
    ("opus_zero_duration", "opus", 1, 48000, -1, 3840, 2, 0L))

  for ((name, codec, ch, rate, brNom, preSkip, nPages, durMs) <- expected) {
    test(s"walks generator fixture $name to the pinned metadata") {
      val r = OggMeta.parse(fixture(name))
      assert(r != null, s"$name refused")
      assert(r.getString(0) == codec)
      assert(r.getInt(1) == ch)
      assert(r.getInt(2) == rate)
      if (brNom < 0) assert(r.isNullAt(3)) else assert(r.getInt(3) == brNom)
      if (preSkip < 0) assert(r.isNullAt(4)) else assert(r.getInt(4) == preSkip)
      assert(r.getInt(5) == nPages)
      assert(r.getLong(6) == durMs)
    }
  }

  test("refusal matrix: every container violation nulls, never garbage") {
    val good = fixture("vorbis_44k_mono")
    assert(OggMeta.parse(good) != null)

    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // bad capture pattern
    assert(OggMeta.parse(mutated(_(0) = 'X'.toByte)) == null)
    // nonzero stream-structure version
    assert(OggMeta.parse(mutated(_(4) = 1.toByte)) == null)
    // flipped payload byte -> CRC mismatch
    assert(OggMeta.parse(mutated(b => b(40) = (b(40) ^ 0x5a).toByte)) == null)
    // stale CRC (checksum field corrupted directly)
    assert(OggMeta.parse(mutated(b => b(22) = (b(22) ^ 1).toByte)) == null)
    // first page stripped of BOS: walk must refuse at page 0
    assert(OggMeta.parse(mutated(_(5) = 0.toByte)) == null)
    // truncated final page
    assert(OggMeta.parse(good.dropRight(5)) == null)
    // trailing junk after EOS
    assert(OggMeta.parse(good ++ Array[Byte](1, 2, 3)) == null)
    // empty / non-ogg
    assert(OggMeta.parse(Array.emptyByteArray) == null)
    assert(OggMeta.parse("RIFF1234WAVE".getBytes) == null)

    // rebuild-level violations need valid CRCs: use the engine's own
    // pageCrc to re-seal mutated pages (the generator covers the
    // independent-CRC direction)
    def reseal(b: Array[Byte]): Array[Byte] = {
      // single-pass: walk pages structurally, rewrite each checksum
      var pos = 0
      while (pos + 27 <= b.length && b(pos) == 'O') {
        val nSegs = b(pos + 26) & 0xff
        var payload = 0
        for (s <- 0 until nSegs) payload += b(pos + 27 + s) & 0xff
        val len = 27 + nSegs + payload
        if (pos + len > b.length) return b
        val crc = OggMeta.pageCrc(b, pos, len)
        b(pos + 22) = (crc & 0xff).toByte
        b(pos + 23) = ((crc >>> 8) & 0xff).toByte
        b(pos + 24) = ((crc >>> 16) & 0xff).toByte
        b(pos + 25) = ((crc >>> 24) & 0xff).toByte
        pos += len
      }
      b
    }
    // page-sequence gap (second page renumbered)
    val gap = good.clone()
    val p2 = pageOffsets(gap)(1)
    gap(p2 + 18) = 9.toByte
    assert(OggMeta.parse(reseal(gap)) == null)
    // second serial mid-stream (multiplexed)
    val mux = good.clone()
    mux(p2 + 14) = (mux(p2 + 14) ^ 0x7f).toByte
    assert(OggMeta.parse(reseal(mux)) == null)
    // EOS bit stripped from the last page
    val noEos = good.clone()
    val pLast = pageOffsets(noEos).last
    noEos(pLast + 5) = 0.toByte
    assert(OggMeta.parse(reseal(noEos)) == null)
    // unknown first packet (id header magic corrupted)
    val badId = good.clone()
    val idPayload = pageOffsets(badId).head + 27 + 1 // 1 lacing byte on BOS
    badId(idPayload) = 0x42.toByte
    assert(OggMeta.parse(reseal(badId)) == null)
  }

  test("tags: vorbis comment page from the independent generator") {
    val r = OggMeta.parseTags(fixture("vorbis_tags"))
    assert(r != null)
    assert(r.getString(0) == "vorbis")
    assert(r.getString(1) == "indie-enc 0.9")
    val tags = r.getArray(2)
    val kv = (0 until tags.numElements()).map { i =>
      val t = tags.getStruct(i, 2)
      t.getUTF8String(0).toString -> t.getUTF8String(1).toString
    }
    assert(kv == Seq("TITLE" -> "Nocturne", "ARTIST" -> "Renée",
      "GENRE" -> "a", "GENRE" -> "b"))
    // the tagged stream still passes the integrity walk
    assert(OggMeta.parse(fixture("vorbis_tags")) != null)
  }

  test("tags: OpusTags packet SPANNING two pages via 255-lacing + cont flag") {
    val r = OggMeta.parseTags(fixture("opus_tags_spanning"))
    assert(r != null)
    assert(r.getString(0) == "opus")
    assert(r.getString(1) == "opusenc from libopus 1.4")
    val tags = r.getArray(2)
    assert(tags.numElements() == 2)
    val c = tags.getStruct(1, 2)
    assert(c.getUTF8String(0).toString == "COMMENT")
    assert(c.getUTF8String(1).toString == "x" * 600)
  }

  test("tags refusals: no comment packet, missing '=', stale CRC") {
    // streams whose packet 2 is an audio packet: not a comment header
    assert(OggMeta.parseTags(fixture("vorbis_44k_mono")) == null)
    // flipped byte in the comment page -> CRC refusal
    val b = fixture("vorbis_tags")
    b(120) = (b(120) ^ 0x40).toByte
    assert(OggMeta.parseTags(b) == null)
    assert(OggMeta.parseTags(Array.emptyByteArray) == null)
  }

  private def pageOffsets(b: Array[Byte]): Seq[Int] = {
    var pos = 0
    val out = Seq.newBuilder[Int]
    while (pos + 27 <= b.length && b(pos) == 'O') {
      out += pos
      val nSegs = b(pos + 26) & 0xff
      var payload = 0
      for (s <- 0 until nSegs) payload += b(pos + 27 + s) & 0xff
      pos += 27 + nSegs + payload
    }
    out.result()
  }
}
