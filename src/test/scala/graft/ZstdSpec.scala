package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Zstd

/** From-spec RFC 8878 decoder vs the INDEPENDENT system `zstd` CLI
  * (tools/gen_zstd_fixtures.py): committed frames across levels 1/3/19,
  * with and without XXH64 checksums, single- and multi-block (> 128 KB),
  * compressible and incompressible payloads — plus the refusal matrix
  * (whole-or-refuse: corrupt inputs must return null, never garbage)
  * and the deterministic raw-block encoder round trip.
  */
class ZstdSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/zstd_fixtures/$name.zst")
    assert(in != null, s"missing fixture $name")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  // (name, raw_len, raw_md5) from the generator manifest
  private val manifest = Seq(
    ("small_l1", 2880, "a2a926ccba7a15544d104fe9a8095728"),
    ("small_l19", 2880, "a2a926ccba7a15544d104fe9a8095728"),
    ("medium_l19_chk", 64800, "d4ac743c514662a174cf4b0a0032fe24"),
    ("medium_l3_nochk", 64800, "d4ac743c514662a174cf4b0a0032fe24"),
    ("large_l19_chk", 302400, "78c21e19375b50accedd032a9c262931"),
    ("entropy_l19", 5000, "20f775d3ecf021739ac4bc2ac6bc7c0e"),
    ("tiny_l19", 144, "b77d49b1549cab63a577239903119c6f"),
    ("empty_l3", 0, "d41d8cd98f00b204e9800998ecf8427e"),
    // hand-crafted long sequence-count header: one block with 0x8000
    // sequences (byte0==255 form) — the count is byte1 + byte2<<8 +
    // 0x7F00 (ADD; an OR loses the carry for any count in
    // [0x8000, 0xFF00) and desyncs the bitstream). CLI-validated at
    // generation time (tools/gen_zstd_fixtures.py craft_seq32k).
    ("seq32k", 98308, "ca44fd73e6d57b7eb0ce448517f1c8f0"))

  for ((name, len, md5) <- manifest) {
    test(s"decodes CLI fixture $name exactly") {
      val dec = Zstd.decompressAll(fixture(name))
      assert(dec != null, s"$name refused")
      assert(dec.length == len)
      assert(md5hex(dec) == md5)
    }
  }

  // dictionary frames from the CLI's --train + -D (the full RFC 8878
  // §5 path: entropy-table preload, rep-offset seeding, matches into
  // the dictionary-content window prefix)
  private val dictManifest = Seq(
    ("dict_small_l3", 8412, "3fd68ad75755d7efdfa8c43f08376fba"),
    ("dict_small_l19", 8412, "434a70f31231cf5eb3c711fb2861d3ff"),
    ("dict_tiny_l3", 28, "2072e9a381c506ba80ce2b53d6e9e495"))

  private def dictBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/zstd_fixtures/dict.bin")
    assert(in != null)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close(); out.toByteArray
  }

  for ((name, len, md5) <- dictManifest) {
    test(s"decodes CLI dictionary fixture $name exactly") {
      val dec = Zstd.decompressAllDict(fixture(name), dictBytes)
      assert(dec != null, s"$name refused")
      assert(dec.length == len)
      assert(md5hex(dec) == md5)
    }
  }

  test("dictionary discipline: missing, wrong, and corrupt dicts refuse") {
    val blob = fixture("dict_small_l3")
    // a dictionary frame without its dictionary must refuse loudly
    assert(Zstd.decompressAll(blob) == null)
    // a dictionary with a different id refuses before decoding
    val wrongId = dictBytes
    wrongId(4) = (wrongId(4) ^ 1).toByte
    assert(Zstd.decompressAllDict(blob, wrongId) == null)
    // torn entropy section refuses
    assert(Zstd.decompressAllDict(blob,
      java.util.Arrays.copyOf(dictBytes, 40)) == null)
    // a NON-dictionary frame still decodes when a dict is supplied
    assert(Zstd.decompressAllDict(fixture("small_l1"), dictBytes) != null)
    // raw-content dictionaries (no magic) are accepted as a window
    // prefix; a dict-id frame against a raw dict decodes on content
    assert(Zstd.decompressAllDict(fixture("small_l1"),
      "no magic here".getBytes) != null)
  }

  test("raw-block encoder round-trips byte-exactly incl. empty and >128KB") {
    for (n <- Seq(0, 1, 255, 256, 65791, 65792, 1 << 17, (1 << 17) + 7, 300000)) {
      val raw = Array.tabulate[Byte](n)(i => ((i * 31 + 7) % 251).toByte)
      val frame = Zstd.compressRaw(raw)
      val back = Zstd.decompressAll(frame)
      assert(back != null, s"n=$n refused")
      assert(java.util.Arrays.equals(back, raw), s"n=$n mismatch")
    }
  }

  test("concatenated frames and skippable frames decode in sequence") {
    val a = Zstd.compressRaw("hello ".getBytes)
    val b = Zstd.compressRaw("world".getBytes)
    val skip = Array[Byte](0x50, 0x2A, 0x4D, 0x18, 3, 0, 0, 0, 9, 9, 9)
    val dec = Zstd.decompressAll(a ++ skip ++ b)
    assert(dec != null && new String(dec) == "hello world")
  }

  test("refusal matrix: corruptions return null, never garbage") {
    val good = fixture("medium_l19_chk")
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 0x29
    assert(Zstd.decompressAll(badMagic) == null)
    // truncation at every framing boundary
    assert(Zstd.decompressAll(good.take(3)) == null)
    assert(Zstd.decompressAll(good.take(9)) == null)
    assert(Zstd.decompressAll(good.dropRight(1)) == null)
    // flipped checksum byte
    val badCk = good.clone(); badCk(badCk.length - 1) = (badCk.last ^ 0x01).toByte
    assert(Zstd.decompressAll(badCk) == null)
    // flipped payload byte deep in the entropy streams
    val badBody = good.clone(); badBody(good.length / 2) = (badBody(good.length / 2) ^ 0x40).toByte
    assert(Zstd.decompressAll(badBody) == null)
    // reserved frame-header bit set
    val badFhd = good.clone(); badFhd(4) = (badFhd(4) | 0x08).toByte
    assert(Zstd.decompressAll(badFhd) == null)
    // trailing junk after a valid frame
    assert(Zstd.decompressAll(good :+ 0x00.toByte) == null)
    // window overflow: descriptor demanding 1 GiB
    val hugeWin = Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte,
      0x00, 0xA0.toByte, 0x01, 0x00, 0x00)
    assert(Zstd.decompressAll(hugeWin) == null)
    // dictionary frames refused loudly
    val dict = Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte,
      0x01, 0x08, 0x42, 0x01, 0x00, 0x00)
    assert(Zstd.decompressAll(dict) == null)
    // decompression-bomb ceiling: FCS far past the cap refuses up front
    val bomb = Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte,
      0xE4.toByte, // single-segment + fcsFlag=3
      -1, -1, -1, -1, -1, -1, -1, -1, // FCS = 2^64-1
      0x01, 0x00, 0x00)
    assert(Zstd.decompressAll(bomb) == null)
    assert(Zstd.decompressAll(Array.emptyByteArray).sameElements(Array.emptyByteArray))
  }

  test("xxh64 matches the published empty-input vector") {
    // XXH64("", seed 0) — public test vector; non-empty inputs are
    // cross-checked via the CLI fixtures carrying -C checksums (the
    // decode refuses if our XXH64 disagrees with the CLI's)
    assert(Zstd.xxh64(Array.emptyByteArray, 0, 0) == 0xEF46DB3751D8E999L)
  }
}
