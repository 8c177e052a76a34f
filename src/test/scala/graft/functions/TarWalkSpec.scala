package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** ustar walk vs committed fixtures from the INDEPENDENT generator
  * (tools/gen_tar_fixtures.py — CPython's Lib/tarfile): member
  * metadata + data bit-exactness, the whole-or-refuse framing matrix
  * (GNU longname, corrupted header checksum, truncation, non-block
  * sizes), and the deterministic pack round trip.
  */
class TarWalkSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/tar_fixtures/$name")
    assert(in != null, s"missing fixture $name")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private def rows(b: Array[Byte]): Seq[(String, String, Long)] = {
    val arr = TarWalk.entries(b)
    assert(arr != null, "archive refused")
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString, r.getLong(2))
    }
  }

  test("plain.tar: file + dir + subdir + multi-block member metadata") {
    assert(rows(fixture("plain.tar")) == Seq(
      ("a.txt", "0", 15L), ("dir/", "5", 0L),
      ("dir/b.txt", "0", 4L), ("big.txt", "0", 1300L)))
  }

  test("member data decodes bit-exactly incl. block-padding boundaries") {
    val b = fixture("plain.tar")
    assert(new String(TarWalk.entry(b, "a.txt"), "UTF-8") ==
      "alpha tar body\n")
    assert(new String(TarWalk.entry(b, "dir/b.txt"), "UTF-8") == "beta")
    val big = TarWalk.entry(b, "big.txt")
    assert(big.length == 1300 &&
      new String(big, 0, 10, "UTF-8") == "0123456789")
    assert(TarWalk.entry(b, "dir/") == null) // not a regular file
    assert(TarWalk.entry(b, "nope") == null)
  }

  test("refusals: GNU longname, bad checksum, truncation, odd length") {
    assert(TarWalk.entries(fixture("longname.tar")) == null)
    assert(TarWalk.entries(fixture("badsum.tar")) == null)
    assert(TarWalk.entries(fixture("trunc.tar")) == null)
    val b = fixture("plain.tar")
    assert(TarWalk.entries(java.util.Arrays.copyOf(b, b.length - 1)) == null)
    assert(TarWalk.entries(java.util.Arrays.copyOf(b, 512)) == null)
    assert(TarWalk.entries(Array[Byte]()) == null)
    // missing second zero block
    assert(TarWalk.entries(java.util.Arrays.copyOf(b, b.length - 512)) == null)
  }

  test("pack round trip: own walker reads the deterministic writer") {
    for (n <- Seq(0, 1, 511, 512, 513, 1300)) {
      val data = Array.tabulate[Byte](n)(i => ((i * 31 + 7) % 251).toByte)
      val t = TarWalk.pack(data)
      assert(t.length % 512 == 0)
      assert(rows(t) == Seq(("doc.txt", "0", n.toLong)))
      assert(java.util.Arrays.equals(TarWalk.entry(t, "doc.txt"), data))
    }
  }
}
