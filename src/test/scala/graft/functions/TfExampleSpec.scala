package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** tf.Example wire walk vs the independent from-scratch writer
  * (tools/gen_tfexample_fixtures.py): value-level decode across packed
  * and unpacked list encodings, unknown-field skipping, and the
  * refusal matrix the oracle rows can't reach (mid-varint tears,
  * group wire types, packed float misalignment, double-kind
  * features).
  */
class TfExampleSpec extends AnyFunSuite {

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // the generator's 'basic' fixture
  private val basic = hx(
    "0A560A1D0A06746F6B656E7312131A110A0F0301040105F7FFFFFFFFFFFFFFFF01" +
    "0A190A0573636F72651210120E0A0C0000003F0000A0BF0000C842" +
    "0A1A0A057469746C6512110A0F0A0B68656C6C6F20776F726C640A00")

  private def rows(b: Array[Byte]) = {
    val arr = TfExample.parse(b)
    assert(arr != null, "refused")
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 5)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString,
        (0 until r.getArray(2).numElements()).map(r.getArray(2).getLong),
        (0 until r.getArray(3).numElements()).map(r.getArray(3).getDouble),
        (0 until r.getArray(4).numElements())
          .map(j => r.getArray(4).getUTF8String(j).toString))
    }
  }

  test("basic: packed int64 (incl. negative), packed float, bytes md5") {
    val rs = rows(basic)
    assert(rs.map(_._1) == Seq("tokens", "score", "title"))
    assert(rs(0)._3 == Seq(3L, 1L, 4L, 1L, 5L, -9L))
    assert(rs(1)._4 == Seq(0.5, -1.25, 100.0))
    assert(rs(2)._5 == Seq("5eb63bbbe01eeed093cb22bb8f5acdc3",
      "d41d8cd98f00b204e9800998ecf8427e"))
  }

  test("unpacked numeric encodings and unknown-field skipping") {
    val unpacked = hx(
      "0A240A140A03696473120D1A0B08070800088080808080200A0C0A0177120712050D00003040")
    val rs = rows(unpacked)
    assert(rs(0)._3 == Seq(7L, 0L, 1L << 40))
    assert(rs(1)._4 == Seq(2.75))
    val unknown = hx(
      "0A1D0A0A0A017812051A030A012A48E7074101020304050607083DAABBCCDD1005")
    assert(rows(unknown).map(r => (r._1, r._3)) == Seq(("x", Seq(42L))))
  }

  test("empty example and default feature decode, not refuse") {
    assert(rows(hx("0A00")).isEmpty)
    val rs = rows(hx(
      "0A1D0A0E0A086E6F6E655F696E7412021A000A0B0A076E6F5F6B696E641200"))
    assert(rs.map(r => (r._1, r._2)) ==
      Seq(("none_int", "int64"), ("no_kind", "none")))
  }

  test("refusals: tears, groups, misaligned floats, double kind") {
    // torn length-delimited payload
    assert(TfExample.parse(basic.dropRight(4)) == null)
    // mid-varint tear: a continuation byte at buffer end
    assert(TfExample.parse(hx("F8")) == null)
    // group wire types (3/4) refuse, known field or unknown
    assert(TfExample.parse(hx("0B")) == null)
    assert(TfExample.parse(hx("13")) == null)
    // packed float list whose payload is not a multiple of 4
    assert(TfExample.parse(hx("0A0E0A0C0A016612071205" +
      "0A03010203")) == null)
    // a Feature with two kinds set (bytes_list AND int64_list)
    assert(TfExample.parse(hx("0A100A0E0A017412090A030A0141" +
      "1A020801")) == null)
    // known field with contradicting wire type (Int64List field 1 wire 5)
    assert(TfExample.parse(hx("0A100A0E0A0362616412071A050D01020304")) == null)
    // Features field 1 with non-message wire type
    assert(TfExample.parse(hx("0A02082A")) == null)
  }
}
