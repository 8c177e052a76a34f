package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Thrift-compact footer walk vs pyarrow's own metadata API (the
  * independent side): version/rows/writer, per-chunk codec and stats,
  * and the refusal matrix.
  */
class ParquetMetaSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/parquet_fixtures/$name.parquet")
    assert(in != null, s"missing fixture $name")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  test("two-row-group snappy file: every chunk field matches pyarrow") {
    val r = ParquetMeta.parse(fixture("pq_snappy_2rg"))
    assert(r != null)
    assert(r.getInt(0) == 2 && r.getLong(1) == 6L && r.getInt(3) == 2)
    assert(r.getUTF8String(2).toString ==
      "parquet-cpp-arrow version 16.1.0")
    val cols = r.getArray(4)
    assert(cols.numElements() == 6)
    val rows = (0 until 6).map { i =>
      val c = cols.getStruct(i, 9)
      (c.getInt(0), c.getUTF8String(1).toString,
        c.getUTF8String(2).toString, c.getUTF8String(3).toString,
        c.getLong(5), c.getLong(6), c.getLong(7), c.getLong(8))
    }
    // pinned from the generator's pyarrow metadata dump
    assert(rows(0) == ((0, "id", "int64", "snappy", 3L, 104L, 100L, 1L)))
    assert(rows(5) == ((1, "name", "byte_array", "snappy", 3L, 66L, 62L, 1L)))
    assert((0 until 6).forall(i =>
      cols.getStruct(i, 9).getUTF8String(4).toString ==
        "plain,rle,rle_dictionary"))
  }

  test("zstd and uncompressed codecs surface by name") {
    val z = ParquetMeta.parse(fixture("pq_zstd"))
    assert(z.getArray(4).getStruct(0, 9).getUTF8String(3)
      .toString == "zstd")
    val p = ParquetMeta.parse(fixture("pq_plain"))
    assert(p.getArray(4).getStruct(2, 9).getUTF8String(3)
      .toString == "uncompressed")
    assert(p.getArray(4).getStruct(2, 9).getLong(5) == 6L)
  }

  test("refusals: torn footer, bad magics, oversize footer length") {
    assert(ParquetMeta.parse(fixture("pq_torn")) == null)
    val good = fixture("pq_plain")
    val frontBad = good.clone(); frontBad(0) = 'X'
    assert(ParquetMeta.parse(frontBad) == null)
    val backBad = good.clone(); backBad(good.length - 1) = 'X'
    assert(ParquetMeta.parse(backBad) == null)
    val lenBad = good.clone()
    lenBad(good.length - 6) = 0x7f // footer length past the buffer
    assert(ParquetMeta.parse(lenBad) == null)
    assert(ParquetMeta.parse(Array.emptyByteArray) == null)
    assert(ParquetMeta.parse("PAR1PAR1".getBytes) == null)
  }
}
