package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Arrow IPC walk vs the INDEPENDENT pyarrow writer
  * (tools/gen_arrow_fixtures.py): stream + file envelopes, flatbuffers
  * metadata, validity bitmaps, varbinary offsets, zstd/lz4 body
  * compression through the repo's own from-spec codecs, and the
  * refusal matrix (torn tails, dictionary encoding, type mismatches).
  */
class ArrowIpcSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/arrow_fixtures/$name.arrow")
    assert(in != null, s"missing fixture $name")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private def u(s: String) = UTF8String.fromString(s)

  test("audit: stream and file formats, fields, nulls, batches") {
    for ((name, fmt) <- Seq("stream_basic" -> "stream",
        "file_basic" -> "file")) {
      val r = ArrowIpc.audit(fixture(name))
      assert(r != null, s"$name refused")
      assert(r.getUTF8String(0).toString == fmt)
      assert(r.getInt(1) == 2 && r.getLong(2) == 6L)
      assert(r.getUTF8String(3).toString == "none")
      val fs = r.getArray(4)
      val rows = (0 until fs.numElements()).map { i =>
        val f = fs.getStruct(i, 4)
        (f.getUTF8String(0).toString, f.getUTF8String(1).toString,
          f.getBoolean(2), f.getLong(3))
      }
      assert(rows == Seq(("id", "int64", true, 2L),
        ("score", "float64", true, 1L), ("text", "utf8", true, 1L),
        ("flag", "bool", true, 1L)))
    }
  }

  test("column extractors: values + nulls across batches, bit-exact") {
    val b = fixture("stream_basic")
    val ids = ArrowIpc.colI64(b, u("id"))
    assert((0 until 6).map(i =>
      if (ids.isNullAt(i)) None else Some(ids.getLong(i))) ==
      Seq(Some(1L), Some(2L), None, Some(4L), Some(10L), None))
    val sc = ArrowIpc.colF64(b, u("score"))
    assert(!sc.isNullAt(0) && sc.getDouble(0) == 0.5 && sc.isNullAt(1))
    assert(sc.getDouble(3) == -3.5 && sc.getDouble(5) == 0.125)
    val tx = ArrowIpc.colStr(b, u("text"))
    assert((0 until 6).map(i =>
      if (tx.isNullAt(i)) null else tx.getUTF8String(i).toString) ==
      Seq("alpha", "béta", null, "", "fin", "de partie"))
  }

  test("narrow int widths and float32 widen exactly") {
    val b = fixture("stream_widths")
    val i8 = ArrowIpc.colI64(b, u("i8"))
    assert(Seq(i8.getLong(0), i8.getLong(1), i8.getLong(2)) ==
      Seq(-128L, 127L, 0L))
    val u8 = ArrowIpc.colI64(b, u("u8"))
    assert(u8.getLong(0) == 255L)
    val i32 = ArrowIpc.colI64(b, u("i32"))
    assert(i32.getLong(0) == (1L << 30) && i32.getLong(1) == -5L &&
      i32.isNullAt(2))
    val f32 = ArrowIpc.colF64(b, u("f32"))
    assert(f32.getDouble(0) == 1.5 && f32.getDouble(1) == -0.25 &&
      f32.isNullAt(2))
  }

  test("large_utf8 / large_binary: 64-bit offsets decode; audit names them") {
    val b = fixture("stream_large")
    val r = ArrowIpc.audit(b)
    assert(r != null)
    val fs = r.getArray(4)
    val types = (0 until fs.numElements()).map(i =>
      fs.getStruct(i, 4).getUTF8String(1).toString)
    assert(types == Seq("large_utf8", "large_binary", "int64"))
    val lt = ArrowIpc.colStr(b, u("ltext"))
    assert((0 until 3).map(i =>
      if (lt.isNullAt(i)) null else lt.getUTF8String(i).toString) ==
      Seq("grand", null, "récit"))
    val k = ArrowIpc.colI64(b, u("k"))
    assert(k.getLong(2) == 9L)
  }

  test("zstd and lz4 body compression decode to the identical values") {
    for (name <- Seq("file_zstd", "file_lz4")) {
      val b = fixture(name)
      val r = ArrowIpc.audit(b)
      assert(r != null, s"$name refused")
      assert(r.getUTF8String(3).toString ==
        (if (name == "file_zstd") "zstd" else "lz4"))
      val ids = ArrowIpc.colI64(b, u("id"))
      assert(ids.getLong(0) == 1L && ids.getLong(4) == 10L)
      val tx = ArrowIpc.colStr(b, u("text"))
      assert(tx.getUTF8String(5).toString == "de partie")
    }
  }

  test("refusals: torn, dictionary encoding, type/name mismatches, corruption") {
    assert(ArrowIpc.audit(fixture("torn")) == null)
    assert(ArrowIpc.audit(fixture("dict_refused")) == null)
    val b = fixture("stream_basic")
    assert(ArrowIpc.colI64(b, u("nope")) == null)      // unknown column
    assert(ArrowIpc.colStr(b, u("id")) == null)        // type mismatch
    assert(ArrowIpc.colI64(b, u("score")) == null)     // type mismatch
    assert(ArrowIpc.colF64(b, u("text")) == null)      // type mismatch
    // corrupted continuation marker
    val bad = b.clone(); bad(0) = 0x7f
    assert(ArrowIpc.audit(bad) == null)
    // stream without its EOS marker
    assert(ArrowIpc.audit(b.dropRight(8)) == null)
    assert(ArrowIpc.audit(Array.emptyByteArray) == null)
    // file with a broken trailing magic
    val f = fixture("file_basic").clone()
    f(f.length - 1) = 'X'
    assert(ArrowIpc.audit(f) == null)
  }
}
