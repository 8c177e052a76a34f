package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** tar_build (the WebDataset shard writer) vs the INDEPENDENT python
  * tarfile implementation: for the same members (mode 0644, uid/gid 0,
  * mtime 0, USTAR_FORMAT) the archive must be BYTE-IDENTICAL — pinned
  * as the md5 of a python-generated fixture (tools note in the test) —
  * and must round-trip through this repo's own tar_entries reader.
  * Plus the refusal matrix: a sink that silently dropped or renamed a
  * member would corrupt the training set it feeds.
  */
class TarBuildSpec extends AnyFunSuite {

  private def entry(name: String, data: Array[Byte]) =
    new GenericInternalRow(Array[Any](UTF8String.fromString(name), data))

  private def arr(es: Any*) = new GenericArrayData(es.toArray)

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  test("byte-identical to python tarfile USTAR_FORMAT for the same members") {
    // fixture: python3 tarfile, format=USTAR_FORMAT, members
    // (000.json -> {"k":1}, 000.txt -> "hello wds", 001.txt -> 700*'x'),
    // mode 0644, uid/gid 0, mtime 0 -> 10240 bytes,
    // md5 9f65762a753187e69cd2177aee2e5a60
    val blob = TarBuild.build(arr(
      entry("000.json", "{\"k\":1}".getBytes("UTF-8")),
      entry("000.txt", "hello wds".getBytes("UTF-8")),
      entry("001.txt", Array.fill[Byte](700)('x'))))
    assert(blob.length == 10240)
    assert(md5(blob) == "9f65762a753187e69cd2177aee2e5a60")
  }

  test("round-trips through this repo's tar_entries reader") {
    val blob = TarBuild.build(arr(
      entry("a/000.txt", "alpha".getBytes("UTF-8")),
      entry("a/000.json", "{}".getBytes("UTF-8"))))
    val rows = TarWalk.entries(blob)
    assert(rows != null && rows.numElements() == 2)
    val e0 = rows.getStruct(0, 3)
    val e1 = rows.getStruct(1, 3)
    assert(e0.getUTF8String(0).toString == "a/000.txt" &&
      e0.getLong(2) == 5L)
    assert(e1.getUTF8String(0).toString == "a/000.json" &&
      e1.getLong(2) == 2L)
    // member payload extraction through tar_entry
    assert(new String(TarWalk.entry(blob, "a/000.txt"), "UTF-8") == "alpha")
  }

  test("refusal matrix: empty, dup names, long names, slash, nulls") {
    intercept[IllegalArgumentException] { TarBuild.build(arr()) }
    intercept[IllegalArgumentException] {
      TarBuild.build(arr(entry("a.txt", Array[Byte](1)),
        entry("a.txt", Array[Byte](2))))
    }
    intercept[IllegalArgumentException] {
      TarBuild.build(arr(entry("x" * 101, Array[Byte](1))))
    }
    intercept[IllegalArgumentException] {
      TarBuild.build(arr(entry("/abs.txt", Array[Byte](1))))
    }
    intercept[IllegalArgumentException] {
      TarBuild.build(arr(entry("", Array[Byte](1))))
    }
    intercept[IllegalArgumentException] {
      TarBuild.build(arr(new GenericInternalRow(
        Array[Any](null, Array[Byte](1)))))
    }
  }
}
