package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** EPUB extraction vs committed fixtures from the INDEPENDENT
  * generator (tools/gen_epub_fixtures.py — CPython's Lib/zipfile plus
  * hand-written OCF/OPF XML): the full discovery chain (mimetype →
  * container.xml → OPF manifest/spine → xhtml chapters), subdirectory
  * OPF with relative hrefs, non-xhtml spine entries skipped, quote
  * styles and attribute order, the refusal matrix, and the
  * deterministic writer round trip.
  */
class EpubSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/epub_fixtures/$name")
    assert(in != null, s"missing fixture $name")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private def text(b: Array[Byte]): String = {
    val u = EpubText.epubText(b)
    if (u == null) null else u.toString
  }

  test("simple.epub: two chapters, entities, title drops, \\n join") {
    assert(text(fixture("simple.epub")) ==
      "Chapter One Hello & world today, café.\n" +
        "Second has <tags> and an em—dash.")
  }

  test("nested.epub: subdir OPF, ./ href, css spine entry skipped") {
    assert(text(fixture("nested.epub")) == "Nested chapter text")
  }

  test("refusals: bad mimetype, empty spine, missing chapter member") {
    assert(text(fixture("badmime.epub")) == null)
    assert(text(fixture("nospine.epub")) == null)
    assert(text(fixture("missing.epub")) == null)
  }

  test("not a zip / truncated archive refuses") {
    assert(text("plainly not a zip archive".getBytes("UTF-8")) == null)
    assert(text(fixture("simple.epub").take(200)) == null)
  }

  test("writer round trip over collapsed multi-line text") {
    val clean = "First chapter line\n\nThird: sym&bols <kept> 'quoted'"
    val rt = text(EpubText.epubDoc(clean.getBytes("UTF-8")))
    assert(rt == clean)
  }

  test("writer output is a valid zip readable by the zip walk") {
    val blob = EpubText.epubDoc("a\nb".getBytes("UTF-8"))
    val names = {
      val arr = ZipDocx.entries(blob)
      assert(arr != null)
      (0 until arr.numElements()).map(i =>
        arr.getStruct(i, 5).getUTF8String(0).toString)
    }
    assert(names == Seq("mimetype", "META-INF/container.xml",
      "OEBPS/content.opf", "OEBPS/ch0001.xhtml", "OEBPS/ch0002.xhtml"))
  }
}
