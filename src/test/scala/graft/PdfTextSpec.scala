package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PdfText

/** Classic-PDF text extraction vs committed fixtures from the
  * INDEPENDENT python generator (tools/gen_pdf_fixtures.py — its own
  * hand-built PDF syntax, self-computed xrefs, python zlib): raw and
  * Flate streams, TJ kerning arrays, hex strings, octal/paren escapes,
  * nested page trees, incremental-update (/Prev) chains — plus the
  * writer round trip and the refusal matrix.
  */
class PdfTextSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/pdf_fixtures/$name.pdf")
    assert(in != null, s"missing fixture $name")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private def extract(b: Array[Byte]): String = {
    val r = PdfText.extract(b)
    assert(r != null, "extraction refused")
    r.toString
  }

  test("raw stream: Td/Tj/', paren and octal escapes") {
    assert(extract(fixture("raw")) ==
      "Hello (classic) PDF AB\ncontinued line")
  }

  test("flate stream: TJ kerning array, T*, hex string") {
    assert(extract(fixture("flate")) == "kerned text run\nHex sid")
  }

  test("nested page tree extracts pages in tree order") {
    assert(extract(fixture("pages")) == "page one\npage two\npage three")
  }

  test("incremental update (/Prev chain): the newest object revision wins") {
    assert(extract(fixture("update")) == "updated revision text")
  }

  test("PDF 1.5: xref STREAM (predictor 12) + /ObjStm compressed objects") {
    assert(extract(fixture("xrefstream")) ==
      "modern xref stream text\nsecond modern line")
  }

  test("hybrid file: classic table + /XRefStm supplementary stream") {
    assert(extract(fixture("hybrid")) == "hybrid file text")
  }

  test("writer round trip: pdf_text(pdf_doc(text)) == text incl. escapes") {
    for (t <- Seq(
      "plain ascii text",
      "parens (and) backslash \\ mix ()()",
      "multi\nline\ntext with\nbreaks",
      "punct !@#$%^&*[]{}<>;:'\",.?/~`|",
      "")) {
      val pdf = PdfText.write(t.getBytes("ISO-8859-1"))
      assert(extract(pdf) == t, s"round trip failed for ${t.take(20)}")
    }
  }

  test("refusal matrix: encrypted, xref streams, bad filters, truncation, junk") {
    val good = fixture("flate")
    // not a PDF at all
    assert(PdfText.extract("hello world".getBytes) == null)
    assert(PdfText.extract(Array.emptyByteArray) == null)
    // truncated: startxref points past the cut
    assert(PdfText.extract(good.take(good.length / 2)) == null)
    // encrypted: /Encrypt in the trailer must refuse loudly
    val enc = new String(good, "ISO-8859-1")
      .replace("/Size", "/Encrypt 9 0 R /Size").getBytes("ISO-8859-1")
    assert(PdfText.extract(enc) == null)
    // startxref pointing at a NON-XRef object (here: a content stream)
    // must refuse — not be misread as a cross-reference stream
    val xs = new String(good, "ISO-8859-1")
    val objAt = xs.indexOf("4 0 obj")
    val xrefStream = xs.replaceAll("startxref\\n\\d+", s"startxref\\n$objAt")
      .getBytes("ISO-8859-1")
    assert(PdfText.extract(xrefStream) == null)
    // unsupported filter
    val lzw = new String(good, "ISO-8859-1")
      .replace("/FlateDecode", "/LZWDecode").getBytes("ISO-8859-1")
    assert(PdfText.extract(lzw) == null)
    // corrupted flate bytes inside the stream
    val bad = good.clone()
    val streamAt = new String(good, "ISO-8859-1").indexOf("stream\n") + 10
    bad(streamAt) = (bad(streamAt) ^ 0x55).toByte
    assert(PdfText.extract(bad) == null)
  }
}
