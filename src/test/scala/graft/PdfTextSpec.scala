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

  test("LZWDecode: variable width through 12 bits, both EarlyChange modes") {
    // fixtures from the independent tools/gen_pdf_fixtures.py LZW
    // encoder: ~12.4k chars whose decoder table crosses 511/1023/2047,
    // exercising every width transition; lzw_early0 pins the
    // /DecodeParms << /EarlyChange 0 >> schedule
    val md = java.security.MessageDigest.getInstance("MD5")
    for (name <- Seq("lzw", "lzw_early0")) {
      val t = extract(fixture(name))
      assert(t.length == 12434, name)
      assert(t.startsWith("lzw stream0 twelve table strea"), name)
      val hex = md.digest(t.getBytes("ISO-8859-1"))
        .map("%02x".format(_)).mkString
      assert(hex == "5429477204a4496a5bb8ecd1946b5355", name)
    }
  }

  test("LZWDecode + PNG predictor: the filter applies BEFORE unpredict") {
    assert(extract(fixture("lzw_pred")) == "predictor text through LZW")
  }

  test("LZWDecode refusals: corrupt code stream, truncation before EOD") {
    val good = fixture("lzw")
    // flip a byte mid-stream: an out-of-table code must refuse, never
    // emit partial text
    val streamAt = new String(good, "ISO-8859-1").indexOf("stream\n") + 7
    val bad = good.clone()
    bad(streamAt + 400) = (bad(streamAt + 400) ^ 0xff).toByte
    assert(PdfText.extract(bad) == null)
    // shorten /Length so the bit reader exhausts before EOD
    val cut = new String(good, "ISO-8859-1")
      .replaceFirst("/Length (\\d+)", "/Length 100").getBytes("ISO-8859-1")
    assert(PdfText.extract(cut) == null)
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
    // filter lies about the encoding: zlib bytes decoded as LZW hit an
    // out-of-table code and refuse (LZW itself is supported since r11)
    val lzw = new String(good, "ISO-8859-1")
      .replace("/FlateDecode", "/LZWDecode").getBytes("ISO-8859-1")
    assert(PdfText.extract(lzw) == null)
    // a genuinely unsupported filter refuses
    val rle = new String(good, "ISO-8859-1")
      .replace("/FlateDecode", "/RunLengthDecode").getBytes("ISO-8859-1")
    assert(PdfText.extract(rle) == null)
    // corrupted flate bytes inside the stream
    val bad = good.clone()
    val streamAt = new String(good, "ISO-8859-1").indexOf("stream\n") + 10
    bad(streamAt) = (bad(streamAt) ^ 0x55).toByte
    assert(PdfText.extract(bad) == null)
  }

  /** Assemble a classic-xref PDF from object bodies (1-based, in
    * order), computing offsets so the refusals under test are about the
    * page TREE, not a stale xref.
    */
  private def buildPdf(objs: Seq[String]): Array[Byte] = {
    val out = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (body, i) =>
      val at = out.length
      out.append(s"${i + 1} 0 obj ").append(body).append(" endobj\n")
      at
    }
    val xrefAt = out.length
    out.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => out.append(f"$o%010d 00000 n \n"))
    out.append(s"trailer << /Size ${objs.length + 1} /Root 1 0 R >>\n")
    out.append(s"startxref\n$xrefAt\n%%EOF\n")
    out.toString.getBytes("ISO-8859-1")
  }

  test("shared /Kids node refuses: repeated ref = tree amplification") {
    // the same Page object listed twice under one Pages node — the
    // K^depth amplification primitive; the visited-set must refuse
    val contents = "<< /Length 23 >> stream\nBT /F1 12 Tf (hi) Tj ET\nendstream"
    val shared = buildPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R 3 0 R] /Count 2 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      contents))
    assert(PdfText.extract(shared) == null)
    // same node shared at two LEVELS (Pages node under itself via a
    // sibling) — the cyclic variant
    val cyclic = buildPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R 2 0 R] /Count 2 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      contents))
    assert(PdfText.extract(cyclic) == null)
    // control: the same shape WITHOUT sharing extracts fine
    val ok = buildPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      contents))
    assert(extract(ok) == "hi")
  }

  test("page-count ceiling: > MaxPages distinct pages refuses") {
    val n = PdfText.MaxPages + 1
    val contents = "<< /Length 23 >> stream\nBT /F1 12 Tf (hi) Tj ET\nendstream"
    val kids = (0 until n).map(i => s"${i + 3} 0 R").mkString(" ")
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      s"<< /Type /Pages /Kids [$kids] /Count $n >>") ++
      (0 until n).map(_ =>
        s"<< /Type /Page /Parent 2 0 R /Contents ${n + 3} 0 R >>") :+
      contents
    // distinct page objects, so the visited-set passes; the aggregate
    // page ceiling is what must trip. NOTE each page shares one
    // contents stream ref — content refs are not tree nodes and may
    // legally repeat (the control in the previous test relies on it).
    assert(PdfText.extract(buildPdf(objs)) == null)
  }
}
