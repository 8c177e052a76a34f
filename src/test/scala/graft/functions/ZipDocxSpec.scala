package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** ZIP walk + DOCX extraction vs committed fixtures from the
  * INDEPENDENT generator (tools/gen_zip_fixtures.py — CPython's
  * Lib/zipfile, its own central-directory writer and deflate): stored
  * and deflated members, subdirectory names, EOCD comments, the
  * per-member CRC quarantine, zip64 marker resolution (local-only
  * and full EOCD64 chains), WordprocessingML runs /
  * tabs / breaks / entities, the deterministic writer round trip.
  */
class ZipDocxSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/zip_fixtures/$name")
    assert(in != null, s"missing fixture $name")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private def rows(b: Array[Byte]): Seq[(String, Int, Long, Long, Boolean)] = {
    val arr = ZipDocx.entries(b)
    assert(arr != null, "archive refused")
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 5)
      (r.getUTF8String(0).toString, r.getInt(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))
    }
  }

  test("stored.zip: two stored members incl. subdirectory path") {
    assert(rows(fixture("stored.zip")) == Seq(
      ("a.txt", 0, 16L, 16L, true),
      ("dir/b.txt", 0, 4L, 4L, true)))
    assert(new String(ZipDocx.entry(fixture("stored.zip"), "a.txt"),
      "UTF-8") == "alpha text body\n")
    assert(new String(ZipDocx.entry(fixture("stored.zip"), "dir/b.txt"),
      "UTF-8") == "beta")
  }

  test("deflated.zip: python-zlib members inflate bit-exactly") {
    assert(rows(fixture("deflated.zip")) == Seq(
      ("doc1.txt", 8, 62L, 1800L, true),
      ("doc2.txt", 8, 22L, 20L, true)))
    val d1 = ZipDocx.entry(fixture("deflated.zip"), "doc1.txt")
    assert(d1.length == 1800)
    assert(new String(d1, 0, 45, "UTF-8") ==
      "the quick brown fox jumps over the lazy dog. ")
    assert(new String(ZipDocx.entry(fixture("deflated.zip"), "doc2.txt"),
      "UTF-8") == "short deflated entry")
  }

  test("mixed.zip: stored + deflated + empty member + EOCD comment") {
    assert(rows(fixture("mixed.zip")) == Seq(
      ("s.txt", 0, 13L, 13L, true),
      ("d.txt", 8, 21L, 256L, true),
      ("empty.txt", 0, 0L, 0L, true)))
    assert(ZipDocx.entry(fixture("mixed.zip"), "empty.txt").length == 0)
  }

  test("badcrc.zip: corrupt member is a per-row signal, not a refuse") {
    val r = rows(fixture("badcrc.zip"))
    assert(r.map(t => (t._1, t._5)) == Seq(
      ("doc1.txt", false), ("doc2.txt", true)))
    assert(ZipDocx.entry(fixture("badcrc.zip"), "doc1.txt") == null)
    assert(ZipDocx.entry(fixture("badcrc.zip"), "doc2.txt") != null)
  }

  test("zip64: local-side markers (python force_zip64) and the FULL " +
    "marker chain (central extras + EOCD64 + locator) both read") {
    for (name <- Seq("zip64.zip", "zip64full.zip")) {
      val r = rows(fixture(name))
      assert(r == Seq(("big.txt", 0, 21L, 21L, true)), s"$name: $r")
      assert(new String(ZipDocx.entry(fixture(name), "big.txt"),
        "UTF-8") == "tiny but zip64-framed")
    }
    // marker EOCD without its locator refuses; corrupt EOCD64 sig too
    val f = fixture("zip64full.zip")
    val noLoc = f.clone()
    noLoc(f.length - 22 - 20 + 3) = 0x01 // break the locator signature
    assert(ZipDocx.entries(noLoc) == null)
    val badZ64 = f.clone()
    // EOCD64 record sits where the locator points; break its signature
    badZ64(0x9f + 3) = 0x01
    assert(ZipDocx.entries(badZ64) == null)
  }

  test("refusal matrix: truncation, bad EOCD, absent member") {
    val s = fixture("stored.zip")
    assert(ZipDocx.entries(java.util.Arrays.copyOf(s, s.length - 3)) == null)
    assert(ZipDocx.entries(java.util.Arrays.copyOf(s, 10)) == null)
    assert(ZipDocx.entries(Array[Byte]()) == null)
    val noSig = s.clone(); noSig(s.length - 22 + 3) = 0x07
    assert(ZipDocx.entries(noSig) == null)
    assert(ZipDocx.entry(s, "missing.txt") == null)
  }

  test("simple.docx: runs, tab, entities, break, paragraph joins") {
    assert(ZipDocx.docxText(fixture("simple.docx")).toString ==
      "Hello world\ttabbed & <escaped>\nsecond line\nafter break")
  }

  test("preserve.docx: xml:space runs, skipped style elements, NCRs") {
    assert(ZipDocx.docxText(fixture("preserve.docx")).toString ==
      "  padded  midABend\n")
  }

  test("nodoc.docx: zip without word/document.xml refuses") {
    assert(ZipDocx.docxText(fixture("nodoc.docx")) == null)
  }

  test("tab-stop definitions inside <w:tabs> are not emitted as tabs") {
    val xml = ("""<?xml version="1.0"?><w:document xmlns:w="x"><w:body>""" +
      """<w:p><w:pPr><w:tabs><w:tab w:val="left" w:pos="720"/></w:tabs>""" +
      """</w:pPr><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t></w:r></w:p>""" +
      """</w:body></w:document>""").getBytes("UTF-8")
    val blob = ZipDocx.writeZipStored(Seq(("word/document.xml", xml)))
    assert(ZipDocx.docxText(blob).toString == "a\tb")
  }

  test("writer round trip: docx_text(docx_doc(x)) == x incl. escapes") {
    for (s <- Seq("plain text", "a & b < c > d", "line1\nline2\n\nline4",
      "", "tab\there")) {
      val blob = ZipDocx.docxDoc(s.getBytes("UTF-8"))
      assert(ZipDocx.docxText(blob).toString == s, s"round trip of '$s'")
      // the writer's zip is also a valid archive for the walk
      assert(rows(blob).map(_._1) ==
        Seq("[Content_Types].xml", "_rels/.rels", "word/document.xml"))
      assert(rows(blob).forall(_._5))
    }
  }

  test("malformed markup refuses: unterminated tag, bad entity, CDATA") {
    def doc(body: String): Array[Byte] =
      ZipDocx.writeZipStored(Seq(("word/document.xml",
        (s"""<w:document xmlns:w="x"><w:body>$body</w:body></w:document>""")
          .getBytes("UTF-8"))))
    assert(ZipDocx.docxText(doc("<w:p><w:r><w:t>ok</w:t></w:r></w:p>")) != null)
    assert(ZipDocx.docxText(doc("<w:p><w:t>no close")) == null)
    assert(ZipDocx.docxText(doc("<w:p><w:t>&bogus;</w:t></w:p>")) == null)
    assert(ZipDocx.docxText(doc("<w:p><w:t>a&amp</w:t></w:p>")) == null)
    assert(ZipDocx.docxText(doc("<![CDATA[x]]>")) == null)
    // comments and processing instructions skip cleanly
    assert(ZipDocx.docxText(doc("<!-- c --><w:p><w:t>x</w:t></w:p>"))
      .toString == "x")
  }

  private def ooxml(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/ooxml_fixtures/$name")
    assert(in != null, s"missing fixture $name")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  test("simple.xlsx: sst entities + rich runs (rPh excluded), number, " +
    "inlineStr, formula cache, skipped column and row pad") {
    assert(ZipDocx.xlsxText(ooxml("simple.xlsx")).toString ==
      "name\t42\tinline str\n\tA & B <tag>\t7\n\nrichtext")
  }

  test("twosheets.xlsx: NUMERIC sheet order (10 after 2), sst-less path") {
    assert(ZipDocx.xlsxText(ooxml("twosheets.xlsx")).toString ==
      "second\t-17\ntenth")
  }

  test("xlsx refusals: no sheet, sst miss, out-of-range, non-monotone") {
    assert(ZipDocx.xlsxText(ooxml("nosheet.xlsx")) == null)
    def wb(sheet: String): Array[Byte] =
      ZipDocx.writeZipStored(Seq(("xl/worksheets/sheet1.xml",
        s"<worksheet><sheetData>$sheet</sheetData></worksheet>"
          .getBytes("UTF-8"))))
    assert(ZipDocx.xlsxText(wb("<row><c><v>ok</v></c></row>"))
      .toString == "ok")
    // t="s" with no sharedStrings member at all
    assert(ZipDocx.xlsxText(
      wb("""<row><c t="s"><v>0</v></c></row>""")) == null)
    // rows and columns must stay monotone (padding can't go backwards)
    assert(ZipDocx.xlsxText(
      wb("""<row r="2"></row><row r="1"></row>""")) == null)
    assert(ZipDocx.xlsxText(
      wb("""<row><c r="B1"><v>1</v></c><c r="A1"><v>2</v></c></row>""")) ==
      null)
  }

  test("xlsx writer round trip: numbers vs shared strings, empty cells") {
    for (s <- Seq("a\tb\nc", "42\t-0\t007\tx", "", "a\t\t\nmid\n\nend\t",
      "1\t2\n3\t4", "esc & < > cell\t-9223372036854775808")) {
      val blob = ZipDocx.xlsxDoc(s.getBytes("UTF-8"))
      assert(ZipDocx.xlsxText(blob).toString == s, s"round trip of '$s'")
      assert(rows(blob).forall(_._5))
    }
  }

  test("simple.pptx: split runs, break, entities, slide join; refusals") {
    assert(ZipDocx.pptxText(ooxml("simple.pptx")).toString ==
      "Hello world\nbreak\nafter & done\nslide two")
    assert(ZipDocx.pptxText(ooxml("noslide.pptx")) == null)
  }

  test("pptx writer round trip: slide per line") {
    for (s <- Seq("one", "a\nb\nc", "", "gap\n\nline", "tab\tin slide",
      "a & b < c")) {
      assert(ZipDocx.pptxText(ZipDocx.pptxDoc(s.getBytes("UTF-8")))
        .toString == s, s"round trip of '$s'")
    }
  }

  test("xlsx/pptx round trips hold under seeded random TSV fuzz") {
    // deterministic fuzz: 200 random grids over an alphabet that leans
    // on the hazards — XML metacharacters, unicode, numbers with and
    // without canonical form, empties, lone separators
    val cells = Array("", "0", "-0", "007", "42", "-9001",
      "9223372036854775807", "9223372036854775808", "a b", "  padded  ",
      "a&b", "<tag>", "\"q\"", "café", "üß", "☃",
      "x'y", "1.5", "+7", " ")
    val rnd = new scala.util.Random(42)
    var i = 0
    while (i < 200) {
      val rows = Seq.fill(1 + rnd.nextInt(4))(
        Seq.fill(1 + rnd.nextInt(5))(cells(rnd.nextInt(cells.length)))
          .mkString("\t"))
      val s = rows.mkString("\n")
      assert(ZipDocx.xlsxText(ZipDocx.xlsxDoc(s.getBytes("UTF-8")))
        .toString == s, s"xlsx fuzz case $i: ${s.take(120)}")
      assert(ZipDocx.pptxText(ZipDocx.pptxDoc(s.getBytes("UTF-8")))
        .toString == s, s"pptx fuzz case $i: ${s.take(120)}")
      i += 1
    }
  }
}
