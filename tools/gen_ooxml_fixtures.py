#!/usr/bin/env python3
"""Generate XLSX / PPTX fixtures with python's stdlib zipfile — an
INDEPENDENT zip implementation (CPython's Lib/zipfile, not our Scala)
— for graft.functions.ZipDocx's xlsx_text / pptx_text. Writes
src/test/resources/ooxml_fixtures/ and prints hex blobs + pinned
extracted text for embedding in WebQueries/ZipDocxSpec.

Fixture set:
  simple.xlsx     shared strings (entities + rich runs + excluded
                  phonetic rPh), a native-number cell, an inlineStr
                  cell, a formula cell (body skipped, cached value
                  kept), a skipped column (r="B2") and a skipped row
                  (r="4") that must pad
  twosheets.xlsx  sheet2 + sheet10 with no sharedStrings — numeric
                  member ordering (sheet10 AFTER sheet2) and the
                  sst-less path
  nosheet.xlsx    a valid zip with no worksheet -> refuse
  simple.pptx     two slides: split a:r runs, a:br, entities,
                  multiple paragraphs
  noslide.pptx    presentation-only zip -> refuse
"""
import os, zipfile, io

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "ooxml_fixtures")
os.makedirs(OUT, exist_ok=True)

FIXED = (1980, 1, 1, 0, 0, 0)


def zinfo(name):
    zi = zipfile.ZipInfo(name, date_time=FIXED)
    zi.compress_type = zipfile.ZIP_DEFLATED
    zi.external_attr = 0o644 << 16
    return zi


def build(path, members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in members:
            z.writestr(zinfo(name), data)
    open(path, "wb").write(buf.getvalue())
    return buf.getvalue()


def dump(name, blob, text):
    print(f"== {name} ({len(blob)} bytes)")
    if text is not None:
        print("   text:", repr(text))
    h = blob.hex().upper()
    for i in range(0, len(h), 96):
        print('    "' + h[i:i + 96] + '" +')


XL_CT = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
         b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
         b'<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
         b'<Default Extension="xml" ContentType="application/xml"/>'
         b'<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
         b'</Types>')
XL_RELS = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           b'<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
           b'<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
           b'</Relationships>')
XL_WB = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
         b'<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
         b'<sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>')

# --- simple.xlsx -------------------------------------------------------
SST = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
       b'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">'
       b'<si><t>name</t></si>'
       b'<si><t>A &amp; B &lt;tag&gt;</t></si>'
       b'<si><r><rPr><b/></rPr><t>rich</t></r><r><t xml:space="preserve">text</t></r>'
       b'<rPh sb="0" eb="4"><t>EXCLUDED</t></rPh></si>'
       b'</sst>')
SHEET1 = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          b'<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
          b'<sheetData>'
          b'<row r="1">'
          b'<c r="A1" t="s"><v>0</v></c>'
          b'<c r="B1"><v>42</v></c>'
          b'<c r="C1" t="inlineStr"><is><t>inline str</t></is></c>'
          b'</row>'
          b'<row r="2">'
          b'<c r="B2" t="s"><v>1</v></c>'
          b'<c r="C2"><f>SUM(A1:B1)</f><v>7</v></c>'
          b'</row>'
          b'<row r="4">'
          b'<c r="A4" t="s"><v>2</v></c>'
          b'</row>'
          b'</sheetData></worksheet>')
simple_xlsx = build(os.path.join(OUT, "simple.xlsx"), [
    ("[Content_Types].xml", XL_CT),
    ("_rels/.rels", XL_RELS),
    ("xl/workbook.xml", XL_WB),
    ("xl/sharedStrings.xml", SST),
    ("xl/worksheets/sheet1.xml", SHEET1)])
dump("simple.xlsx", simple_xlsx,
     "name\t42\tinline str\n\tA & B <tag>\t7\n\nrichtext")

# --- twosheets.xlsx (no sharedStrings; numeric ordering) ---------------
S2 = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
      b'<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
      b'<sheetData><row><c><v>second</v></c><c><v>-17</v></c></row></sheetData>'
      b'</worksheet>')
S10 = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
       b'<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
       b'<sheetData><row><c t="inlineStr"><is><t>tenth</t></is></c></row>'
       b'</sheetData></worksheet>')
twosheets = build(os.path.join(OUT, "twosheets.xlsx"), [
    ("[Content_Types].xml", XL_CT),
    ("_rels/.rels", XL_RELS),
    ("xl/workbook.xml", XL_WB),
    ("xl/worksheets/sheet10.xml", S10),
    ("xl/worksheets/sheet2.xml", S2)])
dump("twosheets.xlsx", twosheets, "second\t-17\ntenth")

# --- nosheet.xlsx ------------------------------------------------------
nosheet = build(os.path.join(OUT, "nosheet.xlsx"), [
    ("[Content_Types].xml", XL_CT),
    ("_rels/.rels", XL_RELS),
    ("xl/workbook.xml", XL_WB)])
dump("nosheet.xlsx -> refuse", nosheet, None)

# --- simple.pptx -------------------------------------------------------
PP_CT = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
         b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
         b'<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
         b'<Default Extension="xml" ContentType="application/xml"/>'
         b'<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
         b'</Types>')
PP_RELS = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           b'<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
           b'<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>'
           b'</Relationships>')
PP_PRES = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           b'<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"/>')
SLIDE1 = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          b'<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'
          b' xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
          b'<p:cSld><p:spTree><p:sp><p:txBody>'
          b'<a:p><a:r><a:rPr b="1"/><a:t>Hello </a:t></a:r>'
          b'<a:r><a:t>world</a:t></a:r></a:p>'
          b'<a:p><a:r><a:t>break</a:t></a:r><a:br/>'
          b'<a:r><a:t>after &amp; done</a:t></a:r></a:p>'
          b'</p:txBody></p:sp></p:spTree></p:cSld></p:sld>')
SLIDE2 = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          b'<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'
          b' xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
          b'<p:cSld><p:spTree><p:sp><p:txBody>'
          b'<a:p><a:r><a:t>slide two</a:t></a:r></a:p>'
          b'</p:txBody></p:sp></p:spTree></p:cSld></p:sld>')
simple_pptx = build(os.path.join(OUT, "simple.pptx"), [
    ("[Content_Types].xml", PP_CT),
    ("_rels/.rels", PP_RELS),
    ("ppt/presentation.xml", PP_PRES),
    ("ppt/slides/slide1.xml", SLIDE1),
    ("ppt/slides/slide2.xml", SLIDE2)])
dump("simple.pptx", simple_pptx,
     "Hello world\nbreak\nafter & done\nslide two")

# --- noslide.pptx ------------------------------------------------------
noslide = build(os.path.join(OUT, "noslide.pptx"), [
    ("[Content_Types].xml", PP_CT),
    ("_rels/.rels", PP_RELS),
    ("ppt/presentation.xml", PP_PRES)])
dump("noslide.pptx -> refuse", noslide, None)
