#!/usr/bin/env python3
"""Generate ZIP / DOCX fixtures with python's stdlib zipfile — an
INDEPENDENT zip implementation (CPython's Lib/zipfile, not our Scala) —
for graft.functions.ZipDocx. Writes src/test/resources/zip_fixtures/
and prints hex blobs + pinned per-entry metadata / extracted text for
embedding in WebQueries/ZipDocxSpec.

Fixture set:
  stored.zip     two STORED entries incl. a subdirectory path
  deflated.zip   two DEFLATED entries (compressible + short)
  mixed.zip      stored + deflated + empty entry + EOCD comment
  badcrc.zip     deflated.zip with one compressed payload byte flipped
                 (structure intact, CRC of entry 0 must fail)
  zip64.zip      a force_zip64 entry -> whole-archive refuse
  simple.docx    two paragraphs, split runs, tab + br, XML entities
  preserve.docx  xml:space="preserve" runs with leading/trailing spaces,
                 skipped style elements, numeric character references
  nodoc.docx     a valid zip with no word/document.xml -> refuse
"""
import os, zipfile, zlib, io

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "zip_fixtures")
os.makedirs(OUT, exist_ok=True)

FIXED = (1980, 1, 1, 0, 0, 0)   # deterministic DOS timestamp


def zinfo(name, compress):
    zi = zipfile.ZipInfo(name, date_time=FIXED)
    zi.compress_type = compress
    zi.external_attr = 0o644 << 16
    return zi


def write_zip(path, entries, compress, comment=b""):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in entries:
            z.writestr(zinfo(name, compress), data)
        if comment:
            z.comment = comment
    open(path, "wb").write(buf.getvalue())
    return buf.getvalue()


def dump(name, blob):
    print(f"== {name} ({len(blob)} bytes)")
    h = blob.hex().upper()
    for i in range(0, len(h), 96):
        print('    "' + h[i:i + 96] + '" +')
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        for zi in z.infolist():
            raw = z.read(zi.filename)
            print(f"    pinned: {zi.filename!r} method={zi.compress_type} "
                  f"comp={zi.compress_size} raw={len(raw)} crc={zi.CRC}")


# --- plain zips --------------------------------------------------------
stored = write_zip(os.path.join(OUT, "stored.zip"),
                   [("a.txt", b"alpha text body\n"),
                    ("dir/b.txt", b"beta")], zipfile.ZIP_STORED)
dump("stored.zip", stored)

defl_payload = (b"the quick brown fox jumps over the lazy dog. " * 40)
deflated = write_zip(os.path.join(OUT, "deflated.zip"),
                     [("doc1.txt", defl_payload),
                      ("doc2.txt", b"short deflated entry")],
                     zipfile.ZIP_DEFLATED)
dump("deflated.zip", deflated)

buf = io.BytesIO()
with zipfile.ZipFile(buf, "w") as z:
    z.writestr(zinfo("s.txt", zipfile.ZIP_STORED), b"stored member")
    z.writestr(zinfo("d.txt", zipfile.ZIP_DEFLATED),
               b"deflated member " * 16)
    z.writestr(zinfo("empty.txt", zipfile.ZIP_STORED), b"")
    z.comment = b"archive comment here"
mixed = buf.getvalue()
open(os.path.join(OUT, "mixed.zip"), "wb").write(mixed)
dump("mixed.zip", mixed)

# badcrc: flip one byte inside doc1.txt's deflate payload (after the
# 30-byte local header + 8-byte name, safely inside compressed data)
bad = bytearray(deflated)
off = 30 + len("doc1.txt") + 20
bad[off] ^= 0xFF
open(os.path.join(OUT, "badcrc.zip"), "wb").write(bad)
print(f"== badcrc.zip: byte {off} flipped in doc1.txt payload")

# zip64
buf = io.BytesIO()
with zipfile.ZipFile(buf, "w") as z:
    with z.open(zinfo("big.txt", zipfile.ZIP_STORED), "w",
                force_zip64=True) as f:
        f.write(b"tiny but zip64-framed")
z64 = buf.getvalue()
open(os.path.join(OUT, "zip64.zip"), "wb").write(z64)
dump("zip64.zip", z64)

# zip64full: hand-assembled per APPNOTE 4.5 with ALL 32-bit fields at
# their markers — central sizes/offset in the 0x0001 extra, counts and
# directory geometry in the EOCD64 record behind the locator. python's
# zipfile only zip64-frames the LOCAL side for small files, so this
# exercises the full marker-resolution chain.
import struct, zlib
data = b"tiny but zip64-framed"
crc = zlib.crc32(data)
name = b"big.txt"
lextra = struct.pack("<HHQQ", 1, 16, len(data), len(data))
local = (b"PK\x03\x04" + struct.pack("<HHHHH", 45, 0, 0, 0, 0x21) +
         struct.pack("<III", crc, 0xFFFFFFFF, 0xFFFFFFFF) +
         struct.pack("<HH", len(name), len(lextra)) + name + lextra)
cextra = struct.pack("<HHQQQ", 1, 24, len(data), len(data), 0)
central = (b"PK\x01\x02" + struct.pack("<HHHHHH", 45, 45, 0, 0, 0, 0x21) +
           struct.pack("<III", crc, 0xFFFFFFFF, 0xFFFFFFFF) +
           struct.pack("<HHHHHII", len(name), len(cextra), 0, 0, 0,
                       0o644 << 16, 0xFFFFFFFF) + name + cextra)
cd_off = len(local) + len(data)
eocd64_off = cd_off + len(central)
eocd64 = (b"PK\x06\x06" + struct.pack("<QHHIIQQQQ", 44, 45, 45, 0, 0,
                                      1, 1, len(central), cd_off))
locator = b"PK\x06\x07" + struct.pack("<IQI", 0, eocd64_off, 1)
eocd = (b"PK\x05\x06" + struct.pack("<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF,
                                    0xFFFFFFFF, 0xFFFFFFFF, 0))
z64full = local + data + central + eocd64 + locator + eocd
open(os.path.join(OUT, "zip64full.zip"), "wb").write(z64full)
dump("zip64full.zip", z64full)

# --- docx --------------------------------------------------------------
CT = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
      b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
      b'<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
      b'<Default Extension="xml" ContentType="application/xml"/>'
      b'<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
      b'</Types>')
RELS = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        b'<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        b'<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
        b'</Relationships>')


def docx(path, body_xml):
    doc = (b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           b'<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
           b'<w:body>' + body_xml + b'</w:body></w:document>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(zinfo("[Content_Types].xml", zipfile.ZIP_DEFLATED), CT)
        z.writestr(zinfo("_rels/.rels", zipfile.ZIP_DEFLATED), RELS)
        z.writestr(zinfo("word/document.xml", zipfile.ZIP_DEFLATED), doc)
    open(path, "wb").write(buf.getvalue())
    return buf.getvalue()


simple = docx(os.path.join(OUT, "simple.docx"),
    b'<w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t>world</w:t></w:r>'
    b'<w:r><w:tab/><w:t>tabbed &amp; &lt;escaped&gt;</w:t></w:r></w:p>'
    b'<w:p><w:r><w:t>second line</w:t><w:br/><w:t>after break</w:t></w:r></w:p>')
print("== simple.docx")
print("   text:", repr("Hello world\ttabbed & <escaped>\n"
                       "second line\nafter break"))
dump("simple.docx blob", simple)

preserve = docx(os.path.join(OUT, "preserve.docx"),
    b'<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
    b'<w:r><w:rPr><w:b/></w:rPr><w:t xml:space="preserve">  padded  </w:t></w:r>'
    b'<w:r><w:t>mid&#65;&#x42;end</w:t></w:r></w:p>'
    b'<w:p><w:r><w:t/></w:t></w:r></w:p>'
    if False else
    b'<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
    b'<w:r><w:rPr><w:b/></w:rPr><w:t xml:space="preserve">  padded  </w:t></w:r>'
    b'<w:r><w:t>mid&#65;&#x42;end</w:t></w:r></w:p>'
    b'<w:p><w:r><w:t></w:t></w:r></w:p>')
print("== preserve.docx")
print("   text:", repr("  padded  midABend\n"))
dump("preserve.docx blob", preserve)

buf = io.BytesIO()
with zipfile.ZipFile(buf, "w") as z:
    z.writestr(zinfo("[Content_Types].xml", zipfile.ZIP_DEFLATED), CT)
    z.writestr(zinfo("word/other.xml", zipfile.ZIP_DEFLATED), b"<x/>")
nodoc = buf.getvalue()
open(os.path.join(OUT, "nodoc.docx"), "wb").write(nodoc)
print(f"== nodoc.docx ({len(nodoc)} bytes) -> refuse")
