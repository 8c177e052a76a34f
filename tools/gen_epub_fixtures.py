#!/usr/bin/env python3
"""Generate EPUB fixtures with python's stdlib zipfile — an INDEPENDENT
zip implementation (CPython's Lib/zipfile, not our Scala writer) plus
hand-written OCF/OPF XML — for graft.functions.EpubText. Writes
src/test/resources/epub_fixtures/ and prints hex blobs + pinned
extracted text for embedding in WebQueries/EpubSpec.

Fixture set:
  simple.epub    two xhtml chapters (entities, inline markup, a title
                 element that must drop), deflated members
  nested.epub    OPF in a subdirectory, relative + ./ hrefs, a css
                 manifest item referenced by the spine (must SKIP),
                 single-quoted attributes, attribute order shuffled
  badmime.epub   mimetype member with the wrong content -> refuse
  nospine.epub   valid container/OPF but an empty spine -> refuse
  missing.epub   spine idref whose chapter member is absent -> refuse
"""
import os, zipfile, io

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "epub_fixtures")
os.makedirs(OUT, exist_ok=True)

FIXED = (1980, 1, 1, 0, 0, 0)


def zinfo(name, compress):
    zi = zipfile.ZipInfo(name, date_time=FIXED)
    zi.compress_type = compress
    zi.external_attr = 0o644 << 16
    return zi


def build(path, members, mimetype=b"application/epub+zip"):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        # OCF: mimetype first, stored
        z.writestr(zinfo("mimetype", zipfile.ZIP_STORED), mimetype)
        for name, data in members:
            z.writestr(zinfo(name, zipfile.ZIP_DEFLATED), data)
    blob = buf.getvalue()
    open(os.path.join(OUT, path), "wb").write(blob)
    return blob


def dump(name, blob, expected):
    print(f"== {name} ({len(blob)} bytes) expected={expected!r}")
    h = blob.hex().upper()
    for i in range(0, len(h), 96):
        print('      "' + h[i:i + 96] + '" +')


def container(full_path):
    return ('<?xml version="1.0" encoding="UTF-8"?>'
            '<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
            f'<rootfiles><rootfile full-path="{full_path}" '
            'media-type="application/oebps-package+xml"/></rootfiles>'
            '</container>').encode()


# --- simple ------------------------------------------------------------
ch1 = ('<?xml version="1.0" encoding="UTF-8"?>'
       '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
       '<title>DROP ME</title></head><body>'
       '<h1>Chapter  One</h1>'
       '<p>Hello &amp; <b>world</b> today, caf&#233;.</p>'
       '</body></html>').encode()
ch2 = ('<html><head><style>p{color:red}</style></head><body>'
       '<p>Second has &lt;tags&gt; and an em&#8212;dash.</p>'
       '</body></html>').encode()
opf_simple = ('<?xml version="1.0" encoding="UTF-8"?>'
              '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
              '<metadata/>'
              '<manifest>'
              '<item id="c1" href="ch1.xhtml" media-type="application/xhtml+xml"/>'
              '<item id="c2" href="ch2.xhtml" media-type="application/xhtml+xml"/>'
              '</manifest>'
              '<spine><itemref idref="c1"/><itemref idref="c2"/></spine>'
              '</package>').encode()
simple = build("simple.epub", [
    ("META-INF/container.xml", container("OEBPS/content.opf")),
    ("OEBPS/content.opf", opf_simple),
    ("OEBPS/ch1.xhtml", ch1),
    ("OEBPS/ch2.xhtml", ch2)])
SIMPLE_EXPECT = ("Chapter One Hello & world today, café.\n"
                 "Second has <tags> and an em—dash.")
dump("simple.epub", simple, SIMPLE_EXPECT)

# --- nested: OPF in subdir, ./ href, css spine entry skipped, single
# quotes, attribute order shuffled ---------------------------------------
nch = ('<html><body><p>Nested  chapter   text</p></body></html>').encode()
css = b'p { margin: 0 }'
opf_nested = ('<?xml version="1.0"?>'
              "<package xmlns='http://www.idpf.org/2007/opf' version='2.0'>"
              '<manifest>'
              "<item href='./nch.xhtml' media-type='application/xhtml+xml' id='n1'/>"
              "<item media-type='text/css' id='style' href='s.css'/>"
              '</manifest>'
              "<spine><itemref idref='n1'/><itemref idref='style'/></spine>"
              '</package>').encode()
nested = build("nested.epub", [
    ("META-INF/container.xml", container("OEBPS/book/pkg.opf")),
    ("OEBPS/book/pkg.opf", opf_nested),
    ("OEBPS/book/nch.xhtml", nch),
    ("OEBPS/book/s.css", css)])
NESTED_EXPECT = "Nested chapter text"
dump("nested.epub", nested, NESTED_EXPECT)

# --- refusals ------------------------------------------------------------
badmime = build("badmime.epub", [
    ("META-INF/container.xml", container("OEBPS/content.opf")),
    ("OEBPS/content.opf", opf_simple),
    ("OEBPS/ch1.xhtml", ch1),
    ("OEBPS/ch2.xhtml", ch2)], mimetype=b"application/zip")
dump("badmime.epub", badmime, None)

opf_nospine = ('<package xmlns="http://www.idpf.org/2007/opf">'
               '<manifest><item id="c1" href="ch1.xhtml" '
               'media-type="application/xhtml+xml"/></manifest>'
               '<spine></spine></package>').encode()
nospine = build("nospine.epub", [
    ("META-INF/container.xml", container("OEBPS/content.opf")),
    ("OEBPS/content.opf", opf_nospine),
    ("OEBPS/ch1.xhtml", ch1)])
dump("nospine.epub", nospine, None)

missing = build("missing.epub", [
    ("META-INF/container.xml", container("OEBPS/content.opf")),
    ("OEBPS/content.opf", opf_simple),
    ("OEBPS/ch1.xhtml", ch1)])  # ch2.xhtml absent
dump("missing.epub", missing, None)

print("fixtures written to", OUT)
