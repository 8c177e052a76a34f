#!/usr/bin/env python3
"""Independent classic-PDF fixtures (hand-built ISO 32000-1 syntax with
self-computed xref offsets, python zlib for Flate) for PdfTextSpec:
raw and Flate content streams, TJ arrays with kerning and hex strings,
octal/paren escapes, a nested page tree, and an incremental-update
(/Prev) chain. Prints each fixture's expected extraction under the
documented operator semantics (Tj/TJ/' append, Td/TD/T*/' newline,
pages join with newline).

Writes src/test/resources/pdf_fixtures/*.pdf.
"""
import os
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "pdf_fixtures")
os.makedirs(OUT, exist_ok=True)


class Pdf:
    def __init__(self):
        self.buf = bytearray(b"%PDF-1.4\n")
        self.offsets = {}

    def obj(self, num, body, stream=None):
        self.offsets[num] = len(self.buf)
        self.buf += b"%d 0 obj " % num + body
        if stream is not None:
            self.buf += b" stream\n" + stream + b"\nendstream"
        self.buf += b" endobj\n"

    def finish(self, root=1, prev=None, size=None):
        size = size or (max(self.offsets) + 1)
        xref_at = len(self.buf)
        nums = sorted(self.offsets)
        self.buf += b"xref\n"
        # one subsection per contiguous run (free entry 0 only in run 1)
        runs = []
        for n in nums:
            if runs and runs[-1][-1] == n - 1:
                runs[-1].append(n)
            else:
                runs.append([n])
        first = True
        for run in runs:
            if first and run[0] == 1:
                self.buf += b"0 %d\n" % (len(run) + 1)
                self.buf += b"0000000000 65535 f \n"
            else:
                self.buf += b"%d %d\n" % (run[0], len(run))
            for n in run:
                self.buf += b"%010d 00000 n \n" % self.offsets[n]
            first = False
        tr = b"trailer << /Size %d /Root %d 0 R" % (size, root)
        if prev is not None:
            tr += b" /Prev %d" % prev
        tr += b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_at
        self.buf += tr
        return xref_at


def page_objs(p, contents_ref=4):
    p.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    p.obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    p.obj(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Contents %d 0 R >>" % contents_ref)


# 1. raw content stream: Td + Tj, ' operator, octal + paren escapes
p = Pdf()
page_objs(p)
content = (b"BT /F1 12 Tf 72 720 Td (Hello \\(classic\\) PDF \\101\\102) Tj "
           b"(continued line) ' ET")
p.obj(4, b"<< /Length %d >>" % len(content), stream=content)
p.finish()
open(os.path.join(OUT, "raw.pdf"), "wb").write(p.buf)
print("raw.pdf ->", repr("Hello (classic) PDF AB\ncontinued line"))

# 2. Flate stream with TJ kerning array + hex string
p = Pdf()
page_objs(p)
content = (b"BT /F1 10 Tf 50 700 Td [(kerned ) -120 (text) 33 ( run)] TJ "
           b"T* <48657820736964> Tj ET")
flate = zlib.compress(content, 9)
p.obj(4, b"<< /Length %d /Filter /FlateDecode >>" % len(flate), stream=flate)
p.finish()
open(os.path.join(OUT, "flate.pdf"), "wb").write(p.buf)
print("flate.pdf ->", repr("kerned text run\nHex sid"))

# 3. nested page tree: 3 pages across 2 Pages nodes
p = Pdf()
p.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
p.obj(2, b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 3 >>")
p.obj(3, b"<< /Type /Pages /Parent 2 0 R /Kids [4 0 R 5 0 R] /Count 2 >>")
c1 = b"BT (page one) Tj ET"
c2 = b"BT (page two) Tj ET"
c3 = b"BT (page three) Tj ET"
p.obj(4, b"<< /Type /Page /Parent 3 0 R /Contents 7 0 R >>")
p.obj(5, b"<< /Type /Page /Parent 3 0 R /Contents 8 0 R >>")
p.obj(6, b"<< /Type /Page /Parent 2 0 R /Contents 9 0 R >>")
p.obj(7, b"<< /Length %d >>" % len(c1), stream=c1)
p.obj(8, b"<< /Length %d >>" % len(c2), stream=c2)
p.obj(9, b"<< /Length %d >>" % len(c3), stream=c3)
p.finish()
open(os.path.join(OUT, "pages.pdf"), "wb").write(p.buf)
print("pages.pdf ->", repr("page one\npage two\npage three"))

# 4. incremental update: original says old, the update's xref (with /Prev)
#    replaces the content object
p = Pdf()
page_objs(p)
c_old = b"BT (old revision text) Tj ET"
p.obj(4, b"<< /Length %d >>" % len(c_old), stream=c_old)
first_xref = p.finish()
# append the update: new object 4 + its own xref pointing back
upd = Pdf()
upd.buf = p.buf
upd.offsets = {}
c_new = b"BT (updated revision text) Tj ET"
upd.obj(4, b"<< /Length %d >>" % len(c_new), stream=c_new)
upd.finish(prev=first_xref, size=5)
open(os.path.join(OUT, "update.pdf"), "wb").write(upd.buf)
print("update.pdf ->", repr("updated revision text"))


def xref_stream_entry(w, t, f1, f2):
    out = b""
    for width, v in zip(w, (t, f1, f2)):
        out += v.to_bytes(width, "big")
    return out


def png_up_filter(data, row_len):
    """Apply the PNG 'Up' filter (tag 2) row-wise — the predictor-12
    pre-filter modern writers use on xref streams."""
    rows = [data[i:i + row_len] for i in range(0, len(data), row_len)]
    out = bytearray()
    prev = bytes(row_len)
    for row in rows:
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(row_len))
        prev = row
    return bytes(out)


# 5. PDF 1.5: xref STREAM (predictor 12) + objects in an /ObjStm
buf = bytearray(b"%PDF-1.5\n")
offsets = {}


def emit(num, body, stream=None):
    offsets[num] = len(buf)
    buf.extend(b"%d 0 obj " % num + body)
    if stream is not None:
        buf.extend(b" stream\n" + stream + b"\nendstream")
    buf.extend(b" endobj\n")


# object stream 6 holds objects 1 (catalog), 2 (pages), 3 (page)
inner = [
    (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
    (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
    (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
]
hdr = b""
body = b""
for num, ob in inner:
    hdr += b"%d %d " % (num, len(body))
    body += ob + b" "
objstm_payload = hdr + body
first = len(hdr)
flate_stm = zlib.compress(objstm_payload, 9)
content = b"BT /F1 9 Tf 40 700 Td (modern xref stream text) Tj " \
    b"(second modern line) ' ET"
flate_content = zlib.compress(content, 9)
emit(4, b"<< /Length %d /Filter /FlateDecode >>" % len(flate_content),
     stream=flate_content)
emit(6, b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
     % (len(inner), first, len(flate_stm)), stream=flate_stm)
# xref stream object 7: W [1 2 1]; entries for objects 0-7
w = (1, 2, 1)
xref_at = len(buf)
entries = b"".join([
    xref_stream_entry(w, 0, 0, 255),          # 0 free
    xref_stream_entry(w, 2, 6, 0),            # 1 in objstm 6, idx 0
    xref_stream_entry(w, 2, 6, 1),            # 2 in objstm 6, idx 1
    xref_stream_entry(w, 2, 6, 2),            # 3 in objstm 6, idx 2
    xref_stream_entry(w, 1, offsets[4], 0),   # 4 file
    xref_stream_entry(w, 0, 0, 0),            # 5 free
    xref_stream_entry(w, 1, offsets[6], 0),   # 6 file
    xref_stream_entry(w, 1, xref_at, 0),      # 7 the xref stream itself
])
row_len = sum(w)
filtered = png_up_filter(entries, row_len)
xdata = zlib.compress(filtered, 9)
emit(7, b"<< /Type /XRef /W [1 2 1] /Size 8 /Root 1 0 R "
     b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns %d >> "
     b"/Length %d >>" % (row_len, len(xdata)), stream=xdata)
buf.extend(b"startxref\n%d\n%%%%EOF\n" % xref_at)
open(os.path.join(OUT, "xrefstream.pdf"), "wb").write(buf)
print("xrefstream.pdf ->", repr("modern xref stream text\nsecond modern line"))

# 6. hybrid: classic table marks the page objects free; /XRefStm points
#    at a supplementary xref stream that locates them in an /ObjStm
buf = bytearray(b"%PDF-1.5\n")
offsets = {}
c2 = b"BT (hybrid file text) Tj ET"
emit(4, b"<< /Length %d >>" % len(c2), stream=c2)
emit(6, b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
     % (len(inner), first, len(flate_stm)), stream=flate_stm)
xstm_at = len(buf)
entries = b"".join([
    xref_stream_entry(w, 2, 6, 0),
    xref_stream_entry(w, 2, 6, 1),
    xref_stream_entry(w, 2, 6, 2),
])
xdata = zlib.compress(entries, 9)
emit(7, b"<< /Type /XRef /W [1 2 1] /Size 8 /Index [1 3] /Root 1 0 R "
     b"/Filter /FlateDecode /Length %d >>" % len(xdata), stream=xdata)
xref_at = len(buf)
buf.extend(b"xref\n0 8\n")
buf.extend(b"0000000000 65535 f \n")
for n in range(1, 8):
    if n in offsets:
        buf.extend(b"%010d 00000 n \n" % offsets[n])
    else:
        buf.extend(b"0000000000 65535 f \n")
buf.extend(b"trailer << /Size 8 /Root 1 0 R /XRefStm %d >>\n" % xstm_at)
buf.extend(b"startxref\n%d\n%%%%EOF\n" % xref_at)
open(os.path.join(OUT, "hybrid.pdf"), "wb").write(buf)
print("hybrid.pdf ->", repr("hybrid file text"))


# 7. /LZWDecode content streams (ISO 32000 §7.4.4, the TIFF LZW variant)
# — an independent encoder, MSB-first packing, synchronized to the
# DECODER's width schedule (pdf.js/mupdf rule: the decoder's table size
# lags the encoder's by one at the same read position, so the encoder
# widens from the decoder's count, not its own).
def lzw_encode(data, early=1):
    out = bytearray()
    bitbuf = 0
    bitcnt = 0
    width = 9

    def emit(code):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    emit(256)  # clear
    d = {bytes([i]): i for i in range(256)}
    enc_next = 258
    dec_next = 258
    first = True
    w = b""

    def emit_word():
        nonlocal first, dec_next, width
        emit(d[w])
        if not first and dec_next < 4096:
            dec_next += 1
            if dec_next + early >= (1 << width) and width < 12:
                width += 1
        first = False

    for b in data:
        c = bytes([b])
        if w + c in d:
            w += c
        else:
            emit_word()
            if enc_next < 4096:
                d[w + c] = enc_next
                enc_next += 1
            w = c
    if w:
        emit_word()
    emit(257)  # EOD
    if bitcnt > 0:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def lzw_text(n_words):
    words = ["stream", "filter", "table", "width", "clear", "code",
             "early", "change", "packing", "variable", "twelve", "bits"]
    return " ".join(words[(i * 7 + i * i * 3) % len(words)]
                    + (str(i) if i % 3 == 0 else "")
                    for i in range(n_words))  # indexes force ~2200 codes: crosses 511/1023/2047


import hashlib
for name, early in (("lzw", 1), ("lzw_early0", 0)):
    p = Pdf()
    page_objs(p)
    text = "lzw " + lzw_text(1600)  # ~10k chars: crosses 511/1023/2047
    content = ("BT (" + text + ") Tj ET").encode("ascii")
    comp = lzw_encode(content, early=early)
    parms = b" /DecodeParms << /EarlyChange 0 >>" if early == 0 else b""
    p.obj(4, b"<< /Length %d /Filter /LZWDecode%s >>" % (len(comp), parms),
          stream=comp)
    p.finish()
    open(os.path.join(OUT, name + ".pdf"), "wb").write(p.buf)
    print("%s.pdf -> len=%d md5=%s head=%r comp=%d" %
          (name, len(text), hashlib.md5(text.encode()).hexdigest(),
           text[:30], len(comp)))


# 8. /LZWDecode + /DecodeParms << /Predictor 12 >> — the filter+predictor
# COMBINATION (tag-2 "Up" rows, 16 columns), certifying that the decoder
# applies the predictor AFTER the LZW stage.
def png_up_prefilter(data, cols):
    pad = (-len(data)) % cols
    data = data + b" " * pad
    out = bytearray()
    prev = bytes(cols)
    for r in range(0, len(data), cols):
        row = data[r:r + cols]
        out.append(2)  # PNG Up
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(cols))
        prev = row
    return bytes(out)


p = Pdf()
page_objs(p)
content = b"BT (predictor text through LZW) Tj ET"
filtered = png_up_prefilter(content, 16)
comp = lzw_encode(filtered)
p.obj(4, b"<< /Length %d /Filter /LZWDecode "
         b"/DecodeParms << /Predictor 12 /Columns 16 >> >>" % len(comp),
      stream=comp)
p.finish()
open(os.path.join(OUT, "lzw_pred.pdf"), "wb").write(p.buf)
print("lzw_pred.pdf ->", repr("predictor text through LZW"))
