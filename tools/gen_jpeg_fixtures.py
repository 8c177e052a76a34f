#!/usr/bin/env python3
"""Generate baseline-JPEG fixtures for JpegPixelSpec, independently of the
Scala decoder under test.

Writes real baseline (SOF0) JPEG files — forward DCT, quantization,
canonical Huffman tables, byte stuffing, optional restart markers,
optional 4:2:0 / 4:4:4 interleaving — plus sidecar `.grays` files holding
the expected LUMA raster:

- For block-constant images with q[0]==8 the decode is EXACT by
  construction under ANY correct decoder (DC = 8*(v-128) quantizes
  losslessly, a DC-only block renders as the constant DC/8 + 128 with no
  rounding ambiguity), so the sidecar is exact.
- For AC-rich images the sidecar is this script's float64
  dequantize->IDCT->round reference; decoders may differ by at most ±1
  per pixel (integer-IDCT vs float rounding), which the spec allows.

Fixture set:
  gray_blocks   32x24 grayscale, constant 8x8 blocks (EXACT)
  gray_ac       24x16 grayscale gradient+texture (AC energy, ±1)
  gray_pad      20x12 grayscale — dims not multiples of 8 (crop path, ±1)
  gray_restart  32x8  grayscale, DRI=2 with RST markers (±1)
  color420      32x32 YCbCr 4:2:0 interleaved, AC-rich chroma (±1 on Y)
  color444      16x16 YCbCr 4:4:4 interleaved (±1 on Y)
  blocks420     32x32 4:2:0, block-constant luma (EXACT) — the
                mm_image_jpeg oracle fixture alongside gray_blocks
  reject_progressive  SOF2 header — decoders must return null
"""
import math
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "jpeg_fixtures")

ZZ = [  # zigzag order: index k -> natural position (row*8+col)
    0,  1,  8, 16,  9,  2,  3, 10,
   17, 24, 32, 25, 18, 11,  4,  5,
   12, 19, 26, 33, 40, 48, 41, 34,
   27, 20, 13,  6,  7, 14, 21, 28,
   35, 42, 49, 56, 57, 50, 43, 36,
   29, 22, 15, 23, 30, 37, 44, 51,
   58, 59, 52, 45, 38, 31, 39, 46,
   53, 60, 61, 54, 47, 55, 62, 63]

COS = [[math.cos((2 * x + 1) * u * math.pi / 16) *
        (math.sqrt(1.0 / 8) if u == 0 else math.sqrt(2.0 / 8))
        for x in range(8)] for u in range(8)]


def dct2(block):  # block[y][x] of level-shifted samples -> X[u][v]
    return [[sum(COS[u][y] * COS[v][x] * block[y][x]
                 for y in range(8) for x in range(8))
             for v in range(8)] for u in range(8)]


def idct2(X):  # X[u][v] -> samples[y][x] (float, pre-level-shift)
    return [[sum(COS[u][y] * COS[v][x] * X[u][v]
                 for u in range(8) for v in range(8))
             for x in range(8)] for y in range(8)]


def quantize(X, qz):  # natural-order X, zigzag-order table -> zigzag coef list
    out = []
    for k in range(64):
        n = ZZ[k]
        out.append(int(math.floor(X[n // 8][n % 8] / qz[k] + 0.5)))
    return out


def dequant_decode(coefz, qz):
    X = [[0.0] * 8 for _ in range(8)]
    for k in range(64):
        n = ZZ[k]
        X[n // 8][n % 8] = coefz[k] * qz[k]
    s = idct2(X)
    return [[max(0, min(255, int(math.floor(s[y][x] + 128 + 0.5))))
             for x in range(8)] for y in range(8)]


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, val, cnt):
        for i in range(cnt - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):  # pad with 1-bits to a byte boundary (spec padding)
        while self.n:
            self.bits(1, 1)


def build_huffman(symbols):
    """All-same-length canonical table over the used symbols (valid JPEG:
    2^L - 1 >= count keeps the all-ones code unused)."""
    syms = sorted(set(symbols))
    L = 1
    while (1 << L) - 1 < len(syms):
        L += 1
    bits = [0] * 17
    bits[L] = len(syms)
    codes = {s: (i, L) for i, s in enumerate(syms)}
    return bits, syms, codes


def mag_bits(v):
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def block_symbols(coefz, pred):
    """Yield (dc_or_ac, symbol, extra_val, extra_len) ops for one block."""
    ops = []
    diff = coefz[0] - pred
    s, ev = mag_bits(diff)
    ops.append(("dc", s, ev, s))
    k = 1
    run = 0
    while k < 64:
        v = coefz[k]
        if v == 0:
            run += 1
        else:
            while run > 15:
                ops.append(("ac", 0xF0, 0, 0))
                run -= 16
            s, ev = mag_bits(v)
            ops.append(("ac", (run << 4) | s, ev, s))
            run = 0
        k += 1
    if run:
        ops.append(("ac", 0x00, 0, 0))
    return ops, coefz[0]


def pad_plane(plane, w, h):
    bw, bh = (w + 7) // 8 * 8, (h + 7) // 8 * 8
    return [[plane[min(y, h - 1)][min(x, w - 1)] for x in range(bw)]
            for y in range(bh)], bw, bh


def encode(path, w, h, planes, sampling, qtables, dri=0):
    """planes: list of (plane[h][w], q_id, comp_id); sampling: [(hs,vs)...];
    qtables: {id: zigzag-64-list}. Returns decoded luma raster (expected)."""
    ncomp = len(planes)
    maxh = max(s[0] for s in sampling)
    maxv = max(s[1] for s in sampling)
    comp_data = []  # per comp: list of rows of quantized blocks + geometry
    expected = None
    for ci, ((plane, qid, cid), (hs, vs)) in enumerate(zip(planes, sampling)):
        cw = (w * hs + maxh - 1) // maxh
        ch = (h * vs + maxv - 1) // maxv
        padded, bw, bh = pad_plane(plane, cw, ch)
        # pad block count to MCU multiples when interleaved
        if ncomp > 1:
            bw = ((bw // 8 + hs - 1) // hs * hs) * 8
            bh = ((bh // 8 + vs - 1) // vs * vs) * 8
            padded = [[padded[min(y, len(padded) - 1)][min(x, len(padded[0]) - 1)]
                       for x in range(bw)] for y in range(bh)]
        blocks = {}
        for by in range(bh // 8):
            for bx in range(bw // 8):
                blk = [[padded[by * 8 + y][bx * 8 + x] - 128 for x in range(8)]
                       for y in range(8)]
                blocks[(bx, by)] = quantize(dct2(blk), qtables[qid])
        comp_data.append((blocks, bw // 8, bh // 8, hs, vs, qid, cid))
        if ci == 0:
            # expected luma: decode path on the quantized coefficients
            dec = [[0] * (bw) for _ in range(bh)]
            for (bx, by), cz in blocks.items():
                px = dequant_decode(cz, qtables[qid])
                for y in range(8):
                    for x in range(8):
                        dec[by * 8 + y][bx * 8 + x] = px[y][x]
            expected = [row[:cw] for row in dec[:ch]]

    # assemble the MCU block sequence
    seq = []  # (comp_index, bx, by)
    if ncomp == 1:
        blocks, nbx, nby, _, _, _, _ = comp_data[0]
        for by in range(nby):
            for bx in range(nbx):
                seq.append([(0, bx, by)])  # one block per "MCU" (Ns=1)
    else:
        mcux = (w + 8 * maxh - 1) // (8 * maxh)
        mcuy = (h + 8 * maxv - 1) // (8 * maxv)
        for my in range(mcuy):
            for mx in range(mcux):
                mcu = []
                for ci, (_, _, _, hs, vs, _, _) in enumerate(comp_data):
                    for byy in range(vs):
                        for bxx in range(hs):
                            mcu.append((ci, mx * hs + bxx, my * vs + byy))
                seq.append(mcu)

    # first pass: collect symbols per (table kind, comp class)
    # table 0 = luma (comp 0), table 1 = chroma (comps 1..)
    dc_syms = {0: [], 1: []}
    ac_syms = {0: [], 1: []}
    preds = [0] * ncomp
    all_ops = []
    for mi, mcu in enumerate(seq):
        if dri and mi and mi % dri == 0:
            preds = [0] * ncomp
            all_ops.append(("rst", (mi // dri - 1) % 8))
        for (ci, bx, by) in mcu:
            blocks = comp_data[ci][0]
            tid = 0 if ci == 0 else 1
            ops, dc = block_symbols(blocks[(bx, by)], preds[ci])
            preds[ci] = dc
            for kind, sym, ev, el in ops:
                (dc_syms if kind == "dc" else ac_syms)[tid].append(sym)
            all_ops.append(("blk", ops, tid))
    tables = {}
    for tid in (0, 1):
        if dc_syms[tid]:
            tables[("dc", tid)] = build_huffman(dc_syms[tid])
            tables[("ac", tid)] = build_huffman(ac_syms[tid])

    # emit
    buf = bytearray(b"\xFF\xD8")
    for qid, qz in qtables.items():
        buf += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([qid]) + bytes(qz)
    buf += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for (_, _, _, hs, vs, qid, cid) in comp_data:
        buf += bytes([cid, (hs << 4) | vs, qid])
    for (kind, tid), (bits, vals, _) in sorted(tables.items()):
        tc = 0 if kind == "dc" else 1
        buf += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals))
        buf += bytes([(tc << 4) | tid]) + bytes(bits[1:17]) + bytes(vals)
    if dri:
        buf += b"\xFF\xDD" + struct.pack(">HH", 4, dri)
    buf += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci, (_, _, _, _, _, _, cid) in enumerate(comp_data):
        tid = 0 if ci == 0 else 1
        buf += bytes([cid, (tid << 4) | tid])
    buf += bytes([0, 63, 0])

    bw_ = BitWriter()
    for op in all_ops:
        if op[0] == "rst":
            bw_.align()
            bw_.out += bytes([0xFF, 0xD0 + op[1]])
        else:
            _, ops, tid = op
            for kind, sym, ev, el in ops:
                _, _, codes = tables[(kind, tid)]
                c, l = codes[sym]
                bw_.bits(c, l)
                if el:
                    bw_.bits(ev, el)
    bw_.align()
    buf += bw_.out
    buf += b"\xFF\xD9"

    with open(path, "wb") as f:
        f.write(buf)
    return expected


def write_expected(path, w, h, raster):
    with open(path, "w") as f:
        f.write(f"{w} {h}\n")
        f.write(" ".join(str(v) for row in raster for v in row) + "\n")


def gray(wv, hv, f):
    return [[f(x, y) for x in range(wv)] for y in range(hv)]


QLUMA = [8] + [10 + ((ZZ[k] // 8) + (ZZ[k] % 8)) * 2 for k in range(1, 64)]
QCHROMA = [8] + [16 + ((ZZ[k] // 8) + (ZZ[k] % 8)) * 3 for k in range(1, 64)]


def main():
    os.makedirs(OUT, exist_ok=True)

    # 1. block-constant grayscale — EXACT expectations by construction
    w, h = 32, 24
    blockv = lambda x, y: (37 * (x // 8) + 59 * (y // 8) + 23) % 256
    exp = encode(os.path.join(OUT, "gray_blocks.jpg"), w, h,
                 [(gray(w, h, blockv), 0, 1)], [(1, 1)], {0: QLUMA})
    # assert the reference decode really is exact (DC-only, q0=8)
    want = gray(w, h, blockv)
    assert exp == want, "gray_blocks reference decode must be exact"
    write_expected(os.path.join(OUT, "gray_blocks.jpg.grays"), w, h, exp)

    # 2. AC-rich grayscale
    w, h = 24, 16
    f = lambda x, y: (x * 9 + y * 5 + ((x * y) % 7) * 11) % 256
    exp = encode(os.path.join(OUT, "gray_ac.jpg"), w, h,
                 [(gray(w, h, f), 0, 1)], [(1, 1)], {0: QLUMA})
    write_expected(os.path.join(OUT, "gray_ac.jpg.grays"), w, h, exp)

    # 3. non-multiple-of-8 dims (crop)
    w, h = 20, 12
    f = lambda x, y: (x * 13 + y * 7) % 256
    exp = encode(os.path.join(OUT, "gray_pad.jpg"), w, h,
                 [(gray(w, h, f), 0, 1)], [(1, 1)], {0: QLUMA})
    write_expected(os.path.join(OUT, "gray_pad.jpg.grays"), w, h, exp)

    # 4. restart markers (DRI=2)
    w, h = 32, 8
    f = lambda x, y: (x * 6 + y * 17 + 40) % 256
    exp = encode(os.path.join(OUT, "gray_restart.jpg"), w, h,
                 [(gray(w, h, f), 0, 1)], [(1, 1)], {0: QLUMA}, dri=2)
    write_expected(os.path.join(OUT, "gray_restart.jpg.grays"), w, h, exp)

    # 5. 4:2:0 color, AC-rich everywhere (chroma must be huffman-walked)
    w, h = 32, 32
    fy = lambda x, y: (x * 3 + y * 11 + ((x + y) % 5) * 9) % 256
    fcb = lambda x, y: (x * 7 + y * 2 + 100) % 256
    fcr = lambda x, y: (x * 4 + y * 13 + 60) % 256
    exp = encode(os.path.join(OUT, "color420.jpg"), w, h,
                 [(gray(w, h, fy), 0, 1),
                  (gray(w // 2, h // 2, fcb), 1, 2),
                  (gray(w // 2, h // 2, fcr), 1, 3)],
                 [(2, 2), (1, 1), (1, 1)], {0: QLUMA, 1: QCHROMA})
    write_expected(os.path.join(OUT, "color420.jpg.grays"), w, h, exp)

    # 6. 4:4:4 color
    w, h = 16, 16
    exp = encode(os.path.join(OUT, "color444.jpg"), w, h,
                 [(gray(w, h, fy), 0, 1),
                  (gray(w, h, fcb), 1, 2),
                  (gray(w, h, fcr), 1, 3)],
                 [(1, 1), (1, 1), (1, 1)], {0: QLUMA, 1: QCHROMA})
    write_expected(os.path.join(OUT, "color444.jpg.grays"), w, h, exp)

    # 7. 4:2:0 with block-constant luma (EXACT) — oracle fixture
    w, h = 32, 32
    bv = lambda x, y: (29 * (x // 8) + 43 * (y // 8) + 50) % 256
    exp = encode(os.path.join(OUT, "blocks420.jpg"), w, h,
                 [(gray(w, h, bv), 0, 1),
                  (gray(w // 2, h // 2, lambda x, y: 128), 1, 2),
                  (gray(w // 2, h // 2, lambda x, y: 90), 1, 3)],
                 [(2, 2), (1, 1), (1, 1)], {0: QLUMA, 1: QCHROMA})
    assert exp == gray(w, h, bv), "blocks420 reference decode must be exact"
    write_expected(os.path.join(OUT, "blocks420.jpg.grays"), w, h, exp)

    # 8. progressive reject: valid SOI/DQT then SOF2 — decoders must null
    with open(os.path.join(OUT, "reject_progressive.jpg"), "wb") as fo:
        buf = bytearray(b"\xFF\xD8")
        buf += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0]) + bytes(QLUMA)
        buf += b"\xFF\xC2" + struct.pack(">HBHHB", 11, 8, 16, 16, 1)
        buf += bytes([1, 0x11, 0])
        buf += b"\xFF\xD9"
        fo.write(buf)

    # 9. colorstats420: 32x32 4:2:0, block-constant Y AND block-constant
    # Cb/Cr mosaics, all on q0=8 tables -> every DC quantizes losslessly
    # and the DC color statistics (jpeg_color_stats) are EXACT closed
    # forms of the block formulas below.
    w, h = 32, 32
    ysv = lambda x, y: (29 * (x // 8) + 31 * (y // 8) + 40) % 256
    cbv = lambda x, y: (50 * (x // 8) + 70 * (y // 8) + 96) % 256
    crv = lambda x, y: (90 * (x // 8) + 30 * (y // 8) + 60) % 256
    exp = encode(os.path.join(OUT, "colorstats420.jpg"), w, h,
                 [(gray(w, h, ysv), 0, 1),
                  (gray(w // 2, h // 2, cbv), 1, 2),
                  (gray(w // 2, h // 2, crv), 1, 3)],
                 [(2, 2), (1, 1), (1, 1)], {0: QLUMA, 1: QLUMA})
    assert exp == gray(w, h, ysv), "colorstats420 luma must be exact"
    write_expected(os.path.join(OUT, "colorstats420.jpg.grays"), w, h, exp)
    ys = [ysv(bx * 8, by * 8) for by in range(4) for bx in range(4)]
    cbs = [cbv(bx * 8, by * 8) for by in range(2) for bx in range(2)]
    crs = [crv(bx * 8, by * 8) for by in range(2) for bx in range(2)]
    stats = dict(
        y_mean_milli=sum(v * 1000 for v in ys) // 16,
        cb_mean_milli=sum(v * 1000 for v in cbs) // 4,
        cr_mean_milli=sum(v * 1000 for v in crs) // 4,
        colorfulness_milli=(sum(abs(v - 128) * 1000 for v in cbs) +
                            sum(abs(v - 128) * 1000 for v in crs)) // 8)
    print("colorstats420 expected:", stats)

    print("fixtures written to", OUT)


if __name__ == "__main__":
    main()
