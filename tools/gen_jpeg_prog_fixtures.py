#!/usr/bin/env python3
"""Generate PROGRESSIVE (SOF2) JPEG fixtures for JpegPixelSpec,
independently of the Scala decoder under test.

Reuses gen_jpeg_fixtures' DCT/quantize/Huffman/bit-writer helpers and
emits libjpeg's default grayscale scan script — DC first (Al=1), two AC
first scans at Al=2 with spectral selection (1-5, 6-63), one AC
refinement 2→1 over the merged band (1-63), DC refinement, final AC
refinement 1→0 — exercising EOB runs, ZRL-in-refinement, buffered
correction bits, and successive approximation end to end. Successive
approximation is lossless once Al reaches 0, so the sidecar expectations
are the same dequantize→IDCT→round references the baseline fixtures use
(EXACT for the block-constant mosaic, ±1 for AC-rich content).

Fixture set:
  prog_blocks  32x24 grayscale, constant 8x8 blocks (EXACT — the
               mm_image_jpeg_prog oracle fixture; same mosaic formula as
               gray_blocks: v = (37*bx + 59*by + 23) % 256)
  prog_ac      24x16 grayscale gradient+texture (AC energy, ±1)
  prog_pad     20x12 grayscale — dims not multiples of 8 (crop path, ±1)
"""
import math
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gen_jpeg_fixtures as base

OUT = base.OUT

SCRIPT = [  # (Ss, Se, Ah, Al) — libjpeg's default grayscale script
    (0, 0, 0, 1),
    (1, 5, 0, 2),
    (6, 63, 0, 2),
    (1, 63, 2, 1),
    (0, 0, 1, 0),
    (1, 63, 1, 0),
]


def sms(v, al):
    """AC point transform: sign-magnitude shift (truncate toward zero)."""
    m = abs(v) >> al
    return m if v >= 0 else -m


def encode_dc_first(blocks_seq, al):
    ops = []
    pred = 0
    for cz in blocks_seq:
        v = cz[0] >> al  # DC point transform is an arithmetic shift
        s, ev = base.mag_bits(v - pred)
        pred = v
        ops.append(("h", s))
        if s:
            ops.append(("b", ev, s))
    return ops


def encode_dc_refine(blocks_seq, al):
    return [("b", (cz[0] >> al) & 1, 1) for cz in blocks_seq]


def encode_ac_first(blocks_seq, ss, se, al):
    ops = []
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            ops.append(("h", r << 4))
            if r:
                ops.append(("b", eobrun - (1 << r), r))
            eobrun = 0

    for cz in blocks_seq:
        vals = [sms(cz[k], al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 32767:
                flush()
            continue
        flush()
        run = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                run += 1
            else:
                while run > 15:
                    ops.append(("h", 0xF0))
                    run -= 16
                s, ev = base.mag_bits(v)
                ops.append(("h", (run << 4) | s))
                ops.append(("b", ev, s))
                run = 0
        if nz[-1] < se - ss:
            eobrun += 1  # EOB covers this block's tail too
    flush()
    return ops


def encode_ac_refine(blocks_seq, ss, se, ah, al):
    ops = []
    eobrun = 0
    bufbits = []

    def flush():
        nonlocal eobrun, bufbits
        if eobrun:
            r = eobrun.bit_length() - 1
            ops.append(("h", r << 4))
            if r:
                ops.append(("b", eobrun - (1 << r), r))
            ops.extend(("b", bit, 1) for bit in bufbits)
            eobrun = 0
            bufbits = []

    for cz in blocks_seq:
        band = [cz[k] for k in range(ss, se + 1)]
        absv = [abs(c) >> al for c in band]
        hist = [abs(c) >> ah for c in band]
        newly = [i for i in range(len(band)) if hist[i] == 0 and absv[i]]
        if not newly:
            bufbits.extend(absv[i] & 1 for i in range(len(band)) if hist[i])
            eobrun += 1
            if eobrun == 32767:
                flush()
            continue
        flush()
        run = 0
        pend = []
        for i in range(newly[-1] + 1):
            if hist[i]:
                pend.append(absv[i] & 1)
            elif absv[i] == 0:
                run += 1
            else:  # newly nonzero at this precision (absv must be 1)
                while run > 15:
                    ops.append(("h", 0xF0))
                    ops.extend(("b", bit, 1) for bit in pend)
                    pend = []
                    run -= 16
                ops.append(("h", (run << 4) | 1))
                ops.append(("b", 1 if band[i] > 0 else 0, 1))
                ops.extend(("b", bit, 1) for bit in pend)
                pend = []
                run = 0
        tail = pend + [absv[i] & 1
                       for i in range(newly[-1] + 1, len(band)) if hist[i]]
        if newly[-1] < len(band) - 1 or tail:
            bufbits.extend(tail)
            eobrun += 1
    flush()
    return ops


def encode_progressive(path, w, h, plane, qz):
    padded, bw, bh = base.pad_plane(plane, w, h)
    nbx, nby = bw // 8, bh // 8
    blocks_seq = []
    for by in range(nby):
        for bx in range(nbx):
            blk = [[padded[by * 8 + y][bx * 8 + x] - 128 for x in range(8)]
                   for y in range(8)]
            blocks_seq.append(base.quantize(base.dct2(blk), qz))

    buf = bytearray(b"\xFF\xD8")
    buf += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0]) + bytes(qz)
    buf += b"\xFF\xC2" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    buf += bytes([1, 0x11, 0])  # comp id 1, 1x1, qtable 0

    for (ss, se, ah, al) in SCRIPT:
        if ss == 0 and ah == 0:
            ops = encode_dc_first(blocks_seq, al)
            tc = 0
        elif ss == 0:
            ops = encode_dc_refine(blocks_seq, al)
            tc = None  # refinement reads raw bits, no table
        elif ah == 0:
            ops = encode_ac_first(blocks_seq, ss, se, al)
            tc = 1
        else:
            ops = encode_ac_refine(blocks_seq, ss, se, ah, al)
            tc = 1
        codes = None
        if tc is not None:
            syms = [op[1] for op in ops if op[0] == "h"]
            bits, vals, codes = base.build_huffman(syms)
            buf += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals))
            buf += bytes([(tc << 4) | 0]) + bytes(bits[1:17]) + bytes(vals)
        buf += b"\xFF\xDA" + struct.pack(">HB", 8, 1)
        buf += bytes([1, 0x00])  # comp 1, Td=0 Ta=0
        buf += bytes([ss, se, (ah << 4) | al])
        bw_ = base.BitWriter()
        for op in ops:
            if op[0] == "h":
                c, l = codes[op[1]]
                bw_.bits(c, l)
            else:
                _, v, n = op
                if n:
                    bw_.bits(v, n)
        bw_.align()
        buf += bw_.out
    buf += b"\xFF\xD9"

    with open(path, "wb") as f:
        f.write(buf)

    # expected raster: successive approximation is lossless at Al=0, so
    # the reference is the same dequantize->IDCT->round as baseline
    dec = [[0] * bw for _ in range(bh)]
    i = 0
    for by in range(nby):
        for bx in range(nbx):
            px = base.dequant_decode(blocks_seq[i], qz)
            i += 1
            for y in range(8):
                for x in range(8):
                    dec[by * 8 + y][bx * 8 + x] = px[y][x]
    return [row[:w] for row in dec[:h]]


def main():
    os.makedirs(OUT, exist_ok=True)

    fixtures = [
        ("prog_blocks", 32, 24,
         base.gray(32, 24, lambda x, y: (37 * (x // 8) + 59 * (y // 8) + 23) % 256)),
        ("prog_ac", 24, 16,
         base.gray(24, 16, lambda x, y: (x * 9 + y * 5 + ((x * y) % 7) * 11) % 256)),
        ("prog_pad", 20, 12,
         base.gray(20, 12, lambda x, y: (x * 12 + y * 7) % 256)),
    ]
    for name, w, h, plane in fixtures:
        exp = encode_progressive(os.path.join(OUT, name + ".jpg"),
                                 w, h, plane, base.QLUMA)
        base.write_expected(os.path.join(OUT, name + ".jpg.grays"), w, h, exp)
        print(name, "written")
    with open(os.path.join(OUT, "prog_blocks.jpg"), "rb") as f:
        hexs = f.read().hex().upper()
    chunks = [hexs[i:i + 100] for i in range(0, len(hexs), 100)]
    print("  private val jpegProgBlocksHex =")
    print("    " + " +\n      ".join('"%s"' % c for c in chunks))


if __name__ == "__main__":
    main()
