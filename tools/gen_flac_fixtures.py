#!/usr/bin/env python3
"""Independent FLAC encoder for Rice-coded FIXED/LPC fixture streams.

Generates mono 16-bit FLAC files whose samples follow the deterministic
formula v[k] = (seed*37 + k*451) % 4001 - 2000 — the same family the
mm_audio_* oracle queries replay arithmetically. The encoder is written
from the public FLAC format spec (datatracker.ietf.org/doc/rfc9639 /
xiph.org/flac/format.html), independently of the Scala decoder
(graft.functions.AudioFlacStats), so agreement between the two is a real
two-implementation check: any drift in Rice decoding, partition walking,
warmup handling, or predictor arithmetic breaks the fixture stats.

Outputs .flac files under src/test/resources/flac_fixtures/ and prints a
Scala-pasteable hex literal block for ExtraQueries.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "flac_fixtures")


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, n):
        assert 0 <= n <= 64 and 0 <= value < (1 << n) if n else value == 0
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value, n):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def samples_for(seed, n):
    return [(seed * 37 + k * 451) % 4001 - 2000 for k in range(n)]


FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def predict(hist, coefs, shift):
    acc = sum(c * h for c, h in zip(coefs, reversed(hist)))
    return acc >> shift  # python >> floors == java arithmetic >>


def zigzag(v):
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def best_param(resids, max_param):
    best, best_bits = 0, None
    for p in range(max_param + 1):
        bits = sum((zigzag(r) >> p) + 1 + p for r in resids)
        if best_bits is None or bits < best_bits:
            best, best_bits = p, bits
    return best


def write_residuals(w, resids, order, block, po, method, escape_bits=None):
    w.write(method, 2)
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    w.write(po, 4)
    parts = 1 << po
    assert block % parts == 0 and (block >> po) >= order
    idx = 0
    for pi in range(parts):
        cnt = (block >> po) - (order if pi == 0 else 0)
        part = resids[idx:idx + cnt]
        idx += cnt
        if escape_bits is not None:
            w.write(escape, pbits)
            w.write(escape_bits, 5)
            for r in part:
                if escape_bits:
                    w.write_signed(r, escape_bits)
        else:
            p = best_param(part, escape - 1)
            w.write(p, pbits)
            for r in part:
                u = zigzag(r)
                w.write_unary(u >> p)
                if p:
                    w.write(u & ((1 << p) - 1), p)
    assert idx == len(resids)


def write_subframe(w, samples, sub, bps=16):
    """Append one subframe (header + body) to BitWriter w."""
    block = len(samples)
    kind = sub["kind"]
    if kind == "constant":
        w.write(0 << 1, 8)
        w.write_signed(samples[0], bps)
        assert all(s == samples[0] for s in samples)
        return
    if kind == "verbatim":
        w.write(1 << 1, 8)
        for s in samples:
            w.write_signed(s, bps)
        return
    if kind == "fixed":
        order = sub["order"]
        w.write((0b001000 | order) << 1, 8)
        coefs, shift = FIXED_COEFS[order], 0
    else:  # lpc
        order = sub["order"]
        coefs = sub["coefs"]
        shift = sub["shift"]
        prec = sub["prec"]
        w.write((0b100000 | (order - 1)) << 1, 8)
    for s in samples[:order]:
        w.write_signed(s, bps)
    if kind == "lpc":
        w.write(prec - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, prec)
    resids = [samples[i] - predict(samples[i - order:i], coefs, shift)
              for i in range(order, block)]
    write_residuals(w, resids, order, block, sub.get("po", 0),
                    sub.get("method", 0), sub.get("escape_bits"))


def encode_stereo_frame(frame_idx, left, right, chan_asgn, subs):
    """chan_asgn: 1 independent, 8 left-side, 9 right-side, 10 mid-side;
    subs: (sub_ch0, sub_ch1)."""
    block = len(left)
    assert len(right) == block
    head = bytes([0xFF, 0xF8, 0x70, (chan_asgn << 4) | 0x08])
    assert frame_idx < 128
    head += bytes([frame_idx])
    head += (block - 1).to_bytes(2, "big")
    head += b"\x00"  # CRC-8 (decoder skips)
    side = [l - r for l, r in zip(left, right)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    if chan_asgn == 1:
        ch = [(left, 16), (right, 16)]
    elif chan_asgn == 8:
        ch = [(left, 16), (side, 17)]
    elif chan_asgn == 9:
        ch = [(side, 17), (right, 16)]
    else:
        ch = [(mid, 16), (side, 17)]
    w = BitWriter()
    for (samples, bps), sub in zip(ch, subs):
        write_subframe(w, samples, sub, bps)
    w.align()
    return head + w.bytes() + b"\x00\x00"


def encode_frame(frame_idx, samples, sub):
    block = len(samples)
    head = bytes([0xFF, 0xF8, 0x70, 0x08])  # sync, bs=explicit16, sr=STREAMINFO, mono 16-bit
    assert frame_idx < 128
    head += bytes([frame_idx])              # UTF-8 frame number, 1 byte
    head += (block - 1).to_bytes(2, "big")  # explicit blocksize-1
    head += b"\x00"                         # CRC-8 (decoder skips)
    w = BitWriter()
    kind = sub["kind"]
    if kind == "fixed":
        order = sub["order"]
        w.write(((0b001000 | order) << 1), 8)  # subframe header byte
        for s in samples[:order]:
            w.write_signed(s, 16)
        coefs, shift = FIXED_COEFS[order], 0
        resids = [samples[i] - predict(samples[i - order:i], coefs, shift)
                  for i in range(order, block)]
        write_residuals(w, resids, order, block, sub.get("po", 0),
                        sub.get("method", 0), sub.get("escape_bits"))
    elif kind == "lpc":
        order = sub["order"]
        coefs = sub["coefs"]
        shift = sub["shift"]
        prec = sub["prec"]
        assert len(coefs) == order
        assert all(-(1 << (prec - 1)) <= c < (1 << (prec - 1)) for c in coefs)
        w.write(((0b100000 | (order - 1)) << 1), 8)
        for s in samples[:order]:
            w.write_signed(s, 16)
        w.write(prec - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, prec)
        resids = [samples[i] - predict(samples[i - order:i], coefs, shift)
                  for i in range(order, block)]
        write_residuals(w, resids, order, block, sub.get("po", 0),
                        sub.get("method", 0), sub.get("escape_bits"))
    else:
        raise ValueError(kind)
    w.align()
    return head + w.bytes() + b"\x00\x00"  # CRC-16 (decoder skips)


def streaminfo(total, channels=1):
    out = b"\x80\x00\x00\x22"              # last block, type 0, len 34
    out += (16).to_bytes(2, "big") + (65535).to_bytes(2, "big")
    out += b"\x00" * 6                      # min/max framesize unknown
    packed = (16000 << 44) | ((channels - 1) << 41) | (15 << 36) | total
    out += packed.to_bytes(8, "big")
    out += b"\x00" * 16                     # MD5 unset
    return out


def encode(seed, frames):
    total = sum(f["n"] for f in frames)
    out = b"fLaC" + streaminfo(total)
    pos = 0
    for i, f in enumerate(frames):
        s = samples_for(seed, total)[pos:pos + f["n"]]
        out += encode_frame(i, s, f)
        pos += f["n"]
    return out


FIXTURES = [
    ("fixed0", 101, 64, [dict(n=64, kind="fixed", order=0, po=0)]),
    ("fixed1", 102, 64, [dict(n=64, kind="fixed", order=1, po=1)]),
    ("fixed2", 103, 64, [dict(n=64, kind="fixed", order=2, po=2)]),
    ("fixed34", 104, 64, [dict(n=32, kind="fixed", order=3, po=0),
                          dict(n=32, kind="fixed", order=4, po=1)]),
    ("lpc2", 105, 64, [dict(n=64, kind="lpc", order=2, prec=12, shift=5,
                            coefs=[60, -29], po=0)]),
    ("lpc4r2", 106, 64, [dict(n=64, kind="lpc", order=4, prec=14, shift=6,
                              coefs=[101, -47, 23, -11], po=1, method=1)]),
    ("esc", 107, 64, [dict(n=64, kind="fixed", order=0, po=1,
                           escape_bits=13)]),
    ("lpc8", 108, 64, [dict(n=64, kind="lpc", order=8, prec=12, shift=5,
                            coefs=[40, -20, 10, -5, 3, -2, 1, -1], po=2)]),
]


def samples_lr(seed, n):
    left = [(seed * 37 + k * 451) % 4001 - 2000 for k in range(n)]
    right = [(seed * 53 + k * 211) % 3001 - 1500 for k in range(n)]
    return left, right


def encode_stereo(seed, n, chan_asgn, subs):
    out = b"fLaC" + streaminfo(n, channels=2)
    left, right = samples_lr(seed, n)
    out += encode_stereo_frame(0, left, right, chan_asgn, subs)
    return out


STEREO_FIXTURES = [
    ("st_ind", 201, 64, 1, (dict(kind="fixed", order=2, po=1),
                            dict(kind="fixed", order=1, po=0))),
    ("st_ls", 202, 64, 8, (dict(kind="fixed", order=2, po=0),
                           dict(kind="fixed", order=1, po=1))),
    ("st_rs", 203, 64, 9, (dict(kind="fixed", order=0, po=0),
                           dict(kind="lpc", order=2, prec=12, shift=5,
                                coefs=[60, -29], po=0))),
    ("st_ms", 204, 64, 10, (dict(kind="fixed", order=2, po=1),
                            dict(kind="fixed", order=2, po=0, method=1))),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    print("  // committed FLAC fixtures (tools/gen_flac_fixtures.py) --")
    print("  // samples v[k] = (seed*37 + k*451) % 4001 - 2000")
    for name, seed, n, chan_asgn, subs in STEREO_FIXTURES:
        blob = encode_stereo(seed, n, chan_asgn, subs)
        with open(os.path.join(OUT, name + ".flac"), "wb") as f:
            f.write(blob)
        hexs = blob.hex().upper()
        chunks = [hexs[i:i + 100] for i in range(0, len(hexs), 100)]
        lines = " +\n      ".join('"%s"' % c for c in chunks)
        print('  private val flacStereo_%s =\n    %s' % (name, lines))
    srows = ", ".join('("%s", %dL, %d, flacStereo_%s)' % (nm, seed, n, nm)
                      for nm, seed, n, _, _ in STEREO_FIXTURES)
    print("  private val flacStereoFixtures = Seq(%s)" % srows)
    for name, seed, n, frames in FIXTURES:
        blob = encode(seed, frames)
        with open(os.path.join(OUT, name + ".flac"), "wb") as f:
            f.write(blob)
        hexs = blob.hex().upper()
        chunks = [hexs[i:i + 100] for i in range(0, len(hexs), 100)]
        lines = " +\n      ".join('"%s"' % c for c in chunks)
        print('  private val flacRice_%s =\n    %s' % (name, lines))
    rows = ", ".join('("%s", %dL, %d, flacRice_%s)' % (nm, seed, n, nm)
                     for nm, seed, n, _ in FIXTURES)
    print("  private val flacRiceFixtures = Seq(%s)" % rows)


if __name__ == "__main__":
    main()
