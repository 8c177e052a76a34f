#!/usr/bin/env python3
"""LZ4 frame fixtures for Lz4Spec from the INDEPENDENT system `lz4`
CLI, with exact payload sidecars. Covers levels 1 and 9, block and
content checksums on and off, content-size header, small/64KB block
sizes, an incompressible payload (uncompressed blocks), a >64KB
repetitive payload (multi-block, long matches), and a two-frame
concatenation.

Writes src/test/resources/lz4_fixtures/<name>.lz4 plus <name>.raw.
"""
import hashlib
import os
import subprocess
import tempfile

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "lz4_fixtures")
os.makedirs(OUT, exist_ok=True)
LZ4 = "lz4"


def lcg(seed):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield (s >> 33) & 0xFF


def compress(raw, args):
    with tempfile.NamedTemporaryFile() as fin:
        fin.write(raw)
        fin.flush()
        r = subprocess.run([LZ4, "-z", "-f", "-q"] + args +
                           [fin.name, "-c"], capture_output=True, check=True)
        return r.stdout


def main():
    phrase = (b"pack my box with five dozen liquor jugs 0123456789 "
              b"the five boxing wizards jump quickly ")
    g = lcg(99)
    rand8k = bytes(next(g) for _ in range(8192))
    rep90k = (phrase * 1200)[:90000]

    cases = [
        ("text_l1", phrase * 6, ["-1"]),
        ("text_l9_bx", phrase * 6, ["-9", "-BX"]),           # block checksums
        ("text_l9_sz", phrase * 6, ["-9", "--content-size"]),
        ("rand8k", rand8k, ["-9"]),                          # incompressible
        ("rep90k_b4", rep90k, ["-9", "-B4", "-BX",
                               "--content-size"]),           # 64KB multi-block
        ("empty", b"", ["-9"]),
    ]
    rows = []
    for name, raw, args in cases:
        blob = compress(raw, args)
        with open(os.path.join(OUT, name + ".lz4"), "wb") as f:
            f.write(blob)
        with open(os.path.join(OUT, name + ".raw"), "wb") as f:
            f.write(raw)
        rows.append((name, blob, raw))
        print(f"{name}: {len(raw)} raw -> {len(blob)} lz4 ({' '.join(args)}), "
              f"md5 {hashlib.md5(raw).hexdigest()}")

    a = compress(b"frame one. ", ["-9"])
    b2 = compress(b"frame two! ", ["-1", "-BX"])
    raw = b"frame one. frame two! "
    with open(os.path.join(OUT, "concat2.lz4"), "wb") as f:
        f.write(a + b2)
    with open(os.path.join(OUT, "concat2.raw"), "wb") as f:
        f.write(raw)
    print(f"concat2: {len(raw)} raw, md5 {hashlib.md5(raw).hexdigest()}")


if __name__ == "__main__":
    main()
