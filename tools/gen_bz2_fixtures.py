#!/usr/bin/env python3
"""bzip2 fixtures for Bzip2Spec from the INDEPENDENT python stdlib
compressor (libbz2), with exact payload sidecars: any correct decoder
must reproduce the compressor's input bit-for-bit.

Writes src/test/resources/bz2_fixtures/<name>.bz2 plus <name>.raw
payload files, and prints (name, raw_len, raw_md5) rows for the
query-registry fixtures (small ones are also emitted as hex on stdout).
"""
import bz2
import hashlib
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "bz2_fixtures")
os.makedirs(OUT, exist_ok=True)


def lcg(seed):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield (s >> 33) & 0xFF


def payloads():
    phrase = (b"the quick brown fox jumps over the lazy dog 0123456789 "
              b"pack my box with five dozen liquor jugs ")
    g = lcg(42)
    rand64k = bytes(next(g) for _ in range(65536))
    runs = b"".join(bytes([b]) * n for b, n in
                    [(65, 3), (66, 4), (67, 5), (68, 260), (69, 259),
                     (70, 1), (71, 300), (72, 4)])
    multi = phrase * 3000  # > 100k so level 1 emits multiple blocks
    return [
        ("text_small", phrase * 4, 9),
        ("empty", b"", 9),
        ("runs_rle1", runs, 9),
        ("rand64k", rand64k, 9),
        ("multiblock_l1", multi, 1),
    ]


def main():
    rows = []
    for name, raw, level in payloads():
        blob = bz2.compress(raw, level)
        with open(os.path.join(OUT, name + ".bz2"), "wb") as f:
            f.write(blob)
        with open(os.path.join(OUT, name + ".raw"), "wb") as f:
            f.write(raw)
        rows.append((name, blob, raw))
        print(f"{name}: {len(raw)} raw -> {len(blob)} bz2, "
              f"md5 {hashlib.md5(raw).hexdigest()}")

    # two-stream concatenation (the parallel-dump layout)
    a = bz2.compress(b"first stream payload. ", 9)
    bb = bz2.compress(b"second stream payload! ", 9)
    raw = b"first stream payload. " + b"second stream payload! "
    with open(os.path.join(OUT, "concat2.bz2"), "wb") as f:
        f.write(a + bb)
    with open(os.path.join(OUT, "concat2.raw"), "wb") as f:
        f.write(raw)
    print(f"concat2: {len(raw)} raw -> {len(a) + len(bb)} bz2, "
          f"md5 {hashlib.md5(raw).hexdigest()}")

    print("\n--- query fixtures (hex) ---")
    for name, blob, raw in rows:
        if len(blob) <= 4096 and name != "rand64k":
            print(f'"{name}" -> ("{blob.hex().upper()}", {len(raw)}, '
                  f'"{hashlib.md5(raw).hexdigest()}"),')


if __name__ == "__main__":
    main()
