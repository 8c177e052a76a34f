#!/usr/bin/env python3
"""XZ/LZMA2 fixtures for XzSpec from the INDEPENDENT python stdlib
(liblzma) compressor, with exact payload sidecars. Covers every check
type (none/CRC32/CRC64/SHA-256), presets 0 and 9e, an incompressible
random payload (uncompressed LZMA2 chunks), a multi-stream
concatenation, and a >64 KiB highly repetitive payload (long matches,
rep distances, all length coders).

Writes src/test/resources/xz_fixtures/<name>.xz plus <name>.raw.
"""
import hashlib
import lzma
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "xz_fixtures")
os.makedirs(OUT, exist_ok=True)


def lcg(seed):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield (s >> 33) & 0xFF


def main():
    phrase = (b"sphinx of black quartz judge my vow 0123456789 "
              b"how vexingly quick daft zebras jump ")
    g = lcg(7)
    rand32k = bytes(next(g) for _ in range(32768))
    rep = (phrase * 900)[:70000]  # long matches across length coders
    mixed = b"".join(bytes([b]) * n for b, n in
                     [(120, 1), (121, 200), (122, 3), (123, 500)]) + phrase

    cases = [
        ("text_crc64", phrase * 5, {"check": lzma.CHECK_CRC64, "preset": 6}),
        ("text_crc32", phrase * 5, {"check": lzma.CHECK_CRC32, "preset": 6}),
        ("text_sha256", phrase * 5, {"check": lzma.CHECK_SHA256, "preset": 6}),
        ("text_none", phrase * 5, {"check": lzma.CHECK_NONE, "preset": 6}),
        ("empty", b"", {"check": lzma.CHECK_CRC64, "preset": 6}),
        ("rand32k_p0", rand32k, {"check": lzma.CHECK_CRC64, "preset": 0}),
        ("rep70k_p9e", rep, {"check": lzma.CHECK_CRC64,
                             "preset": 9 | lzma.PRESET_EXTREME}),
        ("mixed_runs", mixed, {"check": lzma.CHECK_CRC32, "preset": 6}),
        # compressible + incompressible + compressible: liblzma emits
        # uncompressed chunks for the 200 KB random middle, then a
        # compressed chunk with reset mode 1 (state reset, props
        # REUSED) — chunk sequence C(3) U U C(1), the sequence that
        # regressed when props were dropped along with the state
        ("sandwich", phrase * 400 +
         bytes(next(g) for _ in range(200_000)) + phrase * 400,
         {"check": lzma.CHECK_CRC64, "preset": 6}),
    ]
    for name, raw, kw in cases:
        blob = lzma.compress(raw, format=lzma.FORMAT_XZ, **kw)
        with open(os.path.join(OUT, name + ".xz"), "wb") as f:
            f.write(blob)
        with open(os.path.join(OUT, name + ".raw"), "wb") as f:
            f.write(raw)
        print(f"{name}: {len(raw)} raw -> {len(blob)} xz, "
              f"md5 {hashlib.md5(raw).hexdigest()}")

    a = lzma.compress(b"stream one. ", format=lzma.FORMAT_XZ,
                      check=lzma.CHECK_CRC32)
    b2 = lzma.compress(b"stream two! ", format=lzma.FORMAT_XZ,
                       check=lzma.CHECK_CRC64)
    raw = b"stream one. " + b"stream two! "
    with open(os.path.join(OUT, "concat2.xz"), "wb") as f:
        f.write(a + b2)
    with open(os.path.join(OUT, "concat2.raw"), "wb") as f:
        f.write(raw)
    assert lzma.decompress(a + b2) == raw
    # 4-byte zero stream padding between streams is legal per the XZ
    # spec (python's one-shot decompress stops at it; liblzma's
    # multi-stream decoder and this repo's decoder read past it)
    with open(os.path.join(OUT, "concat_padded.xz"), "wb") as f:
        f.write(a + b"\x00" * 4 + b2)
    with open(os.path.join(OUT, "concat_padded.raw"), "wb") as f:
        f.write(raw)
    print(f"concat2(+padded): {len(raw)} raw, "
          f"md5 {hashlib.md5(raw).hexdigest()}")


if __name__ == "__main__":
    main()
