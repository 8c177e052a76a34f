#!/usr/bin/env python3
"""Pin exact gzip-member sizes for the text_compression_ratio fixtures
using python zlib — an INDEPENDENT implementation of DEFLATE from the
engine's JDK Deflater, at the same default level (both emit identical
streams for these inputs; the oracle join makes any divergence a loud
gate failure rather than an assumption).

The fixture texts here must stay byte-identical to
`WebQueries.compressionFixtures`; rerun after any edit and update
`compressionPinnedSql`.
"""
import zlib


def gz_size(b):
    co = zlib.compressobj(level=-1, wbits=-15)  # raw deflate, default level
    return len(co.compress(b) + co.flush()) + 18  # +10 header, +8 trailer


ALPHA = ("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
         " .,;:!?()[]{}<>+-*/=%&#@^_|~")


def noise():
    s = 12345
    out = []
    for _ in range(600):
        s = (s * 1103515245 + 12345) % (1 << 31)
        out.append(ALPHA[s % len(ALPHA)])
    return "".join(out)


FIXTURES = [
    (-6, "the same line over and over " * 40),
    (-5, ("the quick brown fox jumps over a lazy dog while mixed words "
          "vary across this sentence and keep entropy moderate ") * 6),
    (-4, noise()),
    (-3, "tiny"),
    (-2, ""),
    (-1, "naïve café über straße — 文字化けテスト " * 3),
]


def main():
    rows = []
    for i, t in FIXTURES:
        b = t.encode("utf-8")
        rows.append("(%d, %d, %d)" % (i, len(b), gz_size(b)))
    print(", ".join(rows))


if __name__ == "__main__":
    main()
