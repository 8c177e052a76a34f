#!/usr/bin/env python3
"""Generate zstd fixtures with the INDEPENDENT system `zstd` CLI.

Payloads are deterministic constructions (no randomness), compressed at
levels that exercise every decoder path the engine must certify:

- level 1 and 19: FSE-coded sequences + Huffman literals (1- and
  4-stream, FSE-compressed and direct weights, repeat/treeless blocks)
- a > 128 KB payload: multi-block frames (treeless literals + Repeat
  sequence modes across blocks)
- --no-check vs -C: frames with and without the XXH64 content checksum
- high-entropy payload: raw-literals branch inside compressed blocks

Outputs: src/test/resources/zstd_fixtures/<name>.zst plus a manifest
(stdout) with (name, raw_len, raw_md5) for pinning in the oracle.
"""
import hashlib
import os
import subprocess
import sys

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "zstd_fixtures")
os.makedirs(OUT, exist_ok=True)

ZSTD = "zstd"


def payload_text(n_sent):
    """Repetitive English-ish text: matches + skewed literal histogram."""
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dogs", "while", "seventeen", "pipelines", "decode",
             "frames", "daily"]
    parts = []
    for i in range(n_sent):
        w = [words[(i * 7 + k * 3) % len(words)] for k in range(9)]
        parts.append("Sentence %05d: %s." % (i, " ".join(w)))
    return ("\n".join(parts) + "\n").encode("utf-8")


def payload_entropy(n):
    """xorshift-ish deterministic bytes — incompressible, forces raw
    literals inside compressed blocks (or whole raw blocks)."""
    x = 88172645463325252
    out = bytearray()
    while len(out) < n:
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        out += x.to_bytes(8, "little")
    return bytes(out[:n])


FIXTURES = [
    ("small_l1", payload_text(40), ["-1"]),
    ("small_l19", payload_text(40), ["-19"]),
    ("medium_l19_chk", payload_text(900), ["-19", "-C"]),
    ("medium_l3_nochk", payload_text(900), ["-3", "--no-check"]),
    ("large_l19_chk", payload_text(4200), ["-19", "-C"]),  # > 128 KB raw
    ("entropy_l19", payload_entropy(5000), ["-19", "-C"]),
    ("tiny_l19", payload_text(2), ["-19"]),
    ("empty_l3", b"", ["-3", "-C"]),
]


def main():
    rows = []
    for name, raw, flags in FIXTURES:
        src = os.path.join(OUT, name + ".bin")
        dst = os.path.join(OUT, name + ".zst")
        with open(src, "wb") as f:
            f.write(raw)
        if os.path.exists(dst):
            os.remove(dst)
        subprocess.run([ZSTD, "-q"] + flags + ["-o", dst, src], check=True)
        os.remove(src)
        with open(dst, "rb") as f:
            comp = f.read()
        rows.append((name, len(raw), hashlib.md5(raw).hexdigest(),
                     len(comp)))
    print("name,raw_len,raw_md5,comp_len")
    for r in rows:
        print("%s,%d,%s,%d" % r)
    # scala hex fragments for embedding
    for name, _, _, _ in rows:
        with open(os.path.join(OUT, name + ".zst"), "rb") as f:
            h = f.read().hex().upper()
        chunks = [h[i:i + 100] for i in range(0, len(h), 100)]
        print("\n  private val zstd_%s =" % name)
        print("    \"%s\"" % chunks[0] if chunks else '    ""')
        for c in chunks[1:]:
            print("      + \"%s\"" % c)


if __name__ == "__main__":
    sys.exit(main())
