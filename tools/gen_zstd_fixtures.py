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


def craft_seq32k():
    """Hand-craft a frame whose single compressed block carries 0x8000
    sequences — the long sequence-count header (byte0==255, count =
    byte1 + byte2<<8 + 0x7F00) where an OR instead of ADD loses the
    carry. RLE tables (LL sym 0, OF sym 2, ML sym 0): every sequence is
    0 literals + a 3-byte match at offset (1<<2)+0b11-3 = 4, so the
    bitstream is exactly 2 one-bits per sequence. A 4-byte raw block
    seeds the match history. Validated against the system zstd CLI at
    generation time."""
    numseq = 0x8000
    content = 4 + 3 * numseq
    frame = bytearray()
    frame += bytes.fromhex("28B52FFD")
    frame.append(0xA0)                      # single-segment, 4-byte FCS
    frame += content.to_bytes(4, "little")
    frame += ((4 << 3) | 0).to_bytes(3, "little")  # raw block, not last
    frame += b"ABCD"
    blk = bytearray()
    blk.append(0x00)                        # literals: raw, size 0
    blk += bytes([0xFF, 0x00, 0x01])        # numSeq = 0x100 + 0x7F00
    blk.append((1 << 6) | (1 << 4) | (1 << 2))  # LL/OF/ML all RLE
    blk += bytes([0, 2, 0])                 # RLE symbols
    blk += b"\xFF" * 8192                   # 2 bits x 32768 sequences
    blk.append(0x01)                        # sentinel, 0 payload bits
    frame += ((len(blk) << 3) | (2 << 1) | 1).to_bytes(3, "little")
    frame += blk
    out = bytearray(b"ABCD")
    for _ in range(numseq):
        for _k in range(3):
            out.append(out[-4])
    return bytes(frame), bytes(out)


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
    frame, raw = craft_seq32k()
    dec = subprocess.run([ZSTD, "-d", "-c"], input=frame,
                         capture_output=True, check=True).stdout
    assert dec == raw, "crafted seq32k frame disagrees with system zstd"
    with open(os.path.join(OUT, "seq32k.zst"), "wb") as f:
        f.write(frame)
    rows.append(("seq32k", len(raw), hashlib.md5(raw).hexdigest(),
                 len(frame)))
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
