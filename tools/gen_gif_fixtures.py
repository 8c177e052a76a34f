#!/usr/bin/env python3
"""Generate GIF fixtures for GifPixelSpec, independently of the Scala
decoder under test: a from-spec LZW compressor (LSB-first variable-width
codes, clear/end, 12-bit table saturation) plus GIF87a/89a container
emission — global and local color tables, interlaced frames, extension
blocks the decoder must skip.

Palettes are r=g=b=v so the decoded luma equals the palette VALUE
exactly (no rounding freedom under the (299r+587g+114b)/1000 weights),
making the sidecar rasters exact for every fixture.

Fixture set:
  gif_blocks     32x24, 8x8-constant mosaic v=(37bx+59by+23)%256, 256-color
                 grayscale global table (EXACT; the mm_image_gif oracle)
  gif_interlace  24x16 gradient, interlaced, with a GCE extension block
  gif_local      16x8 with a LOCAL color table overriding the global one
  gif_kwkwk      8x2 run 'aaaaaaaa...' forcing the KwKwK LZW case
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "gif_fixtures")


class LzwWriter:
    def __init__(self, min_code):
        self.min_code = min_code
        self.bits = []          # LSB-first stream
        self.reset()

    def reset(self):
        self.code_size = self.min_code + 1
        self.next = (1 << self.min_code) + 2

    def put(self, code):
        for i in range(self.code_size):
            self.bits.append((code >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def lzw_compress(indices, min_code):
    clear = 1 << min_code
    end = clear + 1
    w = LzwWriter(min_code)
    table = {}
    w.put(clear)
    prev = (indices[0],)
    for k in indices[1:]:
        cur = prev + (k,)
        if cur in table:
            prev = cur
            continue
        code = table[prev] if len(prev) > 1 else prev[0]
        w.put(code)
        if w.next < 4096:
            table[cur] = w.next
            w.next += 1
            # the decoder grows when ITS next hits 1<<codeSize, one entry
            # behind the encoder — so the encoder grows at (1<<cs)+1
            if w.next == (1 << w.code_size) + 1 and w.code_size < 12:
                w.code_size += 1
        prev = (k,)
    w.put(table[prev] if len(prev) > 1 else prev[0])
    w.put(end)
    return w.bytes()


def sub_blocks(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gray_palette(n):
    # r=g=b=v: luma == v exactly for the first n values, padded to size
    return b"".join(bytes([v, v, v]) for v in range(n))


def encode(path, w, h, pixels, pal_bits=8, interlaced=False,
           local_table=False, gce=False):
    """pixels: row-major palette indices (values < 2^pal_bits)."""
    n = 1 << pal_bits
    buf = bytearray(b"GIF89a")
    packed_global = 0 if local_table else (0x80 | (pal_bits - 1))
    buf += struct.pack("<HHBBB", w, h, packed_global, 0, 0)
    if not local_table:
        buf += gray_palette(n)
    if gce:  # graphic control extension the decoder must skip
        buf += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    rows = list(range(h))
    if interlaced:
        rows = ([y for y in range(0, h, 8)] + [y for y in range(4, h, 8)] +
                [y for y in range(2, h, 4)] + [y for y in range(1, h, 2)])
    stream = []
    for y in rows:
        stream.extend(pixels[y * w:(y + 1) * w])
    packed_img = (0x40 if interlaced else 0) | \
        ((0x80 | (pal_bits - 1)) if local_table else 0)
    buf += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, packed_img)
    if local_table:
        buf += gray_palette(n)
    min_code = max(2, pal_bits)
    buf += bytes([min_code])
    buf += sub_blocks(lzw_compress(stream, min_code))
    buf += b"\x3b"
    with open(path, "wb") as f:
        f.write(buf)


def write_expected(path, w, h, raster):
    with open(path, "w") as f:
        f.write(f"{w} {h}\n")
        f.write(" ".join(str(v) for v in raster) + "\n")


def main():
    os.makedirs(OUT, exist_ok=True)

    w, h = 32, 24
    blocks = [(37 * (x // 8) + 59 * (y // 8) + 23) % 256
              for y in range(h) for x in range(w)]
    encode(os.path.join(OUT, "gif_blocks.gif"), w, h, blocks)
    write_expected(os.path.join(OUT, "gif_blocks.gif.grays"), w, h, blocks)

    w, h = 24, 16
    grad = [(x * 9 + y * 5 + ((x * y) % 7) * 11) % 256
            for y in range(h) for x in range(w)]
    encode(os.path.join(OUT, "gif_interlace.gif"), w, h, grad,
           interlaced=True, gce=True)
    write_expected(os.path.join(OUT, "gif_interlace.gif.grays"), w, h, grad)

    w, h = 16, 8
    loc = [(x * 12 + y * 7) % 256 for y in range(h) for x in range(w)]
    encode(os.path.join(OUT, "gif_local.gif"), w, h, loc, local_table=True)
    write_expected(os.path.join(OUT, "gif_local.gif.grays"), w, h, loc)

    w, h = 8, 2
    runs = [5] * 10 + [7] * 6  # long runs force the KwKwK code path
    encode(os.path.join(OUT, "gif_kwkwk.gif"), w, h, runs)
    write_expected(os.path.join(OUT, "gif_kwkwk.gif.grays"), w, h, runs)

    with open(os.path.join(OUT, "gif_blocks.gif"), "rb") as f:
        hexs = f.read().hex().upper()
    chunks = [hexs[i:i + 100] for i in range(0, len(hexs), 100)]
    print("  private val gifBlocksHex =")
    print("    " + " +\n      ".join('"%s"' % c for c in chunks))


if __name__ == "__main__":
    main()
