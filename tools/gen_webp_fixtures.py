#!/usr/bin/env python3
"""Independent VP8L (lossless WebP) encoder for fixtures — written here
from the public "WebP Lossless Bitstream Specification", separately from
the Scala decoder: LSB-first bit writing, simple and code-length-coded
canonical prefix codes (incl. 17/18 zero-run tokens), literals, LZ77
backward references (plain AND 2D neighborhood distance codes), the
color cache, and the subtract-green / predictor / color-indexing
transforms (bundled and plain).

Writes src/test/resources/webp_fixtures/<name>.webp plus a
`<name>.webp.grays` sidecar with the expected luma raster
((299r+587g+114b)/1000 per pixel, row-major) for WebpPixelSpec.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "webp_fixtures")
os.makedirs(OUT, exist_ok=True)

CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class Bw:
    def __init__(self):
        self.bits = []

    def w(self, v, n):  # LSB-first
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def wmsb(self, v, n):  # prefix codes: first bit = MSB
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, b in enumerate(self.bits[i:i + 8]):
                byte |= b << j
            out.append(byte)
        return bytes(out)


def canonical(lengths):
    """symbol -> (code, len) per DEFLATE canonical assignment."""
    maxlen = max(lengths.values())
    codes = {}
    code = 0
    for ln in range(1, maxlen + 1):
        for sym in sorted(s for s, l in lengths.items() if l == ln):
            codes[sym] = (code, ln)
            code += 1
        code <<= 1
    return codes


def kraft_lengths(symbols):
    """Assign a COMPLETE set of code lengths to `symbols` (sorted)."""
    k = len(symbols)
    if k == 1:
        return {symbols[0]: 1}  # written via simple code instead normally
    # balanced: some at ceil(log2 k), rest one shorter, completing Kraft
    import math
    L = math.ceil(math.log2(k))
    n_long = 2 * k - (1 << L)  # count at depth L; rest at L-1
    lens = {}
    for i, s in enumerate(sorted(symbols)):
        lens[s] = L if i < n_long else L - 1
    assert sum(2 ** -l for l in lens.values()) == 1.0
    return lens


def write_simple(bw, syms):
    """Simple code: 1 or 2 symbols (first may be 8-bit)."""
    bw.w(1, 1)
    bw.w(len(syms) - 1, 1)
    bw.w(1, 1)  # first symbol as 8 bits
    bw.w(syms[0], 8)
    if len(syms) == 2:
        bw.w(syms[1], 8)
    if len(syms) == 1:
        return {syms[0]: (0, 0)}
    return {syms[0]: (0, 1), syms[1]: (1, 1)}


def write_full(bw, lengths, alphabet_size):
    """Code-length-coded form; returns symbol->(code,len)."""
    bw.w(0, 1)
    seq = [lengths.get(s, 0) for s in range(alphabet_size)]
    # tokenize: zeros via 17/18, nonzero literal
    tokens = []  # (cl_symbol, extra_value, extra_bits)
    i = 0
    while i < len(seq):
        if seq[i] == 0:
            j = i
            while j < len(seq) and seq[j] == 0:
                j += 1
            run = j - i
            while run > 0:
                if run >= 11:
                    r = min(run, 138)
                    tokens.append((18, r - 11, 7))
                    run -= r
                elif run >= 3:
                    tokens.append((17, run - 3, 3))
                    run = 0
                else:
                    for _ in range(run):
                        tokens.append((seq[i], None, 0))  # literal zero
                    run = 0
            i = j
        else:
            tokens.append((seq[i], None, 0))
            i += 1
    cl_syms = sorted(set(t[0] for t in tokens))
    if len(cl_syms) == 1:
        cl_lens = {cl_syms[0]: 1}
    else:
        cl_lens = kraft_lengths(cl_syms)
    assert all(l <= 7 for l in cl_lens.values())
    num_cl = max(CL_ORDER.index(s) for s in cl_lens) + 1
    num_cl = max(num_cl, 4)
    bw.w(num_cl - 4, 4)
    for i2 in range(num_cl):
        bw.w(cl_lens.get(CL_ORDER[i2], 0), 3)
    cl_codes = canonical(cl_lens) if len(cl_syms) > 1 else {cl_syms[0]: (0, 0)}
    bw.w(0, 1)  # no max-symbol cap
    for sym, extra, ebits in tokens:
        c, ln = cl_codes[sym]
        bw.wmsb(c, ln)
        if ebits:
            bw.w(extra, ebits)
    return canonical({s: l for s, l in lengths.items() if l > 0})


def prefix_encode(v):
    """value -> (code, extra_value, extra_bits); inverse of the spec's
    prefix decoding for length/distance values."""
    assert v >= 1
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    hi = x.bit_length() - 1
    extra = hi - 1
    base2 = (2 + ((x >> extra) & 1)) << extra
    code = 2 * hi + ((x >> extra) & 1)
    return code, x - base2, extra


def dist_map():
    cands = [(dx, 0) for dx in range(1, 9)] + \
        [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return cands[:120]


DIST_MAP = dist_map()


def luma(a, r, g, b):
    return (299 * r + 587 * g + 114 * b) // 1000


class Stream:
    """One spatially-coded image stream (no meta image, optional cache);
    level0 (main) streams must still write the meta-image-present bit."""

    def __init__(self, bw, cache_bits=0, level0=True):
        self.bw = bw
        self.cache_bits = cache_bits
        if cache_bits:
            bw.w(1, 1)
            bw.w(cache_bits, 4)
            self.cache = [0] * (1 << cache_bits)
        else:
            bw.w(0, 1)
            self.cache = None
        if level0:
            bw.w(0, 1)  # no meta-prefix image

    def trees(self, g_lens=None, g_simple=None, r=None, b=None, a=None,
              d=None, cache_extra=0):
        """Write the 5 codes. g via full lengths or simple list; r/b/a/d
        via simple symbol lists (or full dicts)."""
        bw = self.bw
        gsize = 256 + 24 + (1 << self.cache_bits if self.cache_bits else 0)
        if g_simple is not None:
            self.gc = write_simple(bw, g_simple)
        else:
            self.gc = write_full(bw, g_lens, gsize)
        self.rc = write_simple(bw, r) if isinstance(r, list) else write_full(bw, r, 256)
        self.bc = write_simple(bw, b) if isinstance(b, list) else write_full(bw, b, 256)
        self.ac = write_simple(bw, a) if isinstance(a, list) else write_full(bw, a, 256)
        self.dc = write_simple(bw, d) if isinstance(d, list) else write_full(bw, d, 40)

    def _emit(self, codes, sym):
        c, ln = codes[sym]
        self.bw.wmsb(c, ln)

    def cache_key(self, px):
        a, r, g, b = px
        v = (a << 24) | (r << 16) | (g << 8) | b
        return ((0x1e35a7bd * v) & 0xFFFFFFFF) >> (32 - self.cache_bits)

    def insert(self, px):
        if self.cache is not None:
            self.cache[self.cache_key(px)] = px

    def literal(self, px):
        a, r, g, b = px
        self._emit(self.gc, g)
        self._emit(self.rc, r)
        self._emit(self.bc, b)
        self._emit(self.ac, a)
        self.insert(px)

    def cache_hit(self, px):
        idx = self.cache_key(px)
        assert self.cache[idx] == px
        self._emit(self.gc, 256 + 24 + idx)

    def backref(self, length, dist_code_value, copied):
        lc, lext, lbits = prefix_encode(length)
        self._emit(self.gc, 256 + lc)
        if lbits:
            self.bw.w(lext, lbits)
        dc, dext, dbits = prefix_encode(dist_code_value)
        self._emit(self.dc, dc)
        if dbits:
            self.bw.w(dext, dbits)
        for px in copied:
            self.insert(px)


def riff(vp8l_payload):
    chunk = b"VP8L" + len(vp8l_payload).to_bytes(4, "little") + vp8l_payload
    if len(vp8l_payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def header(bw, w, h):
    bw.w(0x2F, 8)
    bw.w(w - 1, 14)
    bw.w(h - 1, 14)
    bw.w(0, 1)  # alpha hint
    bw.w(0, 3)  # version


FLAT8 = {s: 8 for s in range(256)}


def fixture(name, blob, grays):
    with open(os.path.join(OUT, name + ".webp"), "wb") as f:
        f.write(blob)
    with open(os.path.join(OUT, name + ".webp.grays"), "w") as f:
        f.write(",".join(str(g) for g in grays))
    print(name, len(blob), "px", len(grays))


W, H = 16, 12


def mosaic_px(x, y):
    v = (37 * x + 59 * y + 23) % 256
    return (255, v, v, v)


# 1. literals with flat 8-bit trees (the single-symbol CL-tree shape)
bw = Bw()
header(bw, W, H)
bw.w(0, 1)  # no transforms
st = Stream(bw)
st.trees(g_lens=FLAT8, r=FLAT8, b=FLAT8, a=[255], d=[0])
grays = []
for y in range(H):
    for x in range(W):
        px = mosaic_px(x, y)
        st.literal(px)
        grays.append(luma(*px))
fixture("literals", riff(bw.bytes()), grays)

# 2. subtract-green: r=b=g so residual r/b are constant 0
bw = Bw()
header(bw, W, H)
bw.w(1, 1); bw.w(2, 2)  # transform: subtract green
bw.w(0, 1)  # no more transforms
st = Stream(bw)
st.trees(g_lens=FLAT8, r=[0], b=[0], a=[255], d=[0])
grays = []
for y in range(H):
    for x in range(W):
        a, r, g, b = mosaic_px(x, y)
        st.literal((a, (r - g) % 256, g, (b - g) % 256))
        grays.append(luma(a, r, g, b))
fixture("subgreen", riff(bw.bytes()), grays)

# 3. 4-color palette, bundled 4 pixels/byte (widthBits=2)
bw = Bw()
header(bw, W, H)
bw.w(1, 1); bw.w(3, 2)  # color indexing
pal = [10, 70, 130, 200]
bw.w(len(pal) - 1, 8)
# palette image: size x 1, delta-coded, via its own stream
pst = Stream(bw, level0=False)
pst.trees(g_lens=FLAT8, r=FLAT8, b=FLAT8, a=FLAT8, d=[0])
prev = (0, 0, 0, 0)
for v in pal:
    cur = (255, v, v, v)
    pst.literal(tuple((c - p) % 256 for c, p in zip(cur, prev)))
    prev = cur
bw.w(0, 1)  # no more transforms
packed_w = (W + 3) // 4
st = Stream(bw)
st.trees(g_lens=FLAT8, r=[0], b=[0], a=[0], d=[0])
grays = []
for y in range(H):
    for x in range(W):
        grays.append(luma(255, *( [pal[(x + y) % 4]] * 3 )))
for y in range(H):
    for xb in range(packed_w):
        packed = 0
        for k in range(4):
            x = xb * 4 + k
            if x < W:
                packed |= ((x + y) % 4) << (2 * k)
        st.literal((0, 0, packed, 0))
fixture("palette4", riff(bw.bytes()), grays)

# 4. 20-color palette, no bundling
bw = Bw()
header(bw, W, H)
bw.w(1, 1); bw.w(3, 2)
pal = [5 + 12 * k for k in range(20)]
bw.w(len(pal) - 1, 8)
pst = Stream(bw, level0=False)
pst.trees(g_lens=FLAT8, r=FLAT8, b=FLAT8, a=FLAT8, d=[0])
prev = (0, 0, 0, 0)
for v in pal:
    cur = (255, v, v, v)
    pst.literal(tuple((c - p) % 256 for c, p in zip(cur, prev)))
    prev = cur
bw.w(0, 1)
st = Stream(bw)
st.trees(g_lens=FLAT8, r=[0], b=[0], a=[0], d=[0])
grays = []
for y in range(H):
    for x in range(W):
        idx = (3 * x + y) % 20
        grays.append(luma(255, pal[idx], pal[idx], pal[idx]))
        st.literal((0, 0, (3 * x + y) % 20, 0))
fixture("palette20", riff(bw.bytes()), grays)

# 5. LZ77: first row literals, every later row one backref to the row
#    above — even rows via the PLAIN distance code (W+120), odd rows via
#    the 2D neighborhood code for (dx=0, dy=1)
bw = Bw()
header(bw, W, H)
bw.w(0, 1)
# green needs literals + the length code for W=16: code for 16 ->
lc16 = prefix_encode(W)[0]
g_lens = dict(FLAT8)
g_lens[256 + lc16] = 8  # incomplete now: 257 symbols at 8 -> fix: drop one
# make room: give symbol 255 length 9 and 256+lc16 length 9 (Kraft: 255*2^-8+2*2^-9=1)
del g_lens[255]
g_lens[255] = 9
g_lens[256 + lc16] = 9
assert abs(sum(2 ** -l for l in g_lens.values()) - 1.0) < 1e-12
dcode_plain = prefix_encode(W + 120)[0]
d2d_value = DIST_MAP.index((0, 1)) + 1  # 2D code for "the pixel above"
dcode_2d = prefix_encode(d2d_value)[0]
st = Stream(bw)
st.trees(g_lens=g_lens, r=FLAT8, b=FLAT8, a=[255],
         d={dcode_plain: 1, dcode_2d: 1})
grays = []
row0 = [mosaic_px(x, 0) for x in range(W)]
for px in row0:
    st.literal(px)
for y in range(1, H):
    dist_value = W + 120 if y % 2 == 0 else d2d_value
    st.backref(W, dist_value, [mosaic_px(x, 0) for x in range(W)])
for y in range(H):
    for x in range(W):
        grays.append(luma(*mosaic_px(x, 0)))
fixture("lz77", riff(bw.bytes()), grays)

# 6. color cache: alternating pixels; second occurrences via cache hits
bw = Bw()
header(bw, W, H)
bw.w(0, 1)
cache_bits = 6
stA = (255, 40, 40, 40)
stB = (255, 210, 210, 210)
st = Stream(bw, cache_bits=cache_bits)
g_lens2 = {40: 2, 210: 2}
kA = st.cache_key(stA)
kB = st.cache_key(stB)
assert kA != kB
g_lens2[256 + 24 + kA] = 2
g_lens2[256 + 24 + kB] = 2
st.trees(g_lens=g_lens2, r=[40, 210], b=[40, 210], a=[255], d=[0])
grays = []
seen = set()
for y in range(H):
    for x in range(W):
        px = stA if (x + y) % 2 == 0 else stB
        key = px[1]
        if key not in seen:
            st.literal(px)
            seen.add(key)
        else:
            st.cache_hit(px)
        grays.append(luma(*px))
fixture("cache", riff(bw.bytes()), grays)

# 7. predictor transform, uniform mode 2 (top): residuals are row deltas
bw = Bw()
header(bw, W, H)
bw.w(1, 1); bw.w(0, 2)  # predictor
size_bits = 4
bw.w(size_bits - 2, 3)
mw = (W + (1 << size_bits) - 1) >> size_bits
mh = (H + (1 << size_bits) - 1) >> size_bits
pst = Stream(bw, level0=False)
pst.trees(g_simple=[2], r=[0], b=[0], a=[0], d=[0])  # green=mode 2
for _ in range(mw * mh):
    pst.literal((0, 0, 2, 0))
bw.w(0, 1)  # no more transforms
st = Stream(bw)
st.trees(g_lens=FLAT8, r=FLAT8, b=FLAT8, a=FLAT8, d=[0])
grays = []
img = [[mosaic_px(x, y) for x in range(W)] for y in range(H)]
for y in range(H):
    for x in range(W):
        cur = img[y][x]
        if x == 0 and y == 0:
            pred = (255, 0, 0, 0)
        elif y == 0:
            pred = img[0][x - 1]
        elif x == 0:
            pred = img[y - 1][0]
        else:
            pred = img[y - 1][x]  # mode 2 = top
        st.literal(tuple((c - p) % 256 for c, p in zip(cur, pred)))
        grays.append(luma(*cur))
fixture("pred_top", riff(bw.bytes()), grays)
