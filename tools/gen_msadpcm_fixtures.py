#!/usr/bin/env python3
"""Independent Microsoft ADPCM (WAV format tag 0x0002) fixtures for
MsAdpcmSpec, written from the RIFF "New Multimedia Data Types and Data
Techniques" WAVE spec separately from the Scala decoder.

Closed-loop encoder: per block it tries all 7 standard predictor pairs,
quantizes the prediction error against the adapting delta, and keeps
the predictor with the lowest total squared error. All divisions
truncate toward zero as in the spec's C pseudo-code. The codec has no
rounding freedom, so the expected decoded PCM sidecars are EXACT.

Writes src/test/resources/msadpcm_fixtures/<name>.wav plus
<name>.wav.pcm sidecars ("n\nv0 v1 ..." decoded 16-bit samples).
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "msadpcm_fixtures")
os.makedirs(OUT, exist_ok=True)

COEF = [(256, 0), (512, -256), (0, 0), (192, 64),
        (240, 0), (460, -208), (392, -232)]
ADAPT = [230, 230, 230, 230, 307, 409, 512, 614, 768,
         614, 512, 409, 307, 230, 230, 230]


def trunc_div(a, b):
    """C-style integer division: truncate toward zero."""
    q = abs(a) // b
    return -q if a < 0 else q


def clamp16(v):
    return max(-32768, min(32767, v))


def decode_block(pred_idx, delta, s1, s2, nibbles):
    """Reference decode of one mono block -> list of samples."""
    c1, c2 = COEF[pred_idx]
    out = [s2, s1]
    for nib in nibbles:
        snib = nib - 16 if nib >= 8 else nib
        pred = clamp16(trunc_div(s1 * c1 + s2 * c2, 256) + snib * delta)
        delta = max(16, trunc_div(ADAPT[nib] * delta, 256))
        s2, s1 = s1, pred
        out.append(pred)
    return out


def encode_block(samples, pred_idx, delta0):
    """Closed-loop nibble quantization for one block with a fixed
    predictor; returns (nibbles, decoded, sq_err)."""
    c1, c2 = COEF[pred_idx]
    s2, s1 = samples[0], samples[1]
    delta = delta0
    nibbles = []
    decoded = [s2, s1]
    err = 0
    for want in samples[2:]:
        base = trunc_div(s1 * c1 + s2 * c2, 256)
        snib = max(-8, min(7, trunc_div(want - base, delta)))
        nib = snib + 16 if snib < 0 else snib
        got = clamp16(base + snib * delta)
        delta = max(16, trunc_div(ADAPT[nib] * delta, 256))
        s2, s1 = s1, got
        nibbles.append(nib)
        decoded.append(got)
        err += (want - got) ** 2
    return nibbles, decoded, err


def encode_blocks(samples, spb):
    """Mono MS blocks: 7-byte header (pred u8, delta i16, s1 i16,
    s2 i16) + nibble bytes HIGH nibble first."""
    assert spb >= 4 and spb % 2 == 0
    blocks = b""
    decoded = []
    i = 0
    while i < len(samples):
        chunk = samples[i:i + spb]
        if len(chunk) < spb:  # pad the tail block
            chunk = chunk + [chunk[-1]] * (spb - len(chunk))
        delta0 = max(16, (max(chunk) - min(chunk)) // 8 or 16)
        best = None
        for pi in range(len(COEF)):
            nibs, dec, err = encode_block(chunk, pi, delta0)
            if best is None or err < best[3]:
                best = (pi, nibs, dec, err)
        pi, nibs, dec, _ = best
        hdr = struct.pack("<Bhhh", pi, delta0, chunk[1], chunk[0])
        data = bytes([(nibs[k] << 4) | nibs[k + 1]
                      for k in range(0, len(nibs), 2)])
        blocks += hdr + data
        decoded.extend(dec)
        i += spb
    return blocks, decoded


def wav(blocks, spb, n_samples, rate=8000):
    block_align = 7 + (spb - 2) // 2
    ext = struct.pack("<HH", spb, len(COEF))
    for c1, c2 in COEF:
        ext += struct.pack("<hh", c1, c2)
    fmt = struct.pack("<HHIIHHH", 0x02, 1, rate,
                      rate * block_align // spb, block_align, 4,
                      len(ext)) + ext
    fact = struct.pack("<I", n_samples)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"fact" + struct.pack("<I", len(fact)) + fact +
            b"data" + struct.pack("<I", len(blocks)) + blocks)
    if len(blocks) % 2:
        body += b"\x00"  # RIFF pad byte after an odd-sized chunk
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def write(name, samples, spb):
    blocks, decoded = encode_blocks(samples, spb)
    w = wav(blocks, spb, len(decoded))
    with open(os.path.join(OUT, name + ".wav"), "wb") as f:
        f.write(w)
    with open(os.path.join(OUT, name + ".wav.pcm"), "w") as f:
        f.write(f"{len(decoded)}\n")
        f.write(" ".join(str(v) for v in decoded))
    print(name, len(w), "bytes,", len(decoded), "samples")


def main():
    # 1. ramp+fold waveform, one 34-sample block (all 7 predictors race)
    write("ramp_1blk", [((k * 997) % 4001) - 2000 for k in range(34)], 34)
    # 2. step edges (worst case for the delta adaptation), 3 blocks
    write("edges_3blk",
          [(-30000 if (k // 9) % 2 else 30000) for k in range(102)], 34)
    # 3. tail-padded multi-block (71 samples over 34-sample blocks)
    write("pad_tail", [((k * k * 31) % 60001) - 30000 for k in range(71)], 34)
    # 4. smooth triangle wave where the 2-tap linear predictors shine
    write("smooth_2blk",
          [(-10000 + 600 * k) if k < 34 else (10400 - 600 * (k - 34))
           for k in range(68)], 34)
    print("fixtures written to", OUT)


if __name__ == "__main__":
    main()
