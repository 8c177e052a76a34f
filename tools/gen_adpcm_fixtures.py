#!/usr/bin/env python3
"""Independent IMA/DVI ADPCM (WAV format tag 0x11) fixtures for
ImaAdpcmSpec, written from the IMA ADPCM specification (the DVI4 /
"Recommended Practices for Enhancing Digital Audio Compatibility"
algorithm, also RFC 3551 §4.5.1) separately from the Scala decoder.

The codec is pure integer arithmetic with no rounding freedom, so the
expected decoded PCM sidecars are EXACT: any correct decoder must
reproduce them bit-for-bit.

Writes src/test/resources/adpcm_fixtures/<name>.wav plus
<name>.wav.pcm sidecars ("n\nv0 v1 ..." decoded 16-bit samples).
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "adpcm_fixtures")
os.makedirs(OUT, exist_ok=True)

STEP = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767]
INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]

assert len(STEP) == 89 and STEP[0] == 7 and STEP[-1] == 32767
assert all(b > a for a, b in zip(STEP, STEP[1:]))


def clamp16(v):
    return max(-32768, min(32767, v))


def decode_nibble(pred, idx, delta):
    step = STEP[idx]
    vpdiff = step >> 3
    if delta & 4:
        vpdiff += step
    if delta & 2:
        vpdiff += step >> 1
    if delta & 1:
        vpdiff += step >> 2
    pred = clamp16(pred - vpdiff if (delta & 8) else pred + vpdiff)
    idx = max(0, min(88, idx + INDEX[delta & 7]))
    return pred, idx


def encode_nibble(pred, idx, sample):
    step = STEP[idx]
    diff = sample - pred
    delta = 8 if diff < 0 else 0
    diff = abs(diff)
    if diff >= step:
        delta |= 4
        diff -= step
    if diff >= step >> 1:
        delta |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        delta |= 1
    pred, idx = decode_nibble(pred, idx, delta)
    return delta, pred, idx


def encode_blocks(samples, samples_per_block):
    """Mono IMA blocks: 4-byte header (pred int16, index u8, 0) +
    (samples_per_block-1)/2 data bytes, LOW nibble first."""
    n_data = samples_per_block - 1
    assert n_data % 2 == 0
    blocks = b""
    decoded = []
    idx = 0
    pred = 0
    i = 0
    while i < len(samples):
        chunk = samples[i:i + samples_per_block]
        if len(chunk) < samples_per_block:  # pad the tail block
            chunk = chunk + [chunk[-1]] * (samples_per_block - len(chunk))
        pred = clamp16(chunk[0])
        hdr = struct.pack("<hBB", pred, idx, 0)
        decoded.append(pred)
        nibs = []
        for s in chunk[1:]:
            d, pred, idx = encode_nibble(pred, idx, s)
            nibs.append(d)
            decoded.append(pred)
        data = bytes([(nibs[k + 1] << 4) | nibs[k]
                      for k in range(0, len(nibs), 2)])
        blocks += hdr + data
        i += samples_per_block
    return blocks, decoded


def wav(tag_blocks, samples_per_block, n_samples, rate=8000):
    block_align = 4 + (samples_per_block - 1) // 2
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, rate,
                      rate * block_align // samples_per_block, block_align,
                      4, 2, samples_per_block)
    fact = struct.pack("<I", n_samples)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"fact" + struct.pack("<I", len(fact)) + fact +
            b"data" + struct.pack("<I", len(tag_blocks)) + tag_blocks)
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
    # 1. ramp+fold waveform, one block of 33 samples
    write("ramp_1blk", [((k * 997) % 4001) - 2000 for k in range(33)], 33)
    # 2. step edges (worst case for the index adaptation), 3 blocks
    write("edges_3blk",
          [(-30000 if (k // 9) % 2 else 30000) for k in range(99)], 33)
    # 3. tail-padded multi-block (70 samples over 33-sample blocks)
    write("pad_tail", [((k * k * 31) % 60001) - 30000 for k in range(70)], 33)
    print("fixtures written to", OUT)


if __name__ == "__main__":
    main()
