#!/usr/bin/env python3
"""Independent MPEG-audio frame-sequence fixtures (ISO 11172-3 framing
tables written here from the published spec, separately from the Scala
parser AND the Scala query construction): VBR bitrate changes, padding
bits, ID3v2 with footer, each version/layer family.

Writes src/test/resources/mp3_fixtures/*.mp3 and prints the expected
metadata rows for pinning in MpegMetaSpec.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "mp3_fixtures")
os.makedirs(OUT, exist_ok=True)

BR = {
    ("1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
SR = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000],
      "2.5": [11025, 12000, 8000]}
VERBITS = {"1": 3, "2": 2, "2.5": 0}


def frame(ver, layer, br_idx, sr_idx, pad, mode=0):
    vkey = "2" if ver == "2.5" else ver
    kbps = BR[(vkey, layer)][br_idx]
    sr = SR[ver][sr_idx]
    if layer == 1:
        size = (12 * kbps * 1000 // sr + pad) * 4
        samples = 384
    else:
        coef = 144 if (ver == "1" or layer == 2) else 72
        if ver != "1" and layer == 3:
            coef = 72
        size = coef * kbps * 1000 // sr + pad
        samples = 1152 if (ver == "1" or layer == 2) else 576
    layer_bits = 4 - layer
    b0 = 0xFF
    b1 = 0xE0 | (VERBITS[ver] << 3) | (layer_bits << 1) | 1
    b2 = (br_idx << 4) | (sr_idx << 2) | (pad << 1)
    b3 = mode << 6
    body = bytes([b0, b1, b2, b3]) + bytes(size - 4)
    return body, samples, sr, kbps


def id3v2(size, footer=False):
    flags = 0x10 if footer else 0
    ss = [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F,
          size & 0x7F]
    h = b"ID3" + bytes([4, 0, flags]) + bytes(ss) + bytes(size)
    if footer:
        h += b"3DI" + bytes([4, 0, flags]) + bytes(ss)
    return h


FIX = []

# VBR MPEG1 L3 44100, padding alternating, 6 frames of varying bitrate
frames = []
tot = 0
for i, (bi, pad) in enumerate([(9, 0), (11, 1), (5, 0), (14, 1), (9, 0), (7, 0)]):
    f, smp, sr, kbps = frame("1", 3, bi, 0, pad)
    frames.append(f)
    tot += smp
FIX.append(("vbr_v1l3", b"".join(frames), dict(
    version="1", layer=3, sample_rate=44100, bitrate_kbps=128, channels=2,
    n_frames=6, duration_ms=tot * 1000 // 44100)))

# ID3v2-with-footer + MPEG2.5 L3 mono + ID3v1 tag
frames = []
tot = 0
for i in range(4):
    f, smp, sr, kbps = frame("2.5", 3, 6, 1, i % 2, mode=3)
    frames.append(f)
    tot += smp
blob = id3v2(40, footer=True) + b"".join(frames) + b"TAG" + bytes(125)
FIX.append(("id3_v25l3", blob, dict(
    version="2.5", layer=3, sample_rate=12000, bitrate_kbps=48, channels=1,
    n_frames=4, duration_ms=tot * 1000 // 12000)))

# MPEG2 Layer 2 stereo, constant
frames = []
tot = 0
for i in range(5):
    f, smp, sr, kbps = frame("2", 2, 10, 0, 0, mode=1)
    frames.append(f)
    tot += smp
FIX.append(("cbr_v2l2", b"".join(frames), dict(
    version="2", layer=2, sample_rate=22050, bitrate_kbps=96, channels=2,
    n_frames=5, duration_ms=tot * 1000 // 22050)))

# MPEG1 Layer 1 with padding
frames = []
tot = 0
for i in range(3):
    f, smp, sr, kbps = frame("1", 1, 3, 2, 1, mode=0)
    frames.append(f)
    tot += smp
FIX.append(("pad_v1l1", b"".join(frames), dict(
    version="1", layer=1, sample_rate=32000, bitrate_kbps=96, channels=2,
    n_frames=3, duration_ms=tot * 1000 // 32000)))


def main():
    for name, blob, exp in FIX:
        with open(os.path.join(OUT, name + ".mp3"), "wb") as f:
            f.write(blob)
        print(name, len(blob), exp)


if __name__ == "__main__":
    main()
