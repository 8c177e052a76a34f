#!/usr/bin/env python3
"""Independent Ogg fixture generator for OggMetaSpec.

Builds Ogg streams (RFC 3533 framing; Vorbis I / Opus RFC 7845 id
headers) with its OWN CRC table and page packer — no code shared with
the Scala decoder — so a bit-level disagreement between the two
implementations shows up as a spec failure.

Usage: python3 tools/gen_ogg_fixtures.py src/test/resources/ogg_fixtures
"""
import os
import struct
import sys

# CRC-32/OGG: poly 0x04c11db7, MSB-first, init 0, no xorout (RFC 3533 §6)
_TABLE = []
for i in range(256):
    r = i << 24
    for _ in range(8):
        r = ((r << 1) ^ 0x04C11DB7 if (r & 0x80000000) else (r << 1)) & 0xFFFFFFFF
    _TABLE.append(r)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc


def lacing(payload: bytes) -> bytes:
    """Segment table for one packet ending on this page (255-splitting)."""
    segs = []
    n = len(payload)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)  # includes the 0 terminator for 255-multiples
    return bytes(segs)


def page(payload: bytes, serial: int, seq: int, granule: int,
         bos=False, eos=False, cont=False) -> bytes:
    hdr_type = (0x01 if cont else 0) | (0x02 if bos else 0) | (0x04 if eos else 0)
    segs = lacing(payload)
    head = (b"OggS" + bytes([0, hdr_type])
            + struct.pack("<q", granule)
            + struct.pack("<II", serial, seq)
            + b"\x00\x00\x00\x00"
            + bytes([len(segs)]) + segs)
    crc = ogg_crc(head + payload)
    head = head[:22] + struct.pack("<I", crc) + head[26:]
    return head + payload


def vorbis_id(channels: int, rate: int, br_nom: int) -> bytes:
    return (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
            + struct.pack("<I", rate)
            + struct.pack("<iii", 0, br_nom, 0)
            + bytes([0xB8])  # blocksizes 2^8 / 2^11
            + b"\x01")


def opus_id(channels: int, pre_skip: int, rate: int) -> bytes:
    return (b"OpusHead" + bytes([1, channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", rate)
            + struct.pack("<h", 0)  # output gain
            + bytes([0]))  # mapping family 0


def audio_payload(seq: int, size: int = 24) -> bytes:
    return bytes((seq * 31 + k * 7) % 256 for k in range(size))


def main(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)

    def write(name: str, data: bytes) -> None:
        with open(os.path.join(outdir, name), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes")

    # vorbis mono 44100, bitrate 128000, 3 audio pages, 1 s granule steps
    ser = 0x1234ABCD
    pages = [page(vorbis_id(1, 44100, 128000), ser, 0, 0, bos=True)]
    for i in range(1, 4):
        pages.append(page(audio_payload(i), ser, i, 44100 * i, eos=(i == 3)))
    write("vorbis_44k_mono.ogg", b"".join(pages))

    # opus stereo, input rate 48000, pre-skip 312, 4 audio pages of 960
    ser = 0x00C0FFEE
    pages = [page(opus_id(2, 312, 48000), ser, 0, 0, bos=True)]
    for i in range(1, 5):
        pages.append(page(audio_payload(i), ser, i, 312 + 960 * i,
                          eos=(i == 4)))
    write("opus_48k_stereo.ogg", b"".join(pages))

    # vorbis with a >255-byte packet: the segment table must 255-split
    ser = 0x0BADF00D
    big = audio_payload(9, size=600)
    pages = [page(vorbis_id(2, 48000, 192000), ser, 0, 0, bos=True),
             page(big, ser, 1, 48000, eos=True)]
    write("vorbis_lacing255.ogg", b"".join(pages))

    # opus where the final page granule equals pre-skip: duration 0
    ser = 0x5EED5EED
    pages = [page(opus_id(1, 3840, 48000), ser, 0, 0, bos=True),
             page(audio_payload(1), ser, 1, 3840, eos=True)]
    write("opus_zero_duration.ogg", b"".join(pages))

    # ---- comment headers (packet 2) ----

    def vorbis_comment(vendor: bytes, comments) -> bytes:
        out = b"\x03vorbis" + struct.pack("<I", len(vendor)) + vendor
        out += struct.pack("<I", len(comments))
        for c in comments:
            out += struct.pack("<I", len(c)) + c
        return out + b"\x01"

    def opus_tags(vendor: bytes, comments) -> bytes:
        out = b"OpusTags" + struct.pack("<I", len(vendor)) + vendor
        out += struct.pack("<I", len(comments))
        for c in comments:
            out += struct.pack("<I", len(c)) + c
        return out

    # vorbis with a standard comment page (UTF-8 value, duplicate key)
    ser = 0x7A657031
    cm = vorbis_comment(b"indie-enc 0.9", [
        b"TITLE=Nocturne", b"ARTIST=Ren\xc3\xa9e", b"GENRE=a", b"GENRE=b"])
    pages = [page(vorbis_id(1, 44100, 128000), ser, 0, 0, bos=True),
             page(cm, ser, 1, 0),
             page(audio_payload(1), ser, 2, 44100, eos=True)]
    write("vorbis_tags.ogg", b"".join(pages))

    # opus whose comment PACKET SPANS TWO PAGES: page 1 ends with a 255
    # lacing value (packet unterminated), page 2 carries the remainder
    # with the continuation flag set
    ser = 0x7A657032
    cm = opus_tags(b"opusenc from libopus 1.4",
                   [b"TITLE=Long form", b"COMMENT=" + b"x" * 600])
    assert len(cm) > 510, len(cm)
    head_part, tail_part = cm[:510], cm[510:]
    p1_head = (b"OggS" + bytes([0, 0x00])
               + struct.pack("<q", 0) + struct.pack("<II", ser, 1)
               + b"\x00\x00\x00\x00" + bytes([2, 255, 255]))
    p1 = p1_head + head_part
    crc = ogg_crc(p1)
    p1 = p1[:22] + struct.pack("<I", crc) + p1[26:] + b""
    pages = [page(opus_id(2, 312, 48000), ser, 0, 0, bos=True),
             p1,
             page(tail_part, ser, 2, 0, cont=True),
             page(audio_payload(1), ser, 3, 312 + 960, eos=True)]
    write("opus_tags_spanning.ogg", b"".join(pages))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/ogg_fixtures")
