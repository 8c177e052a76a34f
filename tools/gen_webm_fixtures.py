#!/usr/bin/env python3
"""Independent WebM/Matroska (EBML) fixture generator for WebmMetaSpec.

Writes the EBML element tree from RFC 8794 / the Matroska spec with its
own vint packer — no code shared with the Scala walk — covering: known
and UNKNOWN Segment sizes, 4- and 8-byte Duration floats, non-default
TimecodeScale, video+audio / video-only / audio-only track layouts,
NUL-padded codec strings, unknown elements the walk must skip, and a
trailing Cluster that must STOP the walk.

Usage: python3 tools/gen_webm_fixtures.py src/test/resources/webm_fixtures
"""
import os
import struct
import sys


def vint_size(value: int, length: int = None) -> bytes:
    """Element size as a vint with the marker bit (shortest or forced length)."""
    if length is None:
        length = 1
        while length <= 8 and value >= (1 << (7 * length)) - 1:
            length += 1
    out = value | (1 << (7 * length))
    return out.to_bytes(length, "big")


def elem(eid: int, payload: bytes) -> bytes:
    nid = (eid.bit_length() + 7) // 8
    return eid.to_bytes(nid, "big") + vint_size(len(payload)) + payload


def uint(v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def ebml_header(doctype: str) -> bytes:
    return elem(0x1A45DFA3,
                elem(0x4286, uint(1))          # EBMLVersion
                + elem(0x42F7, uint(1))        # EBMLReadVersion
                + elem(0x4282, doctype.encode()))  # DocType


def info(duration_ticks: float, tc_scale: int = None, f32: bool = False) -> bytes:
    body = b""
    if tc_scale is not None:
        body += elem(0x2AD7B1, uint(tc_scale))
    if f32:
        body += elem(0x4489, struct.pack(">f", duration_ticks))
    else:
        body += elem(0x4489, struct.pack(">d", duration_ticks))
    return elem(0x1549A966, body)


def video_track(codec: bytes, w: int, h: int) -> bytes:
    return elem(0xAE,
                elem(0xD7, uint(1))  # TrackNumber (skipped by the walk)
                + elem(0x83, uint(1))
                + elem(0x86, codec)
                + elem(0xE0, elem(0xB0, uint(w)) + elem(0xBA, uint(h))))


def audio_track(codec: bytes, rate: float, ch: int) -> bytes:
    return elem(0xAE,
                elem(0x83, uint(2))
                + elem(0x86, codec)
                + elem(0xE1, elem(0xB5, struct.pack(">f", rate))
                       + elem(0x9F, uint(ch))))


def main(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)

    def write(name: str, data: bytes) -> None:
        with open(os.path.join(outdir, name), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes")

    # vp9+opus webm: known segment size, 8-byte duration, default scale,
    # a Void element to skip, a Cluster that must stop the walk
    seg = (info(12345.0)
           + elem(0xEC, b"\x00" * 7)  # Void
           + elem(0x1654AE6B,
                  video_track(b"V_VP9", 1920, 1080)
                  + audio_track(b"A_OPUS", 48000.0, 2))
           + elem(0x1F43B675, b"\xA1\x82\x00\x00"))  # Cluster w/ junk
    write("vp9_opus.webm",
          ebml_header("webm") + elem(0x18538067, seg))

    # vp8+vorbis, UNKNOWN segment size, 4-byte float duration,
    # non-default timecode scale (500000 ns => ticks*0.5 ms)
    seg = (info(2000.0, tc_scale=500000, f32=True)
           + elem(0x1654AE6B,
                  video_track(b"V_VP8", 640, 360)
                  + audio_track(b"A_VORBIS", 44100.0, 1)))
    body = elem(0x18538067, seg)
    # rewrite the segment size as unknown (1-byte all-ones vint)
    nid = 4  # segment id length
    stripped = body[nid:]
    # strip the existing size vint
    first = stripped[0]
    ln = 1
    mask = 0x80
    while not (first & mask):
        ln += 1
        mask >>= 1
    write("vp8_vorbis_unksize.webm",
          ebml_header("webm") + body[:nid] + b"\xFF" + stripped[ln:])

    # matroska doctype, video only, NUL-padded codec id, no duration
    seg = elem(0x1654AE6B, video_track(b"V_MPEG4/ISO/AVC\x00\x00", 1280, 720))
    write("h264_videoonly.mkv", ebml_header("matroska") + elem(0x18538067, seg))

    # audio-only webm
    seg = (info(500.0) + elem(0x1654AE6B, audio_track(b"A_OPUS", 24000.0, 1)))
    write("opus_audioonly.webm", ebml_header("webm") + elem(0x18538067, seg))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/webm_fixtures")
