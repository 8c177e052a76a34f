#!/usr/bin/env python3
"""TFRecord fixtures for TfRecordSpec, written from the published
framing (u64 length + masked CRC32C of length + payload + masked
CRC32C of payload) with an INDEPENDENT from-polynomial CRC32C
implementation (the Scala decoder uses the JDK's, so the two sides
cross-validate the Castagnoli table).

Writes src/test/resources/tfrecord_fixtures/<name>.tfrecord plus a
<name>.meta sidecar of "idx n_bytes md5" lines.
"""
import hashlib
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "tfrecord_fixtures")
os.makedirs(OUT, exist_ok=True)

# CRC32C (Castagnoli, reflected, poly 0x1EDC6F41) from the polynomial
TABLE = []
for i in range(256):
    c = i
    for _ in range(8):
        c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
    TABLE.append(c)


def crc32c(data):
    c = 0xFFFFFFFF
    for b in data:
        c = (c >> 8) ^ TABLE[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


def masked(data):
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def record(payload):
    length = struct.pack("<Q", len(payload))
    return (length + struct.pack("<I", masked(length)) + payload +
            struct.pack("<I", masked(payload)))


def lcg(seed):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield (s >> 33) & 0xFF


def write(name, payloads):
    blob = b"".join(record(p) for p in payloads)
    with open(os.path.join(OUT, name + ".tfrecord"), "wb") as f:
        f.write(blob)
    with open(os.path.join(OUT, name + ".meta"), "w") as f:
        for i, p in enumerate(payloads):
            f.write(f"{i} {len(p)} {hashlib.md5(p).hexdigest()}\n")
    print(name, len(payloads), "records,", len(blob), "bytes")


def main():
    g = lcg(3)
    write("three_examples", [
        b"pretend serialized tf.Example number one",
        bytes(next(g) for _ in range(1024)),
        b""])  # empty record is legal
    write("single_big", [bytes(next(g) for _ in range(70000))])
    write("empty_file", [])
    write("many_small", [f"rec {i} payload".encode() for i in range(50)])


if __name__ == "__main__":
    main()
