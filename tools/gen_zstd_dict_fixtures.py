#!/usr/bin/env python3
"""Dictionary-frame fixtures from the INDEPENDENT system zstd CLI:
`zstd --train` builds a real trained dictionary (magic, entropy tables,
rep offsets, content); payloads compressed with -D must decode through
the engine's from-spec dictionary path bit-exactly.

Writes src/test/resources/zstd_fixtures/dict.bin + dict_*.zst and
prints the (name, raw_len, raw_md5) pins plus the dict id.
"""
import hashlib
import os
import struct
import subprocess
import tempfile

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "zstd_fixtures")
os.makedirs(OUT, exist_ok=True)


def sample(i):
    words = ["telemetry", "pipeline", "decode", "frame", "sensor",
             "voltage", "current", "duty", "erpm", "battery"]
    parts = []
    for k in range(120):
        w = [words[(i * 5 + k * 3 + j) % len(words)] for j in range(7)]
        parts.append("record %04d field %s;" % (k, " ".join(w)))
    return ("\n".join(parts) + "\n").encode()


def main():
    with tempfile.TemporaryDirectory() as td:
        for i in range(40):
            with open(os.path.join(td, f"s{i:02d}.txt"), "wb") as f:
                f.write(sample(i))
        dict_path = os.path.join(OUT, "dict.bin")
        subprocess.run(
            ["zstd", "--train"] +
            [os.path.join(td, f"s{i:02d}.txt") for i in range(40)] +
            ["-o", dict_path, "--maxdict=4096", "-f"],
            check=True, capture_output=True)
        d = open(dict_path, "rb").read()
        did = struct.unpack("<I", d[4:8])[0]
        print(f"// dict: {len(d)} bytes, id {did}")

        for name, payload, level in (
                ("dict_small_l3", sample(77), "-3"),
                ("dict_small_l19", sample(78), "-19"),
                ("dict_tiny_l3", b"record 0000 field telemetry;", "-3")):
            raw_path = os.path.join(td, name + ".raw")
            with open(raw_path, "wb") as f:
                f.write(payload)
            zst_path = os.path.join(OUT, name + ".zst")
            subprocess.run(
                ["zstd", level, "-D", dict_path, raw_path, "-o",
                 zst_path, "-f"], check=True, capture_output=True)
            blob = open(zst_path, "rb").read()
            print(f"    (\"{name}\", {len(payload)}, "
                  f"\"{hashlib.md5(payload).hexdigest()}\"), "
                  f"// {len(blob)} zst bytes")


if __name__ == "__main__":
    main()
