#!/usr/bin/env python3
"""tf.Example fixtures for TfExampleSpec / src_tfexample_parse, written
from the PUBLISHED protobuf wire format (varint tags, length-delimited
messages) by an independent from-scratch writer — no protobuf library.

Message shapes (tensorflow/core/example/example.proto, public):
  Example  { Features features = 1; }
  Features { map<string, Feature> feature = 1; }
  Feature  { oneof kind { BytesList=1; FloatList=2; Int64List=3 } }
  BytesList{ repeated bytes value = 1; }
  FloatList{ repeated float value = 1 [packed]; }
  Int64List{ repeated int64 value = 1 [packed]; }

Prints (a) scala hex literals for embedding, (b) pinned oracle rows.
Float fixture values are chosen exactly representable in float32 AND
short decimal, so Double.toString (Spark) == repr (this pin) == DuckDB.
"""
import hashlib
import struct


def varint(n):
    n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def tag(field, wire):
    return varint((field << 3) | wire)


def ld(field, payload):  # length-delimited
    return tag(field, 2) + varint(len(payload)) + payload


def bytes_list(values):
    return b"".join(ld(1, v) for v in values)


def float_list_packed(values):
    return ld(1, b"".join(struct.pack("<f", v) for v in values))


def float_list_unpacked(values):
    return b"".join(tag(1, 5) + struct.pack("<f", v) for v in values)


def int64_list_packed(values):
    return ld(1, b"".join(varint(v) for v in values))


def int64_list_unpacked(values):
    return b"".join(tag(1, 0) + varint(v) for v in values)


def feature(kind_field, payload):
    return ld(kind_field, payload)


def entry(name, feat):
    return ld(1, name.encode()) + ld(2, feat)


def example(entries, extra=b""):
    feats = b"".join(ld(1, e) for e in entries)
    return ld(1, feats + extra) if (feats or extra) else ld(1, b"")


def fmt_float(v):
    s = repr(float(v))
    assert struct.unpack("<f", struct.pack("<f", v))[0] == v, v
    return s


def main():
    cases = {}

    # basic: one of each kind, packed
    cases["basic"] = example([
        entry("tokens", feature(3, int64_list_packed([3, 1, 4, 1, 5, -9]))),
        entry("score", feature(2, float_list_packed([0.5, -1.25, 100.0]))),
        entry("title", feature(1, bytes_list([b"hello world", b""]))),
    ])

    # unpacked encodings of the repeated numeric lists (legal proto)
    cases["unpacked"] = example([
        entry("ids", feature(3, int64_list_unpacked([7, 0, 1 << 40]))),
        entry("w", feature(2, float_list_unpacked([2.75]))),
    ])

    # unknown fields that a conforming reader must SKIP: field 9
    # varint + field 8 fixed64 + field 7 fixed32 inside Features,
    # and an unknown field 2 inside Example
    unknown = (tag(9, 0) + varint(999) +
               tag(8, 1) + b"\x01\x02\x03\x04\x05\x06\x07\x08" +
               tag(7, 5) + b"\xAA\xBB\xCC\xDD")
    feats = b"".join(ld(1, e) for e in [
        entry("x", feature(3, int64_list_packed([42])))])
    cases["unknown_fields"] = (ld(1, feats + unknown) +
                               tag(2, 0) + varint(5))

    # empty: Example with zero features
    cases["empty"] = example([])

    # empty lists: a Feature whose list message has zero values, and a
    # feature with NO kind at all (legal: all-defaults Feature)
    cases["empty_lists"] = example([
        entry("none_int", feature(3, b"")),
        entry("no_kind", b""),
    ])

    # torn: declared length runs past the buffer
    good = cases["basic"]
    cases["torn"] = good[:-4]

    # badwire: Int64List claimed with wire type 5 on its field 1
    cases["badwire"] = example([
        entry("bad", feature(3, tag(1, 5) + b"\x01\x02\x03\x04"))])

    expected = {
        "basic": [
            ("tokens", "int64", 6, "3,1,4,1,5,-9", "", ""),
            ("score", "float", 3, "", "0.5,-1.25,100.0", ""),
            ("title", "bytes", 2, "", "",
             hashlib.md5(b"hello world").hexdigest() + "," +
             hashlib.md5(b"").hexdigest()),
        ],
        "unpacked": [
            ("ids", "int64", 3, f"7,0,{1 << 40}", "", ""),
            ("w", "float", 1, "", "2.75", ""),
        ],
        "unknown_fields": [("x", "int64", 1, "42", "", "")],
        "empty": [],
        "empty_lists": [
            ("none_int", "int64", 0, "", "", ""),
            ("no_kind", "none", 0, "", "", ""),
        ],
        "torn": None,
        "badwire": None,
    }
    # sanity: float reprs are the short forms shared by Java/DuckDB
    assert fmt_float(0.5) == "0.5" and fmt_float(-1.25) == "-1.25"
    assert fmt_float(100.0) == "100.0" and fmt_float(2.75) == "2.75"

    print("// ---- scala hex fixtures ----")
    for name, blob in cases.items():
        h = blob.hex().upper()
        chunks = [h[i:i + 96] for i in range(0, len(h), 96)] or ['""']
        lit = ' +\n      '.join(f'"{c}"' for c in chunks)
        print(f'    ("{name}",\n      {lit}),')
    print("\n// ---- pinned oracle rows ----")
    for name, rows in expected.items():
        if rows is None:
            print(f"    \"('{name}', '(refused)', '(refused)', -1, "
                  f"'', '', ''),\",")
        elif not rows:
            print(f"    \"('{name}', '(empty)', '(empty)', 0, "
                  f"'', '', ''),\",")
        else:
            for (n, kind, cnt, i64, flt, md5s) in rows:
                print(f"    \"('{name}', '{n}', '{kind}', {cnt}, "
                      f"'{i64}', '{flt}', '{md5s}'),\",")


if __name__ == "__main__":
    main()
