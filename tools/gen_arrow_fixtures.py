#!/usr/bin/env python3
"""Arrow IPC fixtures for ArrowIpcSpec / src_arrow_read from the
INDEPENDENT pyarrow writer (the Scala reader is a from-spec
flatbuffers + envelope walk sharing no code with it).

Prints (a) scala hex literals, (b) pinned oracle rows, (c) writes the
raw fixtures to src/test/resources/arrow_fixtures/ for the spec.
"""
import hashlib
import os

import pyarrow as pa
import pyarrow.ipc as ipc

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "arrow_fixtures")
os.makedirs(OUT, exist_ok=True)


def basic_batches():
    b1 = pa.record_batch([
        pa.array([1, 2, None, 4], type=pa.int64()),
        pa.array([0.5, None, 2.25, -3.5], type=pa.float64()),
        pa.array(["alpha", "béta", None, ""], type=pa.utf8()),
        pa.array([True, False, None, True], type=pa.bool_()),
    ], names=["id", "score", "text", "flag"])
    b2 = pa.record_batch([
        pa.array([10, None], type=pa.int64()),
        pa.array([100.0, 0.125], type=pa.float64()),
        pa.array(["fin", "de partie"], type=pa.utf8()),
        pa.array([False, False], type=pa.bool_()),
    ], names=["id", "score", "text", "flag"])
    return [b1, b2]


def widths_batch():
    return [pa.record_batch([
        pa.array([-128, 127, 0], type=pa.int8()),
        pa.array([-32768, 32767, 7], type=pa.int16()),
        pa.array([1 << 30, -5, None], type=pa.int32()),
        pa.array([255, 0, 9], type=pa.uint8()),
        pa.array([1.5, -0.25, None], type=pa.float32()),
    ], names=["i8", "i16", "i32", "u8", "f32"])]


def large_batch():
    return [pa.record_batch([
        pa.array(["grand", None, "récit"], type=pa.large_utf8()),
        pa.array([b"\x00\x01", b"", None], type=pa.large_binary()),
        pa.array([7, 8, 9], type=pa.int64()),
    ], names=["ltext", "lbin", "k"])]


def write_stream(batches):
    sink = pa.BufferOutputStream()
    with ipc.new_stream(sink, batches[0].schema) as w:
        for b in batches:
            w.write_batch(b)
    return sink.getvalue().to_pybytes()


def write_file(batches, compression=None):
    sink = pa.BufferOutputStream()
    opts = ipc.IpcWriteOptions(compression=compression)
    with ipc.new_file(sink, batches[0].schema, options=opts) as w:
        for b in batches:
            w.write_batch(b)
    return sink.getvalue().to_pybytes()


def main():
    cases = {}
    cases["stream_basic"] = write_stream(basic_batches())
    cases["file_basic"] = write_file(basic_batches())
    cases["file_zstd"] = write_file(basic_batches(), compression="zstd")
    cases["file_lz4"] = write_file(basic_batches(), compression="lz4")
    cases["stream_widths"] = write_stream(widths_batch())
    cases["stream_large"] = write_stream(large_batch())
    cases["torn"] = cases["stream_basic"][:-30]
    # dictionary-encoded column: valid Arrow, refused by this subset
    dict_b = pa.record_batch(
        [pa.array(["a", "b", "a"]).dictionary_encode()], names=["d"])
    cases["dict_refused"] = write_stream([dict_b])

    for name, blob in cases.items():
        with open(os.path.join(OUT, name + ".arrow"), "wb") as f:
            f.write(blob)

    # expected aggregates over basic data (replayed by the oracle)
    ids = [1, 2, None, 4, 10, None]
    scores = [0.5, None, 2.25, -3.5, 100.0, 0.125]
    texts = ["alpha", "béta", None, "", "fin", "de partie"]
    i64_sum = sum(v for v in ids if v is not None)
    f64_sum = round(sum(v for v in scores if v is not None), 4)
    str_cat = "|".join("(null)" if t is None else t for t in texts)
    str_md5 = hashlib.md5(str_cat.encode()).hexdigest()
    fields_basic = "id:int64:1:2;score:float64:1:1;text:utf8:1:1;flag:bool:1:1"
    fields_widths = "i8:int8:1:0;i16:int16:1:0;i32:int32:1:1;u8:uint8:1:0;f32:float32:1:1"
    w_i64 = dict(i8=-1, i16=6, i32=(1 << 30) - 5, u8=264)

    print("// ---- scala hex fixtures ----")
    for name, blob in cases.items():
        h = blob.hex().upper()
        chunks = [h[i:i + 96] for i in range(0, len(h), 96)]
        lit = ' +\n      '.join(f'"{c}"' for c in chunks)
        print(f'    ("{name}",\n      {lit}),')
    print("\n// ---- pinned oracle rows ----")
    for name in ("stream_basic", "file_basic", "file_zstd", "file_lz4"):
        fmt = "stream" if name.startswith("stream") else "file"
        comp = ("zstd" if name == "file_zstd"
                else "lz4" if name == "file_lz4" else "none")
        print(f"    \"('{name}', '{fmt}', 2, 6, '{comp}', "
              f"'{fields_basic}', {i64_sum}, {f64_sum}, '{str_md5}'),\",")
    print(f"    \"('stream_widths', 'stream', 1, 3, 'none', "
          f"'{fields_widths}', {w_i64['i8'] + w_i64['i16'] + w_i64['i32'] + w_i64['u8']}, "
          f"1.25, '(na)'),\",")
    print("    \"('torn', '(refused)', -1, -1, '(refused)', "
          "'(refused)', NULL, NULL, '(refused)'),\",")
    print("    \"('dict_refused', '(refused)', -1, -1, '(refused)', "
          "'(refused)', NULL, NULL, '(refused)')\",")
    for name, blob in cases.items():
        print(f"// {name}: {len(blob)} bytes")


if __name__ == "__main__":
    main()
