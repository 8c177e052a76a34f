#!/usr/bin/env python3
"""Parquet footer-audit fixtures for ParquetMetaSpec / src_parquet_audit
from the INDEPENDENT pyarrow writer + its metadata API (the Scala
reader is a from-spec thrift-compact walk sharing no code with it).

Prints scala hex literals and pinned oracle rows; writes the raw
files to src/test/resources/parquet_fixtures/.
"""
import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "parquet_fixtures")
os.makedirs(OUT, exist_ok=True)


def table():
    return pa.table({
        "id": pa.array([1, 2, None, 4, 5, 6], type=pa.int64()),
        "score": pa.array([0.5, 1.5, 2.5, None, 4.5, 5.5],
                          type=pa.float64()),
        "name": pa.array(["a", "bb", "ccc", "dd", None, "f"],
                         type=pa.utf8()),
    })


def write(name, compression, row_group_size):
    path = os.path.join(OUT, name + ".parquet")
    pq.write_table(table(), path, compression=compression,
                   row_group_size=row_group_size)
    return open(path, "rb").read()


def main():
    cases = {
        "pq_snappy_2rg": write("pq_snappy_2rg", "snappy", 3),
        "pq_zstd": write("pq_zstd", "zstd", 100),
        "pq_plain": write("pq_plain", "none", 100),
    }
    blob = cases["pq_snappy_2rg"]
    cases["pq_torn"] = blob[:-6]
    with open(os.path.join(OUT, "pq_torn.parquet"), "wb") as f:
        f.write(cases["pq_torn"])

    print("// ---- scala hex fixtures ----")
    for name, b in cases.items():
        h = b.hex().upper()
        chunks = [h[i:i + 96] for i in range(0, len(h), 96)]
        lit = ' +\n      '.join(f'"{c}"' for c in chunks)
        print(f'    ("{name}",\n      {lit}),')

    print("\n// ---- pinned oracle rows ----")
    for name in ("pq_snappy_2rg", "pq_zstd", "pq_plain"):
        md = pq.ParquetFile(os.path.join(OUT, name + ".parquet")).metadata
        version = 2 if md.format_version.startswith("2") else 1
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in range(g.num_columns):
                col = g.column(c)
                encs = ",".join(sorted(set(
                    e.lower() for e in col.encodings)))
                nulls = (col.statistics.null_count
                         if col.statistics is not None and
                         col.statistics.has_null_count else -1)
                print(f"    \"('{name}', {version}, {md.num_rows}, "
                      f"{md.num_row_groups}, {rg}, "
                      f"'{col.path_in_schema}', "
                      f"'{col.physical_type.lower()}', "
                      f"'{col.compression.lower()}', '{encs}', "
                      f"{col.num_values}, {col.total_compressed_size}, "
                      f"{col.total_uncompressed_size}, {nulls}),\",")
    print("    \"('pq_torn', -1, -1, -1, -1, '(refused)', '(refused)', "
          "'(refused)', '(refused)', -1, -1, -1, -1)\",")
    md = pq.ParquetFile(os.path.join(OUT, "pq_plain.parquet")).metadata
    print(f"// created_by: {md.created_by}")
    for name, b in cases.items():
        print(f"// {name}: {len(b)} bytes")


if __name__ == "__main__":
    main()
