#!/usr/bin/env python3
"""Generate TAR fixtures with python's stdlib tarfile — an INDEPENDENT
ustar implementation (CPython's Lib/tarfile) — for
graft.functions.TarWalk. Writes src/test/resources/tar_fixtures/ and
prints the gzip-compressed hex (tar is zero-padded; WebQueries embeds
the gzipped form and unwraps with the certified gunzip_all) plus the
pinned per-member metadata.

Fixtures (each trimmed at the two-zero-block end-of-archive marker —
the walker's documented contract; record padding beyond it is
optional):
  plain.tar     file + dir + subdir file + 1300-byte multi-block file
  longname.tar  GNU longname (typeflag L) -> whole-archive refuse
  badsum.tar    plain.tar with a checksum-field byte flipped -> refuse
  trunc.tar     plain.tar cut mid-member -> refuse
"""
import tarfile, io, os, gzip

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "tar_fixtures")
os.makedirs(OUT, exist_ok=True)
Z = b"\0" * 512


def trim(b):
    p = 0
    while p + 1024 <= len(b):
        if b[p:p + 512] == Z and b[p + 512:p + 1024] == Z:
            return b[:p + 1024]
        p += 512
    return b


def make(entries, fmt=tarfile.USTAR_FORMAT):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as t:
        for name, data, ftype in entries:
            ti = tarfile.TarInfo(name)
            ti.mtime = 0
            ti.uid = ti.gid = 0
            ti.uname = ti.gname = "root"
            if ftype == "dir":
                ti.type = tarfile.DIRTYPE
                t.addfile(ti)
            else:
                ti.size = len(data)
                t.addfile(ti, io.BytesIO(data))
    return trim(buf.getvalue())


plain = make([
    ("a.txt", b"alpha tar body\n", "f"),
    ("dir/", b"", "dir"),
    ("dir/b.txt", b"beta", "f"),
    ("big.txt", b"0123456789" * 130, "f"),
])
open(os.path.join(OUT, "plain.tar"), "wb").write(plain)

longname = make([("x" * 120 + ".txt", b"long name data", "f")],
                fmt=tarfile.GNU_FORMAT)
open(os.path.join(OUT, "longname.tar"), "wb").write(longname)

bad = bytearray(plain)
bad[148] ^= 0x01  # first header's checksum field
open(os.path.join(OUT, "badsum.tar"), "wb").write(bad)

trunc = plain[:len(plain) // 2 - 100]
open(os.path.join(OUT, "trunc.tar"), "wb").write(trunc)

for f in ["plain.tar", "longname.tar", "badsum.tar", "trunc.tar"]:
    b = open(os.path.join(OUT, f), "rb").read()
    gz = gzip.compress(b, 9, mtime=0)
    h = gz.hex().upper()
    print(f"== {f} ({len(b)} bytes, {len(gz)} gz)")
    for i in range(0, len(h), 96):
        print('    "' + h[i:i + 96] + '" +')
    if f == "plain.tar":
        with tarfile.open(fileobj=io.BytesIO(b)) as t:
            for ti in t.getmembers():
                print(f"    pinned: {ti.name!r} type={ti.type!r} "
                      f"size={ti.size}")
