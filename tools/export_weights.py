#!/usr/bin/env python3
"""One-time offline export of the reference CNN checkpoint to a neutral
parquet weight table (layer, shape, data) — no torch required.

A PyTorch .pt checkpoint is a zip archive holding a pickled state_dict whose
tensors reference raw little-endian storage files inside the archive. A
custom Unpickler reconstructs each tensor from (storage key, dtype, shape,
stride) without importing torch.

Usage: python3 tools/export_weights.py <best_model.pt> <out.parquet>
"""
import io, pickle, struct, sys, zipfile
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DTYPES = {
    "FloatStorage": np.float32, "DoubleStorage": np.float64,
    "LongStorage": np.int64, "IntStorage": np.int32,
    "HalfStorage": np.float16, "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}

class FakeTensor:
    def __init__(self, storage, storage_offset, size, stride):
        self.storage, self.offset, self.size, self.stride = storage, storage_offset, size, stride
    def array(self):
        a = np.lib.stride_tricks.as_strided(
            self.storage[self.offset:],
            shape=self.size,
            strides=[s * self.storage.itemsize for s in self.stride])
        return np.ascontiguousarray(a)

def load_state_dict(path):
    zf = zipfile.ZipFile(path)
    prefix = None
    for n in zf.namelist():
        if n.endswith("data.pkl"):
            prefix = n[: -len("data.pkl")]
            break
    storages = {}

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "torch._utils" and name == "_rebuild_tensor_v2":
                def rebuild(storage, storage_offset, size, stride, *args):
                    return FakeTensor(storage, storage_offset, size, stride)
                return rebuild
            if module == "collections" and name == "OrderedDict":
                import collections
                return collections.OrderedDict
            if module == "torch" and name in DTYPES:
                return name  # dtype marker
            raise pickle.UnpicklingError(f"blocked: {module}.{name}")

        def persistent_load(self, pid):
            typename, storage_type, key, location, numel = pid[0], pid[1], pid[2], pid[3], pid[4]
            assert typename == "storage"
            if key not in storages:
                raw = zf.read(f"{prefix}data/{key}")
                storages[key] = np.frombuffer(raw, dtype=DTYPES[storage_type])
            return storages[key]

    with zf.open(prefix + "data.pkl") as f:
        return Unpickler(io.BytesIO(f.read())).load()

def main():
    src, out = sys.argv[1], sys.argv[2]
    sd = load_state_dict(src)
    names, shapes, datas = [], [], []
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            continue
        a = v.array().astype(np.float32)
        names.append(k)
        shapes.append(list(a.shape) if a.shape else [1])
        datas.append(a.reshape(-1).tolist())
        print(f"{k}: shape={list(a.shape)}")
    table = pa.table({
        "layer": pa.array(names),
        "shape": pa.array(shapes, type=pa.list_(pa.int32())),
        "data": pa.array(datas, type=pa.list_(pa.float32())),
    })
    pq.write_table(table, out)
    print(f"wrote {out} ({len(names)} tensors)")

if __name__ == "__main__":
    main()
