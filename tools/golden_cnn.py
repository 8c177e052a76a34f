#!/usr/bin/env python3
"""Generate golden fixtures for the Scala CNN scorer:

1. norm_stats.parquet — the reference's norm_stats.npz as (channel, mean, std)
2. cnn_golden.parquet — deterministic synthetic (30×24) windows and the
   expected 13 sigmoid outputs, computed with an independent NumPy
   implementation of the reference CNN's eval-mode forward pass.

Usage: python3 tools/golden_cnn.py
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo/tools")
from export_weights import load_state_dict

REF = "/root/reference"

def conv1d(x, w, b, dilation=1, padding=1):
    # x: (C_in, T); w: (C_out, C_in, K)
    c_out, c_in, k = w.shape
    t = x.shape[1]
    span = dilation * (k - 1)
    t_out = t + 2 * padding - span
    xp = np.zeros((c_in, t + 2 * padding), dtype=np.float32)
    xp[:, padding:padding + t] = x
    out = np.zeros((c_out, t_out), dtype=np.float32)
    for kk in range(k):
        seg = xp[:, kk * dilation: kk * dilation + t_out]          # (C_in, T_out)
        out += np.tensordot(w[:, :, kk], seg, axes=(1, 0)).astype(np.float32)
    return (out + b[:, None]).astype(np.float32)

def bn(x, g, bta, m, v, eps=1e-5):
    return ((x - m[:, None]) / np.sqrt(v[:, None] + eps) * g[:, None] + bta[:, None]).astype(np.float32)

def relu(x): return np.maximum(x, 0).astype(np.float32)

def forward(win, sd):
    # win: (T, C) float32 normalized
    t = lambda k: sd[k].array().astype(np.float32)
    x = win.T.astype(np.float32)
    h = relu(bn(conv1d(x, t("net.0.weight"), t("net.0.bias")),
                t("net.1.weight"), t("net.1.bias"), t("net.1.running_mean"), t("net.1.running_var")))
    blk = conv1d(h, t("net.3.block.0.weight"), t("net.3.block.0.bias"))
    blk = relu(blk)
    blk = conv1d(blk, t("net.3.block.2.weight"), t("net.3.block.2.bias"))
    blk = relu(bn(blk, t("net.3.block.3.weight"), t("net.3.block.3.bias"),
                  t("net.3.block.3.running_mean"), t("net.3.block.3.running_var")))
    h = relu(h + blk)
    h = relu(bn(conv1d(h, t("net.4.weight"), t("net.4.bias")),
                t("net.5.weight"), t("net.5.bias"), t("net.5.running_mean"), t("net.5.running_var")))
    h = relu(bn(conv1d(h, t("net.7.weight"), t("net.7.bias"), dilation=2),
                t("net.8.weight"), t("net.8.bias"), t("net.8.running_mean"), t("net.8.running_var")))
    h = relu(bn(conv1d(h, t("net.10.weight"), t("net.10.bias"), dilation=2),
                t("net.11.weight"), t("net.11.bias"), t("net.11.running_mean"), t("net.11.running_var")))
    pooled = h.mean(axis=1).astype(np.float32)                     # (64,)
    logits = (t("head.weight") @ pooled + t("head.bias")).astype(np.float32)
    return 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))

def main():
    sd = load_state_dict(f"{REF}/best_model.pt")
    ns = np.load(f"{REF}/model/norm_stats.npz", allow_pickle=True)
    mean, std = ns["mean"].astype(np.float64), ns["std"].astype(np.float64)
    feature_cols = [str(c) for c in ns["feature_cols"]]

    pq.write_table(pa.table({
        "channel": pa.array(feature_cols),
        "mean": pa.array(mean, type=pa.float64()),
        "std": pa.array(std, type=pa.float64()),
    }), "/root/repo/src/test/resources/norm_stats.parquet")

    # deterministic synthetic windows (seeded), normalized like the app
    rng = np.random.RandomState(7)
    wins, outs = [], []
    for i in range(8):
        raw = rng.uniform(-2, 2, size=(30, 24)).astype(np.float32)
        norm = ((raw - mean.astype(np.float32)) / std.astype(np.float32)).astype(np.float32)
        wins.append(raw.reshape(-1).tolist())
        outs.append(forward(norm, sd).tolist())
    pq.write_table(pa.table({
        "win_id": pa.array(range(8), type=pa.int32()),
        "window": pa.array(wins, type=pa.list_(pa.float32())),   # row-major 30*24
        "expected": pa.array(outs, type=pa.list_(pa.float64())),
    }), "/root/repo/src/test/resources/cnn_golden.parquet")
    print("wrote norm_stats.parquet and cnn_golden.parquet")
    print("sample expected[0]:", np.round(outs[0], 4))

if __name__ == "__main__":
    main()
