#!/usr/bin/env python3
"""Golden oracle for the full-network trunk gradient (TrunkGrad.scala).

Independent NumPy implementation of the masked-BCE backward pass through
the whole reference CNN with FROZEN BatchNorm statistics (gamma/beta
trained) — the same training configuration TrunkTrainer uses. Forward is
float32 (like the app), backward accumulates in float64 (like the Scala
backward). Self-checks the analytic gradient against central finite
differences of a float64 forward before writing the fixture.

Inputs: the 8 golden windows from cnn_golden.parquet, labels
y_k = NaN if (win_id+k)%5==0 else ((win_id+k)%3)/2.0.

Output: src/test/resources/trunk_grad_golden.parquet with one row per
parameter block: (block, value) where value = round2(L2 norm of the
summed batch gradient), plus ("loss", round2(summed loss)) and
("labeled", count).

Usage: python3 tools/golden_trunk_grad.py
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo/tools")
from export_weights import load_state_dict

REF = "/root/reference"
OUT = "/root/repo/src/test/resources/trunk_grad_golden.parquet"


def conv1d(x, w, b, dilation=1, padding=1, dtype=np.float32):
    c_out, c_in, k = w.shape
    t = x.shape[1]
    t_out = t + 2 * padding - dilation * (k - 1)
    xp = np.zeros((c_in, t + 2 * padding), dtype=dtype)
    xp[:, padding:padding + t] = x
    out = np.zeros((c_out, t_out), dtype=dtype)
    for kk in range(k):
        seg = xp[:, kk * dilation: kk * dilation + t_out]
        out += np.tensordot(w[:, :, kk], seg, axes=(1, 0)).astype(dtype)
    return (out + b[:, None]).astype(dtype)


def bn(x, g, bta, m, v, eps=1e-5, dtype=np.float32):
    inv = 1.0 / np.sqrt(v.astype(np.float64)[:, None] + eps)
    return ((x - m[:, None]) * inv * g[:, None] + bta[:, None]).astype(dtype)


def relu(x):
    return np.maximum(x, 0).astype(x.dtype)


class P:
    """Parameter bundle in TrunkGrad.blockSpec order."""
    def __init__(self, sd, dtype=np.float32):
        t = lambda k: sd[k].array().astype(dtype)
        self.c1w, self.c1b = t("net.0.weight"), t("net.0.bias")
        self.b1g, self.b1b = t("net.1.weight"), t("net.1.bias")
        self.b1m, self.b1v = t("net.1.running_mean"), t("net.1.running_var")
        self.r1w, self.r1b = t("net.3.block.0.weight"), t("net.3.block.0.bias")
        self.r2w, self.r2b = t("net.3.block.2.weight"), t("net.3.block.2.bias")
        self.rbg, self.rbb = t("net.3.block.3.weight"), t("net.3.block.3.bias")
        self.rbm, self.rbv = t("net.3.block.3.running_mean"), t("net.3.block.3.running_var")
        self.c2w, self.c2b = t("net.4.weight"), t("net.4.bias")
        self.b2g, self.b2b = t("net.5.weight"), t("net.5.bias")
        self.b2m, self.b2v = t("net.5.running_mean"), t("net.5.running_var")
        self.c3w, self.c3b = t("net.7.weight"), t("net.7.bias")
        self.b3g, self.b3b = t("net.8.weight"), t("net.8.bias")
        self.b3m, self.b3v = t("net.8.running_mean"), t("net.8.running_var")
        self.c4w, self.c4b = t("net.10.weight"), t("net.10.bias")
        self.b4g, self.b4b = t("net.11.weight"), t("net.11.bias")
        self.b4m, self.b4v = t("net.11.running_mean"), t("net.11.running_var")
        self.hw, self.hb = t("head.weight"), t("head.bias")


def forward_cached(x0, p, dtype=np.float32):
    c = {}
    c["x0"] = x0.astype(dtype)
    c["c1pre"] = conv1d(c["x0"], p.c1w, p.c1b, dtype=dtype)
    c["b1out"] = bn(c["c1pre"], p.b1g, p.b1b, p.b1m, p.b1v, dtype=dtype)
    c["h1"] = relu(c["b1out"])
    c["r1pre"] = conv1d(c["h1"], p.r1w, p.r1b, dtype=dtype)
    c["r1post"] = relu(c["r1pre"])
    c["r2pre"] = conv1d(c["r1post"], p.r2w, p.r2b, dtype=dtype)
    c["rbnOut"] = bn(c["r2pre"], p.rbg, p.rbb, p.rbm, p.rbv, dtype=dtype)
    c["s2"] = (relu(c["rbnOut"]) + c["h1"]).astype(dtype)
    c["h2"] = relu(c["s2"])
    c["c2pre"] = conv1d(c["h2"], p.c2w, p.c2b, dtype=dtype)
    c["b2out"] = bn(c["c2pre"], p.b2g, p.b2b, p.b2m, p.b2v, dtype=dtype)
    c["h3"] = relu(c["b2out"])
    c["c3pre"] = conv1d(c["h3"], p.c3w, p.c3b, dilation=2, dtype=dtype)
    c["b3out"] = bn(c["c3pre"], p.b3g, p.b3b, p.b3m, p.b3v, dtype=dtype)
    c["h4"] = relu(c["b3out"])
    c["c4pre"] = conv1d(c["h4"], p.c4w, p.c4b, dilation=2, dtype=dtype)
    c["b4out"] = bn(c["c4pre"], p.b4g, p.b4b, p.b4m, p.b4v, dtype=dtype)
    c["h5"] = relu(c["b4out"])
    c["pooled"] = c["h5"].mean(axis=1).astype(dtype)
    c["logits"] = (p.hw.astype(np.float64) @ c["pooled"].astype(np.float64)
                   + p.hb.astype(np.float64))
    return c


def masked_bce(logits, y):
    loss, dz, labeled = 0.0, np.zeros_like(logits), 0
    for o, yk in enumerate(y):
        if not np.isnan(yk):
            z = logits[o]
            loss += max(z, 0.0) - z * yk + np.log1p(np.exp(-abs(z)))
            dz[o] = 1.0 / (1.0 + np.exp(-z)) - yk
            labeled += 1
    return loss, dz, labeled


def conv_backward(x, w, dy, dilation=1, padding=1):
    """Returns (dW, db, dx) in float64. x (C_in,T) f32, dy (C_out,T_out) f64."""
    c_out, c_in, k = w.shape
    t = x.shape[1]
    t_out = dy.shape[1]
    x64 = x.astype(np.float64)
    xp = np.zeros((c_in, t + 2 * padding))
    xp[:, padding:padding + t] = x64
    dxp = np.zeros_like(xp)
    dW = np.zeros((c_out, c_in, k))
    for kk in range(k):
        seg = xp[:, kk * dilation: kk * dilation + t_out]          # (C_in,T_out)
        dW[:, :, kk] = dy @ seg.T                                  # (C_out,C_in)
        dxp[:, kk * dilation: kk * dilation + t_out] += w[:, :, kk].astype(np.float64).T @ dy
    db = dy.sum(axis=1)
    dx = dxp[:, padding:padding + t]
    return dW, db, dx


def bn_backward(x_pre, g, m, v, dy, eps=1e-5):
    inv = 1.0 / np.sqrt(v.astype(np.float64) + eps)
    xc = x_pre.astype(np.float64) - m.astype(np.float64)[:, None]
    dg = (dy * xc * inv[:, None]).sum(axis=1)
    db = dy.sum(axis=1)
    dx = dy * (inv * g.astype(np.float64))[:, None]
    return dg, db, dx


def relu_backward(pre, dy):
    return np.where(pre > 0, dy, 0.0)


def row_gradient(win_norm, y, p):
    """win_norm (T,C) f32 → dict of block grads (f64), loss, labeled."""
    c = forward_cached(win_norm.T, p)
    loss, dz, labeled = masked_bce(c["logits"], y)
    g = {}
    if labeled == 0:
        return g, 0.0, 0
    g["head.w"] = np.outer(dz, c["pooled"].astype(np.float64))
    g["head.b"] = dz.copy()
    d_pooled = p.hw.astype(np.float64).T @ dz
    t4 = c["h5"].shape[1]
    dH = np.repeat((d_pooled / t4)[:, None], t4, axis=1)

    dH = relu_backward(c["b4out"], dH)
    g["bn4.g"], g["bn4.b"], dH = bn_backward(c["c4pre"], p.b4g, p.b4m, p.b4v, dH)
    g["conv4.w"], g["conv4.b"], dH = conv_backward(c["h4"], p.c4w, dH, dilation=2)

    dH = relu_backward(c["b3out"], dH)
    g["bn3.g"], g["bn3.b"], dH = bn_backward(c["c3pre"], p.b3g, p.b3m, p.b3v, dH)
    g["conv3.w"], g["conv3.b"], dH = conv_backward(c["h3"], p.c3w, dH, dilation=2)

    dH = relu_backward(c["b2out"], dH)
    g["bn2.g"], g["bn2.b"], dH = bn_backward(c["c2pre"], p.b2g, p.b2m, p.b2v, dH)
    g["conv2.w"], g["conv2.b"], dH = conv_backward(c["h2"], p.c2w, dH)

    dS2 = relu_backward(c["s2"], dH)
    dBlk = relu_backward(c["rbnOut"], dS2)
    g["resbn.g"], g["resbn.b"], dBlk = bn_backward(c["r2pre"], p.rbg, p.rbm, p.rbv, dBlk)
    g["res2.w"], g["res2.b"], dBlk = conv_backward(c["r1post"], p.r2w, dBlk)
    dBlk = relu_backward(c["r1pre"], dBlk)
    g["res1.w"], g["res1.b"], dBlk = conv_backward(c["h1"], p.r1w, dBlk)
    dH1 = dS2 + dBlk

    dB1 = relu_backward(c["b1out"], dH1)
    g["bn1.g"], g["bn1.b"], dB1 = bn_backward(c["c1pre"], p.b1g, p.b1m, p.b1v, dB1)
    g["conv1.w"], g["conv1.b"], _ = conv_backward(c["x0"], p.c1w, dB1)
    return g, loss, labeled


BLOCKS = ["conv1.w", "conv1.b", "bn1.g", "bn1.b", "res1.w", "res1.b",
          "res2.w", "res2.b", "resbn.g", "resbn.b", "conv2.w", "conv2.b",
          "bn2.g", "bn2.b", "conv3.w", "conv3.b", "bn3.g", "bn3.b",
          "conv4.w", "conv4.b", "bn4.g", "bn4.b", "head.w", "head.b"]


def loss_of(win_norm, y, p, dtype):
    c = forward_cached(win_norm.T, p, dtype=dtype)
    loss, _, _ = masked_bce(c["logits"], y)
    return loss


def self_check(win_norm, y, sd):
    """Central FD vs analytic on a float64 forward, a few params/blocks."""
    rng = np.random.RandomState(3)
    p64 = P(sd, dtype=np.float64)
    g, _, _ = row_gradient(win_norm, y, p64)
    checks = [("conv1.w", "c1w"), ("res2.w", "r2w"), ("bn3.g", "b3g"),
              ("conv4.w", "c4w"), ("head.w", "hw")]
    for block, attr in checks:
        arr = getattr(p64, attr)
        idx = tuple(rng.randint(s) for s in arr.shape)
        eps = 1e-6
        orig = arr[idx]
        arr[idx] = orig + eps
        lp = loss_of(win_norm, y, p64, np.float64)
        arr[idx] = orig - eps
        lm = loss_of(win_norm, y, p64, np.float64)
        arr[idx] = orig
        fd = (lp - lm) / (2 * eps)
        an = g[block][idx]
        rel = abs(fd - an) / max(1e-6, abs(fd), abs(an))
        assert rel < 1e-4, f"{block}{idx}: fd {fd} vs analytic {an} (rel {rel})"
    print("FD self-check passed")


def main():
    sd = load_state_dict(f"{REF}/best_model.pt")
    ns = np.load(f"{REF}/model/norm_stats.npz", allow_pickle=True)
    mean = ns["mean"].astype(np.float32)
    std = ns["std"].astype(np.float32)
    p = P(sd)

    golden = pq.read_table("/root/repo/src/test/resources/cnn_golden.parquet").to_pydict()
    K = 13
    total = {b: None for b in BLOCKS}
    total_loss, total_labeled = 0.0, 0
    first = True
    for win_id, flat in zip(golden["win_id"], golden["window"]):
        raw = np.array(flat, dtype=np.float32).reshape(30, 24)
        norm = ((raw - mean) / std).astype(np.float32)
        y = np.array([np.nan if (win_id + k) % 5 == 0 else ((win_id + k) % 3) / 2.0
                      for k in range(K)])
        if first:
            self_check(norm, y, sd)
            first = False
        g, loss, labeled = row_gradient(norm, y, p)
        total_loss += loss
        total_labeled += labeled
        for b in BLOCKS:
            total[b] = g[b] if total[b] is None else total[b] + g[b]

    def r3(x):
        return np.floor(x * 1000 + 0.5) / 1000.0

    # log-scale norms: the two float32 forwards (Scala loop order vs NumPy
    # tensordot order) agree to ~1e-5 RELATIVE, which is exactly what a
    # log-scale fixed rounding tolerates (1e-5 << half-bucket 5e-4) —
    # absolute rounding of a norm ~1700 would sit on the bucket boundary
    rows = [(b, r3(float(np.log(np.sqrt((total[b] ** 2).sum())))))
            for b in BLOCKS]
    rows.append(("loss", r3(float(np.log(total_loss)))))
    rows.append(("labeled", float(total_labeled)))
    pq.write_table(pa.table({
        "block": pa.array([r[0] for r in rows]),
        "value": pa.array([r[1] for r in rows], type=pa.float64()),
    }), OUT)
    for b, v in rows:
        print(f"{b}: {v}")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
