#!/usr/bin/env python
"""Close-or-refuse microbench for PERF.md §3's last two headroom items
(VERDICT r4 item #5):

  A. "sequential data-grad chains" — the backward's dh_t propagation
     (d_gates @ Wᵀ per scan step) is a carried dependency no stacking
     can remove.  Isolate it: `jax.grad` w.r.t. the INPUT FEATURES only
     (weight-grad contractions dead-code-eliminated, the sequential
     chain + recomputation kept).  Compare against the full grad and
     against a per-step latency floor measured by an L-step scan whose
     body is one minimal dependent matmul.

  B. "forward small-row character" — time the forward alone across
     batch {64, 256, 512, 1024}: if ms/img and MFU plateau with batch,
     rows are not the binding constraint; the residue is the per-step
     op-chain latency of 2 scans x L steps (same structural floor as
     decode latency).

Writes experiments/train_decomp.json.  Run on the real chip.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import flagship_config, random_arrays, train_image_flops  # noqa: E402
from cvc_tpu.models import core  # noqa: E402
from cvc_tpu.models.cyclical import cyclical_loss  # noqa: E402

PEAK = 197e12
REPS = 30


def timed(fn, *args):
    out = fn(*args)                      # compile + warm
    float(jnp.asarray(out).ravel()[0])   # scalar sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        float(jnp.asarray(out).ravel()[0])   # scalar sync
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best * 1e3


def main():
    smoke = "--smoke" in sys.argv
    kw = (dict(vocab_size=512, rnn_size=64, input_encoding_size=32,
               att_hid_size=32, feat_dim=64, num_regions=16,
               num_classes=16, class_emb_dim=8) if smoke else {})
    cfg = flagship_config(dtype="bfloat16", **kw)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    global REPS
    if smoke:
        REPS = 2
    rows = []

    def loss_fn(p, arrays):
        loss, _ = cyclical_loss(p, cfg, arrays, jax.random.PRNGKey(1),
                                train=True)
        return loss

    for batch in ((8,) if smoke else (64, 256)):
        arrays = random_arrays(cfg, batch, seed=1)

        full = jax.jit(lambda p, a: jax.grad(loss_fn)(p, a))
        t_full = timed(lambda a: jax.tree_util.tree_leaves(
            full(params, a))[0], arrays)

        # A: data-grad chain only — grad w.r.t. feats; every weight-grad
        # contraction is dead code, the sequential dh chain is not.
        dfeat = jax.jit(lambda p, a: jax.grad(
            lambda f: loss_fn(p, {**a, "feats": f}))(a["feats"]))
        t_data = timed(lambda a: dfeat(params, a), arrays)

        fwd = jax.jit(lambda p, a: loss_fn(p, a))
        t_fwd = timed(lambda a: fwd(params, a), arrays)

        rows.append({
            "batch": batch,
            "full_grad_ms": round(t_full, 3),
            "input_grad_only_ms": round(t_data, 3),
            "forward_ms": round(t_fwd, 3),
            "weight_grad_share_ms": round(t_full - t_data, 3),
            "note": "input_grad_only = forward + sequential data-grad "
                    "chain + recompute; full - input_only ~ stacked "
                    "weight-grad contractions",
        })
        print(rows[-1], flush=True)

    # B: forward scaling curve
    fwd_curve = []
    for batch in ((8, 16) if smoke else (64, 256, 512, 1024)):
        arrays = random_arrays(cfg, batch, seed=1)
        fwd = jax.jit(lambda p, a: loss_fn(p, a))
        t = timed(lambda a: fwd(params, a), arrays)
        mfu = batch * (train_image_flops(cfg) / 3.0) / (t / 1e3) / PEAK
        fwd_curve.append({"batch": batch, "forward_ms": round(t, 3),
                          "us_per_img": round(t * 1e3 / batch, 2),
                          "mfu": round(mfu, 4)})
        print(fwd_curve[-1], flush=True)

    # per-step latency floor: L-step scan, one minimal dependent matmul
    L = cfg.max_tokens - 1
    w = jnp.zeros((8, 8), jnp.bfloat16)

    def tiny_scan(x):
        def body(c, _):
            return jnp.tanh(c @ w), None
        c, _ = jax.lax.scan(body, x, None, length=L)
        return c.sum()

    ts = jax.jit(tiny_scan)
    t_floor = timed(ts, jnp.ones((8, 8), jnp.bfloat16))
    floor = {"scan_steps": int(L), "tiny_scan_ms": round(t_floor, 3),
             "us_per_step": round(t_floor * 1e3 / L, 2),
             "note": "1 dependent 8x8 matmul+tanh per step: the pure "
                     "sequential-dispatch floor of an L-step scan"}
    print(floor, flush=True)

    dev0 = jax.devices()[0]
    out = {"config": "flagship bf16", "reps": REPS,
           "platform": dev0.platform, "device_kind": dev0.device_kind,
           "grad_decomp": rows, "forward_curve": fwd_curve,
           "scan_latency_floor": floor}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "experiments", "train_decomp.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
