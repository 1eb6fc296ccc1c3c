#!/usr/bin/env python
"""Isolate the optimizer sweep (grad-clip + Adam over the flagship param
pytree) on the real chip and compare it to its HBM roofline.

PERF.md §3 lists "Adam + grad-clip elementwise sweeps (~0.7 ms/step pure
HBM)" as remaining train-step headroom (VERDICT r3 next-round #6).  Before
engineering a fused optimizer, measure whether there is anything to win:

  * measured: jitted `opt.update + apply_updates` alone (donated state),
    exactly the transform the train step runs (training/optimizer.py).
  * roofline: minimum HBM traffic at f32 — clip needs one full read of
    the grads for the global norm (a reduction that must complete before
    any update), then the update reads (g, p, m, v) and writes (p, m, v):
    32 B/param with clip, 28 B/param without — divided by the v5e HBM
    bandwidth (819 GB/s).
  * flat variant: the same transform over ONE concatenated 1-D vector —
    bounds the overhead attributable to per-array kernel scheduling /
    tile padding (59M params spread over ~40 leaves).  If flat ≈ pytree,
    a fused/flattened optimizer state has nothing to recover.

Writes experiments/optimizer_roofline.json and prints it.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import flagship_config  # noqa: E402
from cvc_tpu.config import TrainConfig  # noqa: E402
from cvc_tpu.models import core  # noqa: E402
from cvc_tpu.training import make_optimizer  # noqa: E402

HBM_GBPS = 819e9  # TPU v5e


def time_chain(fn, st, p, g, iters=50, reps=3):
    """Per-iteration time of st,p = fn(st,p,g), CHAINED through the
    loop so every launch depends on the previous one — device time
    accumulates and the single final block captures it (independent
    same-arg launches only measure ~23 us/dispatch enqueue cost
    through the axon relay)."""
    st1, p1 = fn(st, p, g)                # compile + warmup
    jax.block_until_ready((st1, p1))
    best = float("inf")
    for _ in range(reps):
        s, q = st1, p1
        t0 = time.perf_counter()
        for _ in range(iters):
            s, q = fn(s, q, g)
        # a 1-element device->host read of the last output: through the
        # axon relay block_until_ready returns before device completion,
        # but a readback cannot — and the chain makes the last output
        # depend on every launch before it
        np.asarray(jax.tree.leaves(q)[0]).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    cfg = flagship_config(dtype="float32")
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    leaves = jax.tree.leaves(params)
    n_params = sum(int(np.prod(x.shape)) for x in leaves)
    tc = TrainConfig(learning_rate=5e-4, grad_clip=0.1)
    opt = make_optimizer(tc, steps_per_epoch=1000)
    opt_nc = make_optimizer(
        TrainConfig(learning_rate=5e-4, grad_clip=0.0), 1000)

    grads = jax.tree.map(lambda x: x * 1e-3, params)

    def run(o):
        st = jax.jit(o.init)(params)

        @jax.jit
        def apply(st, p, g):
            updates, st = o.update(g, st, p)
            return st, jax.tree.map(jnp.add, p, updates)

        sec = time_chain(apply, st, params, grads)
        return sec * 1e3

    ms_clip = run(opt)
    ms_noclip = run(opt_nc)

    # flat variant: identical transform over one concatenated vector
    flat = jnp.concatenate([x.ravel() for x in leaves])
    gflat = flat * 1e-3

    def run_flat(o):
        st = jax.jit(o.init)(flat)

        @jax.jit
        def apply(st, p, g):
            updates, st = o.update(g, st, p)
            return st, p + updates

        sec = time_chain(apply, st, flat, gflat)
        return sec * 1e3

    ms_flat = run_flat(opt)

    roof_clip = n_params * 32 / HBM_GBPS * 1e3
    roof_noclip = n_params * 28 / HBM_GBPS * 1e3
    out = {
        "n_params": n_params,
        "n_leaves": len(leaves),
        "measured_ms": {"clip+adam": round(ms_clip, 4),
                        "adam_only": round(ms_noclip, 4),
                        "clip+adam_flat_vector": round(ms_flat, 4)},
        "roofline_ms": {"clip+adam": round(roof_clip, 4),
                        "adam_only": round(roof_noclip, 4)},
        "hbm_gbps_assumed": HBM_GBPS / 1e9,
        "pct_of_roofline": {
            "clip+adam": round(100 * roof_clip / ms_clip, 1),
            "adam_only": round(100 * roof_noclip / ms_noclip, 1),
            "flat": round(100 * roof_clip / ms_flat, 1)},
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "experiments",
        "optimizer_roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
