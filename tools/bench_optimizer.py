#!/usr/bin/env python
"""Isolate the optimizer sweep (grad-clip + Adam over the flagship param
pytree) on the real chip and compare it to its HBM roofline.

PERF.md §3 lists "Adam + grad-clip elementwise sweeps (~0.7 ms/step pure
HBM)" as remaining train-step headroom (VERDICT r3 next-round #6).  Before
engineering a fused optimizer, measure whether there is anything to win:

  * measured: jitted `opt.update + apply_updates` alone (donated state,
    like the real step), exactly the transform the train step runs
    (training/optimizer.py).
  * roofline: minimum HBM traffic at f32 — clip needs one full read of
    the grads for the global norm (a reduction that must complete before
    any update), then the update reads (g, p, m, v) and writes (p, m, v):
    32 B/param with clip, 28 B/param without — divided by the v5e HBM
    bandwidth (819 GB/s).
  * flat variant: the same transform over ONE concatenated 1-D vector —
    bounds the overhead attributable to per-array kernel scheduling /
    tile padding (45M params spread over 22 leaves).  If flat ≈ pytree,
    a fused/flattened optimizer state has nothing to recover.

Timing protocol (the v1 harness was measurement-broken): every update
returns a SCALAR checksum and the sync is `float(chk)` — through the
axon relay, reading an element of a large output buffer (v1's
`np.asarray(leaf)[:1]`) can return before device execution finishes
(v1 "measured" the flat variant at 4781% of the HBM roofline, i.e.
38 TB/s — physically impossible; that was host enqueue cost).  A
device->host SCALAR read is the one sync the relay honors (same
technique as bench.py's `float(m["loss"])`).  An empty-program control
measures the enqueue floor so it can be subtracted from the reading.

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
    """Per-iteration time of st,p,chk = fn(st,p,g), CHAINED through the
    loop so every launch depends on the previous one, synced by a
    device->host read of the final SCALAR output (see module doc)."""
    st1, p1, chk = fn(st, p, g)            # compile + warmup
    float(chk)
    best = float("inf")
    for _ in range(reps):
        s, q = st1, p1
        t0 = time.perf_counter()
        for _ in range(iters):
            s, q, chk = fn(s, q, g)
        float(chk)
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

        # donate state+params like the real train step; the scalar
        # checksum (one leaf's first element) costs nothing and forces
        # the relay to wait for program completion on readback
        @jax.jit
        def apply(st, p, g):
            updates, st = o.update(g, st, p)
            p = jax.tree.map(jnp.add, p, updates)
            return st, p, jax.tree.leaves(p)[0].ravel()[0]

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
            p = p + updates
            return st, p, p[0]

        sec = time_chain(apply, st, flat, gflat)
        return sec * 1e3

    ms_flat = run_flat(opt)

    # enqueue floor: a near-empty chained program with a scalar sync —
    # the per-dispatch cost the relay adds regardless of program size
    @jax.jit
    def noop(st, p, g):
        return st, p + 1.0, (p + 1.0)[0]

    z = jnp.zeros((8,), jnp.float32)
    ms_floor = time_chain(noop, z, z, z) * 1e3

    roof_clip = n_params * 32 / HBM_GBPS * 1e3
    roof_noclip = n_params * 28 / HBM_GBPS * 1e3
    out = {
        "n_params": n_params,
        "n_leaves": len(leaves),
        "measured_ms": {"clip+adam": round(ms_clip, 4),
                        "adam_only": round(ms_noclip, 4),
                        "clip+adam_flat_vector": round(ms_flat, 4),
                        "enqueue_floor": round(ms_floor, 4)},
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
