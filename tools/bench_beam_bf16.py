#!/usr/bin/env python
"""A/B the bf16 beam-select path on the real chip (docs/PERF.md §1).

The B>=256 decode attribution puts the vocab head + select at ~40% of
the call, with the [B*K, V] logits tensor crossing HBM three times
(write, top-k read, logsumexp read) in f32.  `beam_select_bf16=True`
emits bf16 logits (the convert fuses into the head matmul epilogue),
halving that traffic; selection then sees bf16-rounded candidates.

Writes experiments/beam_select_bf16.json with caps/s per batch per arm.

    python tools/bench_beam_bf16.py [--iters 10]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 256, 512])
    a = ap.parse_args()

    import jax
    from bench import (BEAM, caption_flops, flagship_config, bench_decode,
                       PEAK_BF16_FLOPS)
    from cvc_tpu.models import core

    out = {"device": str(jax.devices()[0]), "beam": BEAM, "arms": {}}
    for sel in (False, True):
        cfg = flagship_config(dtype="bfloat16", beam_select_bf16=sel)
        params = core.init_params(jax.random.PRNGKey(0), cfg)
        gflop = caption_flops(cfg, BEAM) / 1e9
        rows = {}
        for b in a.batches:
            caps = bench_decode(cfg, params, batch=b)
            rows[str(b)] = {
                "caps_per_sec": round(caps, 1),
                "mfu": round(caps * gflop * 1e9 / PEAK_BF16_FLOPS, 4)}
            print(f"beam_select_bf16={sel} batch={b}: {caps:.0f} caps/s "
                  f"(MFU {rows[str(b)]['mfu']:.3f})", flush=True)
        out["arms"]["bf16_select" if sel else "f32_select"] = rows

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "experiments", "beam_select_bf16.json")
    json.dump(out, open(path, "w"), indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
