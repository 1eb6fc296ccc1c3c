#!/usr/bin/env python
"""Regenerate the README batch-scaling table on the current chip.

Measures beam-5 decode (caps/s) and the cyclical train step (img/s, MFU)
at B in {64, 256, 512} with the shipped auto dispatch.  Fresh params per
train point (the step donates its state).

    python tools/throughput_table.py [--video]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

import bench as B
from bench import (BEAM, PEAK_BF16_FLOPS, bench_decode, bench_train,
                   caption_flops, flagship_config)
from cvc_tpu.models import core


def main():
    kw = (dict(num_frames=10, global_feat_dim=3072)
          if "--video" in sys.argv else {})
    cfg = flagship_config(dtype="bfloat16", **kw)
    gf = caption_flops(cfg, BEAM) / 1e9
    rows = []
    for b in (64, 256, 512):
        params = core.init_params(jax.random.PRNGKey(0), cfg)
        caps = bench_decode(cfg, params, batch=b)
        B.BATCH = b
        params = core.init_params(jax.random.PRNGKey(0), cfg)
        tr = bench_train(cfg, params)
        rows.append((b, caps, caps * gf * 1e9 / PEAK_BF16_FLOPS,
                     tr["train_images_per_sec"], tr["train_step_ms"],
                     tr["train_mfu"]))
        print(f"B={b:4d}  decode {caps:7.1f} caps/s ({rows[-1][2]:.0%} MFU)"
              f"   train {tr['train_images_per_sec']:7.1f} img/s "
              f"{tr['train_step_ms']:6.2f} ms ({tr['train_mfu']:.0%} MFU)",
              flush=True)


if __name__ == "__main__":
    main()
