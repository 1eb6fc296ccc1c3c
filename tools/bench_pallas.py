#!/usr/bin/env python
"""Head-to-head: XLA-fused vs Pallas-fused decoder paths on the real chip.

VERDICT r1 next-round item #4: "make Pallas earn its place or document its
retirement with data".  Measures, at the bench flagship shapes
(bench.py: rnn 1024 / att 512 / vocab 8704 / 128 region slots, batch 64):

  * beam-5 decode throughput (captions/s/chip) — the fused beam-decoder
    core kernel (`ops/pallas/decoder_step.py`) vs XLA's own fusion;
  * the cyclical train step (ms) — the train-time fused pieces
    (attention + LSTM gates + masked-xent kernels with custom VJPs).

Writes experiments/pallas_vs_xla.json and prints a small table.  The
use_pallas default follows this data (see PARITY.md "Pallas decision").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

from bench import (BATCH, BEAM, bench_decode, bench_train, flagship_config)
from cvc_tpu.models import core


def main():
    results = {"device": str(jax.devices()[0]), "batch": BATCH, "beam": BEAM}
    # auto = the shipped per-context dispatch (Pallas for generation steps,
    # XLA for the teacher-forced grad scans; ops/dispatch.py) — the other
    # two rows force one path everywhere (the A/B switch).
    for tag, pallas in (("xla", False), ("pallas", True), ("auto", None)):
        cfg = flagship_config(use_pallas=pallas, dtype="bfloat16")
        params = core.init_params(jax.random.PRNGKey(0), cfg)
        t0 = time.time()
        caps = bench_decode(cfg, params)
        tr = bench_train(cfg, params)
        results[tag] = {"caps_per_sec_beam5": round(caps, 1),
                        "train_step_ms": tr["train_step_ms"],
                        "wall_s": round(time.time() - t0, 1)}
        print(f"{tag:7s} decode={caps:8.1f} caps/s  "
              f"train={tr['train_step_ms']:7.3f} ms", flush=True)
    results["decode_speedup_pallas_over_xla"] = round(
        results["pallas"]["caps_per_sec_beam5"]
        / results["xla"]["caps_per_sec_beam5"], 4)
    results["train_speedup_pallas_over_xla"] = round(
        results["xla"]["train_step_ms"]
        / results["pallas"]["train_step_ms"], 4)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "experiments", "pallas_vs_xla.json")
    # keep the measurement history (the default-dispatch decisions cite it)
    prior = json.load(open(out)) if os.path.exists(out) else {}
    prior[f"rerun_{time.strftime('%Y%m%d_%H%M')}"] = results
    json.dump(prior, open(out, "w"), indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
