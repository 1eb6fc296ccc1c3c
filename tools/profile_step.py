#!/usr/bin/env python
"""Capture a jax.profiler trace of the train step and/or beam decode
(SURVEY.md §5.1 — the reference has no profiling; view the output in
TensorBoard or Perfetto).

    python tools/profile_step.py --out /tmp/trace [--beam] [--steps 5]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/cvc_trace")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--beam", action="store_true",
                   help="profile beam-5 generation instead of training")
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()

    from bench import flagship_config, random_arrays
    from cvc_tpu.config import EvalConfig, TrainConfig
    from cvc_tpu.models import core
    from cvc_tpu.models.decoding import make_decoder
    from cvc_tpu.training import TrainState, make_optimizer, make_train_step

    cfg = flagship_config()
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    arrays = jax.device_put(random_arrays(cfg, args.batch))

    if args.beam:
        fn = make_decoder(cfg, EvalConfig(beam_size=5, max_length=20,
                                          sample_method="beam"))
        run = lambda s: fn(params, arrays)["tokens"]
    else:
        tc = TrainConfig(learning_rate=1e-4)
        opt = make_optimizer(tc, 100)
        state = TrainState.create(params, opt)
        state = jax.device_put(state)
        step = make_train_step(cfg, tc, opt)
        rng = jax.random.PRNGKey(1)

        def run(s):
            nonlocal state
            state, m = step(state, arrays, rng)
            return m["loss"]

    jax.block_until_ready(run(0))  # compile outside the trace
    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    for i in range(args.steps):
        out = run(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.steps
    jax.profiler.stop_trace()
    mode = "beam5 decode" if args.beam else "train step"
    print(f"{mode}: {dt*1e3:.2f} ms/iter (batch {args.batch}); "
          f"trace -> {args.out}")


if __name__ == "__main__":
    main()
