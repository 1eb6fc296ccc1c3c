#!/usr/bin/env python
"""Where do the decode/train milliseconds go?  (VERDICT r2 next-round #3)

jax.profiler device traces don't come back through the axon PJRT tunnel,
so attribution here is by MEASURED DECOMPOSITION: each suspected consumer
is timed as its own chained jitted program on the real chip (outputs feed
inputs so XLA cannot dead-code or reorder; sync via a device->host scalar
read — see memory/axon-tunnel-benchmarking), and the pieces are compared
against the full program and against analytic FLOP/byte rooflines.

Writes experiments/attribution.json; docs/PERF.md narrates the result.

    python tools/attribution_bench.py [--batch 64] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

PEAK_BF16 = 197e12          # v5e MXU peak, bf16
HBM_GBPS = 819e9            # v5e nominal HBM bandwidth


def _timeit(fn, args, sync, iters=10, reps=3):
    """Median-of-reps amortized wall time for a chained program."""
    out = fn(*args)
    sync(out)                      # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = out
        for _ in range(iters):
            o = fn(*args)          # same inputs: no caching observed on
        sync(o)                    # this relay (memory note), chain-free
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes on CPU (smoke test of the harness)")
    ap.add_argument("--dtype", default="bfloat16",
                    help="activation dtype; bench.py's headline is bf16")
    a = ap.parse_args()
    if a.tiny:
        import jax as _j
        _j.config.update("jax_platforms", "cpu")

    from bench import (BEAM, SEQ, caption_flops, flagship_config,
                       random_arrays, train_image_flops)
    from cvc_tpu.config import EvalConfig, TrainConfig
    from cvc_tpu.models import core
    from cvc_tpu.models.decoding import make_decoder

    B = a.batch
    # match bench.py's headline operating point (bf16, auto dispatch)
    cfg = (flagship_config(vocab_size=512, rnn_size=128,
                           input_encoding_size=64, att_hid_size=64,
                           feat_dim=128, num_regions=16, num_classes=32,
                           class_emb_dim=16)
           if a.tiny else flagship_config(dtype=a.dtype, use_pallas=None))
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    arrays = jax.device_put(random_arrays(cfg, B))
    rows = []

    def sync_tokens(o):
        int(jax.device_get(o["tokens"][0, 0]))

    def sync_arr(o):
        float(jax.device_get(jnp.ravel(o)[0]))

    def add(name, ms, flops=None, bytes_=None, note=""):
        row = {"name": name, "ms": round(ms * 1e3, 3)}
        if flops:
            row["mxu_bound_ms"] = round(flops / PEAK_BF16 * 1e3, 3)
        if bytes_:
            row["hbm_bound_ms"] = round(bytes_ / HBM_GBPS * 1e3, 3)
        row["note"] = note
        rows.append(row)
        print(json.dumps(row), flush=True)

    H, E, A, V = (cfg.rnn_size, cfg.input_encoding_size, cfg.att_hid_size,
                  cfg.vocab_size)
    S, D = cfg.total_regions, cfg.feat_dim
    L = SEQ + 1
    R = B * BEAM                     # beam-folded rows

    # ---- full beam decode ------------------------------------------------
    dec = make_decoder(cfg, EvalConfig(beam_size=BEAM, max_length=SEQ,
                                       sample_method="beam"))
    t = _timeit(lambda p, ar: dec(p, ar), (params, arrays), sync_tokens,
                a.iters)
    add("decode/full_beam5", t, flops=B * caption_flops(cfg, BEAM),
        note=f"caps/s={B / t:.0f}")

    # ---- encode ----------------------------------------------------------
    @jax.jit
    def enc(p, ar):
        v_enc, keys, vg = core.encode_regions(
            p, cfg, ar["feats"], ar["box_geom"], ar["region_cls"],
            ar["region_mask"], ar.get("global_feat"))
        return v_enc
    t = _timeit(enc, (params, arrays), sync_arr, a.iters)
    add("decode/encode_regions", t,
        flops=B * (2 * S * D * H + 2 * S * H * A),
        bytes_=B * S * D * 4, note="region proj + keys")

    # ---- vocab head alone (sequential chain of L matmuls) ----------------
    w = params["logit"]["w"].astype(jnp.bfloat16)
    b0 = params["logit"]["b"].astype(jnp.float32)

    @jax.jit
    def head_chain(h0):
        def body(h, _):
            logits = (h @ w).astype(jnp.float32) + b0
            # feed a slice of the output back so each step depends on the
            # last (defeats batching/reordering); cast keeps dtype stable
            h = h + logits[:, :H].astype(h.dtype) * 1e-6
            return h, logits[0, :4]
        h, tail = jax.lax.scan(body, h0, None, length=L)
        return tail
    h0 = jnp.ones((R, H), jnp.bfloat16)
    t = _timeit(head_chain, (h0,), sync_arr, a.iters)
    add("decode/vocab_head_x21", t, flops=L * 2 * R * H * V,
        bytes_=L * (2 * H * V + R * V * 4),
        note=f"[{R},{H}]x[{H},{V}] per step")

    # ---- softmax + two-stage top-k alone ---------------------------------
    @jax.jit
    def select_chain(x0):
        def body(x, _):
            logp = jax.nn.log_softmax(x.astype(jnp.float32))
            lp1, idx1 = jax.lax.top_k(logp, BEAM)          # [R, K]
            x = x + (lp1.sum(-1, keepdims=True) * 1e-9).astype(x.dtype)
            return x, lp1[0]
        x, tail = jax.lax.scan(body, x0, None, length=L)
        return tail
    x0 = jnp.zeros((R, V), jnp.float32)
    t = _timeit(select_chain, (x0,), sync_arr, a.iters)
    add("decode/softmax_topk_x21", t, bytes_=L * R * V * 4 * 2,
        note="log_softmax + per-beam top-k")

    # ---- beam scan minus vocab head (tiny 128-col head) ------------------
    import dataclasses
    cfg_small = dataclasses.replace(cfg, vocab_size=128)
    p_small = dict(params)
    p_small["logit"] = {"w": params["logit"]["w"][:, :128],
                       "b": params["logit"]["b"][:128]}
    dec_small = make_decoder(cfg_small, EvalConfig(
        beam_size=BEAM, max_length=SEQ, sample_method="beam"))
    t = _timeit(lambda p, ar: dec_small(p, ar), (p_small, arrays),
                sync_tokens, a.iters)
    add("decode/beam_scan_V128", t,
        note="full beam decode with a 128-col head: scan minus head cost")

    if a.train:
        from cvc_tpu.training import TrainState, make_optimizer
        from cvc_tpu.training.step import make_train_step
        tc = TrainConfig(learning_rate=5e-4, grad_clip=0.1,
                         donate_state=False)
        opt = make_optimizer(tc, 1000)
        state = TrainState.create(params, opt)
        step = make_train_step(cfg, tc, opt)
        rng = jax.random.PRNGKey(0)

        def sync_m(o):
            float(jax.device_get(o[1]["loss"]))
        t = _timeit(lambda s, ar, r: step(s, ar, r),
                    (state, arrays, rng), sync_m, a.iters)
        add("train/full_cyclical_step", t,
            flops=B * train_image_flops(cfg),
            note=f"imgs/s={B / t:.0f}")

        from cvc_tpu.models.cyclical import cyclical_loss

        @jax.jit
        def fwd(p, ar):
            loss, _ = cyclical_loss(p, cfg, ar, rng=None, train=False,
                                    enable_cycle=True)
            return loss
        t = _timeit(fwd, (params, arrays), sync_arr, a.iters)
        add("train/forward_only", t, flops=B * train_image_flops(cfg) / 3)

        @jax.jit
        def fwd_nocycle(p, ar):
            loss, _ = cyclical_loss(p, cfg, ar, rng=None, train=False,
                                    enable_cycle=False)
            return loss
        t = _timeit(fwd_nocycle, (params, arrays), sync_arr, a.iters)
        add("train/forward_decode_only", t)

        @jax.jit
        def grad_nocycle(p, ar):
            def lf(p):
                loss, _ = cyclical_loss(p, cfg, ar, rng=None, train=False,
                                        enable_cycle=False)
                return loss
            return jax.grad(lf)(p)["logit"]["b"][:4]
        t = _timeit(grad_nocycle, (params, arrays), sync_arr, a.iters)
        add("train/grad_decode_only", t, note="fwd+bwd, no cycle")

    out = {"batch": B, "beam": BEAM, "rows": rows}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "experiments",
        f"attribution_b{B}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
