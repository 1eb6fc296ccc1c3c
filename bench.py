#!/usr/bin/env python
"""Headline benchmark: captions/sec/chip (beam 5) + cyclical train step.

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", "vs_baseline_measured",
   "mfu", "gflop_per_caption", "train_images_per_sec",
   "train_tokens_per_sec", "train_step_ms", "train_mfu", "dtype"}

Configuration mirrors BASELINE.json's headline metric: full-size decoder
(rnn 1024 / emb 512 / att 512), 100 region proposals (padded to 128 slots
for MXU tiling), vocab 8704, seq 20, batch 64, beam 5, generation entirely
on device via the vectorized beam search.  The cyclical TRAIN step (the
paper's actual hot loop, SURVEY.md §3.1) is benchmarked in the same run.

Baselines:
  * vs_baseline — ratio against the MEASURED reference-shaped torch
    decoder (tools/measure_torch_baseline.py writes
    BASELINE_MEASURED.json; torch-CPU on this host — an anchor for the
    reference's host-bound per-step structure, not a V100 reproduction;
    no GPU exists in this sandbox).
  * vs_baseline_estimate_v100 — a documented engineering ESTIMATE of
    the reference's per-image Python beam loop on a V100-class GPU
    (~150 caps/s); not a measurement — kept only for continuity with
    BASELINE.md, always secondary to the measured ratio.

MFU: analytic matmul FLOPs (computed from the model dims below) divided
by the v5e bf16 peak of 197 TFLOP/s.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from cvc_tpu.config import EvalConfig, ModelConfig, TrainConfig
from cvc_tpu.models import core
from cvc_tpu.models.decoding import make_decoder

REF_BASELINE_CAPS_PER_SEC = 150.0  # documented estimate; see docstring
PEAK_BF16_FLOPS = 197e12           # TPU v5e peak (bf16)

BATCH = 64
BEAM = 5
SEQ = 20


def flagship_config(**kw) -> ModelConfig:
    base = dict(vocab_size=8704, input_encoding_size=512, rnn_size=1024,
                att_hid_size=512, feat_dim=2048, num_regions=128,
                num_frames=1, seq_length=SEQ, num_classes=512,
                class_emb_dim=128, drop_prob_lm=0.5,
                scan_unroll=7,         # generation scans: measured best
                train_scan_unroll=SEQ + 1)  # grad scans: full unroll wins
                #                             (13.8 vs 14.6 ms, XLA path)
    base.update(kw)
    return ModelConfig(**base)


def random_arrays(cfg: ModelConfig, batch: int, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    S = cfg.total_regions
    T = cfg.max_tokens
    tokens = np.zeros((batch, T), np.int32)
    tokens[:, 0] = 1
    tokens[:, 1:SEQ + 1] = rng.integers(4, cfg.vocab_size, (batch, SEQ))
    tokens[:, SEQ + 1] = 2
    # mask: 100 live proposals per frame (reference's proposal budget)
    live = (np.arange(S)[None, :] % cfg.num_regions) < 100
    out = dict(
        feats=jnp.asarray(rng.normal(size=(batch, S, cfg.feat_dim)),
                          jnp.float32),
        box_geom=jnp.asarray(rng.uniform(size=(batch, S, 5)), jnp.float32),
        region_cls=jnp.asarray(
            rng.integers(0, cfg.num_classes, size=(batch, S)), jnp.int32),
        region_mask=jnp.asarray(live.astype(np.float32)
                                * np.ones((batch, 1), np.float32)),
        tokens=jnp.asarray(tokens),
        token_mask=jnp.ones((batch, T), jnp.float32),
    )
    if cfg.global_feat_dim:
        out["global_feat"] = jnp.asarray(
            rng.normal(size=(batch, cfg.global_feat_dim)), jnp.float32)
    return out


# ---------------------------------------------------------------------------
# Analytic FLOPs (matmul terms only; elementwise excluded -> conservative)
# ---------------------------------------------------------------------------

def per_row_step_flops(cfg: ModelConfig) -> float:
    """One autoregressive decoder step for one (batch*beam) row."""
    H, E, A, V, S = (cfg.rnn_size, cfg.input_encoding_size,
                     cfg.att_hid_size, cfg.vocab_size, cfg.total_regions)
    att_lstm = 8 * H * (E + 2 * H)        # emb/h_lang/h_att gate matmuls
    attention = 2 * H * A + 4 * S * A + 2 * S * H
    lang_lstm = 24 * H * H                # ctx/h_att/h_lang gate matmuls
    logits = 2 * H * V
    return float(att_lstm + attention + lang_lstm + logits)


def encode_flops(cfg: ModelConfig) -> float:
    S = cfg.total_regions
    return float(2 * S * cfg.feat_dim * cfg.rnn_size            # region proj
                 + 2 * S * cfg.rnn_size * cfg.att_hid_size)     # keys


def caption_flops(cfg: ModelConfig, beam: int) -> float:
    L = cfg.seq_length + 1
    return encode_flops(cfg) + beam * L * per_row_step_flops(cfg)


def train_image_flops(cfg: ModelConfig) -> float:
    """Cyclical train step per image: forward (decode scan + localizer +
    reconstruct scan) x3 for fwd+bwd."""
    L = cfg.max_tokens - 1
    S, A, E = cfg.total_regions, cfg.att_hid_size, cfg.input_encoding_size
    localizer = L * (2 * E * A + 2 * S * A + 2 * S * cfg.rnn_size)
    fwd = encode_flops(cfg) + 2 * L * per_row_step_flops(cfg) + localizer
    return 3.0 * fwd


# ---------------------------------------------------------------------------

def bench_decode(cfg, params, batch: int = BATCH) -> float:
    decoder = make_decoder(cfg, EvalConfig(beam_size=BEAM, max_length=SEQ,
                                           sample_method="beam"))
    arrays = random_arrays(cfg, batch)
    out = decoder(params, arrays)          # compile + warmup
    int(out["tokens"][0, 0])
    # Throughput: submit a stream of batches and sync once — serving
    # pipelines dispatch, per-call blocking would understate ~3x here.
    # Final sync is a device->host scalar read (see bench_train).
    N_ITERS = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            out = decoder(params, arrays)
        int(out["tokens"][0, 0])
        best = min(best, (time.perf_counter() - t0) / N_ITERS)
    return batch / best


def bench_serving_sustained(cfg, params, batch: int = 256,
                            secs: float = 30.0) -> float:
    """Sustained caps/s with fresh host inputs, depth-4 pipelined
    submission (device_put of batch i+1 overlaps execution of batch i;
    the sync on the oldest in-flight result is the backpressure)."""
    from collections import deque
    decoder = make_decoder(cfg, EvalConfig(beam_size=BEAM, max_length=SEQ,
                                           sample_method="beam"))
    rng = np.random.default_rng(7)
    S = cfg.total_regions
    live = ((np.arange(S)[None, :] % cfg.num_regions) < 100)
    hosts = []
    for s in range(4):                      # distinct host batches, cycled
        hosts.append(dict(
            feats=rng.normal(size=(batch, S, cfg.feat_dim))
            .astype(np.float32),
            box_geom=rng.uniform(size=(batch, S, 5)).astype(np.float32),
            region_cls=rng.integers(0, cfg.num_classes, size=(batch, S))
            .astype(np.int32),
            region_mask=(live * np.ones((batch, 1))).astype(np.float32)))

    def put(h):
        return {k: jnp.asarray(v) for k, v in h.items()}

    r = decoder(params, put(hosts[0]))      # compile + warm
    int(r["tokens"][0, 0])
    inflight: deque = deque()
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < secs:
        inflight.append(decoder(params, put(hosts[n % 4])))
        if len(inflight) >= 4:
            int(inflight.popleft()["tokens"][0, 0])
        n += 1
    while inflight:
        int(inflight.popleft()["tokens"][0, 0])
    return batch * n / (time.perf_counter() - t0)


def bench_train(cfg, params, batch: int | None = None) -> dict:
    from cvc_tpu.training import TrainState, make_optimizer
    from cvc_tpu.training.step import make_train_step
    batch = BATCH if batch is None else batch
    tc = TrainConfig(learning_rate=5e-4, grad_clip=0.1, donate_state=True)
    opt = make_optimizer(tc, steps_per_epoch=1000)
    state = TrainState.create(params, opt)
    step = make_train_step(cfg, tc, opt)
    arrays = random_arrays(cfg, batch, seed=1)
    rng = jax.random.PRNGKey(0)
    state, m = step(state, arrays, rng)    # compile + warmup
    float(m["loss"])
    N_ITERS = 20
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            state, m = step(state, arrays, rng)
        # hard sync via a device->host scalar read: through the axon relay,
        # block_until_ready on buffers of a donated-state step can return
        # before execution finishes and report absurd times
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / N_ITERS)
    toks = float(batch * (cfg.seq_length + 1))
    return {"train_step_ms": round(best * 1e3, 3),
            "train_images_per_sec": round(batch / best, 1),
            "train_tokens_per_sec": round(toks / best, 1),
            "train_mfu": round(batch * train_image_flops(cfg)
                               / best / PEAK_BF16_FLOPS, 4)}


def main():
    # bf16 is the default serving operating point: convergence and caption
    # quality were verified equivalent to f32 on the synthetic world
    # (loss 3.650 vs 3.652, CIDEr within noise) and it is ~6% faster.
    dtype = "float32" if "--fp32" in sys.argv else "bfloat16"
    # use_pallas=None = auto, resolved per context (Pallas for generation
    # steps, XLA for the teacher-forced grad scans; see ops/dispatch.py
    # and experiments/pallas_vs_xla.json).  --no-pallas / --pallas force
    # one path everywhere for A/B runs.
    up = False if "--no-pallas" in sys.argv else (
        True if "--pallas" in sys.argv else None)
    video = "--video" in sys.argv
    # --obj-interact: region self-attention in the encoder (GVD's
    # --obj_interact flag) — one transformer layer over the S region slots
    oi = {"obj_interact": True} if "--obj-interact" in sys.argv else {}
    if video:
        # ANet-Entities flavor: 10 frames x 100 proposals (padded to
        # 10x128 slots) + a 3072-d segment appearance+motion feature
        cfg = flagship_config(use_pallas=up, dtype=dtype, num_frames=10,
                              global_feat_dim=3072, **oi)
    else:
        cfg = flagship_config(use_pallas=up, dtype=dtype, **oi)
    params = core.init_params(jax.random.PRNGKey(0), cfg)

    caps_per_sec = bench_decode(cfg, params)
    gflop_caption = caption_flops(cfg, BEAM) / 1e9
    out = {
        "metric": ("captions_per_sec_per_chip_beam5_anet_video" if video
                   else "captions_per_sec_per_chip_beam5_flickr30k")
        + ("_obj_interact" if oi else ""),
        "value": round(caps_per_sec, 2),
        "unit": "captions/s/chip",
        "mfu": round(caps_per_sec * gflop_caption * 1e9 / PEAK_BF16_FLOPS,
                     4),
        "gflop_per_caption": round(gflop_caption, 3),
        "dtype": dtype,
    }
    # vs_baseline is the MEASURED ratio (torch-CPU reference-shaped
    # decoder on this host); the V100-class guess is demoted to a
    # clearly-named estimate field.  The video flavor carries neither —
    # both baselines are flickr-shaped.
    mb = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "BASELINE_MEASURED.json")
    if os.path.exists(mb) and not video:
        measured = json.load(open(mb))
        ref = float(measured["torch_cpu_caps_per_sec"])
        out["vs_baseline"] = round(caps_per_sec / ref, 1)
        out["baseline_measured_caps_per_sec"] = ref
        out["vs_baseline_estimate_v100"] = round(
            caps_per_sec / REF_BASELINE_CAPS_PER_SEC, 3)

    if "--no-serving" not in sys.argv and not video:
        # Serving operating point: batch 256 saturates the MXU rows the
        # 64-batch baseline point leaves idle (~ +30% caps/s, ~30% MFU;
        # plateaus by batch 512).  Headline stays batch 64 for cross-round
        # comparability with BENCH_r01.
        caps256 = bench_decode(cfg, params, batch=256)
        out["serving_batch"] = 256
        out["serving_caps_per_sec"] = round(caps256, 2)
        out["serving_mfu"] = round(
            caps256 * gflop_caption * 1e9 / PEAK_BF16_FLOPS, 4)
        # SUSTAINED serving (VERDICT r4 #4): fresh HOST inputs every
        # call, 4 batches in flight (Captioner pipeline_depth=4 at the
        # tensor level), >=30 s wall — the number a real client sees
        # including input transfer, vs the device-only resident number
        # above.  Ladder + blocking point: tools/bench_serving.py ->
        # experiments/serving_pipeline.json.
        out["serving_sustained_caps_per_sec"] = round(
            bench_serving_sustained(cfg, params, batch=256, secs=30.0), 2)

    if "--no-train" not in sys.argv:
        out.update(bench_train(cfg, params))
        if not video:
            # large-batch operating point: B=64 leaves half the MXU rows
            # idle; production training runs at 256-512 (configs/c5)
            from cvc_tpu.models import core as _core
            p2 = _core.init_params(jax.random.PRNGKey(0), cfg)
            tr = bench_train(cfg, p2, batch=256)
            out["train_serving_batch"] = 256
            out["train_serving_images_per_sec"] = tr["train_images_per_sec"]
            out["train_serving_mfu"] = tr["train_mfu"]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
