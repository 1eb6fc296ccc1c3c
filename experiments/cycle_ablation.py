#!/usr/bin/env python
"""Cycle ablation: reproduce the reference's load-bearing qualitative
result (SURVEY.md §6) on the synthetic grounded-captioning world —
cyclical training should substantially raise grounding F1 at roughly
equal caption metrics vs the no-cycle baseline.

    python experiments/cycle_ablation.py [--epochs N] [--images N]

Writes experiments/cycle_ablation_results.json.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cvc_tpu.config import EvalConfig, ModelConfig, TrainConfig
from cvc_tpu.data.pipeline import make_batches
from cvc_tpu.data.synthetic import make_synthetic_dataset
from cvc_tpu.evaluation.evaluator import (evaluate_split,
                                          gt_sentence_attention_eval)
from cvc_tpu.models import core
from cvc_tpu.training import TrainState, make_optimizer, make_train_step


def run(enable_cycle: bool, epochs: int, train_ds, val_ds, mc, seed=0):
    tc = TrainConfig(learning_rate=1e-3, grad_clip=5.0,
                     learning_rate_decay_start=epochs // 3,
                     learning_rate_decay_every=max(epochs // 6, 1),
                     learning_rate_decay_rate=0.6,
                     enable_cycle=enable_cycle, seed=seed)
    steps_per_epoch = max(
        sum(len(train_ds.get(i).captions) for i in range(len(train_ds))) // 64,
        1)
    opt = make_optimizer(tc, steps_per_epoch)
    params = core.init_params(jax.random.PRNGKey(seed), mc)
    state = TrainState.create(params, opt)
    step = make_train_step(mc, tc, opt)
    rng = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    for epoch in range(epochs):
        for b in make_batches(train_ds, mc, 64, shuffle=True, seed=epoch):
            arrays = {k: jnp.asarray(v) for k, v in b.model_inputs().items()}
            state, m = step(state, arrays, rng)
        if epoch % 10 == 9:
            print(f"  [{'cycle' if enable_cycle else 'plain'}] epoch {epoch}"
                  f" loss={float(m['loss']):.3f}"
                  f" ent={float(m['attention_entropy']):.3f}"
                  f" ({time.time()-t0:.0f}s)", flush=True)
    ec = EvalConfig(beam_size=3, sample_method="beam",
                    max_length=mc.seq_length, grounding_source="decoder")
    res = evaluate_split(state.params, mc, ec, val_ds, 64)
    res.update(gt_sentence_attention_eval(state.params, mc, val_ds, 64))
    ec_loc = EvalConfig(beam_size=3, sample_method="beam",
                        max_length=mc.seq_length, language_eval=False,
                        grounding_source="localizer")
    loc = evaluate_split(state.params, mc, ec_loc, val_ds, 64)
    res["F1_all_localizer"] = loc["F1_all"]
    res["F1_loc_localizer"] = loc["F1_loc"]
    return {k: v for k, v in res.items() if isinstance(v, (int, float))}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--images", type=int, default=1500)
    args = p.parse_args()

    mc = ModelConfig(vocab_size=128, input_encoding_size=256, rnn_size=512,
                     att_hid_size=256, feat_dim=512, num_regions=36,
                     seq_length=16, num_classes=24, class_emb_dim=32,
                     drop_prob_lm=0.3)
    train_ds = make_synthetic_dataset(
        num_images=args.images, num_regions=36, feat_dim=512, seq_length=16,
        split="train", seed=0)
    val_ds = make_synthetic_dataset(
        num_images=256, num_regions=36, feat_dim=512, seq_length=16,
        split="val", seed=0)
    mc.vocab_size = train_ds.vocab.padded_size(128)

    print("== no cycle ==", flush=True)
    plain = run(False, args.epochs, train_ds, val_ds, mc)
    print(json.dumps(plain, indent=2), flush=True)
    print("== cycle ==", flush=True)
    cycle = run(True, args.epochs, train_ds, val_ds, mc)
    print(json.dumps(cycle, indent=2), flush=True)

    out = {"plain": plain, "cycle": cycle,
           "epochs": args.epochs, "images": args.images}
    with open("experiments/cycle_ablation_results.json", "w") as f:
        json.dump(out, f, indent=2)
    print("\nSUMMARY")
    for k in ("CIDEr", "F1_all", "F1_loc", "attn_accuracy"):
        print(f"  {k}: plain={plain.get(k, 0):.4f} "
              f"cycle={cycle.get(k, 0):.4f}")


if __name__ == "__main__":
    main()
