#!/usr/bin/env python
"""Cycle ablation v2: anti-memorization configuration.

Previous runs showed total memorization (train loss << the random-filler
entropy floor) killing every attention-alignment signal.  This version:
  * 40k images (device-resident — one HBM upload),
  * small decoder (rnn 128) + dropout 0.4 + weight decay 1e-4,
  * optional decoder-pretrain staging (cycle from epoch `cycle_after`),
  * probes every 5 epochs: val decoder-alpha and localizer-beta accuracy.
Writes experiments/cycle_ablation_results.json.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cvc_tpu.config import EvalConfig, ModelConfig, TrainConfig
from cvc_tpu.data.device_data import DeviceDataset
from cvc_tpu.data.synthetic import make_synthetic_dataset
from cvc_tpu.evaluation.evaluator import (evaluate_split,
                                          gt_sentence_attention_eval)
from cvc_tpu.models import core
from cvc_tpu.training import TrainState, make_optimizer
from cvc_tpu.training.step import make_resident_train_step


def main(epochs=60, images=40000, batch=128):
    import os
    starve_global = os.environ.get("CVC_ABLATION_NO_GLOBAL", "0") == "1"
    mc = ModelConfig(vocab_size=128, input_encoding_size=64, rnn_size=192,
                     att_hid_size=96, feat_dim=512, num_regions=36,
                     seq_length=16, num_classes=24, class_emb_dim=16,
                     drop_prob_lm=0.4, use_global_feat=not starve_global)
    print("use_global_feat:", mc.use_global_feat, flush=True)
    print("building datasets...", flush=True)
    train_ds = make_synthetic_dataset(num_images=images, num_regions=36,
                                      feat_dim=512, seq_length=16,
                                      split="train", seed=0)
    val_ds = make_synthetic_dataset(num_images=256, num_regions=36,
                                    feat_dim=512, seq_length=16,
                                    split="val", seed=0)
    mc.vocab_size = train_ds.vocab.padded_size(128)
    dd = DeviceDataset(train_ds, mc)
    print(f"device dataset: {dd.nbytes()/1e9:.2f} GB, {dd.num_pairs} pairs",
          flush=True)
    steps_per_epoch = dd.num_pairs // batch

    def run(enable_cycle, cycle_after=0):
        tc = TrainConfig(learning_rate=2e-3, grad_clip=5.0,
                         weight_decay=1e-4,
                         learning_rate_decay_start=int(epochs * 0.7),
                         learning_rate_decay_every=max(epochs // 7, 1),
                         learning_rate_decay_rate=0.5,
                         enable_cycle=enable_cycle)
        opt = make_optimizer(tc, steps_per_epoch)
        params = core.init_params(jax.random.PRNGKey(0), mc)
        state = TrainState.create(params, opt)
        from dataclasses import replace
        steps = {
            False: make_resident_train_step(
                mc, replace(tc, enable_cycle=False), opt),
            True: make_resident_train_step(
                mc, replace(tc, enable_cycle=True), opt),
        }
        rng = jax.random.PRNGKey(1)
        tag = "cycle" if enable_cycle else "plain"
        t0 = time.time()
        for epoch in range(epochs):
            step = steps[enable_cycle and epoch >= cycle_after]
            for idx in dd.epoch_batches(batch, seed=epoch):
                state, m = step(state, dd.data, jnp.asarray(idx), rng)
            if epoch % 5 == 4:
                probe = gt_sentence_attention_eval(state.params, mc, val_ds,
                                                   64)
                probe_l = gt_sentence_attention_eval(state.params, mc,
                                                     val_ds, 64,
                                                     source="localizer")
                print(f"  [{tag}] ep{epoch} loss={float(m['loss']):.3f}"
                      f" ent={float(m['attention_entropy']):.3f}"
                      f" attn_acc={probe['attn_accuracy']:.3f}"
                      f" loc_acc={probe_l['attn_accuracy']:.3f}"
                      f" ({time.time()-t0:.0f}s)", flush=True)
        ec = EvalConfig(beam_size=3, sample_method="beam", max_length=16,
                        grounding_source="decoder")
        res = evaluate_split(state.params, mc, ec, val_ds, 64)
        res.update(gt_sentence_attention_eval(state.params, mc, val_ds, 64))
        ec_loc = EvalConfig(beam_size=3, sample_method="beam", max_length=16,
                            language_eval=False,
                            grounding_source="localizer")
        loc = evaluate_split(state.params, mc, ec_loc, val_ds, 64)
        res["F1_all_localizer"] = loc["F1_all"]
        res["F1_loc_localizer"] = loc["F1_loc"]
        # keep the arm's params for post-hoc diagnosis (e.g. "does the
        # reconstruction loss actually depend on v̂?")
        from cvc_tpu.training.checkpoint import CheckpointManager
        ck = CheckpointManager(f"experiments/ckpt_{tag}")
        ck.save(int(state.step), state, infos={"arm": tag})
        ck.wait()
        return {k: v for k, v in res.items() if isinstance(v, (int, float))}

    print("== plain ==", flush=True)
    plain = run(False)
    print(json.dumps(plain, indent=1), flush=True)
    print("== cycle (staged from ep10) ==", flush=True)
    cycle = run(True, cycle_after=10)
    print(json.dumps(cycle, indent=1), flush=True)
    print("SUMMARY", flush=True)
    for k in ("CIDEr", "F1_all", "F1_loc", "attn_accuracy",
              "F1_all_localizer", "F1_loc_localizer"):
        print(f"  {k}: plain={plain.get(k, 0):.4f} "
              f"cycle={cycle.get(k, 0):.4f}", flush=True)
    json.dump({"plain": plain, "cycle": cycle, "images": images,
               "epochs": epochs},
              open("experiments/cycle_ablation_results.json", "w"), indent=2)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
