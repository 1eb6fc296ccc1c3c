#!/usr/bin/env python
"""Long cycle-ablation with periodic teacher-forced attention probes
(decoder alpha accuracy + localizer beta accuracy every 10 epochs).
Writes experiments/cycle_ablation_results.json.  See cycle_ablation.py
for the short variant."""

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


def main(epochs=100, images=12000):
    mc = ModelConfig(vocab_size=128, input_encoding_size=128, rnn_size=256,
                     att_hid_size=128, feat_dim=512, num_regions=36,
                     seq_length=16, num_classes=24, class_emb_dim=32,
                     drop_prob_lm=0.3)
    print("building datasets...", flush=True)
    train_ds = make_synthetic_dataset(num_images=images, num_regions=36,
                                      feat_dim=512, seq_length=16,
                                      split="train", seed=0)
    val_ds = make_synthetic_dataset(num_images=256, num_regions=36,
                                    feat_dim=512, seq_length=16,
                                    split="val", seed=0)
    mc.vocab_size = train_ds.vocab.padded_size(128)
    dd = DeviceDataset(train_ds, mc)   # ONE upload; fixes the per-batch
    print(f"device dataset: {dd.nbytes()/1e9:.2f} GB, {dd.num_pairs} pairs",
          flush=True)                  # host-leak OOM and speeds epochs

    def run(enable_cycle):
        tc = TrainConfig(learning_rate=1e-3, grad_clip=5.0,
                         learning_rate_decay_start=int(epochs * 0.7),
                         learning_rate_decay_every=max(epochs // 7, 1),
                         learning_rate_decay_rate=0.5,
                         enable_cycle=enable_cycle)
        opt = make_optimizer(tc, max(images // 64, 1))
        params = core.init_params(jax.random.PRNGKey(0), mc)
        state = TrainState.create(params, opt)
        step = make_resident_train_step(mc, tc, opt)
        rng = jax.random.PRNGKey(1)
        tag = "cycle" if enable_cycle else "plain"
        t0 = time.time()
        for epoch in range(epochs):
            for idx in dd.epoch_batches(64, seed=epoch):
                state, m = step(state, dd.data, jnp.asarray(idx), rng)
            if epoch % 10 == 9:
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
        return {k: v for k, v in res.items() if isinstance(v, (int, float))}

    print("== plain ==", flush=True)
    plain = run(False)
    print(json.dumps(plain, indent=1), flush=True)
    print("== cycle ==", flush=True)
    cycle = run(True)
    print(json.dumps(cycle, indent=1), flush=True)
    print("SUMMARY", flush=True)
    for k in ("CIDEr", "F1_all", "F1_loc", "attn_accuracy",
              "F1_all_localizer", "F1_loc_localizer"):
        print(f"  {k}: plain={plain.get(k, 0):.4f} "
              f"cycle={cycle.get(k, 0):.4f}", flush=True)
    json.dump({"plain": plain, "cycle": cycle},
              open("experiments/cycle_ablation_results.json", "w"), indent=2)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
