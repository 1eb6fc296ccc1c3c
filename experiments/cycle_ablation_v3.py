#!/usr/bin/env python
"""Cycle ablation v3: multi-seed, shared-warmup branch experiment.

Round-1 diagnosis (experiments/README.md): in the "sorted" synthetic
world, class words are predictable from the class SET (ascending-id
order), so captioning never needs word-aligned attention at the steps the
grounding protocol grades — the paper's precondition is absent, and both
arms sit at chance.  v3 restores the precondition with the new world
knobs (word_order="shuffled", unique_colors=True): the next object word
is only predictable by attending the region whose color was just emitted.

Design (VERDICT r1, next-round item #1):
  * N seeds (default 3);
  * per seed, a PLAIN warmup of W epochs, then the state is snapshot and
    BOTH arms branch from it (isolates the cycle's marginal effect from
    warmup variance);
  * arm "plain": cycle stays off;  arm "cycle": cycle on from the branch
    (this is --cycle_after = W on the transient-alignment window found in
    round 1);
  * probes every PROBE epochs: teacher-forced decoder attn accuracy +
    localizer-beta accuracy on val;
  * final: beam-3 caption metrics + grounding F1s (decoder alpha AND
    localizer beta) + the v-hat dependence diagnostic (reconstruction XE
    with learned beta vs uniform beta — if the cycle works, the learned
    localization must lower the reconstruction loss).

Writes experiments/cycle_ablation_v3_results.json incrementally.
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from cvc_tpu.config import EvalConfig, ModelConfig, TrainConfig
from cvc_tpu.data.device_data import DeviceDataset
from cvc_tpu.data.pipeline import make_batches
from cvc_tpu.data.synthetic import make_synthetic_dataset
from cvc_tpu.evaluation.evaluator import (evaluate_split,
                                          gt_sentence_attention_eval)
from cvc_tpu.models import core
from cvc_tpu.training import TrainState, make_optimizer
from cvc_tpu.training.step import make_resident_train_step

RESULTS = os.environ.get("CVC_V3_RESULTS", "experiments/cycle_ablation_v3_results.json")


def make_fast_probe(mc, val_ds):
    """Device-resident teacher-forced grounding probe: ONE jitted call
    over the whole val split returning 4 scalars (decoder-alpha and
    localizer-beta accuracies).  Probes run ~100x per experiment; the
    per-call relay latency and D2H pathologies of the batch-wise host
    path would dominate the wall clock otherwise."""
    batches = list(make_batches(val_ds, mc, 64, shuffle=False, prefetch=0,
                                drop_last=False))
    keys = ["feats", "box_geom", "region_cls", "region_mask", "tokens",
            "token_mask"]
    stacked = {k: jnp.asarray(np.concatenate(
        [np.asarray(getattr(b, k)) for b in batches], axis=0))
        for k in keys}
    N = stacked["feats"].shape[0]
    L = mc.max_tokens - 1
    gt_box = np.zeros((N, L, 4), np.float32)
    gt_has = np.zeros((N, L), np.float32)
    row = 0
    for b in batches:
        for i in range(b.feats.shape[0]):
            if b.valid[i]:
                ex = val_ds.get(int(b.example_idx[i]))
                ci = int(b.caption_idx[i])
                for e in ex.entities:
                    if e.caption_idx == ci and e.word_idx < L:
                        gt_box[row + i, e.word_idx] = np.asarray(e.box)
                        gt_has[row + i, e.word_idx] = 1.0
        row += b.feats.shape[0]
    gt_box = jnp.asarray(gt_box)
    gt_has = jnp.asarray(gt_has)

    def _iou(a, b):  # [..., 4] vs [..., 4]
        lt = jnp.maximum(a[..., :2], b[..., :2])
        rb = jnp.minimum(a[..., 2:4], b[..., 2:4])
        wh = jnp.clip(rb - lt, 0.0, None)
        inter = wh[..., 0] * wh[..., 1]
        area = lambda x: (jnp.clip(x[..., 2] - x[..., 0], 0, None)
                          * jnp.clip(x[..., 3] - x[..., 1], 0, None))
        union = area(a) + area(b) - inter
        return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)

    from cvc_tpu.models.cyclical import decode_teacher_forced

    @jax.jit
    def fn(params):
        _, alphas, _, (v_enc, _, _) = decode_teacher_forced(
            params, mc, stacked)
        beta, _ = core.localize(params, mc, stacked["tokens"][:, 1:],
                                v_enc, stacked["region_mask"])
        boxes = stacked["box_geom"][..., :4]                # [N, S, 4]

        def acc(att):                                        # [N, L, S]
            sel = jnp.argmax(att, axis=-1)                  # [N, L]
            pred = boxes[jnp.arange(N)[:, None], sel]       # [N, L, 4]
            iou = _iou(pred, gt_box)
            hit = (iou >= 0.5).astype(jnp.float32) * gt_has
            return jnp.sum(hit)

        total = jnp.sum(gt_has)
        return acc(alphas), acc(beta), total

    def probe(params):
        cd, cl, tot = jax.device_get(fn(params))
        tot = max(float(tot), 1.0)
        return {"attn_acc": float(cd) / tot, "loc_acc": float(cl) / tot,
                "n_words": int(tot)}

    return probe


def make_recon_probe(mc):
    """Jitted: recon XE with the learned localizer beta vs a uniform beta.
    A working cycle must show delta = uniform - learned > 0 (v-hat carries
    word-aligned information the reconstructor uses)."""

    def recon_loss(params, arrays, uniform):
        from cvc_tpu.ops.primitives import masked_xent
        tokens, token_mask = arrays["tokens"], arrays["token_mask"]
        targets, mask = tokens[:, 1:], token_mask[:, 1:]
        v_enc, keys, v_global = core.encode_regions(
            params, mc, arrays["feats"], arrays["box_geom"],
            arrays["region_cls"], arrays["region_mask"],
            arrays.get("global_feat"))
        emb_in = core.embed_tokens(params, tokens[:, :-1], jnp.float32)
        h_seq, _, _ = core.decode(params, mc, v_enc, keys, v_global, emb_in,
                                  arrays["region_mask"])
        gen = jnp.argmax(core.logits(params, h_seq), axis=-1).astype(jnp.int32)
        if uniform:
            m = arrays["region_mask"]
            vh1 = (v_enc * m[..., None]).sum(1) / jnp.maximum(
                m.sum(1), 1.0)[..., None]                       # [B, H]
            v_hat = jnp.broadcast_to(vh1[:, None, :],
                                     (gen.shape[0], gen.shape[1],
                                      vh1.shape[-1])).astype(v_enc.dtype)
        else:
            _, v_hat = core.localize(params, mc, gen, v_enc,
                                     arrays["region_mask"])
        h_rec, _, _ = core.decode(params, mc, v_enc, keys, v_global, emb_in,
                                  arrays["region_mask"],
                                  context_override=v_hat)
        return masked_xent(core.logits(params, h_rec), targets, mask)

    learned = jax.jit(lambda p, a: recon_loss(p, a, False))
    unif = jax.jit(lambda p, a: recon_loss(p, a, True))

    def probe(params, ds, batch_size=64):
        ls, us = [], []
        for b in make_batches(ds, mc, batch_size, shuffle=False,
                              prefetch=0, drop_last=False):
            arrays = {k: jnp.asarray(v) for k, v in b.model_inputs().items()}
            ls.append(float(learned(params, arrays)))
            us.append(float(unif(params, arrays)))
        # NOTE the field name: the probe queries the localizer with the
        # decode pass's ARGMAX words for every arm.  For the cycle_gt arm
        # (trained on GT-word queries) that is off its training
        # distribution — its big negative values mean "wrong-query vhat
        # is catastrophic", not "ignores vhat"; only arms trained on
        # argmax queries (boot after the switch, plain) read naturally.
        return {"recon_xe_learned_beta": float(np.mean(ls)),
                "recon_xe_uniform_beta": float(np.mean(us)),
                "vhat_dependence_argmax_probe": float(np.mean(us) - np.mean(ls))}

    return probe


def snapshot(state):
    return jax.tree_util.tree_map(lambda x: jnp.array(x), state)


def main():
    seeds = [int(s) for s in os.environ.get("CVC_V3_SEEDS",
                                            "0,1,2").split(",")]
    images = int(os.environ.get("CVC_V3_IMAGES", "24000"))
    epochs = int(os.environ.get("CVC_V3_EPOCHS", "48"))
    warmup = int(os.environ.get("CVC_V3_WARMUP", "8"))
    probe_every = int(os.environ.get("CVC_V3_PROBE", "4"))
    # Harder-world knobs (v3c): more regions dilute the attention gradient
    # that lets the PLAIN arm self-align in the 36-region world (3/5 seeds
    # in cycle_ablation_v3b_results.json), isolating the cycle's marginal
    # contribution; more classes harden the word->region matching.
    regions = int(os.environ.get("CVC_V3_REGIONS", "36"))
    classes = int(os.environ.get("CVC_V3_CLASSES", "24"))
    batch = 128

    mc = ModelConfig(vocab_size=128, input_encoding_size=64, rnn_size=192,
                     att_hid_size=96, feat_dim=512, num_regions=regions,
                     seq_length=16, num_classes=classes, class_emb_dim=16,
                     drop_prob_lm=0.4, use_global_feat=True)
    world = dict(num_regions=regions, feat_dim=512, seq_length=16,
                 num_classes=classes, word_order="shuffled",
                 unique_colors=True)
    print(f"v3: seeds={seeds} images={images} epochs={epochs} "
          f"warmup={warmup} world={world}", flush=True)
    train_ds = make_synthetic_dataset(num_images=images, split="train",
                                      seed=0, **world)
    val_ds = make_synthetic_dataset(num_images=256, split="val", seed=0,
                                    **world)
    mc.vocab_size = train_ds.vocab.padded_size(128)
    dd = DeviceDataset(train_ds, mc)
    print(f"device dataset: {dd.nbytes()/1e9:.2f} GB, {dd.num_pairs} pairs",
          flush=True)
    steps_per_epoch = dd.num_pairs // batch

    arms = os.environ.get("CVC_V3_ARMS", "plain,cycle,cycle_gt").split(",")
    tc = TrainConfig(learning_rate=2e-3, grad_clip=5.0, weight_decay=1e-4,
                     learning_rate_decay_start=int(epochs * 0.7),
                     learning_rate_decay_every=max(epochs // 7, 1),
                     learning_rate_decay_rate=0.5)
    opt = make_optimizer(tc, steps_per_epoch)
    mc_gt = replace(mc, cycle_localize_gt=True)
    steps = {
        "plain": make_resident_train_step(mc, replace(tc, enable_cycle=False),
                                          opt),
        "cycle": make_resident_train_step(mc, replace(tc, enable_cycle=True),
                                          opt),
        "cycle_gt": make_resident_train_step(
            mc_gt, replace(tc, enable_cycle=True), opt),
    }
    recon_probe = make_recon_probe(mc)
    fast_probe = make_fast_probe(mc, val_ds)

    # Composite arms: "boot" switches from GT-word localizer queries (break
    # the cold start: argmax queries are garbage exactly at the attention-
    # dependent steps, see experiments/README.md) to the reference's argmax
    # queries once the context->word pathway carries signal.
    boot_switch = warmup + int(os.environ.get("CVC_V3_BOOT_EPOCHS", "16"))
    schedule = {"boot": lambda ep: "cycle_gt" if ep < boot_switch else "cycle"}

    def train_epochs(state, rng, arm, e0, e1, tag, history):
        t0 = time.time()
        for epoch in range(e0, e1):
            step = steps[schedule[arm](epoch) if arm in schedule else arm]
            for idx in dd.epoch_batches(batch, seed=epoch * 7919 + 13):
                state, m = step(state, dd.data, jnp.asarray(idx), rng)
            if (epoch + 1) % probe_every == 0 or epoch == e1 - 1:
                p = fast_probe(state.params)
                rec = {"epoch": epoch, "loss": float(m["loss"]),
                       "attention_entropy": float(m["attention_entropy"]),
                       "attn_acc": p["attn_acc"],
                       "loc_acc": p["loc_acc"]}
                history.append(rec)
                print(f"  [{tag}] ep{epoch} loss={rec['loss']:.3f}"
                      f" ent={rec['attention_entropy']:.3f}"
                      f" attn_acc={rec['attn_acc']:.3f}"
                      f" loc_acc={rec['loc_acc']:.3f}"
                      f" ({time.time()-t0:.0f}s)", flush=True)
        return state

    def final_eval(state, tag):
        ec = EvalConfig(beam_size=3, sample_method="beam", max_length=16,
                        grounding_source="decoder")
        res = evaluate_split(state.params, mc, ec, val_ds, 64)
        res.update(gt_sentence_attention_eval(state.params, mc, val_ds, 64))
        ec_loc = replace(ec, language_eval=False,
                         grounding_source="localizer")
        loc = evaluate_split(state.params, mc, ec_loc, val_ds, 64)
        res["F1_all_localizer"] = loc["F1_all"]
        res["F1_loc_localizer"] = loc["F1_loc"]
        res.update(recon_probe(state.params, val_ds))
        from cvc_tpu.training.checkpoint import CheckpointManager
        ck = CheckpointManager(f"experiments/ckpt_v3_{tag}")
        ck.save(int(state.step), state, infos={"arm": tag})
        ck.wait()
        return {k: v for k, v in res.items() if isinstance(v, (int, float))}

    all_results = {"config": {"images": images, "epochs": epochs,
                              "warmup": warmup, "world": world,
                              "chance_acc": 1.0 / regions},
                   "seeds": {}}
    for seed in seeds:
        print(f"== seed {seed} ==", flush=True)
        rng = jax.random.PRNGKey(seed + 100)
        params = core.init_params(jax.random.PRNGKey(seed), mc)
        state = TrainState.create(params, opt)
        hist_w = []
        state = train_epochs(state, rng, "plain", 0, warmup,
                             f"s{seed}/warm", hist_w)
        branch = snapshot(state)

        seed_res = {}
        for arm in arms:
            # the train step donates its input state — each arm must get
            # its OWN copy of the branch point or later arms read freed
            # buffers
            hist = list(hist_w)
            st = train_epochs(snapshot(branch), rng, arm, warmup, epochs,
                              f"s{seed}/{arm}", hist)
            res = final_eval(st, f"s{seed}_{arm}")
            seed_res[arm] = {"final": res, "history": hist}
            del st
        del branch

        all_results["seeds"][str(seed)] = seed_res
        json.dump(all_results, open(RESULTS, "w"), indent=1)
        for k in ("CIDEr", "F1_all", "F1_loc", "attn_accuracy",
                  "F1_loc_localizer", "vhat_dependence_argmax_probe"):
            print(f"  seed{seed} {k}: " + " ".join(
                f"{a}={seed_res[a]['final'].get(k, 0):.4f}" for a in arms),
                flush=True)

    # cross-seed summary
    def agg(arm, key):
        vs = [all_results["seeds"][str(s)][arm]["final"].get(key, 0.0)
              for s in seeds]
        return float(np.mean(vs)), float(np.std(vs))

    summary = {}
    for k in ("CIDEr", "F1_all", "F1_loc", "attn_accuracy",
              "F1_all_localizer", "F1_loc_localizer", "vhat_dependence_argmax_probe"):
        summary[k] = {}
        parts = []
        for a in arms:
            m, s = agg(a, k)
            summary[k][a] = {"mean": m, "std": s}
            parts.append(f"{a}={m:.4f}±{s:.4f}")
        print(f"SUMMARY {k}: " + " ".join(parts), flush=True)
    all_results["summary"] = summary
    json.dump(all_results, open(RESULTS, "w"), indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
