#!/usr/bin/env python
"""Replication seeds for the round-3 headline (bootstrap-free argmax
cycle dose-response, `argmax_cycle_continuation_results.json`): each
original dose had n=1, because the doses were the three r2 plain arms'
natural plateaus.  This driver grows the n: train FRESH plain baselines
(new seeds, identical world/model to the r2 CLI ablation), record each
one's plateau F1_loc (its engagement dose), then run the same paired
continuation protocol — plain continuation vs the reference's exact
recipe (`--enable_cycle 1 --cycle_after 48 --cycle_gt_until 0`: argmax
localizer queries, zero GT bootstrap; reference `misc/model.py`
cyclical forward semantics).

All arms sequential (never two TPU processes), all through the public
CLI.  Appends to experiments/argmax_cycle_replication_results.json so
seeds can be added across invocations.

Usage: python experiments/run_argmax_replication.py --seeds 31,99
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS = {
    "plaincont": ["--enable_cycle", "0"],
    "argmax": ["--enable_cycle", "1", "--cycle_after", "48",
               "--cycle_gt_until", "0"],
    # the amplify-vs-pin lever (s57 postmortem): same reference-exact
    # recipe with the reconstruction weight lowered — the video-world
    # result says full-weight reconstruction XE can over-constrain the
    # shared decoder and lock it at its engagement accuracy
    "argmax_cw025": ["--enable_cycle", "1", "--cycle_after", "48",
                     "--cycle_gt_until", "0", "--cycle_weight", "0.25"],
    "argmax_cw05": ["--enable_cycle", "1", "--cycle_after", "48",
                    "--cycle_gt_until", "0", "--cycle_weight", "0.5"],
    # lock-in-then-relax: full weight while the cycle engages (16 epochs
    # past --cycle_after), then annealed to 0.25 — tests whether the pin
    # is specifically the *steady-state* full-weight constraint or the
    # engagement-time one
    "argmax_anneal": ["--enable_cycle", "1", "--cycle_after", "48",
                      "--cycle_gt_until", "0", "--cycle_weight", "1.0",
                      "--cycle_weight_anneal_to", "0.25",
                      "--cycle_weight_anneal_after", "64"],
}


def world_flags(seed):
    # identical world/model to the r2 CLI ablation + v5 continuation
    # (run_argmax_continuation.py)
    return [
        "--dataset", "synthetic", "--synthetic_word_order", "shuffled",
        "--synthetic_unique_colors", "1",
        "--synthetic_num_images", "24000",
        "--synthetic_num_val_images", "256",
        "--synthetic_vocab_size", "128", "--synthetic_num_classes", "48",
        "--num_props", "72", "--feat_dim", "512", "--rnn_size", "192",
        "--input_encoding_size", "64", "--att_hid_size", "96",
        "--seq_length", "16", "--drop_prob_lm", "0.4",
        "--batch_size", "128", "--device_resident", "1",
        "--weight_decay", "1e-4", "--grad_clip", "5",
        "--val_every_epoch", "4",
        "--losses_log_every", "2000",
        "--language_eval", "1", "--grounding_eval", "1",
        "--cycle_probes", "1",
        "--seed", str(seed),
    ]


def base_flags(seed):
    return [
        *world_flags(seed),
        "--max_epochs", "48",
        "--learning_rate", "1e-3",
        "--learning_rate_decay_start", "30",
        "--learning_rate_decay_every", "6",
        "--learning_rate_decay_rate", "0.5",
        "--save_checkpoint_every", "48",
    ]


def cont_flags(seed):
    # the v5 continuation leg: fresh LR shared by BOTH arms (paired)
    return [
        *world_flags(seed),
        "--max_epochs", "96",
        "--learning_rate", "1e-3",
        "--learning_rate_decay_start", "81",
        "--learning_rate_decay_every", "6",
        "--learning_rate_decay_rate", "0.5",
        "--save_checkpoint_every", "96",
    ]


def parse_val(path):
    traj = []
    for line in open(path, errors="replace"):
        if "val/F1_loc" in line:
            m = dict(re.findall(r"val/([\w.]+)=(-?[0-9.]+)", line))
            step = re.match(r"\[step (\d+)\]", line)
            traj.append({"step": int(step.group(1)) if step else -1,
                         **{k: float(v) for k, v in m.items()}})
    return traj


def run(cmd, log_path):
    print(f"-> {' '.join(cmd[:4])} ... log: {log_path}", flush=True)
    with open(log_path, "w") as f:
        p = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                           cwd=REPO)
    if p.returncode != 0:
        print("\n".join(open(log_path, errors="replace")
                        .read().splitlines()[-12:]), flush=True)
    return p.returncode == 0


def tf_attn_acc(ckpt, log):
    """Returns (accuracy, identity) where identity records which
    checkpoint dir + restored step the eval actually read — the s31
    spot-check: two arms reporting bit-identical accuracy must still
    show distinct checkpoint identities."""
    gcmd = [sys.executable, "eval.py", "--start_from", ckpt,
            "--split", "val", "--gt_sentence_mode", "1",
            "--language_eval", "0", "--grounding_eval", "0",
            "--sample_method", "greedy", "--beam_size", "1"]
    if run(gcmd, log):
        text = open(log, errors="replace").read()
        m = re.search(r'"attn_accuracy":\s*([0-9.]+)', text)
        s = re.search(r"evaluating checkpoint step (\d+)", text)
        ident = {"ckpt": ckpt, "step": int(s.group(1)) if s else None}
        return (float(m.group(1)) if m else None), ident
    return None, {"ckpt": ckpt, "step": None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="31,99")
    ap.add_argument("--skip_base", action="store_true",
                    help="reuse /tmp/repl_plain_s<seed> checkpoints")
    ap.add_argument("--base_only", action="store_true",
                    help="dose scan: train/record baselines, no "
                         "continuations")
    ap.add_argument("--min_dose", type=float, default=0.0,
                    help="run continuations only when the base plateau "
                         "F1_loc >= this (dose is measured BEFORE arm "
                         "assignment, so this selects the engagement "
                         "regime, not the outcome)")
    ap.add_argument("--arms", default=",".join(ARMS),
                    help="comma-separated subset of arms to run "
                         "(resume a partially-completed seed without "
                         "repeating its finished arms)")
    a = ap.parse_args()
    arms = {k: ARMS[k] for k in a.arms.split(",") if k}

    out_path = os.path.join(REPO, "experiments",
                            "argmax_cycle_replication_results.json")
    results = {"protocol": __doc__, "runs": {}, "baseline_f1_loc": {}}
    if os.path.exists(out_path):
        old = json.load(open(out_path))
        results["runs"] = old.get("runs", {})
        results["baseline_f1_loc"] = old.get("baseline_f1_loc", {})

    for seed in [int(s) for s in a.seeds.split(",")]:
        base_ckpt = f"/tmp/repl_plain_s{seed}"
        base_log = f"/tmp/repl_plain_s{seed}.log"
        if not a.skip_base:
            cmd = [sys.executable, "train.py", *base_flags(seed),
                   "--enable_cycle", "0",
                   "--checkpoint_path", base_ckpt,
                   "--id", f"repl_plain_s{seed}"]
            if not run(cmd, base_log):
                raise SystemExit(f"base s{seed} failed")
        base_traj = parse_val(base_log)
        dose = base_traj[-1]["F1_loc"] if base_traj else None
        results["baseline_f1_loc"][str(seed)] = dose
        acc, ident = tf_attn_acc(base_ckpt,
                                 f"/tmp/repl_plain_s{seed}_gt.log")
        results["runs"][f"base_s{seed}"] = {
            "trajectory": base_traj,
            "final": base_traj[-1] if base_traj else None,
            "tf_attn_acc": acc, "tf_attn_ckpt": ident}
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"   base s{seed}: dose F1_loc={dose}", flush=True)
        if a.base_only or (dose is not None and dose < a.min_dose):
            print(f"   s{seed}: skipping continuations "
                  f"(base_only={a.base_only}, dose {dose} < "
                  f"min_dose {a.min_dose})", flush=True)
            continue

        for arm, arm_flags in arms.items():
            name = f"repl_{arm}_s{seed}"
            ckpt, log = f"/tmp/{name}", f"/tmp/{name}.log"
            cmd = [sys.executable, "train.py", *cont_flags(seed),
                   *arm_flags, "--start_from", base_ckpt,
                   "--checkpoint_path", ckpt, "--id", name]
            ok = run(cmd, log)
            rec = {"ok": ok, "trajectory": parse_val(log)}
            rec["final"] = rec["trajectory"][-1] if rec["trajectory"] \
                else None
            if ok:
                acc, ident = tf_attn_acc(ckpt, f"/tmp/{name}_gt.log")
                rec["tf_attn_acc"], rec["tf_attn_ckpt"] = acc, ident
            results["runs"][name] = rec
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)
            fin = rec["final"] or {}
            print(f"   {name}: F1_loc={fin.get('F1_loc')} "
                  f"F1_all={fin.get('F1_all')} CIDEr={fin.get('CIDEr')} "
                  f"tf_attn_acc={rec.get('tf_attn_acc')}", flush=True)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
