#!/usr/bin/env python
"""THE round-3 headline experiment (VERDICT r2 missing #1 / next-round #1):
the reference's EXACT cyclical recipe — localizer queried with the decode
pass's ARGMAX words from the moment the cycle engages, NO GT bootstrap —
engaged on a decoder with MEASURED partial alignment.

Protocol.  The r2 CLI ablation's plain arms (48 epochs, 72-region/
48-class shuffled/unique-color world, seeds 123/7/2026) ended at three
different baseline grounding levels:

    s123  F1_loc 0.617   (well-aligned baseline)
    s7    F1_loc 0.179   (PARTIAL alignment — the paper's regime)
    s2026 F1_loc 0.062   (near-chance baseline)

Each checkpoint is resumed through the public CLI (--start_from) for 48
more epochs, two ways with identical optimizer settings:

    plain continuation:  --enable_cycle 0
    argmax cycle:        --enable_cycle 1 --cycle_after 48
                         --cycle_gt_until 0      <- reference semantics,
                                                    zero bootstrap

Hypothesis (paper §3 + r2 findings): the bootstrap-free cycle amplifies
grounding where the baseline is at least partially aligned, and fails to
help from a near-chance baseline — a dose-response curve over the three
engagement levels.  Same supervision budget everywhere (captions only).

Usage: python experiments/run_argmax_continuation.py
"""

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SRC = {123: "/tmp/cli_abl_plain", 7: "/tmp/cli_abl_plain_s7",
       2026: "/tmp/cli_abl_plain_s2026"}
BASELINE_F1_LOC = {123: 0.617, 7: 0.179, 2026: 0.062}

ARMS = {
    "plaincont": ["--enable_cycle", "0"],
    "argmax": ["--enable_cycle", "1", "--cycle_after", "48",
               "--cycle_gt_until", "0"],
}


def flags(seed):
    # identical to the r2 CLI ablation world/model, with a fresh LR leg
    # for the continuation (the r2 schedule would be decayed ~1000x by
    # epoch 96); both arms share it, so the comparison stays paired.
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
        "--max_epochs", "96",
        "--learning_rate", "1e-3",
        "--learning_rate_decay_start", "81",
        "--learning_rate_decay_every", "6",
        "--learning_rate_decay_rate", "0.5",
        "--weight_decay", "1e-4", "--grad_clip", "5",
        "--val_every_epoch", "4", "--save_checkpoint_every", "96",
        "--losses_log_every", "2000",
        "--language_eval", "1", "--grounding_eval", "1",
        "--seed", str(seed),
    ]


def parse_val(path):
    traj = []
    for line in open(path, errors="replace"):
        if "val/F1_loc" in line:
            m = dict(re.findall(r"val/([\w.]+)=([0-9.]+)", line))
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


def main():
    out_path = os.path.join(REPO, "experiments",
                            "argmax_cycle_continuation_results.json")
    results = {"protocol": __doc__, "baseline_f1_loc": BASELINE_F1_LOC,
               "runs": {}}
    for seed in (7, 2026, 123):          # partial-alignment seed first
        for arm, arm_flags in ARMS.items():
            name = f"v5_{arm}_s{seed}"
            ckpt = f"/tmp/{name}"
            log = f"/tmp/{name}.log"
            cmd = [sys.executable, "train.py", *flags(seed), *arm_flags,
                   "--start_from", SRC[seed],
                   "--checkpoint_path", ckpt, "--id", name]
            ok = run(cmd, log)
            rec = {"ok": ok, "log": log, "trajectory": parse_val(log)}
            rec["final"] = rec["trajectory"][-1] if rec["trajectory"] \
                else None
            if ok:
                glog = f"/tmp/{name}_gtsent.log"
                gcmd = [sys.executable, "eval.py", "--start_from", ckpt,
                        "--split", "val", "--gt_sentence_mode", "1",
                        "--language_eval", "0", "--grounding_eval", "0",
                        "--sample_method", "greedy", "--beam_size", "1"]
                if run(gcmd, glog):
                    m = re.search(r'"attn_accuracy":\s*([0-9.]+)',
                                  open(glog, errors="replace").read())
                    rec["tf_attn_acc"] = float(m.group(1)) if m else None
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
