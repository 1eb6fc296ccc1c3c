#!/usr/bin/env python
"""Round-3 headline experiment driver: the reference's EXACT recipe —
argmax-query cycle with NO GT bootstrap (`--cycle_gt_until 0`) — in the
partial-alignment world (`--synthetic_easy_frac`), entirely through the
public CLI.

Why this world: the paper's real data gives the plain decoder partially
aligned attention (lexical/visual priors), so the cycle's argmax localizer
queries start mostly-correct; a fraction of few-proposal images plays that
role here (see data/synthetic.py easy_frac).  VERDICT r2 missing #1.

Runs arms SEQUENTIALLY (never two TPU processes).  After each run, probes
teacher-forced attention accuracy through `eval.py --gt_sentence_mode 1`
(the partial-alignment measurement the protocol needs).

Usage:
  python experiments/run_argmax_ablation.py --tag pilot --seeds 123 \
      --easy_frac 0.25 --epochs 48 --images 24000 --arms plain,cycle
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARM_FLAGS = {
    "plain": ["--enable_cycle", "0"],
    # the reference's exact semantics: argmax queries from the first
    # cycle epoch, no GT-query stage
    "cycle": ["--enable_cycle", "1", "--cycle_after", "8",
              "--cycle_gt_until", "0"],
    # the r2 bootstrap arm, for comparison rows
    "boot": ["--enable_cycle", "1", "--cycle_after", "8",
             "--cycle_gt_until", "24"],
    # --obj_interact ablation arms (VERDICT r2 next-round #7): region
    # self-attention in the encoder, GVD's first-class flag
    "plain_oi": ["--enable_cycle", "0", "--obj_interact", "1"],
    "cycle_oi": ["--enable_cycle", "1", "--cycle_after", "8",
                 "--cycle_gt_until", "0", "--obj_interact", "1"],
}


def common_flags(a, seed):
    return [
        "--dataset", "synthetic", "--synthetic_word_order", "shuffled",
        "--synthetic_unique_colors", "1",
        "--synthetic_num_images", str(a.images),
        "--synthetic_num_val_images", "256",
        "--synthetic_vocab_size", "128",
        "--synthetic_num_classes", "48",
        "--synthetic_easy_frac", str(a.easy_frac),
        "--synthetic_easy_regions", str(a.easy_regions),
        "--synthetic_class_skew", str(a.class_skew),
        "--num_props", str(a.regions), "--feat_dim", str(a.feat_dim),
        "--num_frames", str(a.frames),
        *(["--global_feat_dim", "512"] if a.frames > 1 else []),
        "--rnn_size", "192", "--input_encoding_size", "64",
        "--att_hid_size", "96", "--seq_length", "16",
        "--drop_prob_lm", "0.4", "--batch_size", "128",
        "--device_resident", "1", "--max_epochs", str(a.epochs),
        "--learning_rate", "2e-3",
        "--learning_rate_decay_start", str(a.epochs * 2 // 3 + 1),
        "--learning_rate_decay_every", "6",
        "--learning_rate_decay_rate", "0.5",
        "--weight_decay", "1e-4", "--grad_clip", "5",
        "--val_every_epoch", str(a.val_every),
        "--save_checkpoint_every", str(a.epochs),
        "--losses_log_every", "2000",
        "--language_eval", "1", "--grounding_eval", "1",
        "--seed", str(seed),
    ]


def parse_val_lines(path):
    traj = []
    for line in open(path, errors="replace"):
        if "val/F1_loc" in line:
            m = dict(re.findall(r"val/([\w.]+)=([0-9.]+)", line))
            step = re.match(r"\[step (\d+)\]", line)
            traj.append({"step": int(step.group(1)) if step else -1,
                         **{k: float(v) for k, v in m.items()}})
    return traj


def run(cmd, log_path):
    print(f"-> {' '.join(cmd)}\n   log: {log_path}", flush=True)
    with open(log_path, "w") as f:
        p = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                           cwd=REPO)
    if p.returncode != 0:
        print(f"   FAILED rc={p.returncode}; tail:", flush=True)
        print("\n".join(open(log_path, errors="replace")
                        .read().splitlines()[-12:]), flush=True)
    return p.returncode == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--seeds", default="123")
    ap.add_argument("--arms", default="plain,cycle")
    ap.add_argument("--easy_frac", type=float, default=0.25)
    ap.add_argument("--easy_regions", type=int, default=12)
    ap.add_argument("--class_skew", type=float, default=0.0)
    ap.add_argument("--epochs", type=int, default=48)
    ap.add_argument("--images", type=int, default=24000)
    ap.add_argument("--val_every", type=int, default=8)
    ap.add_argument("--regions", type=int, default=72)
    ap.add_argument("--feat_dim", type=int, default=512)
    ap.add_argument("--frames", type=int, default=1,
                    help=">1 = ANet-video-shaped world (frames x regions "
                         "attention, the Pallas gate's XLA fallback)")
    ap.add_argument("--out", default=None,
                    help="results JSON (default experiments/<tag>.json)")
    ap.add_argument("--extra", default="",
                    help="extra train.py flags appended to every arm, "
                         "space-separated (e.g. '--cycle_weight 0.25')")
    a = ap.parse_args()

    out_path = a.out or os.path.join(REPO, "experiments",
                                     f"{a.tag}_results.json")
    results = {"config": vars(a), "runs": {}}
    for seed in [int(s) for s in a.seeds.split(",")]:
        for arm in a.arms.split(","):
            name = f"{a.tag}_{arm}_s{seed}"
            ckpt = f"/tmp/{name}"
            log = f"/tmp/{name}.log"
            cmd = [sys.executable, "train.py",
                   *common_flags(a, seed), *ARM_FLAGS[arm],
                   *(a.extra.split() if a.extra else []),
                   "--checkpoint_path", ckpt, "--id", name]
            ok = run(cmd, log)
            rec = {"ok": ok, "log": log,
                   "trajectory": parse_val_lines(log)}
            rec["final"] = rec["trajectory"][-1] if rec["trajectory"] \
                else None
            if ok:
                # teacher-forced attention accuracy (the partial-
                # alignment probe) through the public eval CLI
                glog = f"/tmp/{name}_gtsent.log"
                gcmd = [sys.executable, "eval.py", "--start_from", ckpt,
                        "--split", "val", "--gt_sentence_mode", "1",
                        "--language_eval", "0", "--grounding_eval", "0",
                        "--sample_method", "greedy", "--beam_size", "1"]
                if run(gcmd, glog):
                    txt = open(glog, errors="replace").read()
                    m = re.search(r'"attn_acc[\w]*":\s*([0-9.]+)', txt)
                    if m is None:
                        m = re.search(r'attn_acc[\w]*[=:]\s*([0-9.]+)',
                                      txt)
                    rec["tf_attn_acc"] = float(m.group(1)) if m else None
            results["runs"][name] = rec
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)
            print(f"   {name}: final={rec['final']} "
                  f"tf_attn_acc={rec.get('tf_attn_acc')}", flush=True)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
