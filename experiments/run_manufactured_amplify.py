#!/usr/bin/env python
"""Manufactured-aligned-base amplify test (VERDICT r4 item #2).

The amplify-vs-pin mechanism claim (s57 postmortem,
`s57_probe_postmortem.json`) rests on n=1 amplified (s123) vs n=1
pinned (s57): the reference-exact full-weight argmax cycle amplifies
when the LOCALIZER is aligned at engagement and pins when it is not.
Growing n by seed-scanning is hopeless (aligned plain bases are a
~1-in-10 lottery — r4 dose scan).  The controlled path: MANUFACTURE
aligned bases with a GT-query boot phase (which trains the localizer
directly — the one knob that reliably aligns it, 8/8 seeds across
rounds), verify localizer-β alignment at the handover checkpoint with
the probe bundle, then hand over to the reference-exact FULL-λ argmax
recipe vs a paired plain continuation.

Prediction (postmortem): aligned localizer at engagement → the full-λ
arm amplifies (or at least tracks) the plain control, never pins below
it.  n≥3 turns the 2-point reading into a tested mechanism.

Per seed: 28-epoch GT-boot manufacture → probe → paired 32-epoch
continuations (plain vs argmax λ=1.0) from the same checkpoint with
identical fresh optimizer/LR schedule.  World/model identical to the
replication protocol (reference `misc/model.py` cyclical forward +
`main.py` training semantics, SURVEY §3.1/§3.3).

Usage: python experiments/run_manufactured_amplify.py --seeds 43,47,53
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BOOT_EPOCHS = 28
CONT_EPOCHS = 60   # 28 boot + 32 continuation

ARMS = {
    "plaincont": ["--enable_cycle", "0"],
    # reference-exact recipe at FULL weight from the handover epoch:
    # argmax localizer queries, zero further GT
    "argmax": ["--enable_cycle", "1", "--cycle_after", str(BOOT_EPOCHS),
               "--cycle_gt_until", "0", "--cycle_weight", "1.0"],
}


def world_flags(seed):
    # identical world/model to the replication protocol
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


def boot_flags(seed):
    return [
        *world_flags(seed),
        "--max_epochs", str(BOOT_EPOCHS),
        "--learning_rate", "1e-3",
        "--learning_rate_decay_start", str(BOOT_EPOCHS + 10),  # none
        "--learning_rate_decay_every", "6",
        "--learning_rate_decay_rate", "0.5",
        "--save_checkpoint_every", str(BOOT_EPOCHS),
        # the manufacture phase: GT-query cycle the whole way
        "--enable_cycle", "1", "--cycle_after", "0",
        "--cycle_gt_until", str(BOOT_EPOCHS), "--cycle_weight", "1.0",
    ]


def cont_flags(seed):
    # paired continuation: BOTH arms share this fresh LR schedule
    return [
        *world_flags(seed),
        "--max_epochs", str(CONT_EPOCHS),
        "--learning_rate", "1e-3",
        "--learning_rate_decay_start", str(CONT_EPOCHS - 12),
        "--learning_rate_decay_every", "6",
        "--learning_rate_decay_rate", "0.5",
        "--save_checkpoint_every", str(CONT_EPOCHS),
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


def probe(ckpt, log):
    """Handover probes: tf attention accuracy + localizer loc_acc +
    v̂-dependence via the --cycle_probes bundle in gt-sentence mode."""
    gcmd = [sys.executable, "eval.py", "--start_from", ckpt,
            "--split", "val", "--gt_sentence_mode", "1",
            "--language_eval", "0", "--grounding_eval", "1",
            "--cycle_probes", "1",
            "--sample_method", "greedy", "--beam_size", "1"]
    if not run(gcmd, log):
        return None
    text = open(log, errors="replace").read()
    out = {}
    for key in ("attn_accuracy", "loc_acc", "vhat_dependence",
                "recon_xe_learned_beta", "recon_xe_uniform_beta",
                "F1_loc", "F1_all"):
        m = re.search(rf'"{key}":\s*(-?[0-9.]+)', text)
        if m:
            out[key] = float(m.group(1))
    s = re.search(r"evaluating checkpoint step (\d+)", text)
    out["ckpt_step"] = int(s.group(1)) if s else None
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="43,47,53")
    ap.add_argument("--skip_boot", action="store_true")
    ap.add_argument("--arms", default=",".join(ARMS))
    a = ap.parse_args()
    arms = {k: ARMS[k] for k in a.arms.split(",") if k}

    out_path = os.path.join(REPO, "experiments",
                            "manufactured_amplify_results.json")
    results = {"protocol": __doc__, "runs": {}}
    if os.path.exists(out_path):
        results["runs"] = json.load(open(out_path)).get("runs", {})

    def save():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    for seed in [int(s) for s in a.seeds.split(",")]:
        boot_ckpt = f"/tmp/manuf_boot_s{seed}"
        boot_log = f"/tmp/manuf_boot_s{seed}.log"
        bname = f"manuf_boot_s{seed}"
        if not a.skip_boot and not results["runs"].get(bname, {}).get("ok"):
            t0 = time.time()
            cmd = [sys.executable, "train.py", *boot_flags(seed),
                   "--checkpoint_path", boot_ckpt, "--id", bname]
            if not run(cmd, boot_log):
                raise SystemExit(f"boot s{seed} failed")
            rec = {"ok": True, "wall_s": round(time.time() - t0, 1),
                   "trajectory": parse_val(boot_log)}
            rec["final"] = rec["trajectory"][-1] if rec["trajectory"] \
                else None
            rec["handover_probes"] = probe(
                boot_ckpt, f"/tmp/{bname}_probe.log")
            results["runs"][bname] = rec
            save()
            print(f"   {bname}: handover {rec['handover_probes']}",
                  flush=True)

        for arm, arm_flags in arms.items():
            name = f"manuf_{arm}_s{seed}"
            if results["runs"].get(name, {}).get("ok"):
                print(f"   {name}: already done, skipping", flush=True)
                continue
            ckpt, log = f"/tmp/{name}", f"/tmp/{name}.log"
            t0 = time.time()
            cmd = [sys.executable, "train.py", *cont_flags(seed),
                   *arm_flags, "--start_from", boot_ckpt,
                   "--checkpoint_path", ckpt, "--id", name]
            ok = run(cmd, log)
            rec = {"ok": ok, "wall_s": round(time.time() - t0, 1),
                   "trajectory": parse_val(log)}
            rec["final"] = rec["trajectory"][-1] if rec["trajectory"] \
                else None
            if ok:
                rec["final_probes"] = probe(ckpt, f"/tmp/{name}_probe.log")
            results["runs"][name] = rec
            save()
            fin = rec["final"] or {}
            print(f"   {name}: F1_loc={fin.get('F1_loc')} "
                  f"CIDEr={fin.get('CIDEr')} ({rec['wall_s']}s)",
                  flush=True)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
