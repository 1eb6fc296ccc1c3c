#!/usr/bin/env python
"""Mesh-lift v2 (VERDICT r3 next-round #2): show the grounding LIFT
happening under the virtual 8-device mesh, not just trajectory parity
at chance signal (v1, `mesh_convergence.json`).

The full 24k-image CLI-ablation recipe is measured infeasible on this
sandbox's single host core (2.7 s/step x 9000 steps ~ 6.8 h/arm;
experiments/README.md "mesh-lift v2"), so this runs the same METHOD on
a world sized for the budget: 16k images, 48 regions, feat 256, boot
cycle engaging at epoch 4 with GT-query bootstrap until 12 then argmax
queries, 16 epochs total — the same (steps-past-engagement) window in
which the committed single-device boot arms lock in (cli_ablation
trajectories: chance -> 0.68-0.90 F1_loc within ~1.5k steps of
engagement).  Both arms are run back-to-back: the 8-device
('data' 4 x 'model' 2) GSPMD mesh arm and its paired single-device
arm — the lift must appear in BOTH, and final metrics must agree
within seed noise.

CPU-only (JAX_PLATFORMS=cpu); never touches the TPU tunnel.
Writes experiments/mesh_lift_results.json after EACH arm completes.
"""

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# v2 ran 16 epochs: grounding locked in (0.853 vs 0.900) but CIDEr was
# mid-climb in both arms (0.92 vs 1.27).  VERDICT r4 weak #3 asks for
# the caption column too: CVC_MESHLIFT_EPOCHS=24 reruns both arms with
# 8 more epochs (the decay schedule below then gives the last epochs a
# settled LR), writing mesh_lift_v3_results.json.
EPOCHS = int(os.environ.get("CVC_MESHLIFT_EPOCHS", "16"))


def flags(seed):
    return [
        "--dataset", "synthetic", "--synthetic_word_order", "shuffled",
        "--synthetic_unique_colors", "1",
        "--synthetic_num_images", "16000",
        "--synthetic_num_val_images", "256",
        "--synthetic_vocab_size", "128", "--synthetic_num_classes", "48",
        "--num_props", "48", "--feat_dim", "256", "--rnn_size", "192",
        "--input_encoding_size", "64", "--att_hid_size", "96",
        "--seq_length", "16", "--drop_prob_lm", "0.4",
        "--batch_size", "128", "--device_resident", "1",
        "--max_epochs", str(EPOCHS), "--learning_rate", "2e-3",
        "--learning_rate_decay_start", "11",
        "--learning_rate_decay_every", "6",
        "--learning_rate_decay_rate", "0.5",
        "--weight_decay", "1e-4", "--grad_clip", "5",
        "--val_every_epoch", "4", "--save_checkpoint_every", str(EPOCHS),
        "--losses_log_every", "500", "--language_eval", "1",
        "--grounding_eval", "1",
        "--enable_cycle", "1", "--cycle_after", "4",
        "--cycle_gt_until", "12",
        "--seed", str(seed),
    ]


def parse_log(path):
    traj, losses = [], []
    for line in open(path, errors="replace"):
        if "val/F1_loc" in line:
            m = dict(re.findall(r"val/([\w.]+)=([0-9.]+)", line))
            step = re.match(r"\[step (\d+)\]", line)
            traj.append({"step": int(step.group(1)) if step else -1,
                         **{k: float(v) for k, v in m.items()}})
        m = re.search(r"train/loss=([0-9.]+)", line)
        if m:
            losses.append(float(m.group(1)))
    return traj, losses


def run(name, extra, env):
    log = f"/tmp/{name}.log"
    cmd = [sys.executable, "train.py", *flags(2026), *extra,
           "--checkpoint_path", f"/tmp/{name}", "--id", name]
    print("->", name, flush=True)
    with open(log, "w") as f:
        p = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                           cwd=REPO, env=env)
    assert p.returncode == 0, open(log, errors="replace").read()[-2000:]
    return parse_log(log)


def main():
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                          " --xla_force_host_platform_device_count=8")
               .strip())
    path = os.path.join(
        REPO, "experiments",
        "mesh_lift_results.json" if EPOCHS == 16
        else f"mesh_lift_v3_results.json")
    out = {
        "what": ("mesh-lift v2: the boot cycle's grounding lift trained "
                 "END-TO-END under the virtual 8-device "
                 "('data' 4 x 'model' 2) GSPMD mesh vs the paired "
                 "single-device run — budget-sized world (see driver "
                 "docstring); chance F1_loc = 1/48 ~ 0.021"),
        "epochs": EPOCHS,
        "world": {"images": 16000, "regions": 48, "classes": 48,
                  "feat_dim": 256, "chance_F1_loc": round(1 / 48, 4)},
        "recipe": {"cycle_after": 4, "cycle_gt_until": 12,
                   "lr": 2e-3, "seed": 2026},
    }

    sfx = "" if EPOCHS == 16 else f"_e{EPOCHS}"
    traj8, loss8 = run(f"meshlift_8dev{sfx}", ["--mGPUs", "8",
                                               "--model_axis", "2"], env)
    out["mesh_8dev"] = {"val_trajectory": traj8,
                        "final_train_loss": loss8[-1] if loss8 else None}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)

    traj1, loss1 = run(f"meshlift_1dev{sfx}", ["--mGPUs", "1"], env)
    out["single_device"] = {"val_trajectory": traj1,
                            "final_train_loss": loss1[-1] if loss1 else None}
    if traj1 and traj8:
        out["final_delta"] = {
            k: round(traj8[-1][k] - traj1[-1][k], 4)
            for k in ("CIDEr", "F1_loc", "F1_all") if k in traj1[-1]}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out.get("final_delta", {})), flush=True)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
