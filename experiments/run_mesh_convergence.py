#!/usr/bin/env python
"""Mesh convergence artifact (VERDICT r2 next-round #2c): the CLI
ablation's boot arm trained END-TO-END on the virtual 8-device mesh —
sharded resident feeding, GSPMD cyclical step with vocab-head TP, staged
cycle switches, checkpointing, and data-parallel beam eval — vs the same
run on a single device.

Batch composition differs between the two runs by construction (each
mesh shard shuffles its own pairs — the standard per-host data-loading
semantics; exact step-level parity is already proven in
tests/test_device_data.py::test_mesh_resident_step_matches_single_device),
so parity here is statistical: both runs must converge to the same loss
basin and val metrics.

Runs on CPU (JAX_PLATFORMS=cpu) so it never touches the TPU tunnel.
Writes experiments/mesh_convergence.json.
"""

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EPOCHS = 12


def flags(seed):
    return [
        "--dataset", "synthetic", "--synthetic_word_order", "shuffled",
        "--synthetic_unique_colors", "1",
        "--synthetic_num_images", "4000",
        "--synthetic_num_val_images", "192",
        "--synthetic_vocab_size", "128", "--synthetic_num_classes", "48",
        "--num_props", "72", "--feat_dim", "512", "--rnn_size", "192",
        "--input_encoding_size", "64", "--att_hid_size", "96",
        "--seq_length", "16", "--drop_prob_lm", "0.4",
        "--batch_size", "128", "--device_resident", "1",
        "--max_epochs", str(EPOCHS), "--learning_rate", "2e-3",
        "--weight_decay", "1e-4", "--grad_clip", "5",
        "--val_every_epoch", "4", "--save_checkpoint_every", str(EPOCHS),
        "--losses_log_every", "10", "--language_eval", "1",
        "--grounding_eval", "1", "--enable_cycle", "1",
        "--cycle_after", "2", "--cycle_gt_until", "6",
        "--seed", str(seed),
    ]


def parse_log(path):
    traj, losses = [], []
    for line in open(path, errors="replace"):
        if "val/F1_loc" in line:
            m = dict(re.findall(r"val/([\w.]+)=([0-9.]+)", line))
            traj.append({k: float(v) for k, v in m.items()})
        m = re.search(r"train/loss=([0-9.]+)", line)
        if m:
            losses.append(float(m.group(1)))
    return traj, losses


def run(name, extra, env):
    log = f"/tmp/{name}.log"
    cmd = [sys.executable, "train.py", *flags(123), *extra,
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
    traj1, loss1 = run("meshconv_1dev", ["--mGPUs", "1"], env)
    traj8, loss8 = run("meshconv_8dev", ["--mGPUs", "8",
                                         "--model_axis", "2"], env)
    out = {
        "what": ("boot-arm cyclical training end-to-end on the virtual "
                 "8-device ('data' 4 x 'model' 2) mesh vs single device: "
                 "sharded resident feeding, GSPMD step, staged cycle "
                 "(plain->GT->argmax), DP beam eval, checkpointing"),
        "epochs": EPOCHS, "world": {"images": 4000, "regions": 72,
                                    "classes": 48},
        "single_device": {"val_trajectory": traj1,
                          "final_train_loss": loss1[-1] if loss1 else None},
        "mesh_8dev": {"val_trajectory": traj8,
                      "final_train_loss": loss8[-1] if loss8 else None},
    }
    if traj1 and traj8:
        out["final_delta"] = {
            k: round(traj8[-1][k] - traj1[-1][k], 4)
            for k in ("CIDEr", "F1_loc", "F1_all") if k in traj1[-1]}
    path = os.path.join(REPO, "experiments", "mesh_convergence.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out.get("final_delta", {})), flush=True)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
