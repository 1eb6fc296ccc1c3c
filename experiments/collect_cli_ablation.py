#!/usr/bin/env python
"""Collect the CLI grounding-lift ablation (train.py, shuffled/unique-color
world, 72 regions / 48 classes) from the run logs into one artifact.

Arms (same seed = same world + same init; zero box supervision in both):
  plain : --enable_cycle 0
  boot  : --enable_cycle 1 --cycle_after 8 --cycle_gt_until 24
          (GT-query bootstrap epochs 8-23, then the reference's exact
          argmax-query semantics)

Usage: python experiments/collect_cli_ablation.py /tmp/cli_abl_*.log
Writes experiments/cli_ablation_results.json.
"""

import json
import re
import sys


def parse(path: str) -> dict:
    """Last val/ line -> metric dict, plus the full val trajectory."""
    traj = []
    for line in open(path, errors="replace"):
        if "val/F1_loc" in line:
            m = dict(re.findall(r"val/(\w+)=([0-9.]+)", line))
            step = re.match(r"\[step (\d+)\]", line)
            traj.append({"step": int(step.group(1)) if step else -1,
                         **{k: float(v) for k, v in m.items()}})
    return {"final": traj[-1] if traj else None, "trajectory": traj}


def main(paths):
    runs = {}
    for p in paths:
        m = re.search(r"cli_abl_(plain|boot)(?:_s(\d+))?\.log", p)
        if not m:
            continue
        arm, seed = m.group(1), m.group(2) or "123"
        runs[f"{arm}_s{seed}"] = parse(p)
    arms = {"plain": [], "boot": []}
    for k, v in runs.items():
        if v["final"]:
            arms[k.split("_")[0]].append(v["final"])

    def mean(rows, key):
        vals = [r[key] for r in rows if key in r]
        return round(sum(vals) / len(vals), 4) if vals else None

    summary = {arm: {k: mean(rows, k)
                     for k in ("CIDEr", "F1_all", "F1_loc", "METEOR",
                               "SPICE_lite")}
               for arm, rows in arms.items()}
    out = {
        "what": ("Grounding-lift ablation run ENTIRELY through the public "
                 "CLI (train.py) on one TPU chip: plain vs "
                 "cycle-with-GT-bootstrap (--cycle_after 8 "
                 "--cycle_gt_until 24), 48 epochs, device-resident, "
                 "per-seed paired worlds, zero box supervision in both "
                 "arms"),
        "world": {"images": 24000, "regions": 72, "classes": 48,
                  "word_order": "shuffled", "unique_colors": True,
                  "chance_F1_loc": round(1 / 72, 4)},
        "per_run_final": {k: v["final"] for k, v in sorted(runs.items())},
        "mean_final": summary,
        "trajectories": {k: v["trajectory"] for k, v in sorted(runs.items())},
    }
    with open("experiments/cli_ablation_results.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"mean_final": summary,
                      "n_runs": {a: len(r) for a, r in arms.items()}},
                     indent=1))


if __name__ == "__main__":
    main(sys.argv[1:])
