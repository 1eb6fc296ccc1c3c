#!/usr/bin/env python
"""Round-5 experiment monitor: prints the paired tables for the
from-scratch protocol, manufactured-amplify, noisy world, mesh-lift v3
and the video λ floor from whatever result JSONs exist so far."""

import json
import os

E = os.path.dirname(os.path.abspath(__file__))


def load(name):
    p = os.path.join(E, name)
    return json.load(open(p)) if os.path.exists(p) else None


def row(tag, f, extra=""):
    if not f:
        print(f"  {tag:28s} (pending)")
        return
    print(f"  {tag:28s} F1_loc={f.get('F1_loc', float('nan')):.3f} "
          f"F1_all={f.get('F1_all', float('nan')):.3f} "
          f"CIDEr={f.get('CIDEr', float('nan')):.3f} "
          f"tf={f.get('tf_attn_acc', float('nan')):.3f} "
          f"loc_acc={f.get('loc_acc', float('nan')):.3f}{extra}")


def main():
    repl = load("argmax_cycle_replication_results.json")
    sc = load("scratch_cycle_results.json")
    print("== from-scratch cycle (vs committed plain controls) ==")
    for seed in (11, 13, 19):
        if repl:
            row(f"plain ctrl s{seed}",
                repl["runs"].get(f"base_s{seed}", {}).get("final"))
        for arm in ("cw01", "cw025", "cw01_after8"):
            r = (sc or {"runs": {}})["runs"].get(f"scratch_{arm}_s{seed}")
            if r:
                row(f"scratch {arm} s{seed}", r.get("final"),
                    f" wall={r.get('wall_s')}s")

    m = load("manufactured_amplify_results.json")
    print("== manufactured amplify ==")
    if m:
        for seed in (43, 47, 53):
            b = m["runs"].get(f"manuf_boot_s{seed}")
            if b:
                row(f"boot s{seed}", b.get("final"))
                print(f"    handover probes: {b.get('handover_probes')}")
            for arm in ("plaincont", "argmax"):
                r = m["runs"].get(f"manuf_{arm}_s{seed}")
                if r:
                    row(f"{arm} s{seed}", r.get("final"))

    n = load("noisy_world_results.json")
    print("== noisy world ==")
    if n:
        for k, r in sorted(n["runs"].items()):
            row(k, r.get("final"), f" tf={r.get('tf_attn_acc')}")

    v3 = load("mesh_lift_v3_results.json")
    print("== mesh-lift v3 (24 ep) ==")
    if v3:
        for arm in ("mesh_8dev", "single_device"):
            t = v3.get(arm, {}).get("val_trajectory") or []
            if t:
                row(arm, t[-1])

    for tag in ("video_cw005", "video_cw002"):
        r = load(f"{tag}_results.json")
        if r:
            print(f"== {tag} ==")
            for k, rr in sorted(r.get("runs", {}).items()):
                row(k, rr.get("final") if isinstance(rr, dict) else None)

    sp = load("serving_pipeline.json")
    if sp:
        print("== serving pipeline ==")
        print("  transfer_GBps:", sp.get("transfer_bandwidth_GBps"))
        for k, v in sp.get("modes", {}).items():
            print(f"  {k:28s} {v.get('caps_per_sec')} caps/s")

    td = load("train_decomp.json")
    if td:
        print("== train decomp ==")
        for r in td.get("grad_decomp", []):
            print(" ", r)
        for r in td.get("forward_curve", []):
            print(" ", r)
        print(" ", td.get("scan_latency_floor"))


if __name__ == "__main__":
    main()
