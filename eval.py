#!/usr/bin/env python
"""Evaluate a trained checkpoint: caption metrics + grounding F1.

Mirrors the reference's standalone eval entry (reference: `main.py
--language_eval 1` / eval scripts; SURVEY.md §3.2/§3.4):

    python eval.py --start_from save/exp1 --split test --beam_size 5 \
        --language_eval 1 --grounding_eval 1
    python eval.py --start_from save/exp1 --gt_sentence_mode 1
"""

import json
import os

import jax

# Honor JAX_PLATFORMS=cpu despite the sandbox's sitecustomize TPU-plugin
# override (same workaround as train.py / __graft_entry__).
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import re
    jax.config.update("jax_platforms", "cpu")
    _m = re.search(r"xla_force_host_platform_device_count=(\d+)",
                   os.environ.get("XLA_FLAGS", ""))
    if _m:
        jax.config.update("jax_num_cpu_devices", int(_m.group(1)))

from cvc_tpu.config import config_from_args
from cvc_tpu.data.datasets import load_dataset
from cvc_tpu.evaluation.evaluator import evaluate_split
from cvc_tpu.models import core
from cvc_tpu.training.checkpoint import CheckpointManager, load_config
from cvc_tpu.training.loop import _finalize_model_config
from cvc_tpu.training.optimizer import make_optimizer
from cvc_tpu.training.train_state import TrainState


def main(argv=None):
    cfg = config_from_args(argv)
    if not (cfg.train.start_from or cfg.train.import_torch):
        raise SystemExit("--start_from <checkpoint dir> or "
                         "--import_torch <.pth/.npz> is required")
    # Prefer the training-time config for model shapes; CLI eval flags win.
    ckpt_dir = cfg.train.start_from
    if ckpt_dir and os.path.exists(os.path.join(ckpt_dir, "config.json")):
        saved = load_config(ckpt_dir)
        saved.eval = cfg.eval
        saved.data.batch_size = cfg.data.batch_size
        saved.train.import_torch = cfg.train.import_torch
        cfg = saved

    ds = load_dataset(cfg.data, cfg.model, cfg.eval.split)
    _finalize_model_config(cfg, ds)

    if cfg.train.import_torch and not ckpt_dir:
        # evaluate a reference-lineage torch checkpoint directly on TPU
        from cvc_tpu.models.torch_import import import_params
        eval_params, report = import_params(cfg.train.import_torch, cfg.model)
        print(f"imported params from {cfg.train.import_torch} "
              f"({len(report.get('mapped', []))} keys)", flush=True)
    else:
        params = core.init_params(jax.random.PRNGKey(0), cfg.model)
        optimizer = make_optimizer(cfg.train, steps_per_epoch=1)
        state = TrainState.create(params, optimizer)
        mgr = CheckpointManager(ckpt_dir)
        step = mgr.best_step() or mgr.latest_step()
        state, infos = mgr.restore(state, step=step)
        print(f"evaluating checkpoint step {step} (best_cider="
              f"{infos.get('best_cider')}) on split={cfg.eval.split}",
              flush=True)
        eval_params = state.params

    out_path = os.path.join(cfg.eval.out_dir,
                            f"{cfg.id}_{cfg.eval.split}_preds.json")
    results = evaluate_split(eval_params, cfg.model, cfg.eval, ds,
                             cfg.data.batch_size, out_path=out_path)
    if cfg.eval.cycle_probes:
        from cvc_tpu.evaluation.probes import cycle_probe_metrics
        results.update(cycle_probe_metrics(eval_params, cfg.model, ds,
                                           cfg.data.batch_size))
    print(json.dumps(results, indent=2, default=float))
    return results


if __name__ == "__main__":
    main()
