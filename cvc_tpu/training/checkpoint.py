"""Checkpoint / resume via orbax.

The reference torch.saves {model, optimizer, infos} every epoch plus a
`model-best.pth` on val-CIDEr improvement, resumed with --start_from
(reference: checkpoint block in `main.py`; SURVEY.md §3.5/§5.3-5.4).
Here the whole TrainState pytree goes through an orbax CheckpointManager:

  * retention keeps the latest N plus the best-by-val-CIDEr step;
  * saves are async (orbax default) — the train loop never blocks on IO;
  * `infos` (epoch, best metric, config JSON) ride along as metadata;
  * restore works from sharded or single-device arrays alike.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from cvc_tpu.training.train_state import TrainState

BEST_METRIC = "CIDEr"


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._dir = directory
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m.get(BEST_METRIC, -1.0),
            best_mode="max",
            keep_checkpoints_without_metrics=True,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: TrainState, infos: dict,
             metrics: Optional[dict] = None) -> None:
        """metrics: val metrics dict (CIDEr drives best-retention)."""
        clean_metrics = {k: float(v) for k, v in (metrics or {}).items()
                         if isinstance(v, (int, float)) and v == v}
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                infos=ocp.args.JsonSave(infos),
            ),
            metrics=clean_metrics,
        )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, state_like: TrainState, step: Optional[int] = None
                ) -> tuple[TrainState, dict]:
        """Restore (state, infos); `state_like` supplies the pytree
        structure/shardings (pass a freshly-initialized state)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          state_like)
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                infos=ocp.args.JsonRestore(),
            ),
        )
        return out["state"], dict(out["infos"] or {})

    def close(self) -> None:
        self._mgr.close()


def save_config(directory: str, cfg) -> None:
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.json"), "w") as f:
        f.write(cfg.to_json())


def load_config(directory: str):
    from cvc_tpu.config import Config
    with open(os.path.join(directory, "config.json")) as f:
        return Config.from_json(f.read())
