"""Checkpoint/resume: round-trip exactness, best-CIDEr retention, infos."""

import jax
import jax.numpy as jnp
import numpy as np

from cvc_tpu.config import TrainConfig
from cvc_tpu.models import core
from cvc_tpu.training import TrainState, make_optimizer
from cvc_tpu.training.checkpoint import CheckpointManager
from tests.conftest import tiny_model_config


def _state():
    cfg = tiny_model_config()
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(TrainConfig(), steps_per_epoch=10)
    return TrainState.create(params, opt)


def test_save_restore_roundtrip(tmp_path):
    state = _state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(5, state, infos={"epoch": 1, "best": 0.5},
             metrics={"CIDEr": 0.5})
    mgr.wait()
    assert mgr.latest_step() == 5

    restored, infos = CheckpointManager(str(tmp_path / "ckpt")).restore(_state())
    assert infos["epoch"] == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_best_step_tracks_cider(tmp_path):
    state = _state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(1, state, infos={}, metrics={"CIDEr": 0.3})
    mgr.save(2, state, infos={}, metrics={"CIDEr": 0.9})
    mgr.save(3, state, infos={}, metrics={"CIDEr": 0.1})
    mgr.wait()
    assert mgr.best_step() == 2


def test_restore_missing_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    import pytest
    with pytest.raises(FileNotFoundError):
        mgr.restore(_state())
