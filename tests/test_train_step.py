"""SPMD training step on a virtual 8-device CPU mesh (the TPU-world fake
backend for distributed tests; SURVEY.md §4).

Checks: mesh construction, sharded-vs-single-device numerical agreement
(GSPMD must not change the math), loss decrease under updates, LR
schedule semantics, and tensor-parallel vocab-head sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvc_tpu.config import TrainConfig
from cvc_tpu.models import core
from cvc_tpu.parallel.mesh import make_mesh, shard_batch, param_shardings
from cvc_tpu.training.optimizer import make_optimizer, lr_schedule
from cvc_tpu.training.step import (make_train_step, make_eval_step,
                                   state_shardings)
from cvc_tpu.training.train_state import TrainState
from tests.conftest import random_batch, tiny_model_config


def _setup(model_axis=1, batch=8, drop=0.0):
    cfg = tiny_model_config(drop_prob_lm=drop)
    tc = TrainConfig(learning_rate=1e-3, grad_clip=1.0, donate_state=False)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(tc, steps_per_epoch=10)
    state = TrainState.create(params, opt)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, batch, 0).items()}
    return cfg, tc, opt, state, arrays


def test_mesh_shapes():
    m = make_mesh(8, model_axis=2)
    assert m.shape["data"] == 4 and m.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh(8, model_axis=3)


def test_single_device_step_decreases_loss():
    cfg, tc, opt, state, arrays = _setup()
    step = make_train_step(cfg, tc, opt)
    rng = jax.random.PRNGKey(7)
    losses = []
    for _ in range(8):
        state, m = step(state, arrays, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(m["grad_norm"])


def test_sharded_matches_single_device():
    """The GSPMD-compiled step over (data=4, model=2) must produce the same
    losses as the single-device step — same math, different layout."""
    cfg, tc, opt, state, arrays = _setup()
    rng = jax.random.PRNGKey(3)

    step1 = make_train_step(cfg, tc, opt)
    s1, losses1 = state, []
    for _ in range(3):
        s1, m = step1(s1, arrays, rng)
        losses1.append(float(m["loss"]))

    mesh = make_mesh(8, model_axis=2)
    sharded_arrays = shard_batch(mesh, arrays)
    stepN = make_train_step(cfg, tc, opt, mesh=mesh, state=state,
                            example_arrays=arrays)
    sN = jax.device_put(state, state_shardings(mesh, state))
    lossesN = []
    for _ in range(3):
        sN, m = stepN(sN, sharded_arrays, rng)
        lossesN.append(float(m["loss"]))
    np.testing.assert_allclose(losses1, lossesN, rtol=2e-4)


def test_vocab_head_actually_sharded():
    cfg, tc, opt, state, arrays = _setup()
    mesh = make_mesh(8, model_axis=2)
    p_sh = param_shardings(mesh, state.params, shard_vocab_head=True)
    spec = p_sh["logit"]["w"].spec
    assert spec == jax.sharding.PartitionSpec(None, "model")
    placed = jax.device_put(state.params, p_sh)
    # each shard holds half the vocab dim
    shard_shape = placed["logit"]["w"].sharding.shard_shape(
        placed["logit"]["w"].shape)
    assert shard_shape[1] == cfg.vocab_size // 2


def test_eval_step_runs_sharded():
    cfg, tc, opt, state, arrays = _setup(batch=8)
    mesh = make_mesh(8, model_axis=1)
    ev = make_eval_step(cfg, mesh=mesh, state=state, example_arrays=arrays)
    p_sh = param_shardings(mesh, state.params, shard_vocab_head=True)
    placed = jax.device_put(state.params, p_sh)
    m = ev(placed, shard_batch(mesh, arrays))
    assert np.isfinite(float(m["loss"]))


def test_lr_schedule_staircase():
    tc = TrainConfig(learning_rate=1.0, learning_rate_decay_start=1,
                     learning_rate_decay_every=2,
                     learning_rate_decay_rate=0.5)
    sched = lr_schedule(tc, steps_per_epoch=10)
    # reference lineage: rate^floor((epoch-start)/every), only once
    # epoch > start -> epochs 0..2 full LR; 3,4 -> 0.5; 5,6 -> 0.25
    assert float(sched(5)) == 1.0    # epoch 0
    assert float(sched(10)) == 1.0   # epoch 1 == start
    assert float(sched(25)) == 1.0   # epoch 2: (2-1)//2 = 0
    assert float(sched(30)) == 0.5   # epoch 3: (3-1)//2 = 1
    assert float(sched(50)) == 0.25  # epoch 5: (5-1)//2 = 2


def test_grad_clip_applied():
    cfg, tc, opt, state, arrays = _setup()
    tc_small = TrainConfig(learning_rate=1e-3, grad_clip=1e-6,
                           donate_state=False)
    opt2 = make_optimizer(tc_small, steps_per_epoch=10)
    state2 = TrainState.create(state.params, opt2)
    step = make_train_step(cfg, tc_small, opt2)
    s, m = step(state2, arrays, jax.random.PRNGKey(0))
    # clipped to tiny norm -> params barely move
    diff = max(float(jnp.abs(a - b).max()) for a, b in
               zip(jax.tree_util.tree_leaves(s.params),
                   jax.tree_util.tree_leaves(state2.params)))
    assert diff < 1e-2


def test_eval_step_sharded_with_attn_supervision():
    """Regression (ADVICE r1): mesh eval step must not pin a fixed metric
    pytree — supervised-grounding configs add loss_attn_sup."""
    cfg = tiny_model_config(attn_supervision_weight=0.5)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    tc = TrainConfig(learning_rate=1e-3, donate_state=False)
    opt = make_optimizer(tc, steps_per_epoch=10)
    state = TrainState.create(params, opt)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 8, 0).items()}
    T = cfg.max_tokens
    gt = np.full((8, T), -1, np.int32)
    gt[:, 1] = 0  # one supervised word per row
    arrays["gt_region"] = jnp.asarray(gt)
    mesh = make_mesh(8, model_axis=1)
    ev = make_eval_step(cfg, mesh=mesh, state=state, example_arrays=arrays)
    placed = jax.device_put(state.params,
                            param_shardings(mesh, state.params))
    metrics = ev(placed, shard_batch(mesh, arrays))
    assert "loss_attn_sup" in metrics
    assert np.isfinite(float(metrics["loss"]))


def test_fused_gt_cycle_sharded_matches_single_device():
    """The merged decode+reconstruct scan (GT-query bootstrap phase)
    stacks the batch to 2B along the data-sharded axis — GSPMD must keep
    the same numerics as the single-device fused step."""
    import dataclasses
    cfg, tc, opt, state, arrays = _setup()
    cfg = dataclasses.replace(cfg, cycle_localize_gt=True)
    rng = jax.random.PRNGKey(5)

    step1 = make_train_step(cfg, tc, opt)
    s1, losses1 = state, []
    for _ in range(3):
        s1, m = step1(s1, arrays, rng)
        losses1.append(float(m["loss"]))

    mesh = make_mesh(8, model_axis=2)
    stepN = make_train_step(cfg, tc, opt, mesh=mesh, state=state,
                            example_arrays=arrays)
    sN = jax.device_put(state, state_shardings(mesh, state))
    sharded_arrays = shard_batch(mesh, arrays)
    lossesN = []
    for _ in range(3):
        sN, m = stepN(sN, sharded_arrays, rng)
        lossesN.append(float(m["loss"]))
    np.testing.assert_allclose(losses1, lossesN, rtol=2e-4)
