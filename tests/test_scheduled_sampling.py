"""Scheduled sampling: ss_prob=0 must equal plain teacher forcing; the
ss path trains; the annealing schedule matches the reference formula."""

import jax
import jax.numpy as jnp
import numpy as np

from cvc_tpu.config import TrainConfig
from cvc_tpu.models import core
from cvc_tpu.models.cyclical import cyclical_loss
from cvc_tpu.training import TrainState, make_optimizer, make_train_step
from tests.conftest import random_batch, tiny_model_config


def test_ss_prob_zero_equals_teacher_forcing():
    cfg = tiny_model_config()
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 3, 0).items()}
    rng = jax.random.PRNGKey(5)
    l0, _ = cyclical_loss(params, cfg, arrays, rng=rng, train=False,
                          enable_cycle=False, ss_prob=None)
    l1, _ = cyclical_loss(params, cfg, arrays, rng=rng, train=False,
                          enable_cycle=False,
                          ss_prob=jnp.asarray(0.0))
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)


def test_ss_prob_changes_loss_and_is_finite():
    cfg = tiny_model_config()
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 3, 0).items()}
    rng = jax.random.PRNGKey(5)
    l0, _ = cyclical_loss(params, cfg, arrays, rng=rng, train=False,
                          enable_cycle=False, ss_prob=jnp.asarray(0.0))
    l1, _ = cyclical_loss(params, cfg, arrays, rng=rng, train=False,
                          enable_cycle=False, ss_prob=jnp.asarray(1.0))
    assert np.isfinite(float(l1))
    assert abs(float(l1) - float(l0)) > 1e-6


def test_ss_train_step_runs_and_grads_flow():
    cfg = tiny_model_config()
    tc = TrainConfig(learning_rate=1e-3, scheduled_sampling_start=0,
                     donate_state=False)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(tc, steps_per_epoch=10)
    state = TrainState.create(params, opt)
    step = make_train_step(cfg, tc, opt)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 4, 0).items()}
    s, m = step(state, arrays, jax.random.PRNGKey(1), jnp.asarray(0.3))
    assert np.isfinite(float(m["loss"]))
    assert float(m["grad_norm"]) > 0


def test_resident_ss_matches_streaming_ss():
    """Scheduled sampling composed with resident feeding (the round-3
    exclusion in loop.py): the resident step's ss_prob arg must reproduce
    the streaming step on the same gathered batch and rng."""
    from cvc_tpu.data.device_data import DeviceDataset, gather_batch
    from cvc_tpu.data.synthetic import make_synthetic_dataset
    from cvc_tpu.training.step import make_resident_train_step

    cfg = tiny_model_config()
    ds = make_synthetic_dataset(num_images=8, num_regions=cfg.num_regions,
                                feat_dim=cfg.feat_dim,
                                seq_length=cfg.seq_length,
                                num_classes=cfg.num_classes, seed=4)
    cfg.vocab_size = ds.vocab.padded_size(128)
    dd = DeviceDataset(ds, cfg)
    tc = TrainConfig(learning_rate=1e-3, grad_clip=1.0, donate_state=False,
                     scheduled_sampling_start=0)
    opt = make_optimizer(tc, steps_per_epoch=10)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(2)
    ss = jnp.asarray(0.2, jnp.float32)
    idx = np.asarray([1, 2, 5, 7], np.int32)

    state_r = TrainState.create(params, opt)
    r_step = make_resident_train_step(cfg, tc, opt)
    state_r, m_r = r_step(state_r, dd.data, jnp.asarray(idx), rng, ss)

    arrays = jax.jit(gather_batch)(dd.data, jnp.asarray(idx))
    state_s = TrainState.create(params, opt)
    s_step = make_train_step(cfg, tc, opt)
    state_s, m_s = s_step(state_s, arrays, rng, ss)

    np.testing.assert_allclose(float(m_r["loss"]), float(m_s["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_r.params),
                    jax.tree_util.tree_leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_mesh_resident_ss_step_runs():
    """SS x mesh x resident: the three-way composition compiles and takes
    a finite step on the virtual mesh."""
    from cvc_tpu.data.device_data import ShardedDeviceDataset
    from cvc_tpu.data.synthetic import make_synthetic_dataset
    from cvc_tpu.parallel.mesh import make_mesh
    from cvc_tpu.training.step import (make_resident_train_step,
                                       state_shardings)

    cfg = tiny_model_config()
    ds = make_synthetic_dataset(num_images=12, num_regions=cfg.num_regions,
                                feat_dim=cfg.feat_dim,
                                seq_length=cfg.seq_length,
                                num_classes=cfg.num_classes, seed=6)
    cfg.vocab_size = ds.vocab.padded_size(128)
    mesh = make_mesh(4, model_axis=2)
    dd = ShardedDeviceDataset(ds, cfg, mesh)
    tc = TrainConfig(learning_rate=1e-3, grad_clip=1.0, donate_state=False,
                     scheduled_sampling_start=0)
    opt = make_optimizer(tc, steps_per_epoch=10)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    state = TrainState.create(params, opt)
    state = jax.device_put(state, state_shardings(mesh, state))
    step = make_resident_train_step(cfg, tc, opt, mesh=mesh, state=state)
    for idx in dd.epoch_batches(8, seed=0):
        state, m = step(state, dd.data, jnp.asarray(idx),
                        jax.random.PRNGKey(3), jnp.asarray(0.15, jnp.float32))
        assert np.isfinite(float(m["loss"]))
        break
