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
