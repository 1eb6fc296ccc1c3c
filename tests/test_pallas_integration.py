"""Model-level Pallas integration: use_pallas=True must reproduce the jnp
path (loss, metrics, gradients, generation) within float tolerance —
interpreter mode on CPU, same code path that compiles on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvc_tpu.models import core
from cvc_tpu.models.cyclical import cyclical_loss
from cvc_tpu.models.decoding import beam_search, greedy_decode
from tests.conftest import random_batch, tiny_model_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config()
    cfg_p = tiny_model_config(use_pallas=True)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 4, 0).items()}
    return cfg, cfg_p, params, arrays


def test_loss_matches(setup):
    cfg, cfg_p, params, arrays = setup
    l0, m0 = cyclical_loss(params, cfg, arrays, enable_cycle=True)
    l1, m1 = cyclical_loss(params, cfg_p, arrays, enable_cycle=True)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    np.testing.assert_allclose(float(m1["loss_recon"]),
                               float(m0["loss_recon"]), rtol=1e-5)


def test_grads_match(setup):
    cfg, cfg_p, params, arrays = setup

    def loss(p, c):
        return cyclical_loss(p, c, arrays, enable_cycle=True)[0]

    g0 = jax.grad(lambda p: loss(p, cfg))(params)
    g1 = jax.grad(lambda p: loss(p, cfg_p))(params)
    key = lambda kv: str(kv[0])
    for (k0, a), (k1, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g0), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(g1), key=key)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5,
                                   err_msg=str(k0))


def test_greedy_decode_matches(setup):
    cfg, cfg_p, params, arrays = setup
    g0 = greedy_decode(params, cfg, arrays, max_len=cfg.seq_length)
    g1 = greedy_decode(params, cfg_p, arrays, max_len=cfg.seq_length)
    np.testing.assert_array_equal(np.asarray(g0["tokens"]),
                                  np.asarray(g1["tokens"]))
    np.testing.assert_allclose(np.asarray(g1["alphas"]),
                               np.asarray(g0["alphas"]), rtol=1e-4,
                               atol=1e-6)


def test_beam_search_matches(setup):
    cfg, cfg_p, params, arrays = setup
    b0 = beam_search(params, cfg, arrays, beam_size=3, max_len=cfg.seq_length)
    b1 = beam_search(params, cfg_p, arrays, beam_size=3, max_len=cfg.seq_length)
    np.testing.assert_array_equal(np.asarray(b0["tokens"]),
                                  np.asarray(b1["tokens"]))
    np.testing.assert_allclose(np.asarray(b1["scores"]),
                               np.asarray(b0["scores"]), rtol=1e-4)


def test_auto_dispatch_gates_on_attention_width():
    """Auto Pallas dispatch must fall back to XLA beyond the kernels'
    VMEM blocking width (ANet video: 10x128 = 1280 slots measured a
    scoped-VMEM compile OOM); explicit settings are respected."""
    import dataclasses
    from cvc_tpu.ops.dispatch import MAX_PALLAS_REGION_SLOTS, use_pallas
    from tests.conftest import tiny_model_config
    wide = tiny_model_config(num_frames=10, num_regions=128)
    assert wide.total_regions > MAX_PALLAS_REGION_SLOTS
    assert use_pallas(dataclasses.replace(wide, use_pallas=None)) is False
    assert use_pallas(dataclasses.replace(wide, use_pallas=True)) is True
    assert use_pallas(dataclasses.replace(wide, use_pallas=False)) is False
