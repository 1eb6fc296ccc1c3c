"""Parity of the stacked-gradient decode VJP (models/decode_vjp.py)
against jax.grad of the plain lax.scan path: same forward values, same
gradients, across every teacher-forced mode the training step uses
(plain decode, argmax-query cycle with its use_attention=False
reconstruct pass, and the merged GT-query 2B-row scan with
context_mix), in f32 and bf16."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvc_tpu.models import core
from cvc_tpu.models.cyclical import cyclical_loss, decode_teacher_forced
from tests.conftest import random_batch, tiny_model_config


def _setup(**cfg_kw):
    cfg = tiny_model_config(**cfg_kw)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 5, 3).items()
              if v is not None}
    return cfg, params, arrays


def _grads(cfg, params, arrays, **loss_kw):
    def loss(p):
        out = cyclical_loss(p, cfg, arrays, **loss_kw)
        return out[0] if isinstance(out, tuple) else out

    val, g = jax.value_and_grad(loss)(params)
    return val, g


def _assert_tree_close(a, b, rtol, atol):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("mode", ["plain", "cycle", "merged"])
def test_stacked_grad_parity_f32(mode):
    kw = {}
    if mode == "merged":
        kw = dict(cycle_localize_gt=True)
    cfg, params, arrays = _setup(**kw)
    cfg_s = dataclasses.replace(cfg, stacked_grad=True)
    enable_cycle = mode != "plain"
    v0, g0 = _grads(cfg, params, arrays, enable_cycle=enable_cycle)
    v1, g1 = _grads(cfg_s, params, arrays, enable_cycle=enable_cycle)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    _assert_tree_close(g0, g1, rtol=2e-4, atol=1e-5)


def test_stacked_grad_parity_bf16():
    cfg, params, arrays = _setup(dtype="bfloat16")
    cfg_s = dataclasses.replace(cfg, stacked_grad=True)
    v0, g0 = _grads(cfg, params, arrays, enable_cycle=True)
    v1, g1 = _grads(cfg_s, params, arrays, enable_cycle=True)
    # forward is the same bf16 math op-for-op
    np.testing.assert_allclose(float(v0), float(v1), rtol=2e-2)
    # bf16 grads accumulate in different orders (stacked contraction vs
    # per-step adds): loose tolerance, but structure must agree
    _assert_tree_close(g0, g1, rtol=1e-1, atol=3e-2)


def test_stacked_forward_values_and_alphas_identical():
    cfg, params, arrays = _setup()
    cfg_s = dataclasses.replace(cfg, stacked_grad=True)
    lg0, al0, h0, _ = decode_teacher_forced(params, cfg, arrays)
    lg1, al1, h1, _ = decode_teacher_forced(params, cfg_s, arrays)
    np.testing.assert_allclose(np.asarray(lg0), np.asarray(lg1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(al0), np.asarray(al1),
                               rtol=1e-6, atol=1e-6)


def test_stacked_grad_alpha_cotangent():
    """Gradients must also flow through the returned attention maps
    (the attention-supervision loss consumes them)."""
    cfg, params, arrays = _setup(attn_supervision_weight=0.5)
    cfg_s = dataclasses.replace(cfg, stacked_grad=True)
    # attention supervision needs GT alignment targets when enabled; if
    # the loss ignores missing targets this still exercises alphas via
    # the localizer-free decode, so fall back to a direct probe:

    def probe(p, c):
        _, alphas, h, _ = decode_teacher_forced(p, c, arrays)
        return (jnp.sum(alphas * alphas) * 0.1
                + jnp.sum(h.astype(jnp.float32) ** 2) * 0.01)

    g0 = jax.grad(probe)(params, cfg)
    g1 = jax.grad(probe)(params, cfg_s)
    _assert_tree_close(g0, g1, rtol=2e-4, atol=1e-5)


def test_stacked_grad_nonzero_init_carry_and_full_mask_rows():
    """Fully-masked region rows (padded batch entries) must keep zero
    attention and produce finite grads in both paths."""
    cfg, params, arrays = _setup()
    mask = np.asarray(arrays["region_mask"]).copy()
    mask[-1] = 0.0
    arrays = dict(arrays, region_mask=jnp.asarray(mask))
    cfg_s = dataclasses.replace(cfg, stacked_grad=True)
    v0, g0 = _grads(cfg, params, arrays, enable_cycle=True)
    v1, g1 = _grads(cfg_s, params, arrays, enable_cycle=True)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    _assert_tree_close(g0, g1, rtol=2e-4, atol=1e-5)
    for leaf in jax.tree_util.tree_leaves(g1):
        assert np.isfinite(np.asarray(leaf)).all()
