"""Pallas kernels vs jnp oracles (interpreter mode on CPU — SURVEY.md §4):
forward equality and custom-VJP gradient equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvc_tpu.ops.pallas.attention import fused_additive_attention, _oracle
from cvc_tpu.ops.pallas.lstm import fused_lstm_gates
from cvc_tpu.ops.pallas.xent import fused_masked_xent
from cvc_tpu.ops.primitives import lstm_cell, masked_xent


def _attn_inputs(B=8, S=16, A=32, H=24, seed=0):
    rng = np.random.default_rng(seed)
    keys = jnp.asarray(rng.normal(size=(B, S, A)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, A)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(A,)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    mask = jnp.asarray(
        (np.arange(S)[None, :] < rng.integers(2, S + 1, size=(B, 1)))
        .astype(np.float32))
    return keys, q, w, v, mask


def test_attention_forward_matches_oracle():
    keys, q, w, v, mask = _attn_inputs()
    ctx_p, alpha_p = fused_additive_attention(keys, q, w, v, mask, 4, True)
    ctx_o, alpha_o = _oracle(keys, q, w, v, mask)
    np.testing.assert_allclose(ctx_p, ctx_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(alpha_p, alpha_o, rtol=1e-5, atol=1e-6)


def test_attention_grads_match_oracle():
    keys, q, w, v, mask = _attn_inputs(B=4, S=8, A=16, H=12)

    def loss_p(keys, q, w, v):
        ctx, alpha = fused_additive_attention(keys, q, w, v, mask, 4, True)
        return jnp.sum(ctx * ctx) + jnp.sum(alpha ** 3)

    def loss_o(keys, q, w, v):
        ctx, alpha = _oracle(keys, q, w, v, mask)
        return jnp.sum(ctx * ctx) + jnp.sum(alpha ** 3)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(keys, q, w, v)
    go = jax.grad(loss_o, argnums=(0, 1, 2, 3))(keys, q, w, v)
    for a, b in zip(gp, go):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_attention_fully_masked_row_safe():
    keys, q, w, v, mask = _attn_inputs(B=4, S=8, A=16, H=12)
    mask = mask.at[0].set(0.0)
    ctx, alpha = fused_additive_attention(keys, q, w, v, mask, 4, True)
    assert np.isfinite(np.asarray(ctx)).all()
    np.testing.assert_allclose(np.asarray(alpha)[0], 0.0)


def test_lstm_gates_forward_matches_oracle():
    rng = np.random.default_rng(1)
    gates = jnp.asarray(rng.normal(size=(8, 4 * 16)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    h_p, c_p = fused_lstm_gates(gates, c, 4, True)
    h_o, c_o = lstm_cell(gates, c)
    np.testing.assert_allclose(h_p, h_o, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c_p, c_o, rtol=1e-5, atol=1e-6)


def test_lstm_gates_grads_match_oracle():
    rng = np.random.default_rng(2)
    gates = jnp.asarray(rng.normal(size=(4, 4 * 8)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)

    def loss_p(gates, c):
        h, cn = fused_lstm_gates(gates, c, 4, True)
        return jnp.sum(h * h) + jnp.sum(jnp.sin(cn))

    def loss_o(gates, c):
        h, cn = lstm_cell(gates, c)
        return jnp.sum(h * h) + jnp.sum(jnp.sin(cn))

    gp = jax.grad(loss_p, argnums=(0, 1))(gates, c)
    go = jax.grad(loss_o, argnums=(0, 1))(gates, c)
    for a, b in zip(gp, go):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_xent_forward_matches_oracle():
    rng = np.random.default_rng(3)
    N, V = 16, 64
    logits = jnp.asarray(rng.normal(size=(N, V)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, V, size=(N,)), jnp.int32)
    mask = jnp.asarray((rng.random(N) > 0.3).astype(np.float32))
    got = fused_masked_xent(logits, targets, mask, 8, True)
    want = masked_xent(logits[None], targets[None], mask[None]) * mask.sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_xent_grads_match_oracle():
    rng = np.random.default_rng(4)
    N, V = 8, 32
    logits = jnp.asarray(rng.normal(size=(N, V)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, V, size=(N,)), jnp.int32)
    mask = jnp.asarray((rng.random(N) > 0.3).astype(np.float32))

    def loss_p(lg):
        return fused_masked_xent(lg, targets, mask, 8, True) / mask.sum()

    def loss_o(lg):
        return masked_xent(lg[None], targets[None], mask[None])

    gp = jax.grad(loss_p)(logits)
    go = jax.grad(loss_o)(logits)
    np.testing.assert_allclose(gp, go, rtol=2e-4, atol=2e-6)


def test_fused_beam_decoder_core_matches_oracle():
    """The whole fused middle of a beam step (LSTM1 gating -> q proj ->
    masked attention -> MXU context) vs the jnp oracle."""
    from cvc_tpu.ops.pallas.decoder_step import (beam_core_oracle,
                                                 fused_beam_decoder_core)
    rng = np.random.default_rng(0)
    B, K, S, A, H = 6, 5, 16, 32, 24
    gates1 = jnp.asarray(rng.normal(size=(B, K, 4 * H)), jnp.float32)
    c_att = jnp.asarray(rng.normal(size=(B, K, H)), jnp.float32)
    keys = jnp.asarray(rng.normal(size=(B, S, A)), jnp.float32)
    v_enc = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    mask = jnp.asarray(
        (np.arange(S)[None, :] < rng.integers(2, S + 1, size=(B, 1)))
        .astype(np.float32))
    att_wh = jnp.asarray(rng.normal(size=(H, A)), jnp.float32)
    att_b = jnp.asarray(rng.normal(size=(A,)), jnp.float32)
    att_w = jnp.asarray(rng.normal(size=(A,)), jnp.float32)

    outs_p = fused_beam_decoder_core(gates1, c_att, keys, v_enc, mask,
                                     att_wh, att_b, att_w, block_b=4,
                                     interpret=True)
    outs_o = beam_core_oracle(gates1, c_att, keys, v_enc, mask,
                              att_wh, att_b, att_w)
    for p, o, name in zip(outs_p, outs_o, ("h", "c", "ctx", "alpha")):
        np.testing.assert_allclose(p, o, rtol=2e-5, atol=2e-5,
                                   err_msg=name)


def test_fused_beam_decoder_core_fully_masked_row():
    from cvc_tpu.ops.pallas.decoder_step import fused_beam_decoder_core
    rng = np.random.default_rng(1)
    B, K, S, A, H = 2, 3, 8, 16, 8
    gates1 = jnp.asarray(rng.normal(size=(B, K, 4 * H)), jnp.float32)
    c_att = jnp.zeros((B, K, H), jnp.float32)
    keys = jnp.asarray(rng.normal(size=(B, S, A)), jnp.float32)
    v_enc = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    mask = jnp.zeros((B, S), jnp.float32)  # no valid regions at all
    att_wh = jnp.asarray(rng.normal(size=(H, A)), jnp.float32)
    att_b = jnp.zeros((A,), jnp.float32)
    att_w = jnp.ones((A,), jnp.float32)
    h, c, ctx, alpha = fused_beam_decoder_core(
        gates1, c_att, keys, v_enc, mask, att_wh, att_b, att_w,
        block_b=2, interpret=True)
    assert np.isfinite(np.asarray(ctx)).all()
    np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-9)


def test_attention_grads_fully_masked_row_finite():
    """Backward kernel: a fully-masked row yields zero dkeys/dq and finite
    everything (alpha rows are 0 there, so softmax-bwd must not NaN)."""
    keys, q, w, v, mask = _attn_inputs(B=4, S=8, A=16, H=12)
    mask = mask.at[0].set(0.0)

    def loss(keys, q, w, v):
        ctx, alpha = fused_additive_attention(keys, q, w, v, mask, 4, True)
        return jnp.sum(ctx * ctx) + jnp.sum(alpha ** 3)

    gk, gq, gw, gv = jax.grad(loss, argnums=(0, 1, 2, 3))(keys, q, w, v)
    for g in (gk, gq, gw, gv):
        assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(gk)[0], 0.0)
    np.testing.assert_allclose(np.asarray(gq)[0], 0.0)


def test_attention_grads_padded_block_and_multiblock():
    """dw reduces over batch rows: blocks that pad past B (B % block != 0)
    and multi-block grids must both keep padding garbage out of the
    accumulation (regression: NaN dw at B=4, block=8)."""
    keys, q, w, v, mask = _attn_inputs(B=6, S=8, A=16, H=12)

    def mk(block):
        def loss(keys, q, w, v):
            ctx, alpha = fused_additive_attention(keys, q, w, v, mask,
                                                  block, True)
            return jnp.sum(ctx * ctx) + jnp.sum(alpha ** 3)
        return loss

    def loss_o(keys, q, w, v):
        ctx, alpha = _oracle(keys, q, w, v, mask)
        return jnp.sum(ctx * ctx) + jnp.sum(alpha ** 3)

    go = jax.grad(loss_o, argnums=(0, 1, 2, 3))(keys, q, w, v)
    for block in (4, 8):        # 4: two blocks w/ padding; 8: one, padded
        gp = jax.grad(mk(block), argnums=(0, 1, 2, 3))(keys, q, w, v)
        for a, b in zip(gp, go):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
