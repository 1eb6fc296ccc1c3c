"""Fused additive (Bahdanau) region attention as a Pallas TPU kernel.

Replaces the jnp composition in `cvc_tpu.ops.primitives` (the reference's
stock-kernel attention inside `misc/model.py`) with ONE kernel per batch
block that keeps every intermediate in VMEM:

    e      = tanh(keys + q)            [bB, S, A]   (VPU)
    scores = e . w                     [bB, S]      (VPU reduce)
    alpha  = masked softmax(scores)    [bB, S]      (f32)
    ctx    = alpha . V                 [bB, H]      (MXU)

The [B, S, A] tanh intermediate never round-trips HBM — that's the fusion
win over the unfused lowering.  Backward is a jnp custom-VJP (XLA fuses it
well); see `_attention_bwd`.

Shapes: keys [B,S,A], q [B,A], w [A], v [B,S,H], mask [B,S] ->
        (ctx [B,H], alpha [B,S] f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # python literal: jnp constants would be captured tracers


def _kernel(keys_ref, q_ref, w_ref, v_ref, mask_ref, ctx_ref, alpha_ref):
    keys = keys_ref[:]                       # [bB, S, A]
    q = q_ref[:]                             # [bB, A]
    w = w_ref[:]                             # [1, A]
    v = v_ref[:]                             # [bB, S, H]
    mask = mask_ref[:]                       # [bB, S]

    e = jnp.tanh(keys + q[:, None, :])
    scores = jnp.sum(e * w[0][None, None, :], axis=-1,
                     dtype=jnp.float32)      # [bB, S]
    masked = jnp.where(mask > 0, scores, NEG)
    m = jnp.max(masked, axis=-1, keepdims=True)
    ex = jnp.exp(masked - m) * (mask > 0)
    denom = jnp.maximum(jnp.sum(ex, axis=-1, keepdims=True), 1e-9)
    alpha = ex / denom                       # [bB, S] f32
    alpha_ref[:] = alpha
    # batched matvec as VPU multiply-reduce (mosaic here can't lower a
    # batch-dim dot_general; S=O(128) makes the reduce cheap)
    ctx = jnp.sum(alpha[..., None].astype(v.dtype) * v, axis=1)
    ctx_ref[:] = ctx.astype(ctx_ref.dtype)


def _fwd_pallas(keys, q, w, v, mask, *, block_b: int, interpret: bool):
    B, S, A = keys.shape
    H = v.shape[-1]
    grid = (pl.cdiv(B, block_b),)
    kernel = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, S, A), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, A), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H), v.dtype),
            jax.ShapeDtypeStruct((B, S), jnp.float32),
        ),
        interpret=interpret,
    )
    return kernel(keys, q, w[None, :], v, mask)


def _oracle(keys, q, w, v, mask):
    from cvc_tpu.ops.primitives import (additive_attention_scores,
                                        masked_softmax)
    scores = additive_attention_scores(keys, q, w)
    alpha = masked_softmax(scores, mask)
    ctx = jnp.einsum("bs,bsh->bh", alpha.astype(v.dtype), v)
    return ctx, alpha


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_additive_attention(keys, q, w, v, mask, block_b: int = 8,
                             interpret: bool = False):
    return _fwd_pallas(keys, q, w, v, mask, block_b=block_b,
                       interpret=interpret)


def _attention_fwd(keys, q, w, v, mask, block_b, interpret):
    ctx, alpha = _fwd_pallas(keys, q, w, v, mask, block_b=block_b,
                             interpret=interpret)
    return (ctx, alpha), (keys, q, w, v, mask, alpha)


def _bwd_oracle(res, grads):
    """Pure-jnp backward (the test oracle; XLA materializes the [B,S,A]
    tanh and its cotangent in HBM here — the Pallas bwd below avoids
    that by recomputing them in VMEM)."""
    keys, q, w, v, mask, alpha = res
    g_ctx, g_alpha = grads
    a_dt = alpha.astype(v.dtype)
    dv = a_dt[..., None] * g_ctx[:, None, :]                  # [B,S,H]
    d_alpha = jnp.einsum("bh,bsh->bs", g_ctx, v).astype(jnp.float32)
    d_alpha = d_alpha + g_alpha.astype(jnp.float32)
    # softmax backward (rows fully masked have alpha == 0 -> zero grads)
    inner = jnp.sum(alpha * d_alpha, axis=-1, keepdims=True)
    d_scores = alpha * (d_alpha - inner)                      # [B,S] f32
    u = jnp.tanh(keys + q[:, None, :])
    de = (d_scores.astype(keys.dtype))[..., None] * w[None, None, :] \
        * (1.0 - u * u)
    dkeys = de
    dq = jnp.sum(de, axis=1)
    dw = jnp.sum(d_scores[..., None].astype(u.dtype) * u, axis=(0, 1))
    return dkeys, dq, dw, dv, None


def _bwd_kernel(nrows, keys_ref, q_ref, w_ref, v_ref, alpha_ref, gctx_ref,
                galpha_ref, dkeys_ref, dq_ref, dw_ref, dv_ref):
    """Backward block: recompute e = tanh(keys+q) in VMEM (never saved to
    HBM by the forward), emit dkeys/dq/dv for this batch block and
    accumulate dw across grid steps (all blocks map to dw block 0).

    `nrows` is the true batch size: when B % block_b != 0 the last block's
    padding rows hold unspecified memory, and dw REDUCES over rows — the
    validity mask keeps that garbage out of the accumulation (per-row
    outputs are simply dropped by Pallas, but reductions are not)."""
    keys = keys_ref[:]                       # [bB, S, A]
    q = q_ref[:]                             # [bB, A]
    w = w_ref[0]                             # [A]
    v = v_ref[:]                             # [bB, S, H]
    alpha = alpha_ref[:]                     # [bB, S] f32
    g_ctx = gctx_ref[:]                      # [bB, H]
    g_alpha = galpha_ref[:]                  # [bB, S]

    bB = alpha.shape[0]
    row = (pl.program_id(0) * bB
           + jax.lax.broadcasted_iota(jnp.int32, (bB, 1), 0))
    valid = row < nrows                      # [bB, 1]

    a_dt = alpha.astype(v.dtype)
    dv_ref[:] = a_dt[..., None] * g_ctx[:, None, :]
    d_alpha = jnp.sum(v * g_ctx[:, None, :], axis=-1,
                      dtype=jnp.float32) + g_alpha.astype(jnp.float32)
    inner = jnp.sum(alpha * d_alpha, axis=-1, keepdims=True)
    d_scores = alpha * (d_alpha - inner)                      # [bB, S] f32
    d_scores = jnp.where(valid, d_scores, 0.0)
    u = jnp.tanh(keys + q[:, None, :])
    u = jnp.where(valid[..., None], u, 0.0)
    de = (d_scores.astype(keys.dtype))[..., None] * w[None, None, :] \
        * (1.0 - u * u)
    dkeys_ref[:] = de
    dq_ref[:] = jnp.sum(de, axis=1)
    dw_part = jnp.sum(d_scores[..., None].astype(jnp.float32)
                      * u.astype(jnp.float32), axis=(0, 1))   # [A] f32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    dw_ref[0, :] += dw_part


def _bwd_pallas(res, grads, *, block_b: int, interpret: bool):
    keys, q, w, v, mask, alpha = res
    g_ctx, g_alpha = grads
    B, S, A = keys.shape
    H = v.shape[-1]
    # The bwd tile holds ~3x the fwd's per-row VMEM (keys+e+de on the A
    # side, v+dv on the H side), double-buffered by Mosaic: shrink the
    # batch block until the tile fits the ~16 MB scoped-vmem budget.
    # Mosaic needs >=8 rows in 2-D blocks; if even block_b=8 does not
    # fit (f32 at flagship widths), fall back to the jnp backward.
    bytes_per_row = 2 * (3 * S * A + 2 * S * H) * keys.dtype.itemsize
    while block_b > 8 and block_b * bytes_per_row > 12 * 2 ** 20:
        block_b //= 2
    if block_b * bytes_per_row > 12 * 2 ** 20 and not interpret:
        return _bwd_oracle(res, grads)
    grid = (pl.cdiv(B, block_b),)
    kernel = pl.pallas_call(
        functools.partial(_bwd_kernel, B),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, S, A), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, A), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, S, A), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, A), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, A), keys.dtype),
            jax.ShapeDtypeStruct((B, A), q.dtype),
            jax.ShapeDtypeStruct((1, A), jnp.float32),
            jax.ShapeDtypeStruct((B, S, H), v.dtype),
        ),
        interpret=interpret,
    )
    g_alpha = jnp.zeros_like(alpha) if g_alpha is None else g_alpha
    dkeys, dq, dw, dv = kernel(keys, q, w[None, :], v, alpha,
                               g_ctx.astype(v.dtype),
                               g_alpha.astype(jnp.float32))
    return dkeys, dq, dw[0].astype(w.dtype), dv, None


def _attention_bwd(block_b, interpret, res, grads):
    return _bwd_pallas(res, grads, block_b=block_b, interpret=interpret)


fused_additive_attention.defvjp(_attention_fwd, _attention_bwd)
