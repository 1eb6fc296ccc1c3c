"""Fused multi-query additive attention for beam search (Pallas TPU).

Beam search issues K queries per image against the SAME region tensors;
this kernel computes all K in one VMEM residency of keys/values:

    e     = tanh(keys[b] + q[b,k])       [K, S, A]
    score = e . w                        [K, S]
    alpha = masked softmax(score)        [K, S]
    ctx   = alpha . V[b]                 [K, H]

Inference-only (no VJP needed — beam search is forward-only).
Shapes: keys [B,S,A], q [B,K,A], w [A], v [B,S,H], mask [B,S] ->
        (ctx [B,K,H], alpha [B,K,S] f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(keys_ref, q_ref, w_ref, v_ref, mask_ref, ctx_ref, alpha_ref):
    keys = keys_ref[:]                    # [bB, S, A]
    q = q_ref[:]                          # [bB, K, A]
    w = w_ref[:]                          # [1, A]
    v = v_ref[:]                          # [bB, S, H]
    mask = mask_ref[:]                    # [bB, 1, S] (3-D: Mosaic requires
    #                                       sublane-divisible 2-D blocks)

    e = jnp.tanh(keys[:, None, :, :] + q[:, :, None, :])   # [bB, K, S, A]
    scores = jnp.sum(e * w[0][None, None, None, :], axis=-1,
                     dtype=jnp.float32)                     # [bB, K, S]
    m4 = mask > 0                                           # [bB, 1, S]
    masked = jnp.where(m4, scores, NEG)
    mx = jnp.max(masked, axis=-1, keepdims=True)
    ex = jnp.exp(masked - mx) * m4
    denom = jnp.maximum(jnp.sum(ex, axis=-1, keepdims=True), 1e-9)
    alpha = ex / denom                                      # [bB, K, S]
    alpha_ref[:] = alpha
    ctx = jnp.sum(alpha[..., None].astype(v.dtype) * v[:, None, :, :],
                  axis=2)                                   # [bB, K, H]
    ctx_ref[:] = ctx.astype(ctx_ref.dtype)


def fused_beam_attention(keys, q, w, v, mask, block_b: int = 4,
                         interpret: bool = False):
    B, S, A = keys.shape
    K = q.shape[1]
    H = v.shape[-1]
    grid = (pl.cdiv(B, block_b),)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, S, A), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, K, A), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, K, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, K, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, K, H), v.dtype),
            jax.ShapeDtypeStruct((B, K, S), jnp.float32),
        ),
        interpret=interpret,
    )(keys, q, w[None, :], v, mask[:, None, :])
