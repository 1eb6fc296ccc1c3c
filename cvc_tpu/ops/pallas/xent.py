"""Fused masked softmax-cross-entropy over the vocab as a Pallas kernel.

The decode/reconstruct losses reduce [B*L, V] logits (V ~ 8704) against
integer targets (reference: LanguageModelCriterion in `misc/utils.py`).
Fusing logsumexp + target-gather + masking in one pass avoids
materializing the [B*L, V] softmax in the forward; the backward kernel
recomputes softmax from the saved logits and emits
(softmax - onehot) * mask * g directly.

API: fused_masked_xent(logits [N, V], targets [N], mask [N]) -> scalar
     sum of masked NLL (divide by mask-sum outside).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(logits_ref, tgt_ref, mask_ref, nll_ref):
    logits = logits_ref[:].astype(jnp.float32)          # [bN, V]
    tgt = tgt_ref[:]                                    # [bN, 1]
    mask = mask_ref[:]                                  # [bN, 1]
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1,
                          keepdims=True)) + m           # [bN, 1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) == tgt)
    tgt_logit = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1,
                        keepdims=True)
    nll_ref[:] = (lse - tgt_logit) * mask


def _bwd_kernel(logits_ref, tgt_ref, mask_ref, g_ref, dlogits_ref):
    logits = logits_ref[:].astype(jnp.float32)
    tgt = tgt_ref[:]                                    # [bN, 1]
    mask = mask_ref[:]                                  # [bN, 1]
    g = g_ref[0, 0]
    m = jnp.max(logits, axis=-1, keepdims=True)
    ex = jnp.exp(logits - m)
    p = ex / jnp.sum(ex, axis=-1, keepdims=True)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
              == tgt).astype(jnp.float32)
    dlogits_ref[:] = ((p - onehot) * (mask * g)).astype(dlogits_ref.dtype)


def _row_spec(block_n, x):
    return pl.BlockSpec((block_n,) + x.shape[1:],
                        lambda i: (i,) + (0,) * (x.ndim - 1),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_masked_xent(logits, targets, mask, block_n: int = 128,
                      interpret: bool = False):
    nll = _nll_rows(logits, targets, mask, block_n, interpret)
    return jnp.sum(nll)


def _nll_rows(logits, targets, mask, block_n, interpret):
    # 1-D operands hit XLA/Mosaic layout mismatches on TPU; keep [N, 1].
    N, V = logits.shape
    tgt2 = targets.astype(jnp.int32).reshape(N, 1)
    mask2 = mask.astype(jnp.float32).reshape(N, 1)
    grid = (pl.cdiv(N, block_n),)
    nll = pl.pallas_call(
        _fwd_kernel, grid=grid,
        in_specs=[_row_spec(block_n, logits),
                  _row_spec(block_n, tgt2),
                  _row_spec(block_n, mask2)],
        out_specs=_row_spec(block_n, mask2),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        interpret=interpret,
    )(logits, tgt2, mask2)
    return nll[:, 0]


def _fwd(logits, targets, mask, block_n, interpret):
    loss = fused_masked_xent(logits, targets, mask, block_n, interpret)
    return loss, (logits, targets, mask)


def _bwd(block_n, interpret, res, g):
    logits, targets, mask = res
    N, V = logits.shape
    # bwd holds logits-in + dlogits-out + f32 intermediates per block and
    # pallas double-buffers: halve the row block to stay inside ~16MB VMEM
    block_n = max(8, block_n // 2)
    tgt2 = targets.astype(jnp.int32).reshape(N, 1)
    mask2 = mask.astype(jnp.float32).reshape(N, 1)
    grid = (pl.cdiv(N, block_n),)
    g_arr = jnp.asarray(g, jnp.float32).reshape(1, 1)
    dlogits = pl.pallas_call(
        _bwd_kernel, grid=grid,
        in_specs=[_row_spec(block_n, logits),
                  _row_spec(block_n, tgt2),
                  _row_spec(block_n, mask2),
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=_row_spec(block_n, logits),
        out_shape=jax.ShapeDtypeStruct((N, V), logits.dtype),
        interpret=interpret,
    )(logits, tgt2, mask2, g_arr)
    return dlogits, None, None


fused_masked_xent.defvjp(_fwd, _bwd)
