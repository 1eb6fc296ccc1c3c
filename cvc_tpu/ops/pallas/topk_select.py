"""Fused per-row top-K + logsumexp over the vocab as a Pallas kernel.

The beam-select step needs, per [B*K, V] logits row (V ~ 8704), the K
largest values with their indices AND the row logsumexp (reference:
CaptionModel.beam_search per-step softmax+sort in `misc/CaptionModel.py`
lineage — rebuilt here as raw-logit selection, see models/decoding.py).
XLA lowers `lax.top_k` to a TopK custom call that measures ~10x over the
HBM roofline at this shape (docs/PERF.md "Select experiments") and reads
the logits separately from the logsumexp reduction.  This kernel makes
ONE pass over the logits tile in VMEM, computing

  * lse[r]     = log(sum(exp(x[r, :])))   (max-shifted, f32), and
  * vals/idxs  = top-K by K iterative max-and-mask sweeps — exact
                 `lax.top_k` tie semantics (descending value, lowest
                 index first among equals; comparison in f32 upcast of
                 the input values, which is order-exact for bf16/f32).

K is tiny (beam width, <= 8) so the K sweeps are pure VPU work over a
VMEM-resident tile; the logits cross HBM exactly once.

API: fused_topk_lse(logits [N, V], k) -> (vals [N, k] f32,
                                          idxs [N, k] int32,
                                          lse  [N]    f32)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # python scalar: jnp constants would be captured by the kernel


def _kernel(k, v_real, logits_ref, vals_ref, idxs_ref, lse_ref):
    x = logits_ref[:].astype(jnp.float32)                   # [bN, V]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if v_real != x.shape[1]:
        # lane padding (V not a multiple of 128) is unspecified memory:
        # mask it out of every reduction
        x = jnp.where(col < v_real, x, _NEG)
    m = jnp.max(x, axis=-1, keepdims=True)                  # [bN, 1]
    lse_ref[:] = jnp.log(jnp.sum(jnp.exp(x - m), axis=-1,
                                 keepdims=True)) + m

    vals, idxs = [], []
    big = jnp.int32(x.shape[1])
    work = x
    for _ in range(k):
        mk = jnp.max(work, axis=-1, keepdims=True)          # [bN, 1]
        ik = jnp.min(jnp.where(work == mk, col, big), axis=-1,
                     keepdims=True)                         # first argmax
        vals.append(mk)
        idxs.append(ik)
        work = jnp.where(col == ik, _NEG, work)
    vals_ref[:] = jnp.concatenate(vals, axis=1)
    idxs_ref[:] = jnp.concatenate(idxs, axis=1)


def _row_spec(block_n, ncol):
    return pl.BlockSpec((block_n, ncol), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def fused_topk_lse(logits, k: int, block_n: int = 32,
                   interpret: bool = False):
    """One-pass top-k + logsumexp per row.  Returns (vals [N,k] f32,
    idxs [N,k] int32, lse [N] f32) — bit-identical index selection to
    `jax.lax.top_k` (ties resolve to the lowest index)."""
    N, V = logits.shape
    grid = (pl.cdiv(N, block_n),)
    vals, idxs, lse = pl.pallas_call(
        functools.partial(_kernel, k, V),
        grid=grid,
        in_specs=[_row_spec(block_n, V)],
        out_specs=[_row_spec(block_n, k),
                   _row_spec(block_n, k),
                   _row_spec(block_n, 1)],
        out_shape=[jax.ShapeDtypeStruct((N, k), jnp.float32),
                   jax.ShapeDtypeStruct((N, k), jnp.int32),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32)],
        interpret=interpret,
    )(logits)
    return vals, idxs, lse[:, 0]
