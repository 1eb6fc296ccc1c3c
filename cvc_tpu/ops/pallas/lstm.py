"""Fused LSTM gate nonlinearity as a Pallas TPU kernel.

Given precomputed gate preactivations (the matmuls stay in XLA on the MXU
— see cvc_tpu/models/core.py for why), apply sigmoid/tanh gating and the
cell update in one VPU pass with a hand-written backward:

    i,f,g,o = split(gates); c' = sig(f)*c + sig(i)*tanh(g)
    h' = sig(o)*tanh(c')

Gate order (i,f,g,o) matches `cvc_tpu.ops.primitives.lstm_cell` (the
oracle).  The backward kernel recomputes the cheap activations instead of
storing them (VPU flops < HBM bytes here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(gates_ref, c_ref, h_out, c_out):
    H = c_ref.shape[-1]
    gates = gates_ref[:].astype(jnp.float32)
    c = c_ref[:].astype(jnp.float32)
    i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
    c_new = f * c + i * g
    h_out[:] = (o * jnp.tanh(c_new)).astype(h_out.dtype)
    c_out[:] = c_new.astype(c_out.dtype)


def _bwd_kernel(gates_ref, c_ref, gh_ref, gc_ref, dgates_out, dc_out):
    H = c_ref.shape[-1]
    gates = gates_ref[:].astype(jnp.float32)
    c = c_ref[:].astype(jnp.float32)
    gh = gh_ref[:].astype(jnp.float32)
    gc = gc_ref[:].astype(jnp.float32)
    i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
    c_new = f * c + i * g
    tanh_c = jnp.tanh(c_new)
    do = gh * tanh_c
    dc_total = gc + gh * o * (1.0 - tanh_c * tanh_c)
    di = dc_total * g
    df = dc_total * c
    dg = dc_total * i
    dgates = jnp.concatenate([
        di * i * (1.0 - i),
        df * f * (1.0 - f),
        dg * (1.0 - g * g),
        do * o * (1.0 - o),
    ], axis=-1)
    dgates_out[:] = dgates.astype(dgates_out.dtype)
    dc_out[:] = (dc_total * f).astype(dc_out.dtype)


def _call(kernel, outs, block_b, interpret, *args):
    B = args[0].shape[0]
    grid = (pl.cdiv(B, block_b),)

    def spec(x):
        return pl.BlockSpec((block_b,) + x.shape[1:],
                            lambda i: (i,) + (0,) * (x.ndim - 1),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[spec(x) for x in args],
        out_specs=tuple(spec(o) for o in outs),
        out_shape=tuple(jax.ShapeDtypeStruct(o.shape, o.dtype) for o in outs),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_lstm_gates(gates, c, block_b: int = 8, interpret: bool = False):
    """gates [B, 4H], c [B, H] -> (h', c')."""
    outs = (jax.ShapeDtypeStruct(c.shape, c.dtype),
            jax.ShapeDtypeStruct(c.shape, c.dtype))
    return _call(_fwd_kernel, outs, block_b, interpret, gates, c)


def _fwd(gates, c, block_b, interpret):
    out = fused_lstm_gates(gates, c, block_b, interpret)
    return out, (gates, c)


def _bwd(block_b, interpret, res, grads):
    gates, c = res
    gh, gc = grads
    outs = (jax.ShapeDtypeStruct(gates.shape, gates.dtype),
            jax.ShapeDtypeStruct(c.shape, c.dtype))
    dgates, dc = _call(_bwd_kernel, outs, block_b, interpret,
                       gates, c, gh, gc)
    return dgates, dc


fused_lstm_gates.defvjp(_fwd, _bwd)
