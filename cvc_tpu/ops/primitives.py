"""Core numeric ops (pure-jnp oracles).

These are the reference's stock-PyTorch kernels rebuilt as JAX functions
(reference: LSTM cells + additive attention inside `misc/model.py`, masked
token XE in `misc/utils.py` LanguageModelCriterion; SURVEY.md L3).  Each has
a fused Pallas TPU twin in `cvc_tpu/ops/pallas/` — these jnp versions are
the unit-test oracles and the CPU fallback.

Conventions:
  * LSTM gate order is (i, f, g, o) on the last axis of the [*, 4H] gates.
  * All softmaxes/reductions accumulate in float32 even under bfloat16.
  * Masks are float {0,1}; masked softmax gives exactly 0 on masked slots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lstm_cell(gates: jnp.ndarray, c: jnp.ndarray):
    """Apply LSTM nonlinearity to precomputed gate preactivations.

    gates: [B, 4H] = x_t @ Wx + h_{t-1} @ Wh + b.  Returns (h', c').
    Splitting the matmuls (MXU) from the elementwise part (VPU) lets the
    caller batch the input projections over time outside lax.scan.
    """
    H = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[..., 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[..., 1 * H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:4 * H])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def additive_attention_scores(keys: jnp.ndarray, query: jnp.ndarray,
                              w: jnp.ndarray) -> jnp.ndarray:
    """Bahdanau/additive attention logits.

    keys  [B, S, A] — precomputed W_v @ V (hoisted out of the decode scan),
    query [B, A]    — W_h @ h (+ bias),
    w     [A]       — scoring vector.
    Returns logits [B, S] = tanh(keys + query) . w
    """
    e = jnp.tanh(keys + query[:, None, :])
    return jnp.einsum("bsa,a->bs", e, w)


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray,
                   axis: int = -1) -> jnp.ndarray:
    """Softmax over `axis` with masked entries receiving exactly 0 weight.

    Safe when a row is fully masked (returns all zeros rather than NaN) —
    padded batch rows hit this.
    """
    logits = logits.astype(jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    masked = jnp.where(mask > 0, logits, neg)
    m = jnp.max(masked, axis=axis, keepdims=True)
    ex = jnp.exp(masked - m) * (mask > 0)
    denom = jnp.sum(ex, axis=axis, keepdims=True)
    return ex / jnp.maximum(denom, 1e-9)


def masked_xent(logits: jnp.ndarray, targets: jnp.ndarray,
                mask: jnp.ndarray) -> jnp.ndarray:
    """Masked token-level cross entropy, averaged over supervised tokens.

    logits [B, L, V], targets [B, L] int ids, mask [B, L] float.
    Matches the reference's LanguageModelCriterion semantics: sum of
    per-token NLL over unmasked positions / sum of mask (reference:
    `misc/utils.py`).
    """
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    tgt_logit = jnp.take_along_axis(
        logits, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    nll = (logz - tgt_logit) * mask
    return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1.0)


def dropout(x: jnp.ndarray, rate: float, rng, deterministic: bool) -> jnp.ndarray:
    """Inverted dropout (reference: --drop_prob_lm on LSTM outputs)."""
    if deterministic or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
