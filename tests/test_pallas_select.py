"""Fused beam-select top-k+logsumexp kernel vs the jnp oracle.

The kernel must be index-EXACT vs `jax.lax.top_k` (including tie order:
descending value, lowest index first) and value/lse-close, because the
beam search's exhaustive-equivalence guarantee (test_decoding.py) rides
on candidate identity.  Runs in interpret mode on CPU (conftest pins the
virtual-CPU backend), compiled on real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvc_tpu.ops.pallas.topk_select import fused_topk_lse


def _oracle(x, k):
    v, i = jax.lax.top_k(x, k)
    lse = jax.nn.logsumexp(x.astype(jnp.float32), axis=-1)
    return np.asarray(v, np.float32), np.asarray(i), np.asarray(lse)


@pytest.mark.parametrize("n,v,dtype", [
    (320, 8704, jnp.float32),     # flagship beam rows, padded vocab
    (64, 8704, jnp.bfloat16),
    (100, 1000, jnp.float32),     # V not a multiple of 128, ragged N
    (8, 131, jnp.float32),
])
def test_matches_lax_top_k(n, v, dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), (n, v), dtype)
    vals, idxs, lse = fused_topk_lse(x, 5, interpret=True)
    v0, i0, lse0 = _oracle(x, 5)
    np.testing.assert_array_equal(np.asarray(idxs), i0)
    np.testing.assert_allclose(np.asarray(vals), v0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lse), lse0, rtol=1e-5, atol=1e-5)


def test_tie_order_matches():
    """Duplicate maxima resolve to ascending index, like lax.top_k."""
    x = jnp.zeros((4, 256), jnp.float32)
    x = x.at[:, 7].set(3.0).at[:, 200].set(3.0).at[:, 30].set(3.0)
    x = x.at[1].set(5.0)  # a whole row of ties
    vals, idxs, _ = fused_topk_lse(x, 5, interpret=True)
    v0, i0, _ = _oracle(x, 5)
    np.testing.assert_array_equal(np.asarray(idxs), i0)
    np.testing.assert_allclose(np.asarray(vals), v0)


def test_vocab_pad_bias_survives():
    """The MXU vocab padding writes -1e9 logit biases on pad columns
    (torch_import guard); they must never be selected and must not
    poison the logsumexp."""
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8704), jnp.float32)
    x = x.at[:, 8700:].set(-1e9)
    vals, idxs, lse = fused_topk_lse(x, 5, interpret=True)
    v0, i0, lse0 = _oracle(x, 5)
    np.testing.assert_array_equal(np.asarray(idxs), i0)
    assert (np.asarray(idxs) < 8700).all()
    np.testing.assert_allclose(np.asarray(lse), lse0, rtol=1e-5)


def test_beam_search_parity_with_and_without_kernel():
    """End-to-end: beam_search with pallas_select on (interpret mode) ==
    beam_search with lax.top_k, token-for-token."""
    from dataclasses import replace

    from cvc_tpu.models import core
    from cvc_tpu.models.decoding import beam_search
    from tests.conftest import random_batch, tiny_model_config

    cfg = tiny_model_config(vocab_size=32, rnn_size=16, att_hid_size=12,
                            input_encoding_size=8, feat_dim=16,
                            num_regions=6, seq_length=6)
    params = core.init_params(jax.random.PRNGKey(3), cfg)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 3, 2).items()}
    out0 = beam_search(params, replace(cfg, pallas_select=False),
                       arrays, beam_size=4, max_len=cfg.seq_length)
    out1 = beam_search(params, replace(cfg, pallas_select=True),
                       arrays, beam_size=4, max_len=cfg.seq_length)
    np.testing.assert_array_equal(np.asarray(out0["tokens"]),
                                  np.asarray(out1["tokens"]))
    np.testing.assert_allclose(np.asarray(out0["scores"]),
                               np.asarray(out1["scores"]), rtol=1e-4,
                               atol=1e-5)


def test_greedy_decode_parity_with_and_without_kernel():
    """Greedy decode is the k=1 case of the fused select kernel: tokens
    must be index-exact and per-token logprobs close vs the jnp path."""
    from dataclasses import replace

    from cvc_tpu.models import core
    from cvc_tpu.models.decoding import greedy_decode
    from tests.conftest import random_batch, tiny_model_config

    cfg = tiny_model_config(vocab_size=32, rnn_size=16, att_hid_size=12,
                            input_encoding_size=8, feat_dim=16,
                            num_regions=6, seq_length=6)
    params = core.init_params(jax.random.PRNGKey(4), cfg)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 3, 5).items()}
    out0 = greedy_decode(params, replace(cfg, pallas_select=False),
                         arrays, max_len=cfg.seq_length)
    out1 = greedy_decode(params, replace(cfg, pallas_select=True),
                         arrays, max_len=cfg.seq_length)
    np.testing.assert_array_equal(np.asarray(out0["tokens"]),
                                  np.asarray(out1["tokens"]))
    np.testing.assert_allclose(np.asarray(out0["logprobs"]),
                               np.asarray(out1["logprobs"]), rtol=1e-4,
                               atol=1e-5)
