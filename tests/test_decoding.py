"""Generation: greedy semantics, EOS/PAD handling, beam-search correctness
(including a brute-force exact-search comparison on a tiny model) and
attention-recording alignment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvc_tpu.data.vocab import BOS_ID, EOS_ID, PAD_ID
from cvc_tpu.models import core
from cvc_tpu.models.decoding import beam_search, greedy_decode
from tests.conftest import random_batch, tiny_model_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config(vocab_size=32, rnn_size=16, att_hid_size=12,
                            input_encoding_size=8, feat_dim=16,
                            num_regions=6, seq_length=5)
    params = core.init_params(jax.random.PRNGKey(1), cfg)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 3, 2).items()}
    return cfg, params, arrays


def _manual_greedy(params, cfg, arrays, max_len):
    """Oracle: per-step Python loop calling the same step pieces."""
    from cvc_tpu.models.decoding import _encode, _step_logits, _vg_pre
    B = arrays["feats"].shape[0]
    v_enc, keys, v_global = _encode(params, cfg, arrays)
    vg_pre = _vg_pre(params, cfg, v_global)
    carry = core.initial_state(B, cfg.rnn_size, keys.dtype)
    word = jnp.full((B,), BOS_ID, jnp.int32)
    finished = np.zeros((B,), bool)
    toks, als = [], []
    for _ in range(max_len + 1):
        carry, logits, alpha = _step_logits(params, cfg, carry, word, v_enc,
                                            keys, arrays["region_mask"], vg_pre)
        nxt = np.asarray(jnp.argmax(logits, -1)).astype(np.int32)
        nxt = np.where(finished, PAD_ID, nxt)
        finished = finished | (nxt == EOS_ID)
        word = jnp.asarray(nxt)
        toks.append(nxt)
        als.append(np.asarray(alpha))
    return np.stack(toks, 1), np.stack(als, 1)


def test_greedy_matches_manual_loop(setup):
    cfg, params, arrays = setup
    out = greedy_decode(params, cfg, arrays, max_len=cfg.seq_length)
    toks, als = _manual_greedy(params, cfg, arrays, cfg.seq_length)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), toks)
    np.testing.assert_allclose(np.asarray(out["alphas"]), als,
                               rtol=1e-5, atol=1e-6)


def test_greedy_eos_padding(setup):
    cfg, params, arrays = setup
    out = greedy_decode(params, cfg, arrays, max_len=cfg.seq_length)
    toks = np.asarray(out["tokens"])
    lp = np.asarray(out["logprobs"])
    for b in range(toks.shape[0]):
        seen_eos = False
        for t in range(toks.shape[1]):
            if seen_eos:
                assert toks[b, t] == PAD_ID
                assert lp[b, t] == 0.0
            if toks[b, t] == EOS_ID:
                seen_eos = True


def test_beam1_equals_greedy(setup):
    cfg, params, arrays = setup
    g = greedy_decode(params, cfg, arrays, max_len=cfg.seq_length)
    b = beam_search(params, cfg, arrays, beam_size=1, max_len=cfg.seq_length)
    np.testing.assert_array_equal(np.asarray(g["tokens"]),
                                  np.asarray(b["tokens"]))
    np.testing.assert_allclose(np.asarray(g["alphas"]),
                               np.asarray(b["alphas"]), rtol=1e-5, atol=1e-6)


def test_beam_score_at_least_greedy(setup):
    """Beam-5's best cumulative logprob must be >= greedy's."""
    cfg, params, arrays = setup
    g = greedy_decode(params, cfg, arrays, max_len=cfg.seq_length)
    g_score = np.asarray(g["logprobs"]).sum(-1)
    b = beam_search(params, cfg, arrays, beam_size=5, max_len=cfg.seq_length)
    b_score = np.asarray(b["scores"])
    assert (b_score >= g_score - 1e-4).all()


def test_beam_matches_exhaustive_search():
    """On a tiny vocab/length, beam_search with K=V must find the true
    argmax sequence found by brute-force enumeration."""
    cfg = tiny_model_config(vocab_size=8, rnn_size=8, att_hid_size=8,
                            input_encoding_size=8, feat_dim=8,
                            num_regions=4, seq_length=3)
    params = core.init_params(jax.random.PRNGKey(3), cfg)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 2, 5).items()}
    L = 3  # steps
    V = cfg.vocab_size

    from cvc_tpu.models.decoding import _encode, _step_logits, _vg_pre
    B = 2
    v_enc, keys, v_global = _encode(params, cfg, arrays)
    vg_pre = _vg_pre(params, cfg, v_global)

    import itertools
    best_seq = [None] * B
    best_score = [-1e9] * B
    for seq in itertools.product(range(V), repeat=L):
        carry = core.initial_state(B, cfg.rnn_size, keys.dtype)
        word = jnp.full((B,), BOS_ID, jnp.int32)
        score = np.zeros((B,))
        dead = np.zeros((B,), bool)
        ok = True
        for t in range(L):
            carry, logits, _ = _step_logits(params, cfg, carry, word, v_enc,
                                            keys, arrays["region_mask"], vg_pre)
            lp = np.asarray(jax.nn.log_softmax(logits))
            w = seq[t]
            # emulate EOS semantics: after EOS only PAD at 0 cost
            for b in range(B):
                if dead[b]:
                    if w != PAD_ID:
                        score[b] = -1e9
                else:
                    score[b] += lp[b, w]
                    if w == EOS_ID:
                        dead[b] = True
            word = jnp.full((B,), w, jnp.int32)
        for b in range(B):
            if score[b] > best_score[b]:
                best_score[b] = score[b]
                best_seq[b] = seq

    out = beam_search(params, cfg, arrays, beam_size=V, max_len=L - 1)
    toks = np.asarray(out["tokens"])
    scores = np.asarray(out["scores"])
    for b in range(B):
        np.testing.assert_allclose(scores[b], best_score[b], rtol=1e-4)
        np.testing.assert_array_equal(toks[b], np.asarray(best_seq[b]))


def test_beam_attention_history_consistent(setup):
    """The recorded attention trail of the winning beam must renormalize to
    1 on generated steps and be zero-padded after EOS... (alphas live on
    real region slots only)."""
    cfg, params, arrays = setup
    out = beam_search(params, cfg, arrays, beam_size=4,
                      max_len=cfg.seq_length)
    a = np.asarray(out["alphas"])
    m = np.asarray(arrays["region_mask"])
    assert (a * (1 - m)[:, None, :]).max() == 0.0
    sums = a.sum(-1)
    assert ((np.abs(sums - 1.0) < 1e-4) | (np.abs(sums) < 1e-6)).all()


def test_beam_all_beams_sorted_scores(setup):
    cfg, params, arrays = setup
    out = beam_search(params, cfg, arrays, beam_size=4,
                      max_len=cfg.seq_length, return_all_beams=True)
    sc = np.asarray(out["all_scores"])
    best = np.asarray(out["scores"])
    assert np.allclose(best, sc.max(1))



def test_beam_select_bf16_semantics():
    """The bf16-select serving knob: inert on f32 models; on a bf16 model
    it returns valid sequences whose f32-rescored beam score is close to
    the f32-select arm's (selection sees bf16-rounded candidates, so
    token-level identity is not guaranteed — score closeness is)."""
    import dataclasses
    cfg = tiny_model_config(vocab_size=32, rnn_size=16, att_hid_size=12,
                            input_encoding_size=8, feat_dim=16,
                            num_regions=6, seq_length=5, dtype="bfloat16")
    params = core.init_params(jax.random.PRNGKey(3), cfg)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 4, 5).items()}

    base = beam_search(params, cfg, arrays, beam_size=4,
                       max_len=cfg.seq_length)
    cfg_b = dataclasses.replace(cfg, beam_select_bf16=True)
    fast = beam_search(params, cfg_b, arrays, beam_size=4,
                       max_len=cfg.seq_length)

    # same output contract
    assert fast["tokens"].shape == base["tokens"].shape
    toks = np.asarray(fast["tokens"])
    # PAD-after-EOS semantics hold
    for row in toks:
        seen_eos = False
        for t in row:
            if seen_eos:
                assert t == PAD_ID
            seen_eos = seen_eos or t == EOS_ID
    # scores agree to bf16 rounding of per-step logits
    np.testing.assert_allclose(np.asarray(fast["scores"]),
                               np.asarray(base["scores"]),
                               rtol=0.05, atol=0.15)

    # inert on f32 models: flag on but dtype float32 -> identical tokens
    cfg32 = tiny_model_config(vocab_size=32, rnn_size=16, att_hid_size=12,
                              input_encoding_size=8, feat_dim=16,
                              num_regions=6, seq_length=5)
    p32 = core.init_params(jax.random.PRNGKey(3), cfg32)
    a = beam_search(p32, cfg32, arrays, beam_size=4, max_len=cfg32.seq_length)
    b = beam_search(p32, dataclasses.replace(cfg32, beam_select_bf16=True),
                    arrays, beam_size=4, max_len=cfg32.seq_length)
    np.testing.assert_array_equal(np.asarray(a["tokens"]),
                                  np.asarray(b["tokens"]))
