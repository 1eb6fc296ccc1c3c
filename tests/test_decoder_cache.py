"""LRU behavior of the make_decoder memo (decoding.py).

Validation rebuilds the decoder every epoch; the memo must (a) return
the identical jitted closure for a repeated (model, eval) config so the
run never recompiles, and (b) evict only the coldest entry when a long
config sweep overflows the 32-entry bound — never the decoder the
current run keeps touching (the r3 clear-all behavior did exactly
that).  Closure construction is lazy (jax.jit compiles on first call),
so this test builds many decoders without compiling any.
"""

import dataclasses

import pytest

from cvc_tpu.config import EvalConfig, ModelConfig
from cvc_tpu.models import decoding


@pytest.fixture(autouse=True)
def fresh_cache():
    """Isolate the module-global memo: cleared before AND after each
    test so test-built decoder entries never leak into other tests."""
    decoding._DECODER_CACHE.clear()
    yield
    decoding._DECODER_CACHE.clear()


def _eval_cfg(i):
    return EvalConfig(sample_method="greedy", max_length=4 + i)


def test_repeat_config_returns_identical_closure():
    cfg = ModelConfig(vocab_size=128, rnn_size=16, input_encoding_size=8,
                      att_hid_size=8, feat_dim=8, num_regions=4,
                      seq_length=4, num_classes=4, class_emb_dim=4)
    a = decoding.make_decoder(cfg, _eval_cfg(0))
    b = decoding.make_decoder(cfg, _eval_cfg(0))
    assert a is b


def test_lru_evicts_coldest_not_hottest():
    cfg = ModelConfig(vocab_size=128, rnn_size=16, input_encoding_size=8,
                      att_hid_size=8, feat_dim=8, num_regions=4,
                      seq_length=4, num_classes=4, class_emb_dim=4)
    hot = decoding.make_decoder(cfg, _eval_cfg(0))
    # Overflow the bound while re-touching the hot entry between inserts,
    # the way a training run's validation re-requests its decoder while a
    # sweep churns through other configs.
    for i in range(1, 40):
        decoding.make_decoder(cfg, _eval_cfg(i))
        assert decoding.make_decoder(cfg, _eval_cfg(0)) is hot
    assert len(decoding._DECODER_CACHE) <= 32
    # The coldest distinct configs really were evicted: re-requesting the
    # first sweep entry builds a new closure.
    first_sweep = decoding.make_decoder(cfg, _eval_cfg(1))
    first_sweep_key = (repr(dataclasses.asdict(cfg)),
                       repr(dataclasses.asdict(_eval_cfg(1))))
    assert first_sweep_key in decoding._DECODER_CACHE
    assert first_sweep is decoding._DECODER_CACHE[first_sweep_key]
