"""End-to-end evaluator: untrained model produces valid metric dicts on the
synthetic world; a cheating 'perfect attention' check validates plumbing."""

import jax
import numpy as np
import pytest

from cvc_tpu.config import EvalConfig
from cvc_tpu.data.synthetic import make_synthetic_dataset
from cvc_tpu.evaluation.evaluator import (evaluate_split,
                                          gt_sentence_attention_eval)
from cvc_tpu.models import core
from tests.conftest import tiny_model_config


@pytest.fixture(scope="module")
def world():
    mc = tiny_model_config(feat_dim=32, num_regions=12, seq_length=12,
                           vocab_size=128)
    ds = make_synthetic_dataset(num_images=12, num_regions=12, feat_dim=32,
                                seq_length=12, split="val", seed=1)
    params = core.init_params(jax.random.PRNGKey(0), mc)
    return mc, ds, params


def test_evaluate_split_greedy(world):
    mc, ds, params = world
    ec = EvalConfig(beam_size=1, sample_method="greedy", max_length=12)
    res = evaluate_split(params, mc, ec, ds, batch_size=4)
    assert res["n_images"] == 12
    for k in ("Bleu_1", "Bleu_4", "CIDEr", "METEOR",
              "F1_all", "F1_loc"):
        assert k in res, k
        assert res[k] is None or np.isfinite(res[k])


def test_evaluate_split_beam(world):
    mc, ds, params = world
    ec = EvalConfig(beam_size=3, sample_method="beam", max_length=12)
    res = evaluate_split(params, mc, ec, ds, batch_size=4)
    assert res["n_images"] == 12
    assert 0 <= res["F1_all"] <= 1 and 0 <= res["F1_loc"] <= 1


def test_gt_sentence_mode(world):
    mc, ds, params = world
    res = gt_sentence_attention_eval(params, mc, ds, batch_size=4)
    assert res["n_words"] > 0
    assert 0.0 <= res["attn_accuracy"] <= 1.0
