"""Native C++ batch packer: build, parity with the numpy path, speed."""

import time

import numpy as np
import pytest

from cvc_tpu import native
from cvc_tpu.data.pipeline import _assemble
from cvc_tpu.data.synthetic import make_synthetic_dataset
from tests.conftest import tiny_model_config

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++/native build unavailable")


def test_native_matches_numpy_path():
    mc = tiny_model_config(feat_dim=32, num_regions=16, seq_length=12)
    ds = make_synthetic_dataset(num_images=10, num_regions=20, feat_dim=32,
                                seq_length=12, split="train", seed=0)
    pairs = [(i, 0) for i in range(8)]
    b_native = _assemble(ds, pairs, mc, 8, use_native=True)
    b_numpy = _assemble(ds, pairs, mc, 8, use_native=False)
    np.testing.assert_allclose(b_native.feats, b_numpy.feats)
    np.testing.assert_allclose(b_native.box_geom, b_numpy.box_geom, rtol=1e-6)
    np.testing.assert_array_equal(b_native.region_cls, b_numpy.region_cls)
    np.testing.assert_array_equal(b_native.region_mask, b_numpy.region_mask)
    np.testing.assert_array_equal(b_native.tokens, b_numpy.tokens)
    np.testing.assert_array_equal(b_native.token_mask, b_numpy.token_mask)


def test_native_video_frames():
    mc = tiny_model_config(feat_dim=16, num_regions=8, num_frames=3,
                           seq_length=10)
    ds = make_synthetic_dataset(num_images=6, num_regions=8, num_frames=2,
                                feat_dim=16, seq_length=10, split="train",
                                seed=1)
    pairs = [(i, 0) for i in range(6)]
    b_native = _assemble(ds, pairs, mc, 6, use_native=True)
    b_numpy = _assemble(ds, pairs, mc, 6, use_native=False)
    np.testing.assert_allclose(b_native.feats, b_numpy.feats)
    np.testing.assert_array_equal(b_native.region_mask, b_numpy.region_mask)


def test_native_large_batch_parity_and_timing():
    """Parity at production shapes; timing is informational only (this
    sandbox is 1-core, so the OpenMP packer has no parallelism to use)."""
    mc = tiny_model_config(feat_dim=2048, num_regions=128, seq_length=20,
                           vocab_size=8704)
    ds = make_synthetic_dataset(num_images=16, num_regions=100,
                                feat_dim=2048, seq_length=20, split="train",
                                seed=2)
    pairs = [(i, 0) for i in range(16)]

    def timeit(fn, n=3):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_native = timeit(lambda: _assemble(ds, pairs, mc, 16, use_native=True))
    t_numpy = timeit(lambda: _assemble(ds, pairs, mc, 16, use_native=False))
    print(f"native={t_native*1e3:.1f}ms numpy={t_numpy*1e3:.1f}ms")
    b_native = _assemble(ds, pairs, mc, 16, use_native=True)
    b_numpy = _assemble(ds, pairs, mc, 16, use_native=False)
    np.testing.assert_allclose(b_native.feats, b_numpy.feats)
    np.testing.assert_array_equal(b_native.tokens, b_numpy.tokens)


# ---------------------------------------------------------------------------
# Native CIDEr-D
# ---------------------------------------------------------------------------

def _random_corpus(n_images=30, seed=0):
    import numpy as _np
    rng = _np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    def sent(lo=3, hi=12):
        return " ".join(rng.choice(vocab, size=rng.integers(lo, hi)))
    cands = {f"i{k}": sent() for k in range(n_images)}
    refs = {f"i{k}": [sent() for _ in range(rng.integers(1, 4))]
            for k in range(n_images)}
    # some exact matches so the score range is exercised
    for k in range(0, n_images, 5):
        cands[f"i{k}"] = refs[f"i{k}"][0]
    return cands, refs


def test_native_cider_matches_python():
    from cvc_tpu import native
    if not native.cider_available():
        pytest.skip("native cider unavailable")
    from cvc_tpu.evaluation.cider import CiderD, CiderDFast
    cands, refs = _random_corpus()
    c_py, per_py = CiderD().compute_score(cands, refs)
    fast = CiderDFast()
    assert fast._native
    c_nat, per_nat = fast.compute_score(cands, refs)
    assert abs(c_py - c_nat) < 1e-9
    for k in per_py:
        assert abs(per_py[k] - per_nat[k]) < 1e-9, k


def test_native_cider_corpus_df_matches_python():
    from cvc_tpu import native
    if not native.cider_available():
        pytest.skip("native cider unavailable")
    from cvc_tpu.evaluation.cider import (CiderD, CiderDFast,
                                          document_frequency)
    cands, refs = _random_corpus(seed=3)
    corpus_refs = list(refs.values())
    py = CiderD(corpus_df=document_frequency(corpus_refs))
    c_py, per_py = py.compute_score(cands, refs)
    fast = CiderDFast(corpus_refs=corpus_refs)
    assert fast._native and fast._df_handle is not None
    c_nat, per_nat = fast.compute_score(cands, refs)
    assert abs(c_py - c_nat) < 1e-9
    for k in per_py:
        assert abs(per_py[k] - per_nat[k]) < 1e-9, k


def test_native_cider_speed_informational():
    from cvc_tpu import native
    if not native.cider_available():
        pytest.skip("native cider unavailable")
    from cvc_tpu.evaluation.cider import CiderD, CiderDFast
    cands, refs = _random_corpus(n_images=300, seed=7)
    t0 = time.perf_counter()
    CiderD().compute_score(cands, refs)
    t_py = time.perf_counter() - t0
    fast = CiderDFast()
    t0 = time.perf_counter()
    fast.compute_score(cands, refs)
    t_nat = time.perf_counter() - t0
    print(f"cider python={t_py*1e3:.1f}ms native={t_nat*1e3:.1f}ms")
