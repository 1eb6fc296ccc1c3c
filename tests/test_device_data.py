"""Device-resident dataset: gather parity with the streaming pipeline and
resident-step training equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from cvc_tpu.config import TrainConfig
from cvc_tpu.data.device_data import DeviceDataset, gather_batch
from cvc_tpu.data.pipeline import make_batches
from cvc_tpu.data.synthetic import make_synthetic_dataset
from cvc_tpu.models import core
from cvc_tpu.training import TrainState, make_optimizer
from cvc_tpu.training.step import make_resident_train_step
from tests.conftest import tiny_model_config


def _world():
    mc = tiny_model_config(feat_dim=32, num_regions=12, seq_length=10,
                           attn_supervision_weight=0.0)
    ds = make_synthetic_dataset(num_images=10, num_regions=12, feat_dim=32,
                                seq_length=10, split="train", seed=0)
    mc.vocab_size = ds.vocab.padded_size(128)
    return mc, ds


def test_gather_matches_streaming_pipeline():
    mc, ds = _world()
    dd = DeviceDataset(ds, mc, with_gt_region=True)
    # streaming pipeline, unshuffled, pairs in order
    batch = next(make_batches(ds, mc, 8, shuffle=False, prefetch=0,
                              with_gt_region=True))
    idx = jnp.arange(8, dtype=jnp.int32)
    arrays = gather_batch(dd.data, idx)
    np.testing.assert_allclose(np.asarray(arrays["feats"]), batch.feats,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(arrays["box_geom"]),
                               batch.box_geom, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(arrays["tokens"]), batch.tokens)
    np.testing.assert_array_equal(np.asarray(arrays["token_mask"]),
                                  batch.token_mask)
    np.testing.assert_array_equal(np.asarray(arrays["gt_region"]),
                                  batch.gt_region)


def test_epoch_batches_cover_all_pairs():
    mc, ds = _world()
    dd = DeviceDataset(ds, mc)
    seen = set()
    for idx in dd.epoch_batches(4, seed=0, drop_last=False):
        assert idx.shape == (4,)
        seen.update(int(i) for i in idx)
    assert seen == set(range(dd.num_pairs))


def test_resident_step_trains():
    mc, ds = _world()
    tc = TrainConfig(learning_rate=2e-3, grad_clip=5.0, donate_state=False)
    dd = DeviceDataset(ds, mc)
    params = core.init_params(jax.random.PRNGKey(0), mc)
    opt = make_optimizer(tc, steps_per_epoch=2)
    state = TrainState.create(params, opt)
    step = make_resident_train_step(mc, tc, opt)
    rng = jax.random.PRNGKey(1)
    losses = []
    for epoch in range(6):
        for idx in dd.epoch_batches(5, seed=epoch):
            state, m = step(state, dd.data, jnp.asarray(idx), rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
