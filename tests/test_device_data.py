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


# ---------------------------------------------------------------------------
# Mesh-resident path (ShardedDeviceDataset): per-device HBM shards +
# local gather under shard_map must reproduce the single-device resident
# step exactly (the VERDICT r2 missing-#2 fix: resident composes with mesh).
# ---------------------------------------------------------------------------

def _mesh_world(n_images=13):
    mc = tiny_model_config(feat_dim=32, num_regions=12, seq_length=10,
                           attn_supervision_weight=0.0)
    ds = make_synthetic_dataset(num_images=n_images, num_regions=12,
                                feat_dim=32, seq_length=10, split="train",
                                seed=0)
    mc.vocab_size = ds.vocab.padded_size(128)
    return mc, ds


def test_sharded_gather_matches_plain_gather():
    from cvc_tpu.data.device_data import ShardedDeviceDataset
    from cvc_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(4, model_axis=1)
    mc, ds = _mesh_world()
    plain = DeviceDataset(ds, mc, with_gt_region=True)
    dd = ShardedDeviceDataset(ds, mc, mesh, with_gt_region=True)
    for idx in dd.epoch_batches(8, seed=3):
        # map the sharded batch's (shard, local) indices to global pairs
        b = len(idx) // dd.n_shards
        gidx = np.concatenate(
            [np.asarray(dd.pair_shards[s])[idx[s * b:(s + 1) * b]]
             for s in range(dd.n_shards)]).astype(np.int32)
        import jax as _jax
        from jax.sharding import PartitionSpec as P
        sharded = _jax.jit(_jax.shard_map(
            gather_batch, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=P("data"), check_vma=False))(
                dd.data, jax.device_put(jnp.asarray(idx), dd.idx_sharding))
        want = gather_batch(plain.data, jnp.asarray(gidx))
        for k in want:
            np.testing.assert_allclose(np.asarray(sharded[k]),
                                       np.asarray(want[k]), rtol=1e-6,
                                       err_msg=k)
        assert dd.batch_tokens(idx) == plain.batch_tokens(gidx)


def test_mesh_resident_step_matches_single_device():
    from cvc_tpu.data.device_data import ShardedDeviceDataset
    from cvc_tpu.parallel.mesh import make_mesh
    from cvc_tpu.training.step import state_shardings
    mesh = make_mesh(4, model_axis=2)
    mc, ds = _mesh_world(n_images=12)
    tc = TrainConfig(learning_rate=2e-3, grad_clip=5.0, donate_state=False)
    params = core.init_params(jax.random.PRNGKey(0), mc)
    opt = make_optimizer(tc, steps_per_epoch=2)
    rng = jax.random.PRNGKey(1)

    plain = DeviceDataset(ds, mc)
    state0 = TrainState.create(params, opt)
    step0 = make_resident_train_step(mc, tc, opt)

    dd = ShardedDeviceDataset(ds, mc, mesh)
    state1 = TrainState.create(params, opt)
    state1 = jax.device_put(state1, state_shardings(mesh, state1))
    step1 = make_resident_train_step(mc, tc, opt, mesh=mesh, state=state1)

    for i, idx in enumerate(dd.epoch_batches(8, seed=0)):
        b = len(idx) // dd.n_shards
        gidx = np.concatenate(
            [np.asarray(dd.pair_shards[s])[idx[s * b:(s + 1) * b]]
             for s in range(dd.n_shards)]).astype(np.int32)
        state0, m0 = step0(state0, plain.data, jnp.asarray(gidx), rng)
        state1, m1 = step1(state1, dd.data, jnp.asarray(idx), rng)
        assert abs(float(m0["loss"]) - float(m1["loss"])) < 1e-5
    # params identical after the epoch
    p0 = jax.tree_util.tree_leaves(state0.params)
    p1 = jax.tree_util.tree_leaves(jax.device_get(state1.params))
    for a, b_ in zip(p0, p1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=2e-5)


def test_sharded_epoch_batches_cover_shard_pairs():
    from cvc_tpu.data.device_data import ShardedDeviceDataset
    from cvc_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(4, model_axis=1)
    mc, ds = _mesh_world(n_images=16)
    dd = ShardedDeviceDataset(ds, mc, mesh)
    seen = [set() for _ in range(dd.n_shards)]
    nb = 0
    for idx in dd.epoch_batches(8, seed=1):
        nb += 1
        b = len(idx) // dd.n_shards
        for s in range(dd.n_shards):
            seen[s].update(int(v) for v in idx[s * b:(s + 1) * b])
    assert nb == min(dd.real_pairs) // 2
    for s in range(dd.n_shards):
        assert seen[s] <= set(range(dd.real_pairs[s]))
        assert len(seen[s]) == nb * 2
