"""Device-resident dataset: upload once, gather batches on device.

Two reasons this exists:
  * it is the TPU-native way to feed datasets that fit HBM — per-step
    host work collapses to sending a [B] int32 index vector, and the
    batch gather fuses into the compiled train step;
  * this sandbox's axon PJRT client leaks ~the full buffer host-side on
    EVERY host->device transfer (measured: ~4.7MB/step at our shapes,
    OOM after ~2h of streaming batches), so long runs must not re-upload
    per batch.

Layout: per-EXAMPLE region tensors (images with several captions share
one copy) + per-PAIR caption tensors:

    ex_feats   [E, S, D]   ex_geom [E, S, 5]   ex_cls [E, S]
    ex_mask    [E, S]      ex_global [E, Dg]?
    pair_tokens[P, T]      pair_tmask [P, T]   pair_example [P]
    pair_gt_region [P, T]? (supervised grounding)

`gather_batch(data, idx)` is pure jnp — call it inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cvc_tpu.data.datasets import CaptionDataset
from cvc_tpu.data.pipeline import _gt_region_row, pad_regions


def _pack_host(ds: CaptionDataset, model_cfg, with_gt_region: bool = False):
    """Pack the whole dataset into the resident host-array layout.
    Returns (data dict of np arrays, pairs list, tokens_per_pair)."""
    E = len(ds)
    S = model_cfg.total_regions
    T = model_cfg.max_tokens
    D = model_cfg.feat_dim
    Dg = model_cfg.global_feat_dim
    ex_feats = np.zeros((E, S, D), np.float32)
    ex_geom = np.zeros((E, S, 5), np.float32)
    ex_cls = np.zeros((E, S), np.int32)
    ex_mask = np.zeros((E, S), np.float32)
    ex_global = np.zeros((E, Dg), np.float32) if Dg else None
    pairs = [(ei, ci) for ei in range(E)
             for ci in range(len(ds.get(ei).captions))]
    P = len(pairs)
    pair_tokens = np.zeros((P, T), np.int32)
    pair_tmask = np.zeros((P, T), np.float32)
    pair_example = np.zeros((P,), np.int32)
    pair_gt = np.full((P, T), -1, np.int32) if with_gt_region else None

    for ei in range(E):
        ex = ds.get(ei)
        ex_feats[ei], ex_geom[ei], ex_cls[ei], ex_mask[ei] = pad_regions(
            ex.features, ex.boxes, ex.classes,
            model_cfg.num_frames, model_cfg.num_regions, D)
        if ex_global is not None and ex.global_feat is not None:
            g = ex.global_feat[:Dg]
            ex_global[ei, :g.shape[0]] = g
    for p, (ei, ci) in enumerate(pairs):
        ex = ds.get(ei)
        ids, n_sup = ds.vocab.encode(ex.captions[ci],
                                     model_cfg.seq_length)
        pair_tokens[p] = ids
        pair_tmask[p, 1:1 + n_sup] = 1.0
        pair_example[p] = ei
        if pair_gt is not None:
            pair_gt[p] = _gt_region_row(ex, ci, ex_geom[ei],
                                        ex_mask[ei], T)

    data = dict(ex_feats=ex_feats, ex_geom=ex_geom, ex_cls=ex_cls,
                ex_mask=ex_mask, pair_tokens=pair_tokens,
                pair_tmask=pair_tmask, pair_example=pair_example)
    if ex_global is not None:
        data["ex_global"] = ex_global
    if pair_gt is not None:
        data["pair_gt_region"] = pair_gt
    return data, pairs, pair_tmask.sum(axis=1)


class DeviceDataset:
    def __init__(self, ds: CaptionDataset, model_cfg,
                 with_gt_region: bool = False):
        data, pairs, tpp = _pack_host(ds, model_cfg, with_gt_region)
        self.data = jax.device_put(data)   # ONE upload
        self.num_pairs = len(pairs)
        self.pairs = pairs
        # host-side stats (no device syncs needed for logging)
        self.tokens_per_pair = tpp

    def batch_tokens(self, idx: np.ndarray) -> float:
        return float(self.tokens_per_pair[idx].sum())

    def example_ids(self, idx) -> list[int]:
        """Original dataset example index for each pair in a batch
        (host-side; SCST needs the image ids for the reward lookup)."""
        return [self.pairs[int(i)][0] for i in idx]

    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for v in self.data.values())

    def epoch_batches(self, batch_size: int, seed: int, drop_last=True):
        """Yield [B] int32 pair-index arrays (the only per-step upload)."""
        order = np.random.default_rng(seed).permutation(self.num_pairs)
        stop = (self.num_pairs // batch_size * batch_size if drop_last
                else self.num_pairs)
        for s in range(0, stop, batch_size):
            idx = order[s:s + batch_size]
            if len(idx) < batch_size:
                idx = np.pad(idx, (0, batch_size - len(idx)), mode="edge")
            yield np.asarray(idx, np.int32)


class ShardedDeviceDataset:
    """Device-resident dataset sharded over a mesh's 'data' axis.

    The mesh-composed counterpart of DeviceDataset (the reference trained
    multi-GPU end-to-end via DataParallel — SURVEY.md §5.8; here the
    resident feeding path must scale the same way): examples are
    partitioned round-robin over the n_data shards, pairs follow their
    example, every array gets a per-shard block layout [n*K, ...] placed
    with NamedSharding(P('data')) so row-block k lives in device k's HBM —
    nothing is replicated, total HBM cost equals the single-chip path.

    Per-shard LOCAL indexing: `pair_example` holds shard-local example
    ids, and `epoch_batches` yields [B] index vectors whose k-th B/n chunk
    contains local pair ids for shard k (each shard shuffles its own
    pairs — the standard per-host data-loading semantics).  The gather
    runs under shard_map, so each device gathers from its own block only:
    no cross-device collectives on the feeding path.
    """

    def __init__(self, ds: CaptionDataset, model_cfg, mesh,
                 with_gt_region: bool = False):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from cvc_tpu.parallel.mesh import DATA_AXIS
        data, pairs, tpp = _pack_host(ds, model_cfg, with_gt_region)
        n = int(mesh.shape[DATA_AXIS])
        E, Pn = data["ex_feats"].shape[0], len(pairs)
        ex_shards = [list(range(s, E, n)) for s in range(n)]
        # pairs follow their example's shard; store (orig_pair, local_ex)
        ex_local = np.full(E, -1, np.int64)
        for s, exs in enumerate(ex_shards):
            for j, e in enumerate(exs):
                ex_local[e] = j
        ex_shard_of = np.arange(E) % n      # round-robin
        pair_shards: list[list[int]] = [[] for _ in range(n)]
        for p, (ei, _ci) in enumerate(pairs):
            pair_shards[int(ex_shard_of[ei])].append(p)
        self.E_s = E_s = max(len(x) for x in ex_shards)
        self.P_s = P_s = max(len(x) for x in pair_shards)
        self.real_pairs = [len(x) for x in pair_shards]

        def stack_ex(a):
            out = np.zeros((n * E_s,) + a.shape[1:], a.dtype)
            for s, exs in enumerate(ex_shards):
                out[s * E_s: s * E_s + len(exs)] = a[exs]
            return out

        def stack_pair(a, fill=0):
            out = np.full((n * P_s,) + a.shape[1:], fill, a.dtype)
            for s, ps in enumerate(pair_shards):
                out[s * P_s: s * P_s + len(ps)] = a[ps]
            return out

        sharded = {}
        for k, v in data.items():
            if k == "pair_example":
                # remap to shard-LOCAL example ids
                local = ex_local[v].astype(np.int32)
                sharded[k] = stack_pair(local)
            elif k.startswith("ex_"):
                sharded[k] = stack_ex(v)
            else:
                sharded[k] = stack_pair(v, fill=-1 if k == "pair_gt_region"
                                        else 0)
        sh = NamedSharding(mesh, P(DATA_AXIS))
        self.data = jax.device_put(
            sharded, {k: sh for k in sharded})    # ONE upload, pre-sharded
        self.mesh = mesh
        self.n_shards = n
        self.idx_sharding = sh
        self.num_pairs = Pn
        self.pair_shards = pair_shards
        # original example id per pair (host-side; example_ids())
        self._pair_example_orig = np.asarray(
            [ei for (ei, _ci) in pairs], np.int64)
        # host-side stats in the stacked layout (logging without syncs)
        self.tokens_per_pair = stack_pair(tpp)

    def epoch_batches(self, batch_size: int, seed: int):
        """Yield [B] int32 LOCAL pair-index vectors (chunk k -> shard k).
        Epoch length = what every shard can fill (min over shards)."""
        n = self.n_shards
        if batch_size % n:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"data axis {n}")
        b = batch_size // n
        rng = np.random.default_rng(seed)
        perms = [rng.permutation(r) for r in self.real_pairs]
        steps = min(r // b for r in self.real_pairs)
        for i in range(steps):
            chunks = [perms[s][i * b:(i + 1) * b] for s in range(n)]
            yield np.concatenate(chunks).astype(np.int32)

    def batch_tokens(self, idx: np.ndarray) -> float:
        """Supervised-token count of a batch (host-side, for logging)."""
        b = len(idx) // self.n_shards
        g = idx.astype(np.int64).copy()
        for s in range(self.n_shards):
            g[s * b:(s + 1) * b] += s * self.P_s
        return float(self.tokens_per_pair[g].sum())

    def example_ids(self, idx) -> list[int]:
        """Original dataset example index for each pair in a batch:
        chunk k of `idx` holds shard k's LOCAL pair ids — map back
        through pair_shards to the original pair, then to its example."""
        b = len(idx) // self.n_shards
        out = []
        for s in range(self.n_shards):
            for i in idx[s * b:(s + 1) * b]:
                orig_pair = self.pair_shards[s][int(i)]
                out.append(int(self._pair_example_orig[orig_pair]))
        return out

    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for v in self.data.values())


def gather_batch(data: dict, idx: jnp.ndarray) -> dict:
    """Pure-jnp batch gather — call inside jit so it fuses with the step."""
    ei = jnp.take(data["pair_example"], idx, axis=0)
    arrays = dict(
        feats=jnp.take(data["ex_feats"], ei, axis=0),
        box_geom=jnp.take(data["ex_geom"], ei, axis=0),
        region_cls=jnp.take(data["ex_cls"], ei, axis=0),
        region_mask=jnp.take(data["ex_mask"], ei, axis=0),
        tokens=jnp.take(data["pair_tokens"], idx, axis=0),
        token_mask=jnp.take(data["pair_tmask"], idx, axis=0),
    )
    if "ex_global" in data:
        arrays["global_feat"] = jnp.take(data["ex_global"], ei, axis=0)
    if "pair_gt_region" in data:
        arrays["gt_region"] = jnp.take(data["pair_gt_region"], idx, axis=0)
    return arrays
