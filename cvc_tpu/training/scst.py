"""Self-critical sequence training (SCST) — the GVD-lineage RL fine-tuning
stage (reference: `misc/rewards.py` RewardCriterion + CIDEr reward from
the self-critical.pytorch lineage; SURVEY.md §2 'Loss/criteria').

TPU-shaped split of the classic recipe:

  device  (one jit):  temperature-sample a caption per image AND its
                      greedy baseline in the same compiled program;
  host:               CIDEr-D rewards (corpus-df TF-IDF) for both;
                      advantage = r_sample - r_greedy;
  device  (one jit):  policy-gradient step — teacher-force the SAMPLED
                      tokens through the decoder to get their logprobs
                      and minimize  -advantage * sum_t logp(w_t) * mask.

The cyclical XE objective can be mixed in with `xe_weight` (reference
practice: SCST after XE convergence, sometimes blended).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cvc_tpu.data.vocab import EOS_ID, PAD_ID
from cvc_tpu.evaluation.cider import CiderDFast
from cvc_tpu.evaluation.tokenizer import ptb_tokenize
from cvc_tpu.models import core
from cvc_tpu.models.cyclical import cyclical_loss
from cvc_tpu.models.decoding import greedy_decode
from cvc_tpu.training.train_state import TrainState


def make_scst_sampler(model_cfg, max_len: int, temperature: float = 1.0):
    """Jitted: (params, arrays, rng) -> dict(sample_tokens, greedy_tokens).
    Both decodes share one compiled program."""

    def fn(params, arrays, rng):
        s = greedy_decode(params, model_cfg, arrays, max_len,
                          temperature=temperature, rng=rng, sample=True)
        g = greedy_decode(params, model_cfg, arrays, max_len, sample=False)
        return {"sample_tokens": s["tokens"], "greedy_tokens": g["tokens"]}

    return jax.jit(fn)


def make_resident_scst_sampler(model_cfg, max_len: int,
                               temperature: float = 1.0, mesh=None,
                               state=None):
    """Jitted: (params, data, idx, rng) -> dict(sample_tokens,
    greedy_tokens), gathering the batch from the HBM-resident dataset
    inside the jit (the resident twin of `make_scst_sampler`).

    With `mesh`, `data` is a ShardedDeviceDataset.data dict: the gather
    runs under shard_map on each device's local HBM block and the two
    decodes run data-parallel under GSPMD (params stay in their training
    placement — pass `state` for the sharding pytree)."""
    from cvc_tpu.data.device_data import gather_batch

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from cvc_tpu.parallel.mesh import DATA_AXIS
        local_gather = jax.shard_map(
            gather_batch, mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS), check_vma=False)
    else:
        local_gather = gather_batch

    def fn(params, data, idx, rng):
        arrays = local_gather(data, idx)
        s = greedy_decode(params, model_cfg, arrays, max_len,
                          temperature=temperature, rng=rng, sample=True)
        g = greedy_decode(params, model_cfg, arrays, max_len, sample=False)
        return {"sample_tokens": s["tokens"], "greedy_tokens": g["tokens"]}

    if mesh is None:
        return jax.jit(fn)
    assert state is not None
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cvc_tpu.parallel.mesh import DATA_AXIS, param_shardings, replicated
    p_sh = param_shardings(mesh, state.params, shard_vocab_head=True)
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    rep = replicated(mesh)
    return jax.jit(fn, in_shardings=(p_sh, data_sh, data_sh, rep),
                   out_shardings=None)


def sample_mask(tokens: jnp.ndarray) -> jnp.ndarray:
    """Supervision mask over a generated buffer: words + the first EOS."""
    is_eos = tokens == EOS_ID
    after_eos = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) - is_eos.astype(jnp.int32)
    return ((tokens != PAD_ID) & (after_eos == 0)).astype(jnp.float32)


def make_scst_step(model_cfg, train_cfg, optimizer, xe_weight: float = 0.0,
                   enable_cycle: bool | None = None, mesh=None, state=None,
                   example_arrays=None, resident: bool = False):
    """Jitted: (state, arrays, sample_tokens, advantage, rng) -> (state,
    metrics).  Recomputes the sampled tokens' logprobs teacher-forced (no
    gradient flows through the sampling itself — the REINFORCE estimator).

    `enable_cycle` stages the XE blend's cycle the same way the XE loop
    does (--cycle_after); defaults to train_cfg.enable_cycle.  With
    `mesh`, shardings are pinned exactly like make_train_step (batch over
    'data', params/moments per param_shardings) so SCST scales over the
    same SPMD mesh as XE training.

    `resident=True`: the signature becomes (state, data, idx,
    sample_tokens, advantage, rng) where `data` is a DeviceDataset.data
    dict — the batch is gathered from HBM inside the jit, so features
    never re-cross host->device during SCST epochs.  Composes with
    `mesh`: `data` is then a ShardedDeviceDataset.data dict, the gather
    runs under shard_map per local HBM block, and the PG update runs
    GSPMD with the same state shardings as XE training (reference:
    --mGPUs composed with misc/rewards.py SCST)."""
    if enable_cycle is None:
        enable_cycle = train_cfg.enable_cycle

    def step(state: TrainState, arrays, sample_tokens, advantage, rng):
        B, L = sample_tokens.shape
        dtype = jnp.bfloat16 if model_cfg.dtype == "bfloat16" else jnp.float32

        def loss_fn(params):
            v_enc, keys, v_global = core.encode_regions(
                params, model_cfg, arrays["feats"], arrays["box_geom"],
                arrays["region_cls"], arrays["region_mask"],
                arrays.get("global_feat"))
            # inputs: BOS + sampled[:-1]; targets: sampled tokens
            bos = jnp.full((B, 1), 1, jnp.int32)
            inputs = jnp.concatenate([bos, sample_tokens[:, :-1]], axis=1)
            emb = core.embed_tokens(params, inputs, dtype)
            h_seq, _, _ = core.decode(params, model_cfg, v_enc, keys,
                                      v_global, emb, arrays["region_mask"])
            logits = core.logits(params, h_seq)             # [B, L, V] f32
            logp = jax.nn.log_softmax(logits, axis=-1)
            tok_lp = jnp.take_along_axis(
                logp, sample_tokens[..., None].astype(jnp.int32),
                axis=-1)[..., 0]                            # [B, L]
            mask = sample_mask(sample_tokens)
            pg = -jnp.sum(advantage[:, None] * tok_lp * mask) \
                / jnp.maximum(jnp.sum(mask), 1.0)
            metrics = {"loss_pg": pg,
                       "advantage_mean": jnp.mean(advantage),
                       "sample_len": jnp.mean(jnp.sum(mask, axis=1))}
            loss = pg
            if xe_weight > 0:
                xe, m2 = cyclical_loss(params, model_cfg, arrays, rng=rng,
                                       train=True,
                                       enable_cycle=enable_cycle)
                loss = loss + xe_weight * xe
                metrics["loss_xe"] = xe
            metrics["loss"] = loss
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        return (TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1), metrics)

    donate = (0,) if train_cfg.donate_state else ()
    if resident:
        from cvc_tpu.data.device_data import gather_batch
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from cvc_tpu.parallel.mesh import DATA_AXIS
            local_gather = jax.shard_map(
                gather_batch, mesh=mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS), check_vma=False)
        else:
            local_gather = gather_batch

        def resident_step(state, data, idx, sample_tokens, advantage, rng):
            return step(state, local_gather(data, idx), sample_tokens,
                        advantage, rng)

        if mesh is None:
            return jax.jit(resident_step, donate_argnums=donate)
        assert state is not None
        from jax.sharding import NamedSharding, PartitionSpec as P
        from cvc_tpu.parallel.mesh import DATA_AXIS, replicated
        from cvc_tpu.training.step import state_shardings
        sh = state_shardings(mesh, state)
        data_sh = NamedSharding(mesh, P(DATA_AXIS))
        rep = replicated(mesh)
        return jax.jit(
            resident_step,
            in_shardings=(sh, data_sh, data_sh, data_sh, data_sh, rep),
            out_shardings=(sh, None), donate_argnums=donate)
    if mesh is None:
        return jax.jit(step, donate_argnums=donate)
    assert state is not None and example_arrays is not None
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cvc_tpu.parallel.mesh import DATA_AXIS, batch_shardings, replicated
    from cvc_tpu.training.step import state_shardings
    sh = state_shardings(mesh, state)
    bs = batch_shardings(mesh, example_arrays)
    rep = replicated(mesh)
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step, in_shardings=(sh, bs, batch_sh, batch_sh, rep),
                   out_shardings=(sh, None), donate_argnums=donate)


class ScstRewarder:
    """Host-side CIDEr-D reward with corpus document frequency (the
    reference precomputes train-corpus df for its SCST reward)."""

    def __init__(self, train_references: dict[str, list[str]]):
        # tokenize every training reference ONCE — rewards() runs per
        # batch in the SCST hot loop, and re-tokenizing 5 refs x B images
        # per step dominated the host-side reward cost
        self._ref_cache = {
            img: [" ".join(ptb_tokenize(r)) for r in refs]
            for img, refs in train_references.items()}
        # native C++ scorer when available (this is a per-batch hot path)
        self.scorer = CiderDFast(corpus_refs=list(self._ref_cache.values()))

    def _refs_tok(self, image_id: str, raw: list[str]) -> list[str]:
        got = self._ref_cache.get(image_id)
        if got is None:     # off-corpus image (val probes): cache it too
            got = [" ".join(ptb_tokenize(r)) for r in raw]
            self._ref_cache[image_id] = got
        return got

    def rewards(self, vocab, tokens: np.ndarray, image_ids: list[str],
                references: dict[str, list[str]]) -> np.ndarray:
        sents = vocab.decode_sequence(tokens)
        cands = {f"c{i}": s for i, s in enumerate(sents)}
        refs = {f"c{i}": self._refs_tok(image_ids[i],
                                        references[image_ids[i]])
                for i in range(len(sents))}
        cands = {k: " ".join(ptb_tokenize(v)) for k, v in cands.items()}
        _, per = self.scorer.compute_score(cands, refs)
        return np.asarray([per[f"c{i}"] for i in range(len(sents))],
                          np.float32)


def scst_train_batch_resident(state, dd, idx, ds, sampler, step_fn,
                              rewarder, rng):
    """One SCST iteration over the device-resident dataset: the only
    per-step host->device uploads are the [B] pair-index vector, the
    sampled tokens (which must visit the host for the CIDEr-D reward
    anyway), and the [B] advantage."""
    rng_sample, rng_step = jax.random.split(rng)
    idx_dev = jnp.asarray(idx)
    out = sampler(state.params, dd.data, idx_dev, rng_sample)
    sample_tokens = np.asarray(out["sample_tokens"])
    greedy_tokens = np.asarray(out["greedy_tokens"])
    ex_ids = dd.example_ids(idx)
    image_ids = [ds.get(e).image_id for e in ex_ids]
    references = {ds.get(e).image_id: ds.get(e).captions for e in ex_ids}
    r_s = rewarder.rewards(ds.vocab, sample_tokens, image_ids, references)
    r_g = rewarder.rewards(ds.vocab, greedy_tokens, image_ids, references)
    advantage = jnp.asarray(r_s - r_g)
    state, metrics = step_fn(state, dd.data, idx_dev,
                             jnp.asarray(sample_tokens), advantage,
                             rng_step)
    metrics = dict(metrics)
    metrics["reward_sample"] = float(r_s.mean())
    metrics["reward_greedy"] = float(r_g.mean())
    return state, metrics


def scst_train_batch(state, arrays, batch, ds, sampler, step_fn, rewarder,
                     rng):
    """One full SCST iteration (sample -> reward -> update) for a batch.
    Returns (state, metrics)."""
    # independent keys: caption-sampling noise must not correlate with the
    # XE blend's dropout inside the update
    rng_sample, rng_step = jax.random.split(rng)
    out = sampler(state.params, arrays, rng_sample)
    sample_tokens = np.asarray(out["sample_tokens"])
    greedy_tokens = np.asarray(out["greedy_tokens"])
    image_ids = [ds.get(int(i)).image_id for i in batch.example_idx]
    references = {ds.get(int(i)).image_id: ds.get(int(i)).captions
                  for i in batch.example_idx}
    r_s = rewarder.rewards(ds.vocab, sample_tokens, image_ids, references)
    r_g = rewarder.rewards(ds.vocab, greedy_tokens, image_ids, references)
    advantage = jnp.asarray((r_s - r_g) * np.asarray(batch.valid, np.float32))
    state, metrics = step_fn(state, arrays, jnp.asarray(sample_tokens),
                             advantage, rng_step)
    metrics = dict(metrics)
    metrics["reward_sample"] = float(r_s.mean())
    metrics["reward_greedy"] = float(r_g.mean())
    return state, metrics
