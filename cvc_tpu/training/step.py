"""The compiled training step.

One XLA program per step (the key structural win over the reference's
per-timestep Python loop + DataParallel scatter/gather; SURVEY.md §3.1):

    decode scan -> localize -> reconstruct scan -> summed masked XE
    -> grads -> clip -> Adam update

SPMD: the step is `jit`ed with explicit shardings — batch over the "data"
mesh axis, params replicated (vocab head optionally sharded over "model").
XLA inserts the gradient all-reduce / logits collectives over ICI; the
same compiled code runs on 1 chip or a slice.  This replaces the
reference's `torch.nn.DataParallel` replicate/scatter/gather entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvc_tpu.models.cyclical import cyclical_loss
from cvc_tpu.parallel.mesh import (batch_shardings, param_shardings,
                                   replicated)
from cvc_tpu.training.train_state import TrainState


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def state_shardings(mesh, state: TrainState, shard_vocab_head: bool = True):
    """Sharding pytree matching a TrainState: params per `param_shardings`,
    optimizer moments follow their params, scalars replicated."""
    rep = replicated(mesh)
    p_sh = param_shardings(mesh, state.params, shard_vocab_head)
    o_sh = _shard_opt_like_params(state.opt_state, state.params, p_sh, rep)
    return TrainState(params=p_sh, opt_state=o_sh, step=rep)


def _shard_opt_like_params(opt_state, params, p_sh, rep):
    """Give param-shaped leaves inside the optimizer state the same
    sharding as their param (Adam mu/nu must co-shard with the vocab head
    or XLA reshards every step)."""
    param_leaves = jax.tree_util.tree_leaves(params)
    shard_leaves = jax.tree_util.tree_leaves(p_sh)
    shape_to_shard = {}
    for p, s in zip(param_leaves, shard_leaves):
        shape_to_shard.setdefault((p.shape, str(p.dtype)), s)

    def leaf_rule(x):
        if hasattr(x, "shape"):
            return shape_to_shard.get((x.shape, str(x.dtype)), rep)
        return rep

    return jax.tree_util.tree_map(leaf_rule, opt_state)


def make_train_step(model_cfg, train_cfg, optimizer, mesh=None,
                    state=None, example_arrays=None):
    """Build the jitted train step: step(state, arrays, rng) -> (state,
    metrics).  With `mesh`, shardings are pinned from `state` and
    `example_arrays` (GSPMD); without, a plain jit."""
    enable_cycle = train_cfg.enable_cycle
    use_ss = train_cfg.scheduled_sampling_start >= 0

    def train_step(state: TrainState, arrays: dict, rng, ss_prob=None):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(p):
            return cyclical_loss(p, model_cfg, arrays, rng=rng, train=True,
                                 enable_cycle=enable_cycle,
                                 ss_prob=ss_prob if use_ss else None)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        metrics["grad_norm"] = global_norm(grads)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, metrics

    donate = (0,) if train_cfg.donate_state else ()
    if not use_ss:
        # keep the 3-arg signature for the common path
        fast = lambda state, arrays, rng: train_step(state, arrays, rng)
    else:
        fast = train_step
    if mesh is None:
        return jax.jit(fast, donate_argnums=donate)

    assert state is not None and example_arrays is not None
    sh = state_shardings(mesh, state)
    bs = batch_shardings(mesh, example_arrays)
    rep = replicated(mesh)
    in_sh = (sh, bs, rep) + ((rep,) if use_ss else ())
    # metrics are scalars — let GSPMD place them (key set varies with the
    # optional supervised-grounding loss)
    return jax.jit(fast, in_shardings=in_sh,
                   out_shardings=(sh, None), donate_argnums=donate)


def make_resident_train_step(model_cfg, train_cfg, optimizer, mesh=None,
                             state=None):
    """Train step over a device-resident dataset (see
    cvc_tpu/data/device_data.py): step(state, data, idx, rng) gathers the
    batch on device — the only per-step host->device transfer is the [B]
    index vector (also the workaround for this sandbox's per-upload host
    memory leak).

    With `mesh`, `data` is a ShardedDeviceDataset.data dict (row blocks
    over the 'data' axis) and the gather runs under shard_map so each
    device reads only its local HBM block; the loss/grad then runs GSPMD
    exactly like make_train_step (grad all-reduce over ICI).

    Scheduled sampling composes: when train_cfg.scheduled_sampling_start
    >= 0 the signature grows a trailing ss_prob scalar, exactly like
    make_train_step (the reference annealed --scheduled_sampling_* flags
    composed with every feeding path)."""
    from cvc_tpu.data.device_data import gather_batch
    enable_cycle = train_cfg.enable_cycle
    use_ss = train_cfg.scheduled_sampling_start >= 0

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from cvc_tpu.parallel.mesh import DATA_AXIS
        local_gather = jax.shard_map(
            gather_batch, mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS), check_vma=False)
    else:
        local_gather = gather_batch

    def train_step(state: TrainState, data: dict, idx, rng, ss_prob=None):
        rng = jax.random.fold_in(rng, state.step)
        arrays = local_gather(data, idx)

        def loss_fn(p):
            return cyclical_loss(p, model_cfg, arrays, rng=rng, train=True,
                                 enable_cycle=enable_cycle,
                                 ss_prob=ss_prob if use_ss else None)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        metrics["grad_norm"] = global_norm(grads)
        return (TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1), metrics)

    donate = (0,) if train_cfg.donate_state else ()
    if not use_ss:
        fast = lambda state, data, idx, rng: train_step(state, data, idx,
                                                        rng)
    else:
        fast = train_step
    if mesh is None:
        return jax.jit(fast, donate_argnums=donate)
    assert state is not None
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cvc_tpu.parallel.mesh import DATA_AXIS
    sh = state_shardings(mesh, state)
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    rep = replicated(mesh)
    # data/idx carry their committed shardings (placed by
    # ShardedDeviceDataset); pin the state + rng, let metrics be placed.
    in_sh = (sh, data_sh, data_sh, rep) + ((rep,) if use_ss else ())
    return jax.jit(fast,
                   in_shardings=in_sh,
                   out_shardings=(sh, None), donate_argnums=donate)


def make_eval_step(model_cfg, mesh=None, state=None, example_arrays=None):
    """Jitted validation loss (no dropout, no update):
    eval_step(params, arrays) -> metrics."""

    def eval_step(params, arrays):
        _, metrics = cyclical_loss(params, model_cfg, arrays, rng=None,
                                   train=False, enable_cycle=True)
        return metrics

    if mesh is None:
        return jax.jit(eval_step)
    assert state is not None and example_arrays is not None
    p_sh = param_shardings(mesh, state.params, shard_vocab_head=True)
    bs = batch_shardings(mesh, example_arrays)
    # metrics are scalars and their key set varies with the optional
    # supervised-grounding loss — let GSPMD place them (same as
    # make_train_step) instead of pinning a fixed pytree.
    return jax.jit(eval_step, in_shardings=(p_sh, bs), out_shardings=None)
