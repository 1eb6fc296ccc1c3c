"""Device mesh + sharding layout.

The reference's only parallelism is single-host `torch.nn.DataParallel`
behind `--mGPUs` (replicate module, scatter batch, gather losses;
reference: `main.py`; SURVEY.md §5.8).  The TPU-native equivalent is SPMD
over a `jax.sharding.Mesh`:

  * axis "data"  — batch sharding (the DataParallel replacement); XLA
    lowers the gradient reduction to ICI all-reduce;
  * axis "model" — optional tensor parallelism for the vocab head (the
    largest matmul: [L*B, H] x [H, V]); the head weight is sharded on V
    and XLA inserts the logits all-gather / loss psum automatically.

We annotate shardings and `jit` the whole step (GSPMD): the compiled
program is identical math on any mesh shape, so single-chip tests and
multi-chip runs share one code path.  PP/SP/EP/context-parallel are
structurally unnecessary here (sequences <= ~22 tokens, attention over
<= ~1000 region slots; SURVEY.md §5.7) — scaling is batch-wise.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: int = 0, model_axis: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh.  model_axis=1 -> pure DP."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    grid = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params, shard_vocab_head: bool = True):
    """Sharding pytree for the model params.

    Everything replicates except (optionally) the vocab head, whose output
    dim V is the only axis in this model big enough to be worth splitting:
    logit.w [H, V] and logit.b [V] shard over MODEL_AXIS.
    """
    use_tp = shard_vocab_head and mesh.shape[MODEL_AXIS] > 1

    def leaf_sharding(path, leaf):
        del leaf
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if use_tp and "logit" in names:
            if "w" in names:
                return NamedSharding(mesh, P(None, MODEL_AXIS))
            if "b" in names:
                return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def batch_shardings(mesh: Mesh, arrays):
    """Batch arrays shard their leading dim over DATA_AXIS."""
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(DATA_AXIS)), arrays)


def shard_batch(mesh: Mesh, arrays):
    """device_put a host batch with data-parallel sharding."""
    return jax.device_put(arrays, batch_shardings(mesh, arrays))
