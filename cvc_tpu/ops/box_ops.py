"""Box math (reference: `misc/bbox_transform.py` bbox_overlaps; SURVEY.md L3).

Pure jnp/numpy-compatible: works on device for on-device grounding checks
and on host (numpy arrays pass straight through jnp) for the evaluator.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_iou(a, b):
    """IoU matrix between two box sets.

    a [N, 4], b [M, 4] in x1,y1,x2,y2 -> [N, M] IoU.  Degenerate boxes get 0.
    """
    a = jnp.asarray(a, dtype=jnp.float32)
    b = jnp.asarray(b, dtype=jnp.float32)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0, None) * jnp.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0, None) * jnp.clip(b[:, 3] - b[:, 1], 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)
