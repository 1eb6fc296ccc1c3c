"""Numerics checking (the TPU-world analogue of the sanitizer slot in
SURVEY.md §5.2 — the reference has nothing; we provide NaN/Inf tripwires
that work under jit via `jax.experimental.checkify` or host callbacks)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_nonfinite_report(tree) -> dict:
    """Host-side: count non-finite entries per leaf path (empty = clean)."""
    report = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype,
                                                            jnp.floating):
            continue
        bad = int(jnp.sum(~jnp.isfinite(leaf)))
        if bad:
            report[jax.tree_util.keystr(path)] = bad
    return report


def assert_tree_finite(tree, what: str = "tree") -> None:
    rep = tree_nonfinite_report(tree)
    if rep:
        raise FloatingPointError(f"non-finite values in {what}: {rep}")


def checkify_loss(loss_fn):
    """Wrap a loss fn with checkify NaN/div checks; returns
    (err, value) — call err.throw() host-side to surface failures."""
    from jax.experimental import checkify
    return checkify.checkify(loss_fn,
                             errors=checkify.float_checks)
