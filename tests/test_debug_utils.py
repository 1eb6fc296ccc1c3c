import jax.numpy as jnp
import numpy as np
import pytest

from cvc_tpu.utils.debug import (assert_tree_finite, checkify_loss,
                                 tree_nonfinite_report)


def test_nonfinite_report_counts_and_paths():
    tree = {"a": jnp.array([1.0, jnp.nan]),
            "b": {"c": jnp.array([jnp.inf, 2.0, jnp.nan])},
            "ints": jnp.array([1, 2])}
    rep = tree_nonfinite_report(tree)
    assert sum(rep.values()) == 3
    assert any("'a'" in k or "a" in k for k in rep)


def test_assert_tree_finite():
    assert_tree_finite({"x": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_tree_finite({"x": jnp.array([jnp.nan])}, what="params")


def test_checkify_loss_catches_nan():
    def loss(x):
        return jnp.log(x).sum()   # nan for negative inputs

    checked = checkify_loss(loss)
    err, val = checked(jnp.array([-1.0, 2.0]))
    with pytest.raises(Exception):
        err.throw()
    err2, val2 = checked(jnp.array([1.0, 2.0]))
    err2.throw()  # clean
    assert np.isfinite(float(val2))
