"""Oracle-vs-Pallas dispatch.

`ModelConfig.use_pallas` selects the fused TPU kernels; off-TPU backends
(CPU tests, the virtual mesh) transparently run the same kernels in
interpreter mode so one flag exercises one code path everywhere.
"""

from __future__ import annotations

import jax


def pallas_interpret() -> bool:
    """True when the default backend can't execute Mosaic kernels."""
    return jax.default_backend() != "tpu"


def use_pallas(cfg) -> bool:
    """Resolve ModelConfig.use_pallas: None means auto — the fused Pallas
    kernels on real TPU (measured >= XLA at flagship shapes on v5e, see
    experiments/pallas_vs_xla.json), XLA's own fusion elsewhere (interpret
    mode is only a correctness tool; it would slow CPU runs 10-100x)."""
    up = getattr(cfg, "use_pallas", None)
    if up is None:
        return jax.default_backend() == "tpu"
    return bool(up)
