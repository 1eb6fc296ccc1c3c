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
