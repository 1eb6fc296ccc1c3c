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


MAX_PALLAS_REGION_SLOTS = 512


def use_pallas(cfg) -> bool:
    """Resolve ModelConfig.use_pallas: None means auto — the fused Pallas
    kernels on real TPU (measured >= XLA at flagship shapes on v5e, see
    experiments/pallas_vs_xla.json), XLA's own fusion elsewhere (interpret
    mode is only a correctness tool; it would slow CPU runs 10-100x).

    Auto also requires the attention width to fit the kernels' VMEM
    blocking: at ANet-video widths (10 frames x 128 slots = 1280) the
    per-block keys/values tiles exceed the ~16 MB scoped-VMEM budget
    (measured compile OOM), so wide configs fall back to XLA fusion.
    An explicit use_pallas=True bypasses the gate (and will OOM at such
    widths — it is the A/B switch, not a safety net)."""
    up = getattr(cfg, "use_pallas", None)
    if up is None:
        if getattr(cfg, "total_regions", 0) > MAX_PALLAS_REGION_SLOTS:
            return False
        return jax.default_backend() == "tpu"
    if up and getattr(cfg, "total_regions", 0) > MAX_PALLAS_REGION_SLOTS:
        import warnings
        warnings.warn(
            f"use_pallas=True with total_regions="
            f"{cfg.total_regions} > {MAX_PALLAS_REGION_SLOTS}: the fused "
            f"kernels' keys/values tiles exceed the ~16MB VMEM budget at "
            f"this width and WILL fail to compile on TPU; use "
            f"use_pallas=None (auto) to fall back to XLA fusion.",
            stacklevel=2)
    return bool(up)


def use_pallas_select(cfg) -> bool:
    """Pallas dispatch for the beam-select top-k+logsumexp kernel
    (ops/pallas/topk_select.py).  Independent knob from `use_pallas`
    (the attention/LSTM kernels) so the two can be A/B'd separately:
    `ModelConfig.pallas_select` None = auto — on on real TPU (the TopK
    custom call measures ~10x over the HBM roofline at vocab width,
    docs/PERF.md §1), off elsewhere (interpret mode is a correctness
    tool only).  No VMEM width gate: the kernel blocks over rows and
    the vocab axis is static."""
    ps = getattr(cfg, "pallas_select", None)
    if ps is None:
        return jax.default_backend() == "tpu"
    return bool(ps)


def use_pallas_train_scan(cfg) -> bool:
    """Pallas dispatch for the TEACHER-FORCED decode/reconstruct scans
    (training + eval loss).  Auto resolves to False even on TPU: through
    `jax.grad` the per-op kernel boundaries block XLA's cross-step fusion,
    and the measured v5e cyclical grad step is faster (and compiles ~6x
    faster) on pure XLA with scan unrolling — 13.8 vs 14.6 ms at flagship
    shapes (see experiments/pallas_vs_xla.json).  Generation-time steps
    (beam/greedy, no grad) keep the fused kernels via `use_pallas` — there
    the VMEM-resident step wins.  An explicit use_pallas=True still forces
    the kernels everywhere (the A/B switch)."""
    up = getattr(cfg, "use_pallas", None)
    if up is None:
        return False
    return bool(up)
