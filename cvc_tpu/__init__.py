"""cvc_tpu — TPU-native grounded visual captioning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`chihyaoma/cyclical-visual-captioning` (ECCV 2020: "Learning to Generate
Grounded Visual Captions without Localization Supervision"): grounded
image/video captioning on Flickr30k Entities and ActivityNet-Entities,
trained with the cyclical decode -> localize -> reconstruct regimen over
pre-extracted Faster R-CNN region features.

Design (see SURVEY.md at the repo root):
  * the whole cyclical training step compiles to ONE XLA program
    (teacher-forced decode scan -> localizer -> weight-shared reconstruct
    scan -> summed masked XE -> grads -> optax update);
  * hot ops (additive region attention, LSTM gate fusion, masked
    softmax-xent) have fused Pallas TPU kernels with pure-jnp oracles;
  * inference is an on-device vectorized beam search (beam folded into
    batch, lax.top_k, gather-based state reorder) that records per-step
    region attention for grounding evaluation;
  * parallelism is SPMD over a `jax.sharding.Mesh` via `shard_map`
    (data-parallel batch sharding + optional model-parallel vocab head),
    replacing the reference's single-host `torch.nn.DataParallel`.
"""

__version__ = "0.1.0"

from cvc_tpu.config import Config, ModelConfig, DataConfig, TrainConfig, EvalConfig  # noqa: E402,F401

