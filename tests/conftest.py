"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world 'fake backend' for distributed tests (SURVEY.md §4):
XLA CPU devices stand in for a v5e slice, so shard_map/psum paths execute
with real collectives, just on host.  Must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override profile's axon/TPU setting
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Plugins (jaxtyping) may import jax before this conftest runs, baking in
# the profile's JAX_PLATFORMS=axon — override through the config API too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# The CPU backend lowers f32 batched matmuls at reduced (bf16-like)
# precision by default, which breaks exact-equivalence tests; force full
# f32 contraction precision under test.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from cvc_tpu.config import ModelConfig  # noqa: E402


def tiny_model_config(**kw) -> ModelConfig:
    base = dict(vocab_size=128, input_encoding_size=16, rnn_size=32,
                att_hid_size=24, feat_dim=64, num_regions=12, num_frames=1,
                seq_length=8, num_classes=24, class_emb_dim=8,
                drop_prob_lm=0.0, use_pallas=False, dtype="float32")
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture
def tiny_cfg() -> ModelConfig:
    return tiny_model_config()


@pytest.fixture
def tiny_batch(tiny_cfg):
    """A random static-shape batch matching tiny_cfg."""
    return random_batch(tiny_cfg, batch=4, seed=0)


def random_batch(mc: ModelConfig, batch: int, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    S = mc.num_frames * mc.num_regions
    T = mc.max_tokens
    n_real = rng.integers(3, S + 1, size=batch)
    region_mask = (np.arange(S)[None, :] < n_real[:, None]).astype(np.float32)
    lengths = rng.integers(2, mc.seq_length + 1, size=batch)
    tokens = np.zeros((batch, T), dtype=np.int32)
    token_mask = np.zeros((batch, T), dtype=np.float32)
    tokens[:, 0] = 1  # BOS
    for i, n in enumerate(lengths):
        tokens[i, 1:1 + n] = rng.integers(4, mc.vocab_size, size=n)
        tokens[i, 1 + n] = 2  # EOS
        token_mask[i, 1:2 + n] = 1.0
    arrays = dict(
        feats=rng.normal(size=(batch, S, mc.feat_dim)).astype(np.float32),
        box_geom=rng.uniform(size=(batch, S, 5)).astype(np.float32),
        region_cls=rng.integers(0, mc.num_classes, size=(batch, S)).astype(np.int32),
        region_mask=region_mask,
        tokens=tokens,
        token_mask=token_mask,
    )
    if mc.global_feat_dim:
        arrays["global_feat"] = rng.normal(
            size=(batch, mc.global_feat_dim)).astype(np.float32)
    return arrays
