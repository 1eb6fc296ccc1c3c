"""Region self-attention encoder (the reference's optional `--obj_interact`
transformer over region features, from the GVD lineage: `misc/transformer.py`).

TPU-first: a plain pre-LN multi-head self-attention + FFN block in jnp —
[B, S, H] with S at most ~1024 slots, so flash-style tiling is unnecessary;
XLA maps the batched matmuls straight onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvc_tpu.ops.primitives import masked_softmax


def init_transformer_params(rng, num_layers: int, dim: int, num_heads: int,
                            ffn_mult: int = 4):
    keys = jax.random.split(rng, num_layers)
    init = jax.nn.initializers.glorot_uniform()

    def layer(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "qkv_w": init(k1, (dim, 3 * dim)),
            "qkv_b": jnp.zeros((3 * dim,)),
            "out_w": init(k2, (dim, dim)),
            "out_b": jnp.zeros((dim,)),
            "ffn1_w": init(k3, (dim, ffn_mult * dim)),
            "ffn1_b": jnp.zeros((ffn_mult * dim,)),
            "ffn2_w": init(k4, (ffn_mult * dim, dim)),
            "ffn2_b": jnp.zeros((dim,)),
            "ln1_scale": jnp.ones((dim,)), "ln1_bias": jnp.zeros((dim,)),
            "ln2_scale": jnp.ones((dim,)), "ln2_bias": jnp.zeros((dim,)),
        }

    # num_heads is static config, NOT a param: an int leaf in the pytree
    # becomes an int32 array under jit and jax.grad refuses the tree
    return {"layers": [layer(k) for k in keys]}


def _ln(x, scale, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def region_self_attention(params, x: jnp.ndarray, mask: jnp.ndarray,
                          num_heads: int = 4) -> jnp.ndarray:
    """x [B, S, H], mask [B, S] -> [B, S, H]; padded slots neither attend
    nor are attended to.  num_heads is static (cfg.obj_interact_heads)."""
    nh = num_heads
    B, S, H = x.shape
    hd = H // nh
    for lp in params["layers"]:
        y = _ln(x, lp["ln1_scale"], lp["ln1_bias"])
        qkv = y @ lp["qkv_w"] + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(hd)
        attn = masked_softmax(logits, mask[:, None, None, :])
        ctx = jnp.einsum("bhst,bhtd->bhsd", attn.astype(v.dtype), v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H)
        x = x + (ctx @ lp["out_w"] + lp["out_b"])
        y = _ln(x, lp["ln2_scale"], lp["ln2_bias"])
        x = x + (jax.nn.relu(y @ lp["ffn1_w"] + lp["ffn1_b"]) @ lp["ffn2_w"]
                 + lp["ffn2_b"])
    return x * mask[..., None]
