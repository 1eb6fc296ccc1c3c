"""Model core: region encoder, Up-Down attention-LSTM decoder, localizer.

Rebuilds the reference's model layer (reference: `misc/model.py` AttModel —
2-layer attention LSTM per Anderson et al. 2018; `misc/CaptionModel.py`;
SURVEY.md §2 "Decoder", "Localizer", "Reconstructor") the TPU way:

  * parameters are explicit pytrees — the reconstructor IS the decoder's
    params applied with a context override, so the paper's weight sharing
    is structural, not an aliasing trick;
  * the per-timestep loop is a single `jax.lax.scan` over a fused step;
    everything hoistable is hoisted out of the scan:
      - word embeddings for all steps,
      - the input-projection halves of both LSTMs' gates that do not
        depend on recurrent state,
      - the attention keys W_v·V over regions,
      - the vocab projection (applied to the stacked [L, B, H] hidden
        states as ONE large MXU matmul after the scan);
  * shapes are static; region padding is handled by masked softmax.

Step recurrence (decode mode):
    x1_t  = [h_lang_{t-1}, v_global, E[w_t]]
    h_att = LSTM_1(x1_t)
    alpha = softmax_mask( w . tanh(W_v V + W_h h_att) )
    c_t   = sum_i alpha_i V_i          (reconstruct mode: c_t := v_hat_t)
    h_lang= LSTM_2([c_t, h_att])
    logits_t = W_o h_lang              (computed post-scan, batched over t)
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from cvc_tpu.ops.primitives import (additive_attention_scores, lstm_cell,
                                    masked_softmax)
from cvc_tpu.models.transformer import (init_transformer_params,
                                        region_self_attention)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_params(rng, cfg) -> dict:
    """Build the full parameter pytree for ModelConfig `cfg`."""
    H, E, A = cfg.rnn_size, cfg.input_encoding_size, cfg.att_hid_size
    V, D = cfg.vocab_size, cfg.feat_dim
    ks = list(jax.random.split(rng, 16))
    glorot = jax.nn.initializers.glorot_uniform()

    def lstm(kx, kh, in_dim):
        b = jnp.zeros((4 * H,))
        # forget-gate bias = 1 (training stability; gate order i,f,g,o)
        b = b.at[H:2 * H].set(1.0)
        return {"wx": glorot(kx, (in_dim, 4 * H)),
                "wh": jax.nn.initializers.orthogonal()(kh, (H, 4 * H)),
                "b": b}

    params = {
        "embed": {"table": jax.random.uniform(ks[0], (V, E), minval=-0.1,
                                              maxval=0.1)},
        "region_enc": {
            "feat_w": glorot(ks[1], (D, H)),
            "geom_w": glorot(ks[2], (5, H)),
            "cls_emb": jax.random.uniform(ks[3], (cfg.num_classes, cfg.class_emb_dim),
                                          minval=-0.1, maxval=0.1),
            "cls_w": glorot(ks[4], (cfg.class_emb_dim, H)),
            "b": jnp.zeros((H,)),
        },
        "att_lstm": lstm(ks[5], ks[6], E + 2 * H),
        "attention": {
            "wv": glorot(ks[7], (H, A)),
            "wh": glorot(ks[8], (H, A)),
            "w": jax.random.normal(ks[9], (A,)) * (1.0 / jnp.sqrt(A)),
            "b": jnp.zeros((A,)),
        },
        "lang_lstm": lstm(ks[10], ks[11], 2 * H),
        "logit": {"w": glorot(ks[12], (H, V)), "b": jnp.zeros((V,))},
        "localizer": {
            "wq": glorot(ks[13], (E, A)),
            "wv": glorot(ks[14], (H, A)),
            "w": jax.random.normal(ks[15], (A,)) * (1.0 / jnp.sqrt(A)),
            "b": jnp.zeros((A,)),
        },
    }
    if cfg.global_feat_dim:
        kg = jax.random.fold_in(rng, 99)
        params["global_enc"] = {"w": glorot(kg, (cfg.global_feat_dim, H)),
                                "b": jnp.zeros((H,))}
    if cfg.num_frames > 1:
        # learned temporal embedding per frame (ANet: regions from 10
        # sampled frames share one attention pool; the reference's video
        # loader carries temporal info — SURVEY.md §2 'ANet dataset')
        kf = jax.random.fold_in(rng, 101)
        params["frame_emb"] = {
            "table": jax.random.uniform(kf, (cfg.num_frames, H),
                                        minval=-0.05, maxval=0.05)}
    if cfg.obj_interact:
        kt = jax.random.fold_in(rng, 100)
        params["obj_interact"] = init_transformer_params(
            kt, cfg.obj_interact_layers, H, cfg.obj_interact_heads)
    return params


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Region encoding
# ---------------------------------------------------------------------------

def encode_regions(params, cfg, feats, box_geom, region_cls, region_mask,
                   global_feat=None):
    """[B,S,Dfeat] region features -> (V_enc [B,S,H], keys [B,S,A],
    v_global [B,H]).

    Mirrors the reference's region encoder: project [feature ‖ box-geometry
    ‖ class-embedding] to the model dim, optionally run region
    self-attention (--obj_interact), and form the mean-pooled global
    feature (or project the provided segment feature for ANet).
    (reference: input projections + transformer in `misc/model.py` /
    `misc/transformer.py`.)
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    re = params["region_enc"]
    x = feats.astype(dtype) @ re["feat_w"].astype(dtype)
    if cfg.use_box_geometry:
        x = x + box_geom.astype(dtype) @ re["geom_w"].astype(dtype)
    cls_e = jnp.take(re["cls_emb"], jnp.clip(region_cls, 0, cfg.num_classes - 1),
                     axis=0).astype(dtype)
    x = x + cls_e @ re["cls_w"].astype(dtype) + re["b"].astype(dtype)
    if cfg.num_frames > 1 and "frame_emb" in params:
        # slots are frame-major: [f0 r0..rN-1, f1 r0..rN-1, ...]
        S = feats.shape[1]
        frame_idx = (jnp.arange(S) // cfg.num_regions).astype(jnp.int32)
        x = x + jnp.take(params["frame_emb"]["table"], frame_idx,
                         axis=0).astype(dtype)[None, :, :]
    v_enc = jax.nn.relu(x) * region_mask[..., None].astype(dtype)

    if cfg.obj_interact and "obj_interact" in params:
        v_enc = region_self_attention(params["obj_interact"], v_enc,
                                      region_mask, cfg.obj_interact_heads)

    keys = v_enc @ params["attention"]["wv"].astype(dtype)

    if not getattr(cfg, "use_global_feat", True):
        # diagnostic/ablation mode: starve the global pathway so object
        # information can only reach the decoder through attention
        v_global = jnp.zeros((feats.shape[0], cfg.rnn_size), dtype)
    elif global_feat is not None and "global_enc" in params:
        ge = params["global_enc"]
        v_global = jax.nn.relu(global_feat.astype(dtype) @ ge["w"].astype(dtype)
                               + ge["b"].astype(dtype))
    else:
        denom = jnp.maximum(jnp.sum(region_mask, axis=1, keepdims=True), 1.0)
        v_global = jnp.sum(v_enc * region_mask[..., None].astype(dtype), axis=1)
        v_global = v_global / denom.astype(dtype)
    return v_enc, keys, v_global


# ---------------------------------------------------------------------------
# Decoder scan
# ---------------------------------------------------------------------------

def initial_state(batch: int, rnn_size: int, dtype=jnp.float32):
    z = jnp.zeros((batch, rnn_size), dtype=dtype)
    return (z, z, z, z)  # (h_att, c_att, h_lang, c_lang)


def _split_wx_att(wx, E, H):
    """att_lstm input is [h_lang (H), v_global (H), emb (E)] — split Wx into
    the recurrent-half (h_lang) and the precomputable halves."""
    w_hl = wx[:H]
    w_vg = wx[H:2 * H]
    w_e = wx[2 * H:2 * H + E]
    return w_hl, w_vg, w_e


def decoder_step(params, cfg, carry, inputs, v_enc, keys, region_mask,
                 use_attention: bool, context_mix=None, pallas=None):
    """One fused decode step (consumed by lax.scan and by beam search).

    carry:  (h_att, c_att, h_lang, c_lang) each [B, H]
    inputs: dict with
        pre1   [B, 4H]  — precomputed gate half: W_e·emb_t + W_vg·v_global + b
        ctx    [B, H]   — context override (reconstruct mode) or unused
    context_mix [B, 1] — optional per-ROW context source selector for the
        merged decode+reconstruct scan (see `decode`): rows with mix=1 take
        inputs["ctx"] (the localized feature v̂), rows with mix=0 take the
        attention context.  Attention is computed for all rows (its FLOPs
        are ~2% of the step) so both passes share one full-MXU-width scan.
    Returns (carry', (h_lang', alpha [B,S])).
    """
    H = cfg.rnn_size
    h_att, c_att, h_lang, c_lang = carry
    al, att, ll = params["att_lstm"], params["attention"], params["lang_lstm"]
    dtype = keys.dtype
    from cvc_tpu.ops.dispatch import use_pallas as _resolve_pallas
    use_pallas = _resolve_pallas(cfg) if pallas is None else pallas
    if use_pallas:
        from cvc_tpu.ops.dispatch import pallas_interpret
        from cvc_tpu.ops.pallas import (fused_additive_attention,
                                        fused_lstm_gates)
        interp = pallas_interpret()
        cell = lambda g, c: fused_lstm_gates(g, c, 8, interp)
    else:
        cell = lstm_cell

    w_hl, _, _ = _split_wx_att(al["wx"].astype(dtype), cfg.input_encoding_size, H)
    gates1 = (inputs["pre1"]
              + h_lang @ w_hl
              + h_att @ al["wh"].astype(dtype))
    h_att, c_att = cell(gates1, c_att)

    if use_attention:
        q = h_att @ att["wh"].astype(dtype) + att["b"].astype(dtype)
        if use_pallas:
            ctx, alpha = fused_additive_attention(
                keys, q, att["w"].astype(dtype), v_enc, region_mask,
                8, interp)
        else:
            logits = additive_attention_scores(keys, q, att["w"].astype(dtype))
            alpha = masked_softmax(logits, region_mask)      # [B, S] f32
            ctx = jnp.einsum("bs,bsh->bh", alpha.astype(dtype), v_enc)
        if context_mix is not None:
            mix = context_mix.astype(ctx.dtype)
            ctx = mix * inputs["ctx"] + (1.0 - mix) * ctx
    else:
        ctx = inputs["ctx"]
        alpha = jnp.zeros(region_mask.shape, dtype=jnp.float32)

    wx2 = ll["wx"].astype(dtype)
    gates2 = (ctx @ wx2[:H]
              + h_att @ wx2[H:]
              + h_lang @ ll["wh"].astype(dtype)
              + ll["b"].astype(dtype))
    h_lang, c_lang = cell(gates2, c_lang)
    return (h_att, c_att, h_lang, c_lang), (h_lang, alpha)


def precompute_pre1(params, cfg, emb_seq, v_global):
    """Hoist the non-recurrent att-LSTM gate contributions out of the scan.

    emb_seq [B, L, E], v_global [B, H] -> pre1 [B, L, 4H].
    """
    H, E = cfg.rnn_size, cfg.input_encoding_size
    al = params["att_lstm"]
    dtype = v_global.dtype
    _, w_vg, w_e = _split_wx_att(al["wx"].astype(dtype), E, H)
    pre = emb_seq.astype(dtype) @ w_e + (v_global @ w_vg)[:, None, :]
    return pre + al["b"].astype(dtype)


def _train_scan_unroll(cfg) -> int:
    """Unroll factor for the teacher-forced scans: train_scan_unroll when
    set (>0), else scan_unroll.  The grad scan benefits from much deeper
    unrolling than the generation scans — per-step weight-gradient matmuls
    contract over only B rows, and unrolling lets XLA batch them across
    steps (measured v5e: full unroll cuts the cyclical grad step ~6% over
    unroll 7, at ~40 s compile)."""
    t = getattr(cfg, "train_scan_unroll", 0)
    return t if t and t > 0 else getattr(cfg, "scan_unroll", 1)


def decode(params, cfg, v_enc, keys, v_global, emb_seq, region_mask,
           init_carry=None, context_override: Optional[jnp.ndarray] = None,
           context_mix: Optional[jnp.ndarray] = None):
    """Teacher-forced multi-step decode as ONE lax.scan.

    emb_seq [B, L, E] — embedded input words (BOS..w_{L-1}).
    context_override [B, L, H] — reconstruct mode: per-step localized
    features v̂_t that REPLACE the attention context (the cyclical method's
    reconstruction pass; reference re-enters the same decoder with swapped
    context — here it is literally the same params + a static flag).
    context_mix [B, 1] — per-row context selector for the MERGED
    decode+reconstruct scan (cyclical.py fused path): pass the decode and
    reconstruct batches stacked on axis 0 with mix 0 for decode rows and 1
    for reconstruct rows, and one scan serves both passes at twice the MXU
    row occupancy.

    Returns (h_seq [B, L, H], alphas [B, L, S], final_carry).
    """
    B, L, _ = emb_seq.shape
    dtype = keys.dtype
    if init_carry is None:
        init_carry = initial_state(B, cfg.rnn_size, dtype)
    pre1 = precompute_pre1(params, cfg, emb_seq, v_global)     # [B, L, 4H]
    use_attention = context_override is None or context_mix is not None
    if context_override is None:
        ctx_seq = jnp.zeros((B, L, cfg.rnn_size), dtype=dtype)
    else:
        ctx_seq = context_override.astype(dtype)

    from cvc_tpu.ops.dispatch import use_pallas_train_scan
    pallas_scan = use_pallas_train_scan(cfg)
    if (getattr(cfg, "stacked_grad", False) and not pallas_scan
            and not getattr(cfg, "remat", False)):
        # hand-written scan VJP: recomputed attention tanh + stacked
        # [L*B]-row weight-gradient contractions (docs/PERF.md §2)
        from cvc_tpu.models.decode_vjp import scan_decode_stacked
        H = cfg.rnn_size
        al, att, ll = (params["att_lstm"], params["attention"],
                       params["lang_lstm"])
        w_hl, _, _ = _split_wx_att(al["wx"].astype(dtype),
                                   cfg.input_encoding_size, H)
        wx2 = ll["wx"].astype(dtype)
        weights = {
            "w_hl": w_hl, "w_ah": al["wh"].astype(dtype),
            "w_qh": att["wh"].astype(dtype),
            "b_q": att["b"].astype(dtype), "w_v": att["w"].astype(dtype),
            "w_cx": wx2[:H], "w_ax": wx2[H:],
            "w_lh": ll["wh"].astype(dtype), "b_l": ll["b"].astype(dtype),
        }
        h_seq, alphas, carry = scan_decode_stacked(
            (use_attention, _train_scan_unroll(cfg)), weights,
            jnp.swapaxes(pre1, 0, 1), jnp.swapaxes(ctx_seq, 0, 1),
            v_enc, keys, region_mask, context_mix, init_carry)
        return (jnp.swapaxes(h_seq, 0, 1), jnp.swapaxes(alphas, 0, 1),
                carry)
    step = partial(decoder_step, params, cfg, v_enc=v_enc, keys=keys,
                   region_mask=region_mask, use_attention=use_attention,
                   context_mix=context_mix,
                   pallas=pallas_scan)

    def body(carry, xs):
        return step(carry, {"pre1": xs[0], "ctx": xs[1]})

    if getattr(cfg, "remat", False):
        # recompute the step in the backward pass instead of saving its
        # activations — the per-step [B,S,A] attention intermediates are
        # the big residents at scale (SURVEY.md: remat knob)
        body = jax.checkpoint(body)

    xs = (jnp.swapaxes(pre1, 0, 1), jnp.swapaxes(ctx_seq, 0, 1))  # [L, B, *]
    carry, (h_seq, alphas) = jax.lax.scan(
        body, init_carry, xs, unroll=_train_scan_unroll(cfg))
    return (jnp.swapaxes(h_seq, 0, 1),          # [B, L, H]
            jnp.swapaxes(alphas, 0, 1),         # [B, L, S]
            carry)


def decode_scheduled_sampling(params, cfg, v_enc, keys, v_global, tokens_in,
                              region_mask, ss_prob: float, rng):
    """Teacher-forced decode with scheduled sampling (reference lineage:
    self-critical.pytorch --scheduled_sampling_*): at each step the input
    word is the GT token with prob 1-ss_prob, else a sample from the
    previous step's softmax.  The sequential word dependency forces the
    vocab projection inside the scan, so this path is slower than
    `decode` — it is only used when ss_prob > 0.

    tokens_in [B, L] — GT input tokens (BOS..w_{L-1}).
    Returns (h_seq [B, L, H], alphas [B, L, S], final_carry).
    """
    B, L = tokens_in.shape
    dtype = keys.dtype
    init_carry = initial_state(B, cfg.rnn_size, dtype)
    al = params["att_lstm"]
    H, E = cfg.rnn_size, cfg.input_encoding_size
    _, w_vg, w_e = _split_wx_att(al["wx"].astype(dtype), E, H)
    vg_pre = v_global @ w_vg + al["b"].astype(dtype)

    from cvc_tpu.ops.dispatch import use_pallas_train_scan
    pallas = use_pallas_train_scan(cfg)

    def body(state, xs):
        carry, prev_word = state
        gt_word, step_rng = xs
        r_use, r_sample = jax.random.split(step_rng)
        use_sampled = (jax.random.uniform(r_use, (B,)) < ss_prob) \
            & (prev_word >= 0)
        word = jnp.where(use_sampled, jnp.maximum(prev_word, 0), gt_word)
        emb = embed_tokens(params, word, dtype)
        pre1 = emb @ w_e + vg_pre
        carry, (h_lang, alpha) = decoder_step(
            params, cfg, carry, {"pre1": pre1,
                                 "ctx": jnp.zeros((B, H), dtype)},
            v_enc=v_enc, keys=keys, region_mask=region_mask,
            use_attention=True, pallas=pallas)
        step_logits = logits(params, h_lang)
        sampled = jax.random.categorical(r_sample, step_logits).astype(jnp.int32)
        return (carry, sampled), (h_lang, alpha)

    rngs = jax.random.split(rng, L)
    xs = (jnp.swapaxes(tokens_in, 0, 1), rngs)
    (carry, _), (h_seq, alphas) = jax.lax.scan(
        body, (init_carry, jnp.full((B,), -1, jnp.int32)), xs,
        unroll=_train_scan_unroll(cfg))
    return jnp.swapaxes(h_seq, 0, 1), jnp.swapaxes(alphas, 0, 1), carry


def logits(params, h_seq):
    """Vocab projection as one big MXU matmul over all timesteps.

    h_seq [..., H] -> [..., V].  Accumulates in f32 (bf16-safe).
    """
    lg = params["logit"]
    return (jnp.dot(h_seq, lg["w"].astype(h_seq.dtype),
                    preferred_element_type=jnp.float32)
            + lg["b"].astype(jnp.float32))


def embed_tokens(params, tokens, dtype=jnp.float32):
    return jnp.take(params["embed"]["table"], tokens, axis=0).astype(dtype)


# ---------------------------------------------------------------------------
# Localizer (the cyclical method's second stage)
# ---------------------------------------------------------------------------

def localize(params, cfg, word_ids, v_enc, region_mask):
    """Word-conditioned region attention: for each (generated) word, compute
    β over regions and the localized feature v̂ = Σ β V.

    word_ids [B, L] int — the decode pass's argmax words (stop-gradient is
    inherent: ids are integers).  Fully parallel over t — no scan needed.
    Returns (beta [B, L, S] f32, v_hat [B, L, H]).
    (reference: localizer module in `misc/model.py`; paper §3.2.)
    """
    loc = params["localizer"]
    dtype = v_enc.dtype
    q_emb = embed_tokens(params, word_ids, dtype)              # [B,L,E]
    q = q_emb @ loc["wq"].astype(dtype) + loc["b"].astype(dtype)   # [B,L,A]
    k = v_enc @ loc["wv"].astype(dtype)                        # [B,S,A]
    e = jnp.tanh(k[:, None, :, :] + q[:, :, None, :])          # [B,L,S,A]
    scores = jnp.einsum("blsa,a->bls", e, loc["w"].astype(dtype))
    beta = masked_softmax(scores, region_mask[:, None, :])     # [B,L,S]
    v_hat = jnp.einsum("bls,bsh->blh", beta.astype(dtype), v_enc)
    return beta, v_hat
