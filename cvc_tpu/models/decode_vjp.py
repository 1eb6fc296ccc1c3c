"""Stacked-gradient teacher-forced decode scan (custom VJP).

A drop-in twin of the `lax.scan` inside `core.decode` whose hand-written
backward fixes the two measured consumers from docs/PERF.md §2:

1. **Attention-intermediate HBM traffic** (#1): XLA's autodiff saves the
   per-step `[B,S,A]` tanh for the backward and accumulates `dv_enc
   [B,S,H]` in the backward-scan carry (~2.8 GB/step-pair at B=256).
   Here the tanh is *recomputed* in the reverse scan from the hoisted
   keys and a stacked re-projection of the saved `h_att` sequence, and
   `dv_enc` is ONE post-scan einsum over the stacked per-step context
   cotangents (`Σ_t α_t ⊗ dctx_t`), never a scan carry.
2. **Weight-gradient contractions at K=B rows** (#2): instead of L
   per-step `[·,B]×[B,·]` matmuls accumulated in the carry, the reverse
   scan emits stacked `[L,B,·]` gate/query cotangents and every weight
   gradient is ONE `[·, L·B]×[L·B, ·]` MXU contraction.

The forward math mirrors `core.decoder_step`'s XLA path bit-for-bit
(same primitives, same dtype casts); parity with `jax.grad` of the
plain path is pinned by tests/test_decode_vjp.py.  The reference
(`misc/model.py` per-timestep Python loop) has neither the problem nor
the fix — its autograd re-derives per-step grads kernel by kernel.

Scope: teacher-forced training scans only (plain decode, reconstruct
via `context_override`, and the merged 2B-row scan via `context_mix`);
generation scans take the normal path.  Not used when the Pallas
train-scan dispatch is on (kernel boundaries already change the
backward there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _lstm_fwd(gates, c):
    H = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[..., 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[..., 1 * H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:4 * H])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _lstm_bwd(gates, c_prev, c_new, dh, dc):
    """Backward of `_lstm_fwd` from saved preactivations: all VPU, no
    saved activations (i/f/g/o are recomputed from the gates)."""
    H = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[..., 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[..., 1 * H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:4 * H])
    tc = jnp.tanh(c_new)
    dc_total = dc + dh * o * (1.0 - tc * tc)
    d_i = dc_total * g * i * (1.0 - i)
    d_f = dc_total * c_prev * f * (1.0 - f)
    d_g = dc_total * i * (1.0 - g * g)
    d_o = dh * tc * o * (1.0 - o)
    dgates = jnp.concatenate([d_i, d_f, d_g, d_o], axis=-1)
    return dgates, dc_total * f


def _masked_softmax_f32(scores, mask):
    # mirror ops.primitives.masked_softmax exactly
    logits = scores.astype(jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    masked = jnp.where(mask > 0, logits, neg)
    m = jnp.max(masked, axis=-1, keepdims=True)
    ex = jnp.exp(masked - m) * (mask > 0)
    denom = jnp.sum(ex, axis=-1, keepdims=True)
    return ex / jnp.maximum(denom, 1e-9)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def scan_decode_stacked(static, weights, pre1, ctx_seq, v_enc, keys,
                        region_mask, context_mix, init_carry):
    """Time-major teacher-forced decode.

    static: (use_attention, unroll) — hashable.
    weights: dict of ALREADY-dtype-cast arrays
        w_hl [H,4H]  att-LSTM recurrent half for h_lang
        w_ah [H,4H]  att-LSTM recurrent half for h_att
        w_qh [H,A], b_q [A], w_v [A]            attention
        w_cx [H,4H], w_ax [H,4H], w_lh [H,4H], b_l [4H]  lang-LSTM
    pre1    [L,B,4H]  hoisted att-LSTM gate half (incl. its bias)
    ctx_seq [L,B,H]   context override stream (reconstruct/merged rows)
    context_mix [B,1] or None — per-row context source selector
    init_carry (h_att, c_att, h_lang, c_lang) each [B,H]

    Returns (h_lang_seq [L,B,H], alpha_seq [L,B,S] f32, final_carry).
    """
    out, _ = _fwd(static, weights, pre1, ctx_seq, v_enc, keys,
                  region_mask, context_mix, init_carry)
    return out


def _fwd(static, weights, pre1, ctx_seq, v_enc, keys, region_mask,
         context_mix, init_carry):
    use_attention, unroll = static
    w = weights
    dtype = keys.dtype
    S = region_mask.shape[-1]
    mix = None if context_mix is None else context_mix.astype(dtype)

    def body(carry, xs):
        h_att, c_att, h_lang, c_lang = carry
        pre1_t, ctx_in_t = xs
        g1 = pre1_t + h_lang @ w["w_hl"] + h_att @ w["w_ah"]
        h_att_n, c_att_n = _lstm_fwd(g1, c_att)
        if use_attention:
            q = h_att_n @ w["w_qh"] + w["b_q"]
            e = jnp.tanh(keys + q[:, None, :])
            scores = jnp.einsum("bsa,a->bs", e, w["w_v"])
            alpha = _masked_softmax_f32(scores, region_mask)
            ctx = jnp.einsum("bs,bsh->bh", alpha.astype(dtype), v_enc)
            if mix is not None:
                ctx = mix * ctx_in_t + (1.0 - mix) * ctx
        else:
            ctx = ctx_in_t
            alpha = jnp.zeros((h_att.shape[0], S), dtype=jnp.float32)
        g2 = (ctx @ w["w_cx"] + h_att_n @ w["w_ax"]
              + h_lang @ w["w_lh"] + w["b_l"])
        h_lang_n, c_lang_n = _lstm_fwd(g2, c_lang)
        ys = (h_lang_n, alpha, g1, g2, ctx, h_att_n, c_att_n, c_lang_n)
        return (h_att_n, c_att_n, h_lang_n, c_lang_n), ys

    final, ys = jax.lax.scan(body, init_carry, (pre1, ctx_seq),
                             unroll=unroll)
    (h_lang_seq, alpha_seq, g1_seq, g2_seq, ctx_post_seq,
     h_att_seq, c_att_seq, c_lang_seq) = ys
    res = (weights, v_enc, keys, region_mask, context_mix, init_carry,
           h_lang_seq, alpha_seq, g1_seq, g2_seq, ctx_post_seq,
           h_att_seq, c_att_seq, c_lang_seq)
    return (h_lang_seq, alpha_seq, final), res


def _shift_prev(seq, init):
    """[x_1..x_L] -> [x_0..x_{L-1}] with x_0 = init."""
    return jnp.concatenate([init[None], seq[:-1]], axis=0)


def _bwd(static, res, cts):
    use_attention, unroll = static
    (w, v_enc, keys, region_mask, context_mix, init_carry,
     h_lang_seq, alpha_seq, g1_seq, g2_seq, ctx_post_seq,
     h_att_seq, c_att_seq, c_lang_seq) = res
    g_h, g_alpha, g_carry = cts
    dtype = keys.dtype
    L, B, H = h_lang_seq.shape
    S = region_mask.shape[-1]
    A = w["w_qh"].shape[-1]
    f32 = jnp.float32

    h_att_prev = _shift_prev(h_att_seq, init_carry[0])
    c_att_prev = _shift_prev(c_att_seq, init_carry[1])
    h_lang_prev = _shift_prev(h_lang_seq, init_carry[2])
    c_lang_prev = _shift_prev(c_lang_seq, init_carry[3])

    if use_attention:
        # one stacked matmul replaces L per-step query projections
        q_seq = h_att_seq @ w["w_qh"] + w["b_q"]          # [L,B,A]
    else:
        q_seq = jnp.zeros((L, B, 0), dtype=dtype)

    mix = None if context_mix is None else context_mix.astype(dtype)
    if g_carry is None:
        g_carry = tuple(jnp.zeros((B, H), dtype) for _ in range(4))
    g_h = jnp.zeros((L, B, H), dtype) if g_h is None else g_h
    g_alpha = (jnp.zeros((L, B, S), f32) if g_alpha is None
               else g_alpha.astype(f32))

    w_hl_T = w["w_hl"].T
    w_ah_T = w["w_ah"].T
    w_cx_T = w["w_cx"].T
    w_ax_T = w["w_ax"].T
    w_lh_T = w["w_lh"].T
    w_qh_T = w["w_qh"].T

    def body(carry, xs):
        dh_att, dc_att, dh_lang, dc_lang, dkeys, dwv = carry
        (g1, g2, alpha, q, gh_t, galpha_t,
         c_att_p, c_att_n, c_lang_p, c_lang_n) = xs
        # lang LSTM
        dg2, dc_lang_p = _lstm_bwd(g2, c_lang_p, c_lang_n,
                                   dh_lang + gh_t, dc_lang)
        d_ctx = dg2 @ w_cx_T
        dh_att_t = dh_att + dg2 @ w_ax_T
        dh_lang_p = dg2 @ w_lh_T
        # attention (recompute e in the reverse scan — never saved)
        if use_attention:
            d_ctx_att = d_ctx if mix is None else (1.0 - mix) * d_ctx
            d_ctx_in = (jnp.zeros_like(d_ctx) if mix is None
                        else mix * d_ctx)
            d_alpha = (jnp.einsum("bh,bsh->bs", d_ctx_att, v_enc)
                       .astype(f32) + galpha_t)
            inner = jnp.sum(alpha * d_alpha, axis=-1, keepdims=True)
            d_s = alpha * (d_alpha - inner)               # [B,S] f32
            e = jnp.tanh(keys + q[:, None, :])
            de = (d_s.astype(dtype))[..., None] * w["w_v"] * (1.0 - e * e)
            dkeys = dkeys + de
            dq = jnp.sum(de, axis=1)                      # [B,A]
            dwv = dwv + jnp.sum(d_s[..., None].astype(f32)
                                * e.astype(f32), axis=(0, 1))
            dh_att_t = dh_att_t + dq @ w_qh_T
        else:
            d_ctx_att = jnp.zeros_like(d_ctx)
            d_ctx_in = d_ctx
            dq = jnp.zeros((B, A), dtype)
        # att LSTM
        dg1, dc_att_p = _lstm_bwd(g1, c_att_p, c_att_n, dh_att_t, dc_att)
        dh_lang_p = dh_lang_p + dg1 @ w_hl_T
        dh_att_p = dg1 @ w_ah_T
        carry = (dh_att_p, dc_att_p, dh_lang_p, dc_lang_p, dkeys, dwv)
        return carry, (dg1, dg2, dq, d_ctx_att, d_ctx_in)

    init = (*g_carry,
            jnp.zeros((B, S, A), dtype),     # dkeys accumulator (dtype:
            #   matches plain autodiff's carry accumulation semantics)
            jnp.zeros((A,), f32))            # d w_v accumulator
    xs = (g1_seq, g2_seq, alpha_seq, q_seq, g_h, g_alpha,
          c_att_prev, c_att_seq, c_lang_prev, c_lang_seq)
    (dh_att0, dc_att0, dh_lang0, dc_lang0, dkeys, dwv), ys = jax.lax.scan(
        body, init, xs, reverse=True, unroll=unroll)
    dg1_seq, dg2_seq, dq_seq, d_ctx_att_seq, d_ctx_in_seq = ys

    # ---- stacked weight gradients: one [·, L·B]x[L·B, ·] MXU
    # contraction per matrix (f32 accumulation, cast to primal dtype) ---
    def stack_mm(x_seq, dg_seq):
        return jnp.einsum("lbh,lbg->hg", x_seq, dg_seq,
                          preferred_element_type=f32).astype(dtype)

    dw = {
        "w_hl": stack_mm(h_lang_prev, dg1_seq),
        "w_ah": stack_mm(h_att_prev, dg1_seq),
        "w_cx": stack_mm(ctx_post_seq, dg2_seq),
        "w_ax": stack_mm(h_att_seq, dg2_seq),
        "w_lh": stack_mm(h_lang_prev, dg2_seq),
        "b_l": jnp.sum(dg2_seq.astype(f32), axis=(0, 1)).astype(dtype),
    }
    if use_attention:
        dw["w_qh"] = stack_mm(h_att_seq, dq_seq)
        dw["b_q"] = jnp.sum(dq_seq.astype(f32), axis=(0, 1)).astype(dtype)
        dw["w_v"] = dwv.astype(dtype)
        # dv_enc as ONE post-scan contraction (never a scan carry)
        dv_enc = jnp.einsum("lbs,lbh->bsh", alpha_seq.astype(dtype),
                            d_ctx_att_seq,
                            preferred_element_type=f32).astype(v_enc.dtype)
        dkeys_out = dkeys.astype(keys.dtype)
    else:
        dw["w_qh"] = jnp.zeros_like(w["w_qh"])
        dw["b_q"] = jnp.zeros_like(w["b_q"])
        dw["w_v"] = jnp.zeros_like(w["w_v"])
        dv_enc = jnp.zeros_like(v_enc)
        dkeys_out = jnp.zeros_like(keys)

    d_init = (dh_att0, dc_att0, dh_lang0, dc_lang0)
    d_mix = None if context_mix is None else jnp.zeros_like(context_mix)
    return (dw, dg1_seq, d_ctx_in_seq, dv_enc, dkeys_out,
            jnp.zeros_like(region_mask), d_mix, d_init)


scan_decode_stacked.defvjp(_fwd, _bwd)
