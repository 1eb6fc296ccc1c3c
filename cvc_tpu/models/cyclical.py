"""The cyclical training objective: decode -> localize -> reconstruct.

This is the reference's namesake method (paper §3; reference: cyclical
orchestration inside `misc/model.py` forward + `main.py` loss sum;
SURVEY.md §3.3).  Decisive semantics preserved:

  (a) localizer queries are the DECODE pass's argmax words (generated, not
      ground truth) — integer ids, so no gradient flows back through them;
  (b) the reconstructor shares ALL decoder parameters (embedding, both
      LSTMs, vocab head) — it differs only in that its per-step attention
      context is replaced by the localized feature v̂_t;
  (c) gradients reach the localizer only through the reconstruction XE.

The whole cycle is one jit-compilable function: decode scan -> argmax ->
batched localizer attention -> reconstruct scan -> two masked XE terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvc_tpu.models import core
from cvc_tpu.ops.primitives import dropout, masked_xent


def _xent(cfg, logits, targets, mask):
    """Masked token XE.  Dispatches with the TRAIN-scan rule (auto -> XLA):
    this loss only runs inside the teacher-forced training/eval step, where
    the measured v5e winner is XLA end-to-end (see ops/dispatch.py); an
    explicit use_pallas=True still selects the fused kernel."""
    from cvc_tpu.ops.dispatch import use_pallas_train_scan as use_pallas
    if use_pallas(cfg):
        from cvc_tpu.ops.dispatch import pallas_interpret
        from cvc_tpu.ops.pallas import fused_masked_xent
        B, L, V = logits.shape
        total = fused_masked_xent(logits.reshape(B * L, V),
                                  targets.reshape(B * L),
                                  mask.reshape(B * L),
                                  128, pallas_interpret())
        return total / jnp.maximum(jnp.sum(mask), 1.0)
    return masked_xent(logits, targets, mask)


def _encode(params, cfg, arrays):
    return core.encode_regions(
        params, cfg, arrays["feats"], arrays["box_geom"],
        arrays["region_cls"], arrays["region_mask"],
        arrays.get("global_feat"))


def decode_teacher_forced(params, cfg, arrays, rng=None, train: bool = False,
                          ss_prob=None):
    """Teacher-forced decode pass.

    Returns (logits [B, L, V] f32, alphas [B, L, S], h_seq, enc) where
    L = max_tokens - 1 (inputs tokens[:, :-1], targets tokens[:, 1:]).
    ss_prob: optional scheduled-sampling probability (traced scalar);
    engages the slower in-scan-logits decode variant.
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    v_enc, keys, v_global = _encode(params, cfg, arrays)
    tokens = arrays["tokens"]
    if ss_prob is not None and rng is not None:
        rng, r_ss = jax.random.split(rng)
        h_seq, alphas, _ = core.decode_scheduled_sampling(
            params, cfg, v_enc, keys, v_global, tokens[:, :-1],
            arrays["region_mask"], ss_prob, r_ss)
    else:
        emb_in = core.embed_tokens(params, tokens[:, :-1], dtype)
        h_seq, alphas, _ = core.decode(params, cfg, v_enc, keys, v_global,
                                       emb_in, arrays["region_mask"])
    if train and rng is not None:
        h_seq = dropout(h_seq, cfg.drop_prob_lm, rng, deterministic=False)
    return core.logits(params, h_seq), alphas, h_seq, (v_enc, keys, v_global)


def cyclical_loss(params, cfg, arrays, rng=None, train: bool = False,
                  enable_cycle: bool = True, ss_prob=None):
    """Total loss = XE(decode) + cycle_weight * XE(reconstruct).

    Returns (loss, metrics) with metrics = {loss, loss_decode, loss_recon}.
    ss_prob: optional scheduled-sampling probability for the decode pass.
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    tokens, token_mask = arrays["tokens"], arrays["token_mask"]
    targets = tokens[:, 1:]
    mask = token_mask[:, 1:]

    r_dec, r_loc = (jax.random.split(rng) if rng is not None else (None, None))

    # Merged-scan fast path: with GT-word localizer queries (the
    # --cycle_gt_until bootstrap phase) the reconstruct pass does not
    # depend on the decode pass's argmax words, so both passes run as ONE
    # lax.scan over the stacked [2B] batch — decode rows take the attention
    # context, reconstruct rows take v̂ (see core.decode context_mix).  At
    # B=64/H=1024 this fills the MXU rows the two separate B=64 scans
    # leave half-idle.  In eval this is bit-for-bit the unfused path
    # (same ops, wider batch; parity-tested in tests/test_model_core.py);
    # in train mode the dropout DRAW differs (one [2B] mask from r_dec
    # vs independent r_dec/r_loc masks per pass), so it is
    # distribution-equivalent, not bit-equal, under dropout.
    if (enable_cycle and getattr(cfg, "cycle_localize_gt", False)
            and getattr(cfg, "fuse_cycle_scans", True) and ss_prob is None):
        return _fused_gt_cycle_loss(params, cfg, arrays, r_dec, train)

    logits_dec, alphas, _, (v_enc, keys, v_global) = decode_teacher_forced(
        params, cfg, arrays, r_dec, train, ss_prob=ss_prob)
    loss_dec = _xent(cfg, logits_dec, targets, mask)

    loss_rec = jnp.zeros((), jnp.float32)
    if enable_cycle:
        # (a) localizer queries: the decode pass's argmax words (the
        # reference's semantics — generated, not ground truth).  With
        # cfg.cycle_localize_gt the TARGET words are used instead during
        # training: same supervision budget (caption words only, no
        # boxes), but the queries are correct at exactly the steps whose
        # prediction needs attention — breaking the cold-start loop where
        # argmax queries are garbage at every attention-dependent step
        # and the reconstructor learns to ignore v̂ (see
        # experiments/README.md round-2 finding).  Inference grounding
        # still queries generated words either way.
        if getattr(cfg, "cycle_localize_gt", False):
            gen_words = targets
        else:
            gen_words = jnp.argmax(logits_dec, axis=-1).astype(jnp.int32)
        # (b) localize each query word over the regions.
        _, v_hat = core.localize(params, cfg, gen_words, v_enc,
                                 arrays["region_mask"])
        # (c) reconstruct the GT caption with context := v̂_t, same params.
        emb_in = core.embed_tokens(params, tokens[:, :-1], dtype)
        h_rec, _, _ = core.decode(params, cfg, v_enc, keys, v_global, emb_in,
                                  arrays["region_mask"],
                                  context_override=v_hat)
        if train and r_loc is not None:
            h_rec = dropout(h_rec, cfg.drop_prob_lm, r_loc, deterministic=False)
        logits_rec = core.logits(params, h_rec)
        loss_rec = _xent(cfg, logits_rec, targets, mask)

    return _finalize_loss(cfg, arrays, mask, loss_dec, loss_rec, alphas)


def _fused_gt_cycle_loss(params, cfg, arrays, rng, train: bool):
    """GT-query cycle as ONE merged scan (see cyclical_loss).

    Semantics identical to the unfused GT-query path: decode XE +
    cycle_weight * reconstruct XE, localizer queried with the target
    words, gradients reaching the localizer only through the
    reconstruction XE (v̂ enters via the reconstruct rows' context).
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    tokens, token_mask = arrays["tokens"], arrays["token_mask"]
    targets = tokens[:, 1:]
    mask = token_mask[:, 1:]
    B = tokens.shape[0]

    v_enc, keys, v_global = _encode(params, cfg, arrays)
    region_mask = arrays["region_mask"]
    _, v_hat = core.localize(params, cfg, targets, v_enc, region_mask)
    emb_in = core.embed_tokens(params, tokens[:, :-1], dtype)

    cat = lambda x: jnp.concatenate([x, x], axis=0)
    ctx2 = jnp.concatenate([jnp.zeros_like(v_hat), v_hat], axis=0)
    mix = jnp.concatenate([jnp.zeros((B, 1)), jnp.ones((B, 1))],
                          axis=0).astype(dtype)
    h2, a2, _ = core.decode(params, cfg, cat(v_enc), cat(keys),
                            cat(v_global), cat(emb_in), cat(region_mask),
                            context_override=ctx2, context_mix=mix)
    if train and rng is not None:
        h2 = dropout(h2, cfg.drop_prob_lm, rng, deterministic=False)
    logits2 = core.logits(params, h2)          # one [2B*L, V] MXU matmul
    loss_dec = _xent(cfg, logits2[:B], targets, mask)
    loss_rec = _xent(cfg, logits2[B:], targets, mask)
    return _finalize_loss(cfg, arrays, mask, loss_dec, loss_rec, a2[:B])


def _finalize_loss(cfg, arrays, mask, loss_dec, loss_rec, alphas):
    """Shared tail: total loss, entropy penalty, optional supervised
    grounding, metrics dict."""
    loss = loss_dec + cfg.cycle_weight * loss_rec
    attn_ent = _mean_attention_entropy(alphas, mask)
    w_ent = getattr(cfg, "attention_entropy_weight", 0.0)
    if w_ent > 0:
        # sharpness pressure on the decoder's region attention: diffuse
        # (near-uniform) attention can reconstruct the global mean and
        # sidestep alignment entirely — penalizing entropy removes that
        # local optimum (experiments/README.md, v3 finding)
        loss = loss + w_ent * attn_ent
    metrics = {"loss": loss, "loss_decode": loss_dec, "loss_recon": loss_rec,
               "attention_entropy": attn_ent}

    w_sup = getattr(cfg, "attn_supervision_weight", 0.0)
    if w_sup > 0 and "gt_region" in arrays:
        # Supervised grounding (the GVD-supervised comparison row in the
        # paper's tables): -log alpha[gt_slot] at annotated word steps.
        # gt_region is token-aligned [B, T]; alpha step t targets
        # tokens[t+1], so slice off the BOS column.
        gt = arrays["gt_region"][:, 1:]                      # [B, L]
        has = (gt >= 0).astype(jnp.float32) * mask
        safe = jnp.maximum(gt, 0)
        p = jnp.take_along_axis(alphas, safe[..., None], axis=-1)[..., 0]
        nll = -jnp.log(jnp.clip(p, 1e-9, 1.0)) * has
        loss_sup = jnp.sum(nll) / jnp.maximum(jnp.sum(has), 1.0)
        loss = loss + w_sup * loss_sup
        metrics["loss"] = loss
        metrics["loss_attn_sup"] = loss_sup
    return loss, metrics


def _mean_attention_entropy(alphas, token_mask):
    """Diagnostic: mean entropy of the decoder's region attention over
    supervised steps (grounding sharpens as this falls)."""
    p = jnp.clip(alphas, 1e-9, 1.0)
    ent = -jnp.sum(p * jnp.log(p), axis=-1)           # [B, L]
    return jnp.sum(ent * token_mask) / jnp.maximum(jnp.sum(token_mask), 1.0)
