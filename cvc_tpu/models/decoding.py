"""On-device caption generation: greedy, temperature sampling, beam search.

The reference generates captions with a per-image Python beam loop that
round-trips host<->device every step of every beam (reference:
`misc/CaptionModel.py` beam_search/sample; SURVEY.md §3.2).  Here the whole
generation is ONE compiled XLA program:

  * the beam dimension is folded into the batch (matmuls see B*K rows —
    MXU-friendly);
  * per-step candidate selection is `lax.top_k` over K*V scores;
  * beam state (LSTM carries, token/attention histories) is reordered
    with gather by parent index each step;
  * the decoder's per-step region attention α is recorded per kept beam —
    it IS the grounding output evaluated by F1_all/F1_loc.

EOS semantics: a finished beam can only extend with PAD at zero logprob,
so its cumulative score freezes; token buffers after EOS hold PAD, which
`decode_sequence` strips.
"""

from __future__ import annotations

from collections import OrderedDict
from functools import partial

import jax
import jax.numpy as jnp

from cvc_tpu.data.vocab import BOS_ID, EOS_ID, PAD_ID
from cvc_tpu.models import core

NEG_INF = jnp.float32(-1e30)

# Measured dead end (v5e, [320, 8704] k=5): a block-tiled two-stage
# top-k (per-512-tile top-k, then top-k over tile winners) is 1.3-2.6x
# SLOWER than the flat lax.top_k — the TPU TopK custom call prefers few
# wide rows over many narrow ones.  Keep stage 1 flat.


def _encode(params, cfg, arrays):
    return core.encode_regions(
        params, cfg, arrays["feats"], arrays["box_geom"],
        arrays["region_cls"], arrays["region_mask"],
        arrays.get("global_feat"))


def _step_logits(params, cfg, carry, prev_word, v_enc, keys, region_mask,
                 vg_pre):
    """One autoregressive step: embed prev word -> fused decoder step ->
    vocab logits.  Rows = B (greedy) or B*K (beam)."""
    H, E = cfg.rnn_size, cfg.input_encoding_size
    dtype = keys.dtype
    emb = core.embed_tokens(params, prev_word, dtype)            # [R, E]
    al = params["att_lstm"]
    _, _, w_e = core._split_wx_att(al["wx"].astype(dtype), E, H)
    pre1 = emb @ w_e + vg_pre                                    # [R, 4H]
    carry, (h_lang, alpha) = core.decoder_step(
        params, cfg, carry, {"pre1": pre1, "ctx": jnp.zeros_like(carry[0])},
        v_enc=v_enc, keys=keys, region_mask=region_mask, use_attention=True)
    logits = core.logits(params, h_lang)                         # [R, V] f32
    return carry, logits, alpha


def _vg_pre(params, cfg, v_global):
    """Precompute the v_global + bias half of the att-LSTM gates."""
    H, E = cfg.rnn_size, cfg.input_encoding_size
    al = params["att_lstm"]
    dtype = v_global.dtype
    _, w_vg, _ = core._split_wx_att(al["wx"].astype(dtype), E, H)
    return v_global @ w_vg + al["b"].astype(dtype)


def _beam_step(params, cfg, carry, prev_word, v_enc, keys, region_mask,
               vg_pre_k, B, K):
    """Beam-folded autoregressive step that keeps the per-region tensors
    UNduplicated: queries reshape to [B, K, A] and attend over the shared
    keys [B, S, A] / v_enc [B, S, H] (the K-fold repeat of the region
    tensors was the dominant HBM traffic of the naive formulation)."""
    H, E = cfg.rnn_size, cfg.input_encoding_size
    dtype = keys.dtype
    h_att, c_att, h_lang, c_lang = carry                  # each [B*K, H]
    al, att, ll = params["att_lstm"], params["attention"], params["lang_lstm"]

    emb = core.embed_tokens(params, prev_word, dtype)     # [B*K, E]
    w_hl, _, w_e = core._split_wx_att(al["wx"].astype(dtype), E, H)
    gates1 = (emb @ w_e + vg_pre_k
              + h_lang @ w_hl
              + h_att @ al["wh"].astype(dtype))
    from cvc_tpu.ops.dispatch import use_pallas
    if use_pallas(cfg):
        # one kernel for the whole step middle: LSTM1 gating -> q proj ->
        # masked attention -> MXU context (intermediates stay in VMEM)
        from cvc_tpu.ops.dispatch import pallas_interpret
        from cvc_tpu.ops.pallas.decoder_step import fused_beam_decoder_core
        h_att, c_att, ctx, alpha = fused_beam_decoder_core(
            gates1.reshape(B, K, -1), c_att.reshape(B, K, -1), keys, v_enc,
            region_mask, att["wh"].astype(dtype), att["b"].astype(dtype),
            att["w"].astype(dtype), 8, pallas_interpret())
        h_att = h_att.reshape(B * K, -1)
        c_att = c_att.reshape(B * K, -1)
    else:
        h_att, c_att = core.lstm_cell(gates1, c_att)
        q = (h_att @ att["wh"].astype(dtype)
             + att["b"].astype(dtype)).reshape(B, K, -1)  # [B, K, A]
        e = jnp.tanh(keys[:, None, :, :] + q[:, :, None, :])  # [B,K,S,A]
        scores = jnp.einsum("bksa,a->bks", e, att["w"].astype(dtype))
        from cvc_tpu.ops.primitives import masked_softmax
        alpha = masked_softmax(scores, region_mask[:, None, :])  # [B,K,S]
        ctx = jnp.einsum("bks,bsh->bkh", alpha.astype(dtype), v_enc)
    ctx = ctx.reshape(B * K, -1)

    wx2 = ll["wx"].astype(dtype)
    gates2 = (ctx @ wx2[:H]
              + h_att @ wx2[H:]
              + h_lang @ ll["wh"].astype(dtype)
              + ll["b"].astype(dtype))
    h_lang, c_lang = core.lstm_cell(gates2, c_lang)
    if getattr(cfg, "beam_select_bf16", False) and dtype == jnp.bfloat16:
        # serving knob: emit bf16 logits (the convert fuses into the head
        # matmul's epilogue) so the [B*K, V] tensor costs half the HBM
        # through top-k + logsumexp; candidate values are rounded to
        # bf16 before selection (near-ties may resolve differently)
        lg = params["logit"]
        logits = (jnp.dot(h_lang, lg["w"].astype(dtype),
                          preferred_element_type=jnp.bfloat16)
                  + lg["b"].astype(jnp.bfloat16))
    else:
        logits = core.logits(params, h_lang)              # [B*K, V] f32
    return (h_att, c_att, h_lang, c_lang), logits, alpha


# ---------------------------------------------------------------------------
# Greedy / sampling
# ---------------------------------------------------------------------------

def greedy_decode(params, cfg, arrays, max_len: int, temperature: float = 1.0,
                  rng=None, sample: bool = False):
    """Argmax (or temperature-sampled) decoding.

    Returns dict(tokens [B, L], alphas [B, L, S], logprobs [B, L]) where L =
    max_len + 1 (room for EOS).  (reference: CaptionModel.sample)
    """
    B = arrays["feats"].shape[0]
    from cvc_tpu.ops.dispatch import pallas_interpret, use_pallas_select
    from cvc_tpu.ops.pallas.topk_select import fused_topk_lse
    _pallas_select = use_pallas_select(cfg) and not sample
    v_enc, keys, v_global = _encode(params, cfg, arrays)
    vg_pre = _vg_pre(params, cfg, v_global)
    region_mask = arrays["region_mask"]
    L = max_len + 1
    init = dict(
        carry=core.initial_state(B, cfg.rnn_size, keys.dtype),
        word=jnp.full((B,), BOS_ID, jnp.int32),
        finished=jnp.zeros((B,), jnp.bool_),
        rng=rng if rng is not None else jax.random.PRNGKey(0),
    )

    def body(s, _):
        carry, logits, alpha = _step_logits(
            params, cfg, s["carry"], s["word"], v_enc, keys, region_mask,
            vg_pre)
        if _pallas_select:
            # argmax decode is the k=1 case of the fused select kernel:
            # one HBM read of the logits instead of materializing the
            # [B, V] log_softmax (argmax ties resolve to the lowest
            # index, same as jnp.argmax)
            r = s["rng"]
            v1, idx1, lse = fused_topk_lse(
                logits / jnp.maximum(temperature, 1e-6), 1,
                interpret=pallas_interpret())
            nxt = idx1[:, 0]
            tok_lp = v1[:, 0] - lse
        elif sample:
            logp = jax.nn.log_softmax(
                logits / jnp.maximum(temperature, 1e-6))
            r, sub = jax.random.split(s["rng"])
            nxt = jax.random.categorical(sub, logp)
            nxt = nxt.astype(jnp.int32)
            tok_lp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        else:
            logp = jax.nn.log_softmax(
                logits / jnp.maximum(temperature, 1e-6))
            r = s["rng"]
            nxt = jnp.argmax(logp, axis=-1)
            nxt = nxt.astype(jnp.int32)
            tok_lp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        nxt = jnp.where(s["finished"], PAD_ID, nxt)
        tok_lp = jnp.where(s["finished"], 0.0, tok_lp)
        fin = s["finished"] | (nxt == EOS_ID)
        return (dict(carry=carry, word=nxt, finished=fin, rng=r),
                (nxt, alpha, tok_lp))

    _, (tokens, alphas, logprobs) = jax.lax.scan(
        body, init, None, length=L, unroll=getattr(cfg, "scan_unroll", 1))
    return dict(tokens=jnp.swapaxes(tokens, 0, 1),
                alphas=jnp.swapaxes(alphas, 0, 1),
                logprobs=jnp.swapaxes(logprobs, 0, 1))


# ---------------------------------------------------------------------------
# Vectorized beam search
# ---------------------------------------------------------------------------

def beam_search(params, cfg, arrays, beam_size: int, max_len: int,
                length_penalty: float = 0.0, return_all_beams: bool = False):
    """Batched on-device beam search with attention recording.

    Returns dict(tokens [B, L], alphas [B, L, S], scores [B]) for the best
    beam (plus all-beam buffers if requested).  L = max_len + 1.
    (reference: CaptionModel.beam_search — per-image Python loop, rebuilt
    as one lax.scan over fused steps with lax.top_k selection.)
    """
    K = beam_size
    B = arrays["feats"].shape[0]
    S = arrays["region_mask"].shape[1]
    V = cfg.vocab_size
    L = max_len + 1
    from cvc_tpu.ops.dispatch import pallas_interpret, use_pallas_select
    from cvc_tpu.ops.pallas.topk_select import fused_topk_lse
    _pallas_select = use_pallas_select(cfg)

    v_enc, keys, v_global = _encode(params, cfg, arrays)
    vg_pre = _vg_pre(params, cfg, v_global)
    region_mask = arrays["region_mask"]
    # Only the [B, 4H] gate precompute folds into the beam dim; region
    # tensors stay [B, S, ...] and are shared across beams (see _beam_step).
    vg_pre_k = jnp.repeat(vg_pre, K, axis=0)            # [B*K, 4H]

    z = jnp.zeros((B * K, cfg.rnn_size), keys.dtype)
    init = dict(
        carry=(z, z, z, z),
        word=jnp.full((B, K), BOS_ID, jnp.int32),
        logprobs=jnp.zeros((B, K), jnp.float32),
        finished=jnp.zeros((B, K), jnp.bool_),
        lengths=jnp.zeros((B, K), jnp.int32),
    )

    def body(s, t):
        carry, logits, alpha = _beam_step(
            params, cfg, s["carry"], s["word"].reshape(B * K), v_enc,
            keys, region_mask, vg_pre_k, B, K)
        # Per-beam top-K over the RAW logits: log_softmax is a per-row
        # monotone shift, so candidate identity and in-beam order are
        # unchanged, and the [B*K, V] log-softmax / finished-mask / score
        # tensors the naive formulation materializes between the head
        # matmul and the TopK custom call never exist.  The normalizer
        # comes back as one fused logsumexp reduction over the same
        # logits, applied to the K survivors only.
        if _pallas_select:
            # one VMEM pass: top-K + logsumexp off a single HBM read of
            # the logits (index-exact vs lax.top_k; ops/pallas/topk_select)
            v1, idx1, lse = fused_topk_lse(
                logits, K, interpret=pallas_interpret())
        else:
            v1, idx1 = jax.lax.top_k(logits, K)                  # [B*K, K]
            lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
        lp1 = (v1.astype(jnp.float32) - lse[:, None]).reshape(B, K, K)
        idx1 = idx1.reshape(B, K, K).astype(jnp.int32)

        # Finished beams: only PAD, at zero cost (score freezes) — applied
        # at candidate level: slot 0 := (PAD, 0.0), rest -inf.
        slot0 = (jnp.arange(K) == 0)[None, None, :]
        lp1 = jnp.where(s["finished"][..., None],
                        jnp.where(slot0, 0.0, NEG_INF), lp1)
        idx1 = jnp.where(s["finished"][..., None], PAD_ID, idx1)
        cand = s["logprobs"][..., None] + lp1                    # [B, K, K]
        # t == 0: all beams identical -> keep only beam 0's candidates.
        beam_live = (jnp.arange(K) == 0)[None, :, None]
        cand = jnp.where((t == 0) & ~beam_live, NEG_INF, cand)

        # Second stage: top-K over the K*K survivors — equivalent to one
        # top-K over K*V (any global winner is within its own beam's top K).
        lp1 = cand.reshape(B, K * K)
        idx1 = idx1.reshape(B, K * K)
        top_lp, pos = jax.lax.top_k(lp1, K)                      # [B, K]
        parent = pos // K
        word = jnp.take_along_axis(idx1, pos, axis=1).astype(jnp.int32)

        # Only the LSTM carries are physically reordered per step; token
        # and attention histories are reconstructed once post-scan from
        # backpointers (saves ~[B,K,L,S] of gather traffic per step).
        carry = tuple(
            jnp.take_along_axis(
                c.reshape(B, K, -1), parent[..., None], axis=1
            ).reshape(B * K, -1)
            for c in carry)

        def gather_k(x):
            return jnp.take_along_axis(x, parent, axis=1)

        finished = gather_k(s["finished"])
        lengths = gather_k(s["lengths"])
        lengths = jnp.where(finished, lengths, lengths + 1)
        finished = finished | (word == EOS_ID)

        return (dict(carry=carry, word=word, logprobs=top_lp,
                     finished=finished, lengths=lengths),
                (word, parent, alpha))

    s, (words_h, parents_h, alphas_h) = jax.lax.scan(
        body, init, jnp.arange(L), unroll=getattr(cfg, "scan_unroll", 1))
    # words_h [L,B,K], parents_h [L,B,K], alphas_h [L,B,K,S] — alphas_h[t]
    # is indexed by the PRE-selection beam id (the parent at step t).

    scores = s["logprobs"]
    if length_penalty > 0:
        norm = jnp.power((5.0 + s["lengths"].astype(jnp.float32)) / 6.0,
                         length_penalty)
        scores = scores / norm

    def backtrack(select):                       # select [B] final beam ids
        """Walk backpointers from the final beam to step 0, emitting the
        (word, alpha) trail in forward order."""
        def back(beam, t):
            w = jnp.take_along_axis(words_h[t], beam[:, None], axis=1)[:, 0]
            par = jnp.take_along_axis(parents_h[t], beam[:, None],
                                      axis=1)[:, 0]
            a = jnp.take_along_axis(
                alphas_h[t], par[:, None, None], axis=1)[:, 0]
            return par, (w, a)
        _, (w_rev, a_rev) = jax.lax.scan(back, select,
                                         jnp.arange(L - 1, -1, -1))
        return (jnp.flip(jnp.swapaxes(w_rev, 0, 1), axis=1),       # [B,L]
                jnp.flip(jnp.swapaxes(a_rev, 0, 1), axis=1))       # [B,L,S]

    best = jnp.argmax(scores, axis=1)                            # [B]
    tokens_b, alphas_b = backtrack(best)
    take = lambda x: jnp.take_along_axis(x, best[:, None], axis=1)[:, 0]
    out = dict(tokens=tokens_b, alphas=alphas_b, scores=take(scores))
    if return_all_beams:
        all_tokens = []
        all_alphas = []
        for k in range(K):
            tk, ak = backtrack(jnp.full((B,), k, jnp.int32))
            all_tokens.append(tk)
            all_alphas.append(ak)
        out.update(all_tokens=jnp.stack(all_tokens, axis=1),
                   all_scores=scores,
                   all_alphas=jnp.stack(all_alphas, axis=1))
    return out


# ---------------------------------------------------------------------------
# Jitted entry points
# ---------------------------------------------------------------------------

_DECODER_CACHE = OrderedDict()


def make_decoder(cfg, eval_cfg):
    """Build the jitted generation function per EvalConfig.sample_method.

    Memoized on the (model cfg, eval cfg) values: validation calls this
    every epoch, and a fresh `jax.jit` closure per call would recompile
    the whole beam search each time.  LRU-bounded at 32 entries so a
    long config sweep evicts only its coldest decoder, never the one
    the current run revalidates every epoch."""
    import dataclasses
    key = (repr(dataclasses.asdict(cfg)), repr(dataclasses.asdict(eval_cfg)))
    if key in _DECODER_CACHE:
        _DECODER_CACHE.move_to_end(key)
        return _DECODER_CACHE[key]
    while len(_DECODER_CACHE) >= 32:
        _DECODER_CACHE.popitem(last=False)
    fn = _make_decoder_uncached(cfg, eval_cfg)
    _DECODER_CACHE[key] = fn
    return fn


def _make_decoder_uncached(cfg, eval_cfg):
    if eval_cfg.sample_method == "beam" and eval_cfg.beam_size > 1:
        fn = partial(beam_search, cfg=cfg, beam_size=eval_cfg.beam_size,
                     max_len=eval_cfg.max_length,
                     length_penalty=eval_cfg.length_penalty)
        return jax.jit(lambda params, arrays: fn(params=params, arrays=arrays))
    sample = eval_cfg.sample_method == "sample"
    fn = partial(greedy_decode, cfg=cfg, max_len=eval_cfg.max_length,
                 temperature=eval_cfg.temperature, sample=sample)
    if sample:
        return jax.jit(lambda params, arrays, rng:
                       fn(params=params, arrays=arrays, rng=rng))
    return jax.jit(lambda params, arrays: fn(params=params, arrays=arrays))
