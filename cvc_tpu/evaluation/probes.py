"""Cycle-mechanism probes, run at validation time (``--cycle_probes``).

Three diagnostics that explain *why* a cyclical run amplifies or pins
grounding (round-3 verdict: two aligned-dose continuations diverged —
s123 amplified 3x, s57 froze at its engagement level — with no mechanism
data recorded).  All are teacher-forced / closed-form, no sampling:

* ``tf_attn_acc`` — decoder attention (alpha) localization accuracy on
  GT sentences (the reference's GT-sentence grounding mode).
* ``loc_acc`` — localizer beta localization accuracy on GT-word queries
  (the cycle's trained grounding head, measured directly).
* ``vhat_dependence`` — reconstruction XE with the learned beta's v-hat
  minus the same XE with a uniform (mean-region) v-hat.  Positive means
  the reconstructor actually *uses* word-aligned visual information; ~0
  means the cycle's gradient path to the localizer carries no signal.
  Queries use the decode pass's argmax words (the reference recipe's
  training distribution, `misc/model.py` cyclical forward).

Reference: the paper's §3 cycle (decode->localize->reconstruct); these
probes instrument the localize and reconstruct stages.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cvc_tpu.data.pipeline import make_batches
from cvc_tpu.models import core
from cvc_tpu.ops.primitives import masked_xent

_RECON_CACHE: dict = {}


def _make_recon_fns(model_cfg):
    """Jitted recon-XE pair: (learned-beta v-hat, uniform v-hat)."""
    key = repr(dataclasses.asdict(model_cfg))
    if key in _RECON_CACHE:
        return _RECON_CACHE[key]

    def recon_loss(params, arrays, uniform: bool):
        tokens, token_mask = arrays["tokens"], arrays["token_mask"]
        targets, mask = tokens[:, 1:], token_mask[:, 1:]
        v_enc, keys, v_global = core.encode_regions(
            params, model_cfg, arrays["feats"], arrays["box_geom"],
            arrays["region_cls"], arrays["region_mask"],
            arrays.get("global_feat"))
        emb_in = core.embed_tokens(params, tokens[:, :-1], jnp.float32)
        h_seq, _, _ = core.decode(params, model_cfg, v_enc, keys, v_global,
                                  emb_in, arrays["region_mask"])
        gen = jnp.argmax(core.logits(params, h_seq),
                         axis=-1).astype(jnp.int32)
        if uniform:
            m = arrays["region_mask"]
            vh1 = (v_enc * m[..., None]).sum(1) / jnp.maximum(
                m.sum(1), 1.0)[..., None]                       # [B, H]
            v_hat = jnp.broadcast_to(
                vh1[:, None, :],
                (gen.shape[0], gen.shape[1], vh1.shape[-1])
            ).astype(v_enc.dtype)
        else:
            _, v_hat = core.localize(params, model_cfg, gen, v_enc,
                                     arrays["region_mask"])
        h_rec, _, _ = core.decode(params, model_cfg, v_enc, keys, v_global,
                                  emb_in, arrays["region_mask"],
                                  context_override=v_hat)
        return masked_xent(core.logits(params, h_rec), targets, mask)

    fns = (jax.jit(lambda p, a: recon_loss(p, a, False)),
           jax.jit(lambda p, a: recon_loss(p, a, True)))
    _RECON_CACHE[key] = fns
    return fns


def vhat_dependence(params, model_cfg, ds, batch_size: int,
                    mesh=None) -> dict:
    """Mean recon XE (learned beta vs uniform v-hat) over a split."""
    from cvc_tpu.evaluation.evaluator import _batch_putter
    learned_fn, uniform_fn = _make_recon_fns(model_cfg)
    put = _batch_putter(mesh)
    ls, us = [], []
    for b in make_batches(ds, model_cfg, batch_size, shuffle=False,
                          prefetch=0, drop_last=False):
        arrays = put(b.model_inputs())
        ls.append(float(learned_fn(params, arrays)))
        us.append(float(uniform_fn(params, arrays)))
    learned, uniform = float(np.mean(ls)), float(np.mean(us))
    return {"recon_xe_learned_beta": learned,
            "recon_xe_uniform_beta": uniform,
            "vhat_dependence": uniform - learned}


def cycle_probe_metrics(params, model_cfg, ds, batch_size: int,
                        mesh=None) -> dict:
    """The full probe bundle for one checkpoint/epoch (see module doc)."""
    from cvc_tpu.evaluation.evaluator import gt_sentence_attention_eval
    out = {}
    dec = gt_sentence_attention_eval(params, model_cfg, ds, batch_size,
                                     source="decoder", mesh=mesh)
    out["tf_attn_acc"] = dec.get("attn_accuracy", 0.0)
    loc = gt_sentence_attention_eval(params, model_cfg, ds, batch_size,
                                     source="localizer", mesh=mesh)
    out["loc_acc"] = loc.get("attn_accuracy", 0.0)
    out.update(vhat_dependence(params, model_cfg, ds, batch_size,
                               mesh=mesh))
    return out
