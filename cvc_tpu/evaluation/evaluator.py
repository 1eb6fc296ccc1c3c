"""Split evaluation: generate captions on-device, score language +
grounding on host (reference: the eval branch of `main.py` +
`language_eval` + the grounding script; SURVEY.md §3.2/§3.4).

Flow per batch: jitted decode (greedy or beam, with recorded region
attention) -> decode_sequence to words -> collect predictions JSON and
per-image grounding samples -> corpus metrics at the end.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cvc_tpu.data.pipeline import make_batches
from cvc_tpu.evaluation.grounding import (grounding_eval,
                                          gt_sentence_localization)
from cvc_tpu.evaluation.language_eval import language_eval
from cvc_tpu.models.cyclical import decode_teacher_forced
from cvc_tpu.models.decoding import make_decoder


_LOCALIZER_CACHE: dict = {}


def _make_localizer_fn(model_cfg):
    """Jitted: localizer β over the generated words (the cycle's trained
    grounding head) — used when eval_cfg.grounding_source == 'localizer'.
    Memoized like make_decoder (fresh jit per epoch = recompile)."""
    import dataclasses
    import jax
    from cvc_tpu.models import core

    key = repr(dataclasses.asdict(model_cfg))
    if key in _LOCALIZER_CACHE:
        return _LOCALIZER_CACHE[key]

    @jax.jit
    def fn(params, arrays, tokens):
        v_enc, _, _ = core.encode_regions(
            params, model_cfg, arrays["feats"], arrays["box_geom"],
            arrays["region_cls"], arrays["region_mask"],
            arrays.get("global_feat"))
        beta, _ = core.localize(params, model_cfg, tokens, v_enc,
                                arrays["region_mask"])
        return beta

    _LOCALIZER_CACHE[key] = fn
    return fn


def _batch_putter(mesh):
    """Host batch -> device arrays; with a mesh, batch-sharded over the
    'data' axis so validation decode runs data-parallel on the slice
    (the reference evaluated multi-GPU through the same DataParallel
    module it trained — SURVEY.md §5.8; GSPMD jit picks the shardings up
    from the committed inputs, params stay in their training placement)."""
    if mesh is None:
        return lambda arrays: {k: jnp.asarray(v) for k, v in arrays.items()}
    from cvc_tpu.parallel.mesh import shard_batch
    return lambda arrays: shard_batch(mesh, arrays)


def generate_split(params, model_cfg, eval_cfg, ds, batch_size: int,
                   rng=None, mesh=None):
    """Generate one caption per image.  Returns (predictions,
    grounding_samples, references) ready for the scorers."""
    import jax

    decoder = make_decoder(model_cfg, eval_cfg)
    needs_rng = eval_cfg.sample_method == "sample"
    use_localizer = getattr(eval_cfg, "grounding_source",
                            "decoder") == "localizer"
    localizer_fn = _make_localizer_fn(model_cfg) if use_localizer else None
    if rng is None:
        rng = jax.random.PRNGKey(0)
    put = _batch_putter(mesh)

    predictions, samples, references = [], [], {}
    for batch in make_batches(ds, model_cfg, batch_size, shuffle=False,
                              drop_last=False, unique_images=True):
        arrays = put(batch.model_inputs())
        if needs_rng:
            rng, sub = jax.random.split(rng)
            out = decoder(params, arrays, sub)
        else:
            out = decoder(params, arrays)
        tokens = np.asarray(out["tokens"])
        if use_localizer:
            alphas = np.asarray(localizer_fn(params, arrays,
                                             jnp.asarray(tokens)))
        else:
            alphas = np.asarray(out["alphas"])
        sents, word_pos = ds.vocab.decode_sequence_with_pos(tokens)
        for i in range(len(sents)):
            if not batch.valid[i]:
                continue
            ex = ds.get(int(batch.example_idx[i]))
            words = sents[i].split()
            predictions.append({"image_id": ex.image_id,
                                "caption": sents[i]})
            references[ex.image_id] = list(ex.captions)
            samples.append({
                "words": words,
                # exact word<->attention alignment: index alphas by each
                # emitted word's timestep (a skipped token, e.g. generated
                # BOS, must not shift subsequent rows)
                "attn": alphas[i, np.asarray(word_pos[i], np.int32)]
                if word_pos[i] else alphas[i, :0],
                "boxes": np.asarray(batch.box_geom[i][:, :4]),
                "gt": [{"class_id": e.class_id,
                        "box": np.asarray(e.box)} for e in ex.entities],
            })
    return predictions, samples, references


def evaluate_split(params, model_cfg, eval_cfg, ds, batch_size: int,
                   out_path: str | None = None, rng=None,
                   mesh=None) -> dict:
    """Full protocol: caption metrics + grounding F1 (+ GT-sentence mode
    when eval_cfg.gt_sentence_mode)."""
    predictions, samples, references = generate_split(
        params, model_cfg, eval_cfg, ds, batch_size, rng, mesh=mesh)
    results = {}
    if eval_cfg.language_eval and predictions:
        results.update(language_eval(predictions, references,
                                     out_path=out_path))
    if eval_cfg.grounding_eval and samples:
        results.update(grounding_eval(samples, ds.class_names))
        results.pop("per_class", None)
    if eval_cfg.gt_sentence_mode:
        results.update(gt_sentence_attention_eval(
            params, model_cfg, ds, batch_size, mesh=mesh))
    results["n_images"] = len(predictions)
    return results


_TF_ALPHA_CACHE: dict = {}


def _make_tf_alpha_fn(model_cfg):
    """Jitted teacher-forced alpha extraction (unjitted decode through a
    remote PJRT tunnel costs ~25ms per dispatched op — minutes per probe)."""
    import dataclasses
    import jax

    key = repr(dataclasses.asdict(model_cfg))
    if key in _TF_ALPHA_CACHE:
        return _TF_ALPHA_CACHE[key]

    @jax.jit
    def fn(params, arrays):
        _, alphas, _, _ = decode_teacher_forced(params, model_cfg, arrays)
        return alphas

    _TF_ALPHA_CACHE[key] = fn
    return fn


def gt_sentence_attention_eval(params, model_cfg, ds, batch_size: int,
                               source: str = "decoder", mesh=None) -> dict:
    """Teacher-forced localization accuracy: run the decode pass on GT
    captions and check the attention at annotated word positions (the
    reference's GT-sentence grounding mode).  source='decoder' uses the
    generation attention alpha; 'localizer' uses the cycle-trained beta
    over the GT words."""
    localizer_fn = _make_localizer_fn(model_cfg) if source == "localizer" \
        else None
    tf_alpha_fn = _make_tf_alpha_fn(model_cfg) if source != "localizer" \
        else None
    put = _batch_putter(mesh)
    samples = []
    for batch in make_batches(ds, model_cfg, batch_size, shuffle=False,
                              drop_last=False):
        arrays = put(batch.model_inputs())
        if localizer_fn is not None:
            # beta over the GT words w_1.. (positions align with word_idx)
            alphas = np.asarray(localizer_fn(params, arrays,
                                             arrays["tokens"][:, 1:]))
        else:
            alphas = np.asarray(tf_alpha_fn(params, arrays))
        for i in range(alphas.shape[0]):
            if not batch.valid[i]:
                continue
            ex = ds.get(int(batch.example_idx[i]))
            ci = int(batch.caption_idx[i])
            gt = [{"word_idx": e.word_idx, "box": np.asarray(e.box)}
                  for e in ex.entities if e.caption_idx == ci]
            if gt:
                samples.append({"attn": alphas[i],
                                "boxes": np.asarray(batch.box_geom[i][:, :4]),
                                "gt": gt})
    return gt_sentence_localization(samples)
