"""Serving API: batched grounded-caption inference from a checkpoint.

The reference has no serving story (research repo); this is the
production-facing surface of the rebuild: load a checkpoint once, keep
the compiled beam-search executable warm, and caption arbitrary-size
request batches with static-shape padding (no recompiles).

    cap = Captioner.from_checkpoint("save/exp1", beam_size=5)
    out = cap.caption([{"features": f, "boxes": b, "classes": c}, ...])
    # -> [{"caption": str, "score": float,
    #      "grounding": [{"word", "box", "weight"}, ...]}, ...]
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from cvc_tpu.config import Config, EvalConfig
from cvc_tpu.data.pipeline import pad_regions
from cvc_tpu.data.vocab import Vocabulary
from cvc_tpu.models import core
from cvc_tpu.models.decoding import make_decoder


@dataclass
class Captioner:
    params: dict
    model_cfg: object
    vocab: Vocabulary
    decoder: object
    batch_size: int

    @staticmethod
    def from_checkpoint(checkpoint_dir: str, beam_size: int = 5,
                        batch_size: int = 64, length_penalty: float = 0.0,
                        vocab: Vocabulary | None = None) -> "Captioner":
        import os

        from cvc_tpu.training.checkpoint import CheckpointManager, load_config
        from cvc_tpu.training.optimizer import make_optimizer
        from cvc_tpu.training.train_state import TrainState

        cfg = load_config(checkpoint_dir)
        if vocab is None:
            vp = cfg.data.vocab_file
            if vp and os.path.exists(vp):
                vocab = Vocabulary.load(vp)
            else:
                from cvc_tpu.data.datasets import load_dataset
                vocab = load_dataset(cfg.data, cfg.model, "train").vocab
        cfg.model.vocab_size = vocab.padded_size(128)
        params = core.init_params(jax.random.PRNGKey(0), cfg.model)
        optimizer = make_optimizer(cfg.train, 1)
        state = TrainState.create(params, optimizer)
        mgr = CheckpointManager(checkpoint_dir)
        step = mgr.best_step() or mgr.latest_step()
        state, _ = mgr.restore(state, step=step)
        return Captioner.build(state.params, cfg.model, vocab, beam_size,
                               batch_size, length_penalty)

    @staticmethod
    def from_torch(ckpt_path: str, config_json: str, vocab_file: str,
                   beam_size: int = 5, batch_size: int = 64,
                   length_penalty: float = 0.0) -> "Captioner":
        """Serve a reference-lineage torch checkpoint (.pth) or a
        converted .npz directly on TPU — no retraining, no orbax dir.

            cap = Captioner.from_torch("model-best.pth",
                                       "configs/c1.json", "vocab.json")

        Weight mapping + parity evidence: cvc_tpu/models/torch_import.py,
        tests/test_torch_import.py."""
        from cvc_tpu.models.torch_import import import_params
        with open(config_json) as f:
            cfg = Config.from_json(f.read())
        vocab = Vocabulary.load(vocab_file)
        cfg.model.vocab_size = vocab.padded_size(128)
        params, _ = import_params(ckpt_path, cfg.model)
        return Captioner.build(params, cfg.model, vocab, beam_size,
                               batch_size, length_penalty)

    @staticmethod
    def build(params, model_cfg, vocab, beam_size: int = 5,
              batch_size: int = 64, length_penalty: float = 0.0) -> "Captioner":
        e_cfg = EvalConfig(beam_size=beam_size,
                           sample_method="beam" if beam_size > 1 else "greedy",
                           max_length=model_cfg.seq_length,
                           length_penalty=length_penalty)
        decoder = make_decoder(model_cfg, e_cfg)
        params = jax.device_put(params)
        return Captioner(params=params, model_cfg=model_cfg, vocab=vocab,
                         decoder=decoder, batch_size=batch_size)

    def caption(self, requests: list[dict],
                pipeline_depth: int = 1) -> list[dict]:
        """requests: [{'features': [N,D] or [F,N,D], 'boxes': [...,4],
        'classes': [...], 'global_feat'?: [Dg]}].  Any request count —
        internally padded to the fixed batch size.

        `pipeline_depth > 1` keeps that many batches IN FLIGHT: jax
        dispatch is asynchronous, so submitting batch i+1 before
        reading batch i's outputs overlaps the host work (packing,
        device transfer, numpy conversion, grounding extraction) with
        device execution — the TPU never idles between batches.  The
        device->host read of the oldest in-flight result is the
        backpressure.  Results are identical at any depth (order
        preserved); measured throughput: tools/bench_serving.py,
        experiments/serving_pipeline.json."""
        from collections import deque

        out: list[dict] = []
        inflight: deque = deque()
        depth = max(1, int(pipeline_depth))
        for s in range(0, len(requests), self.batch_size):
            chunk = requests[s:s + self.batch_size]
            arrays = self._pack(chunk)
            res = self.decoder(self.params, arrays)   # async dispatch
            inflight.append((chunk, arrays, res))
            if len(inflight) >= depth:
                out.extend(self._postprocess(*inflight.popleft()))
        while inflight:
            out.extend(self._postprocess(*inflight.popleft()))
        return out

    def _postprocess(self, chunk: list[dict], arrays: dict,
                     res: dict) -> list[dict]:
        """Convert one in-flight result to the response schema (the
        device->host sync point)."""
        out: list[dict] = []
        tokens = np.asarray(res["tokens"])
        alphas = np.asarray(res["alphas"])
        scores = np.asarray(res.get("scores",
                                    np.zeros(tokens.shape[0])))
        sents = self.vocab.decode_sequence(tokens)
        for i in range(len(chunk)):
            words = sents[i].split()
            boxes = arrays["box_geom"][i][:, :4]
            grounding = []
            for t, w in enumerate(words):
                slot = int(np.argmax(alphas[i, t]))
                grounding.append({
                    "word": w,
                    "box": [float(v) for v in np.asarray(boxes[slot])],
                    "weight": float(alphas[i, t, slot]),
                })
            out.append({"caption": sents[i],
                        "score": float(scores[i]),
                        "grounding": grounding})
        return out

    def _pack(self, chunk: list[dict]) -> dict:
        mc = self.model_cfg
        B = self.batch_size
        S = mc.total_regions
        feats = np.zeros((B, S, mc.feat_dim), np.float32)
        geom = np.zeros((B, S, 5), np.float32)
        cls = np.zeros((B, S), np.int32)
        mask = np.zeros((B, S), np.float32)
        gfeat = (np.zeros((B, mc.global_feat_dim), np.float32)
                 if mc.global_feat_dim else None)
        for i, r in enumerate(chunk):
            f = np.asarray(r["features"], np.float32)
            b = np.asarray(r["boxes"], np.float32)
            c = np.asarray(r.get("classes",
                                 np.zeros(b.shape[:-1], np.int32)), np.int32)
            feats[i], geom[i], cls[i], mask[i] = pad_regions(
                f, b, c, mc.num_frames, mc.num_regions, mc.feat_dim)
            if gfeat is not None and "global_feat" in r:
                g = np.asarray(r["global_feat"], np.float32)
                gfeat[i, :g.shape[0]] = g[:mc.global_feat_dim]
        arrays = dict(
            feats=jnp.asarray(feats), box_geom=jnp.asarray(geom),
            region_cls=jnp.asarray(cls), region_mask=jnp.asarray(mask))
        if gfeat is not None:
            arrays["global_feat"] = jnp.asarray(gfeat)
        return arrays
