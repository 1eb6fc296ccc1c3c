"""Static-shape input pipeline.

The reference feeds the model through a multi-worker torch DataLoader with a
custom collate that pads regions/captions per batch (SURVEY.md L2).  On TPU,
*every* batch must have the same shape or XLA recompiles, so this pipeline
pads to configuration-fixed shapes once and for all:

    feats       [B, S, Dfeat]   S = num_frames * num_regions attention slots
    box_geom    [B, S, 5]       x1,y1,x2,y2,area (normalized)
    region_cls  [B, S]          detector class id (int32)
    region_mask [B, S]          1.0 for real proposals
    tokens      [B, T]          BOS + words + EOS + PAD,  T = seq_length + 2
    token_mask  [B, T]          1.0 on supervised positions (words + EOS)
    global_feat [B, Dg]         optional segment feature (ANet)
    example_idx [B], caption_idx [B], valid [B]

A small background-thread prefetcher overlaps host batch assembly with
device compute (the reference relied on DataLoader worker processes for the
same purpose).
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from cvc_tpu.data.datasets import CaptionDataset


@dataclass
class Batch:
    feats: np.ndarray
    box_geom: np.ndarray
    region_cls: np.ndarray
    region_mask: np.ndarray
    tokens: np.ndarray
    token_mask: np.ndarray
    global_feat: Optional[np.ndarray]
    example_idx: np.ndarray
    caption_idx: np.ndarray
    valid: np.ndarray
    gt_region: Optional[np.ndarray] = None  # [B, T] region slot of the GT
    #   box at annotated word positions (target-aligned), -1 elsewhere —
    #   consumed only by the optional supervised-grounding loss

    def model_inputs(self) -> dict:
        """The device-bound arrays (everything the jitted step consumes)."""
        d = dict(feats=self.feats, box_geom=self.box_geom,
                 region_cls=self.region_cls, region_mask=self.region_mask,
                 tokens=self.tokens, token_mask=self.token_mask)
        if self.global_feat is not None:
            d["global_feat"] = self.global_feat
        if self.gt_region is not None:
            d["gt_region"] = self.gt_region
        return d


def _np_iou_one(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """IoU of one box [4] vs many [S, 4] (host numpy)."""
    lt = np.maximum(box[:2], boxes[:, :2])
    rb = np.minimum(box[2:4], boxes[:, 2:4])
    wh = np.clip(rb - lt, 0.0, None)
    inter = wh[:, 0] * wh[:, 1]
    a = max(box[2] - box[0], 0) * max(box[3] - box[1], 0)
    b = (np.clip(boxes[:, 2] - boxes[:, 0], 0, None)
         * np.clip(boxes[:, 3] - boxes[:, 1], 0, None))
    union = a + b - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)


def _gt_region_row(ex, ci: int, geom: np.ndarray, rmask: np.ndarray,
                   T: int, iou_thresh: float = 0.5) -> np.ndarray:
    """Per-token GT region slot for the supervised-grounding loss: entity
    word k sits at tokens index k+1 (BOS at 0); slot = argmax-IoU region
    of the entity box (>= thresh), else -1."""
    row = np.full((T,), -1, np.int32)
    boxes = geom[:, :4]
    for e in ex.entities:
        if e.caption_idx != ci:
            continue
        t = e.word_idx + 1
        if t >= T:
            continue
        ious = _np_iou_one(np.asarray(e.box, np.float32), boxes) * rmask
        s = int(np.argmax(ious))
        if ious[s] >= iou_thresh:
            row[t] = s
    return row


def box_geometry(boxes: np.ndarray) -> np.ndarray:
    """[..., 4] x1y1x2y2 -> [..., 5] with area appended (the reference feeds
    normalized box coordinates alongside features into the region encoder)."""
    w = np.clip(boxes[..., 2] - boxes[..., 0], 0, None)
    h = np.clip(boxes[..., 3] - boxes[..., 1], 0, None)
    return np.concatenate([boxes, (w * h)[..., None]], axis=-1)


def pad_regions(feats: np.ndarray, boxes: np.ndarray, classes: np.ndarray,
                num_frames: int, num_regions: int, feat_dim: int):
    """Pad/truncate one example's proposals to the static [S, ...] shapes.

    Accepts [N, D] (image) or [F, N, D] (video) features; returns flattened
    [S, D], [S, 5], [S], [S] with S = num_frames * num_regions.
    """
    if feats.ndim == 2:
        feats, boxes, classes = feats[None], boxes[None], classes[None]
    F = min(feats.shape[0], num_frames)
    S = num_frames * num_regions
    out_f = np.zeros((num_frames, num_regions, feat_dim), dtype=np.float32)
    out_b = np.zeros((num_frames, num_regions, 4), dtype=np.float32)
    out_c = np.zeros((num_frames, num_regions), dtype=np.int32)
    out_m = np.zeros((num_frames, num_regions), dtype=np.float32)
    d = min(feats.shape[2], feat_dim)  # zero-pad narrow features, truncate wide
    for f in range(F):
        n = min(feats.shape[1], num_regions)
        out_f[f, :n, :d] = feats[f, :n, :d]
        out_b[f, :n] = boxes[f, :n]
        out_c[f, :n] = classes[f, :n]
        out_m[f, :n] = 1.0
    return (out_f.reshape(S, feat_dim), box_geometry(out_b.reshape(S, 4)),
            out_c.reshape(S), out_m.reshape(S))


_USE_NATIVE_DEFAULT = os.environ.get("CVC_NATIVE_PACK", "0") == "1"


def _assemble(ds: CaptionDataset, pairs: list[tuple[int, int]],
              model_cfg, batch_size: int,
              use_native: bool | None = None,
              with_gt_region: bool = False) -> Batch:
    # The C++ packer (native/pack.cc) wins on multi-core hosts; this
    # sandbox is single-core, where numpy's one-memcpy path is already
    # optimal — so native is opt-in via CVC_NATIVE_PACK=1.
    if use_native is None:
        use_native = _USE_NATIVE_DEFAULT
    S = model_cfg.num_frames * model_cfg.num_regions
    T = model_cfg.max_tokens
    D = model_cfg.feat_dim
    Dg = model_cfg.global_feat_dim
    B = batch_size
    gfeat = np.zeros((B, Dg), dtype=np.float32) if Dg else None
    eidx = np.zeros((B,), dtype=np.int32)
    cidx = np.zeros((B,), dtype=np.int32)
    valid = np.zeros((B,), dtype=np.float32)

    native_out = tok_out = None
    if use_native and pairs:
        # OpenMP C++ packer (native/pack.cc); numpy fallback below.
        from cvc_tpu import native
        from cvc_tpu.data.vocab import simple_tokenize, UNK_ID, BOS_ID, EOS_ID
        examples = [ds.get(ei) for ei, _ in pairs]
        native_out = native.pack_batch_native(
            [(ex.features, ex.boxes, ex.classes) for ex in examples],
            model_cfg.num_frames, model_cfg.num_regions, D)
        if native_out is not None:
            id_lists = [
                [ds.vocab.wtoi.get(w, UNK_ID)
                 for w in simple_tokenize(ds.get(ei).captions[ci])
                 [: model_cfg.seq_length]]
                for ei, ci in pairs]
            tok_out = native.pack_tokens_native(
                id_lists, model_cfg.seq_length, T, BOS_ID, EOS_ID, pad=0)

    if native_out is not None and tok_out is not None:
        nf, ng, nc, nm = native_out
        feats = np.zeros((B, S, D), np.float32)
        geom = np.zeros((B, S, 5), np.float32)
        cls = np.zeros((B, S), np.int32)
        rmask = np.zeros((B, S), np.float32)
        tokens = np.zeros((B, T), np.int32)
        tmask = np.zeros((B, T), np.float32)
        n = len(pairs)
        feats[:n], geom[:n], cls[:n], rmask[:n] = nf, ng, nc, nm
        tokens[:n], tmask[:n] = tok_out
        for j, (ei, ci) in enumerate(pairs):
            ex = ds.get(ei)
            if gfeat is not None and ex.global_feat is not None:
                g = ex.global_feat[:Dg]
                gfeat[j, :g.shape[0]] = g
            eidx[j], cidx[j], valid[j] = ei, ci, 1.0
    else:
        feats = np.zeros((B, S, D), dtype=np.float32)
        geom = np.zeros((B, S, 5), dtype=np.float32)
        cls = np.zeros((B, S), dtype=np.int32)
        rmask = np.zeros((B, S), dtype=np.float32)
        tokens = np.zeros((B, T), dtype=np.int32)
        tmask = np.zeros((B, T), dtype=np.float32)
        for j, (ei, ci) in enumerate(pairs):
            ex = ds.get(ei)
            feats[j], geom[j], cls[j], rmask[j] = pad_regions(
                ex.features, ex.boxes, ex.classes,
                model_cfg.num_frames, model_cfg.num_regions, D)
            ids, n_sup = ds.vocab.encode(ex.captions[ci], model_cfg.seq_length)
            tokens[j] = ids
            tmask[j, 1:1 + n_sup] = 1.0
            if gfeat is not None and ex.global_feat is not None:
                g = ex.global_feat[:Dg]
                gfeat[j, :g.shape[0]] = g
            eidx[j], cidx[j], valid[j] = ei, ci, 1.0
    # Pad a short final batch by repeating row 0 (marked invalid).
    for j in range(len(pairs), B):
        feats[j], geom[j], cls[j], rmask[j] = feats[0], geom[0], cls[0], rmask[0]
        tokens[j], tmask[j] = tokens[0], tmask[0]
    gt_region = None
    if with_gt_region:
        gt_region = np.full((B, T), -1, np.int32)
        for j, (ei, ci) in enumerate(pairs):
            gt_region[j] = _gt_region_row(ds.get(ei), ci, geom[j], rmask[j], T)
    return Batch(feats, geom, cls, rmask, tokens, tmask, gfeat, eidx, cidx,
                 valid, gt_region)


def make_batches(ds: CaptionDataset, model_cfg, batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2, unique_images: bool = False,
                 with_gt_region: bool = False,
                 num_workers: int = 1) -> Iterator[Batch]:
    """Yield fixed-shape Batches over all (example, caption) pairs.

    Like the reference DataLoader, iterates image-caption pairs (an image
    with 5 captions appears 5 times per epoch with different targets).
    `unique_images=True` yields each image once (generation/eval mode).
    `num_workers > 1` assembles batches on that many host threads
    (order-preserving; the reference's DataLoader worker processes).
    """
    if unique_images:
        pairs = [(ei, 0) for ei in range(len(ds))]
    else:
        pairs = [(ei, ci) for ei in range(len(ds))
                 for ci in range(len(ds.get(ei).captions))]
    if shuffle:
        np.random.default_rng(seed).shuffle(pairs)
    chunks = []
    for s in range(0, len(pairs), batch_size):
        chunk = pairs[s:s + batch_size]
        if len(chunk) < batch_size and drop_last:
            continue
        chunks.append(chunk)

    if prefetch <= 0:
        for chunk in chunks:
            yield _assemble(ds, chunk, model_cfg, batch_size,
                            with_gt_region=with_gt_region)
        return

    if num_workers > 1:
        yield from _parallel_batches(ds, chunks, model_cfg, batch_size,
                                     with_gt_region, num_workers,
                                     max(prefetch, num_workers))
        return

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    _SENTINEL = object()

    def worker():
        # Assembly errors must reach the consumer: a swallowed exception
        # here would look like a cleanly finished (but truncated) epoch.
        try:
            for chunk in chunks:
                q.put(_assemble(ds, chunk, model_cfg, batch_size,
                                with_gt_region=with_gt_region))
            q.put(_SENTINEL)
        except BaseException as e:
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def _parallel_batches(ds, chunks, model_cfg, batch_size, with_gt_region,
                      num_workers: int, max_pending: int) -> Iterator[Batch]:
    """Order-preserving multi-threaded batch assembly: `num_workers`
    threads race over the chunk list; batch i is yielded strictly in
    order, and no worker runs more than `max_pending` batches ahead of
    the consumer (bounds host memory)."""
    cond = threading.Condition()
    results: dict[int, Batch] = {}
    errors: list[BaseException] = []
    state = {"next_in": 0, "emitted": 0}
    total = len(chunks)

    def worker():
        while True:
            with cond:
                if errors or state["next_in"] >= total:
                    return
                i = state["next_in"]
                state["next_in"] += 1
                while i - state["emitted"] >= max_pending and not errors:
                    cond.wait()
                if errors:
                    return
            try:
                b = _assemble(ds, chunks[i], model_cfg, batch_size,
                              with_gt_region=with_gt_region)
            except BaseException as e:  # propagate to the consumer
                with cond:
                    errors.append(e)
                    cond.notify_all()
                return
            with cond:
                results[i] = b
                cond.notify_all()

    threads = [threading.Thread(target=worker, daemon=True)
               for _ in range(num_workers)]
    for t in threads:
        t.start()
    try:
        for i in range(total):
            with cond:
                while i not in results and not errors:
                    cond.wait()
                if errors:
                    raise errors[0]
                b = results.pop(i)
                state["emitted"] = i + 1
                cond.notify_all()
            yield b
    finally:
        with cond:
            state["next_in"] = total  # stop idle workers
            if not errors:
                errors.append(GeneratorExit("consumer closed"))
            cond.notify_all()
        for t in threads:
            t.join(timeout=5)


def num_batches(ds: CaptionDataset, batch_size: int, drop_last: bool = True) -> int:
    n = sum(len(ds.get(i).captions) for i in range(len(ds)))
    return n // batch_size if drop_last else -(-n // batch_size)
