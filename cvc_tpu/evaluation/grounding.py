"""Grounding evaluation: F1_all / F1_loc over attention-selected regions.

Protocol (reference: the in-repo grounding script following
`ActivityNet-Entities/scripts/eval_grd_anet_entities.py`; SURVEY.md §3.4):
for each generated object word, the predicted box is the region with the
highest recorded attention at that step; the prediction is correct when
IoU with a ground-truth box of that object class is >= 0.5.  Aggregation
is per object class, then macro-averaged over classes that occur in the
ground truth:

  * F1_all  — generation AND localization must both be right:
      prec_c = #correctly-localized generated c / #generated c
      rec_c  = #correctly-localized generated c / #GT instances of c
      F1_all = mean_c 2 prec_c rec_c / (prec_c + rec_c)
  * F1_loc  — pure localization quality, restricted to object words that
    were correctly generated (c generated and c in GT):
      loc_c = #correctly localized / #attempted(c)
    macro-averaged (this is the 'localization accuracy' flavor the paper
    reports as F1_loc's numerator restriction).
  * GT-sentence mode — teacher-forced attention at GT object-word
    positions -> localization accuracy (attn_accuracy).

All box math is host-side numpy via `cvc_tpu.ops.box_ops.box_iou`.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from cvc_tpu.ops.box_ops import box_iou

IOU_THRESH = 0.5


def _word_class_map(class_names: list[str]) -> dict[str, int]:
    return {w: i for i, w in enumerate(class_names)}


def grounding_eval(samples: list[dict], class_names: list[str],
                   iou_thresh: float = IOU_THRESH) -> dict:
    """samples: one dict per generated caption:
        words     [list of generated words]
        attn      [L, S] attention over region slots (rows past len ignored)
        boxes     [S, 4] region boxes (normalized)
        gt        [{'class_id': int, 'box': [4]}]  ground-truth entities
    Returns macro F1_all, F1_loc, precision/recall and per-class counts.
    """
    # per-class tallies
    gen = defaultdict(int)          # generated object words of class c
    gt_cnt = defaultdict(int)       # GT instances of class c
    correct = defaultdict(int)      # generated & localized correctly
    attempted = defaultdict(int)    # generated & class present in GT
    classes = set()

    names = set(class_names)
    cmap = _word_class_map(class_names)

    for s in samples:
        gt_by_class = defaultdict(list)
        for e in s["gt"]:
            gt_by_class[int(e["class_id"])].append(np.asarray(e["box"]))
            gt_cnt[int(e["class_id"])] += 1
            classes.add(int(e["class_id"]))
        attn = np.asarray(s["attn"])
        boxes = np.asarray(s["boxes"])
        for t, w in enumerate(s["words"]):
            if w not in names:
                continue
            c = cmap[w]
            gen[c] += 1
            classes.add(c)
            if c not in gt_by_class:
                continue  # generated object absent from GT: precision hit only
            attempted[c] += 1
            pred_box = boxes[int(np.argmax(attn[t]))]
            ious = np.asarray(box_iou(pred_box[None, :],
                                      np.stack(gt_by_class[c])))[0]
            if float(ious.max()) >= iou_thresh:
                correct[c] += 1

    f1_all, f1_loc, prec_all, rec_all = [], [], [], []
    per_class = {}
    for c in sorted(classes):
        if gt_cnt[c] == 0:
            continue  # classes never in GT don't enter the macro average
        p = correct[c] / gen[c] if gen[c] else 0.0
        r = correct[c] / gt_cnt[c]
        f1 = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
        loc = correct[c] / attempted[c] if attempted[c] else 0.0
        f1_all.append(f1)
        f1_loc.append(loc)
        prec_all.append(p)
        rec_all.append(r)
        per_class[class_names[c]] = {"prec": p, "rec": r, "f1": f1,
                                     "loc_acc": loc, "n_gt": gt_cnt[c],
                                     "n_gen": gen[c]}
    mean = lambda xs: float(np.mean(xs)) if xs else 0.0
    return {"F1_all": mean(f1_all), "F1_loc": mean(f1_loc),
            "precision": mean(prec_all), "recall": mean(rec_all),
            "n_classes": len(f1_all), "per_class": per_class}


def gt_sentence_localization(samples: list[dict],
                             iou_thresh: float = IOU_THRESH) -> dict:
    """Teacher-forced localization accuracy (the reference's GT-sentence
    mode): samples carry GT entities with their word positions, and `attn`
    from a teacher-forced decode.

    sample: {'attn': [L, S], 'boxes': [S, 4],
             'gt': [{'word_idx': int, 'box': [4]}]}
    """
    total, correct = 0, 0
    for s in samples:
        attn = np.asarray(s["attn"])
        boxes = np.asarray(s["boxes"])
        for e in s["gt"]:
            t = int(e["word_idx"])
            if t >= attn.shape[0]:
                continue
            total += 1
            pred_box = boxes[int(np.argmax(attn[t]))]
            iou = float(np.asarray(box_iou(pred_box[None, :],
                                           np.asarray(e["box"])[None, :]))[0, 0])
            if iou >= iou_thresh:
                correct += 1
    return {"attn_accuracy": correct / total if total else 0.0,
            "n_words": total}
