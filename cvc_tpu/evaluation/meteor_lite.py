"""METEOR-lite: a pure-Python approximation of METEOR.

The real METEOR the reference reports runs a **Java jar** with WordNet
synonymy and paraphrase tables (reference: `coco-caption/pycocoevalcap/
meteor/meteor-1.5.jar`).  No JVM exists in this environment, so this module
implements METEOR's core alignment stages that don't need external
resources: exact match + Porter-stem match, greedy contiguous-chunk
alignment, the standard fragmentation penalty, and the alpha-weighted
harmonic mean.  Scores correlate with, but slightly understate, jar METEOR
(no synonym/paraphrase stage) — reported as 'METEOR_lite' to keep that
honest.  If a JVM + jar are available at runtime, `language_eval` prefers
them (see language_eval.py).
"""

from __future__ import annotations

# METEOR 1.5 defaults (en): alpha, beta, gamma
_ALPHA, _BETA, _GAMMA = 0.85, 0.2, 0.6


def _porter_stem(word: str) -> str:
    """Tiny Porter-style suffix stripper (step-1-ish) — enough to match
    plural/tense variants, no external data."""
    for suf in ("ational", "iveness", "fulness", "ousness",
                "ization", "sses", "ies", "ing", "edly", "ed", "es", "s"):
        if word.endswith(suf) and len(word) - len(suf) >= 3:
            if suf == "sses":
                return word[:-2]
            if suf == "ies":
                return word[:-2]
            if suf == "s" and word.endswith(("ss", "us")):
                return word
            return word[: len(word) - len(suf)]
    return word


# METEOR 1.5 module weights: exact 1.0, stem 0.6 (syn/paraphrase absent)
_STAGE_WEIGHTS = {"exact": 1.0, "stem": 0.6}


def _align(cand: list[str], ref: list[str]):
    """Greedy two-stage alignment: exact, then stem.  Returns list of
    (cand_idx, ref_idx, weight) matches sorted by candidate position."""
    matches = []
    used_c, used_r = set(), set()
    for stage in ("exact", "stem"):
        key = (lambda w: w) if stage == "exact" else _porter_stem
        w_stage = _STAGE_WEIGHTS[stage]
        ref_keys = [key(w) for w in ref]
        for i, w in enumerate(cand):
            if i in used_c:
                continue
            kw = key(w)
            for j, rk in enumerate(ref_keys):
                if j in used_r:
                    continue
                if kw == rk:
                    matches.append((i, j, w_stage))
                    used_c.add(i)
                    used_r.add(j)
                    break
    return sorted(matches)


def _chunks(matches) -> int:
    """Number of maximal contiguous aligned chunks."""
    if not matches:
        return 0
    ch = 1
    for (c0, r0, _), (c1, r1, _) in zip(matches, matches[1:]):
        if not (c1 == c0 + 1 and r1 == r0 + 1):
            ch += 1
    return ch


def _single(cand: list[str], ref: list[str]) -> float:
    matches = _align(cand, ref)
    m = sum(w for _, _, w in matches)   # weighted match mass
    if m == 0:
        return 0.0
    p = m / len(cand)
    r = m / len(ref)
    fmean = p * r / (_ALPHA * p + (1 - _ALPHA) * r)
    frag = _chunks(matches) / len(matches)   # fragmentation uses raw counts
    penalty = _GAMMA * (frag ** 3.0)
    return fmean * (1.0 - penalty)


def meteor_lite(candidates: dict[str, str],
                references: dict[str, list[str]]) -> float:
    """Corpus METEOR-lite: mean over images of the best score against any
    reference (METEOR's multi-reference rule)."""
    total = 0.0
    for img_id, cand in candidates.items():
        c = cand.split()
        if not c:
            continue
        total += max((_single(c, r.split()) for r in references[img_id]),
                     default=0.0)
    return total / max(len(candidates), 1)
