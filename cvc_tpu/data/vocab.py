"""Vocabulary: word<->id mapping, tokenization, decode_sequence.

The reference builds a count-thresholded vocabulary offline and ships it as
a dict JSON consumed by the dataloaders; rare words map to UNK, captions are
truncated to --seq_length (reference: prepro scripts + `misc/utils.py`
decode_sequence; SURVEY.md L0/L2).

Fixed special ids (static for the compiled graph):
  PAD=0  (also functions as "after EOS" filler; masked out of every loss)
  BOS=1  (decoder start symbol)
  EOS=2  (end of caption)
  UNK=3
"""

from __future__ import annotations

import json
import re
from collections import Counter
from typing import Iterable, Sequence

import numpy as np

PAD_ID = 0
BOS_ID = 1
EOS_ID = 2
UNK_ID = 3
SPECIALS = ["<pad>", "<bos>", "<eos>", "<unk>"]

_WORD_RE = re.compile(r"[a-z0-9']+")


def simple_tokenize(text: str) -> list[str]:
    """Lowercase word tokenizer used at vocab-build time (the reference's
    prepro lowercases and strips punctuation the same way)."""
    return _WORD_RE.findall(text.lower())


class Vocabulary:
    def __init__(self, words: Sequence[str]):
        """`words` excludes specials; specials get fixed low ids."""
        self.itow: list[str] = list(SPECIALS) + list(words)
        self.wtoi: dict[str, int] = {w: i for i, w in enumerate(self.itow)}
        assert self.wtoi["<pad>"] == PAD_ID and self.wtoi["<bos>"] == BOS_ID

    def __len__(self) -> int:
        return len(self.itow)

    def padded_size(self, multiple: int = 128) -> int:
        """Vocab size rounded up so the output-projection matmul tiles the MXU."""
        n = len(self.itow)
        return ((n + multiple - 1) // multiple) * multiple

    @staticmethod
    def build(captions: Iterable[str], min_count: int = 5) -> "Vocabulary":
        """Count-thresholded vocab (reference: prepro vocab builder)."""
        counts: Counter = Counter()
        for c in captions:
            counts.update(simple_tokenize(c))
        words = sorted(w for w, n in counts.items() if n >= min_count)
        return Vocabulary(words)

    # -- serialization (dict JSON like the reference's data/*dic.json) -----
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"itow": self.itow}, f)

    @staticmethod
    def load(path: str) -> "Vocabulary":
        with open(path) as f:
            raw = json.load(f)
        if "itow" in raw:
            itow = raw["itow"]
            if itow[:4] == SPECIALS:
                return Vocabulary(itow[4:])
            return Vocabulary([w for w in itow if w not in SPECIALS])
        # reference-style {id(str): word} dicts, 1-indexed
        items = sorted(((int(k), v) for k, v in raw.items()))
        return Vocabulary([w for _, v in items for w in [v] if w not in SPECIALS])

    # -- encoding / decoding ------------------------------------------------
    def encode(self, text: str, seq_length: int) -> tuple[np.ndarray, int]:
        """Caption -> fixed-length id buffer `[BOS, w1..wk, EOS, PAD...]`.

        Returns (ids[seq_length+2], true_length k+1) where true_length counts
        the tokens the loss should supervise (words + EOS), matching the
        reference's mask semantics (reference: dataloader mask construction).
        """
        words = simple_tokenize(text)[:seq_length]
        ids = [self.wtoi.get(w, UNK_ID) for w in words]
        buf = np.full((seq_length + 2,), PAD_ID, dtype=np.int32)
        buf[0] = BOS_ID
        buf[1:1 + len(ids)] = ids
        buf[1 + len(ids)] = EOS_ID
        return buf, len(ids) + 1

    def decode_sequence(self, ids: np.ndarray) -> list[str]:
        """Id matrix [B, L] -> list of sentences, stopping at EOS/PAD
        (reference: `misc/utils.py` decode_sequence)."""
        return self.decode_sequence_with_pos(ids)[0]

    def decode_sequence_with_pos(self, ids: np.ndarray
                                 ) -> tuple[list[str], list[list[int]]]:
        """Like decode_sequence, but also returns for every emitted word its
        TIMESTEP index in the id buffer, so callers can align per-step
        tensors (attention alphas) with the word list exactly even when
        tokens are skipped mid-stream (e.g. a generated BOS)."""
        sents, positions = [], []
        for row in np.asarray(ids):
            words, pos = [], []
            for j, t in enumerate(row):
                t = int(t)
                if t in (EOS_ID, PAD_ID):
                    break
                if t == BOS_ID:
                    continue
                words.append(self.itow[t] if 0 <= t < len(self.itow) else "<unk>")
                pos.append(j)
            sents.append(" ".join(words))
            positions.append(pos)
        return sents, positions
