"""PTB-style tokenizer (pure Python).

The reference evaluates through the vendored coco-caption toolkit, whose
PTBTokenizer shells out to the Stanford CoreNLP **Java** jar (reference:
`coco-caption/pycocoevalcap/tokenizer/ptbtokenizer.py`; SURVEY.md L1).
This sandbox has no JVM, so we port the tokenizer's *observable behavior
on caption text*: lowercase, split off punctuation, drop the toolkit's
punctuation list.  SURVEY.md §7 flags tokenization as the #1 metric-parity
risk — keep this list in sync with the toolkit's PUNCTUATIONS.
"""

from __future__ import annotations

import re

# coco-caption PTBTokenizer's PUNCTUATIONS list (dropped from output).
_PUNCTUATIONS = {
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
}

# Split into: abbreviations/contractions stay attached ("don't", "mr.");
# PTB separates most punctuation into standalone tokens.
_TOKEN_RE = re.compile(r"[a-z0-9]+(?:'[a-z]+)?|[^\sa-z0-9]+")


def ptb_tokenize(text: str) -> list[str]:
    """Lowercase PTB-ish tokenization with punctuation tokens removed."""
    toks = _TOKEN_RE.findall(text.lower().strip())
    return [t for t in toks if t not in _PUNCTUATIONS]


def tokenize_corpus(entries: dict[str, list[str]]) -> dict[str, list[str]]:
    """{image_id: [sentence, ...]} -> {image_id: ['tok tok ...', ...]},
    mirroring PTBTokenizer.tokenize()'s dict-of-joined-tokens output."""
    return {k: [" ".join(ptb_tokenize(s)) for s in v]
            for k, v in entries.items()}
