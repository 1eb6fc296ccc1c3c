#!/usr/bin/env python
"""Offline preprocessing: build the count-thresholded vocabulary
(reference: the prepro vocab-builder scripts; SURVEY.md L0).

    python tools/build_vocab.py --annotation_file ann.json \
        --out vocab.json --min_count 5
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from cvc_tpu.data.vocab import Vocabulary  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--annotation_file", required=True,
                   help="canonical annotation JSON (see datasets.py)")
    p.add_argument("--out", required=True)
    p.add_argument("--min_count", type=int, default=5)
    args = p.parse_args()

    with open(args.annotation_file) as f:
        ann = json.load(f)
    captions = [c for img in ann["images"] for c in img["captions"]]
    vocab = Vocabulary.build(captions, min_count=args.min_count)
    vocab.save(args.out)
    print(f"{len(captions)} captions -> vocab of {len(vocab)} words "
          f"(padded MXU size {vocab.padded_size()}) -> {args.out}")


if __name__ == "__main__":
    main()
