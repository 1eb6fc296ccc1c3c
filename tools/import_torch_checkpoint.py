#!/usr/bin/env python
"""Convert a reference-lineage PyTorch checkpoint to cvc_tpu params.

A user of the reference holds `.pth` files written by `torch.save` in the
reference's `main.py` (GVD-lineage AttModel state_dicts, possibly with a
DataParallel `module.` prefix from `--mGPUs`).  This tool maps one onto
our param pytree and writes a `.npz` that `train.py --import_torch` /
`eval.py --import_torch` consume, plus a JSON mapping report.

    python tools/import_torch_checkpoint.py \
        --ckpt model-best.pth --config_json save/config.json \
        --out imported_params.npz [--rename renames.json] \
        [--att_input_order hge]

Key mapping rules (transposes, LSTM bias folding, attention-bias
equivalence, vocab padding) are documented in
`cvc_tpu/models/torch_import.py`.  Unknown checkpoint names can be
pre-renamed with --rename (JSON {ckpt_key: canonical_key}); every
unmapped key is listed in the report rather than silently dropped.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(
        description="Import a reference torch checkpoint into cvc_tpu")
    ap.add_argument("--ckpt", required=True, help=".pth/.pt state_dict")
    ap.add_argument("--config_json", required=True,
                    help="cvc_tpu Config JSON (e.g. save/config.json or a "
                         "configs/ preset) describing the target model")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--rename", default=None,
                    help="JSON file {ckpt_key: canonical_key}")
    ap.add_argument("--att_input_order", default="hge",
                    help="checkpoint att-LSTM input concat order over "
                         "h=h_lang g=v_global e=emb (reference: hge)")
    args = ap.parse_args()

    from cvc_tpu.config import Config
    from cvc_tpu.models.torch_import import (convert_state_dict,
                                             load_torch_state_dict,
                                             save_params_npz)

    with open(args.config_json) as f:
        cfg = Config.from_json(f.read())
    rename = None
    if args.rename:
        with open(args.rename) as f:
            rename = json.load(f)

    sd = load_torch_state_dict(args.ckpt)
    params, report = convert_state_dict(sd, cfg.model, rename=rename,
                                        att_input_order=args.att_input_order)
    save_params_npz(params, args.out)
    report_path = args.out + ".report.json"
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out} ({len(report['mapped'])} ckpt keys mapped, "
          f"vocab {report['ckpt_vocab']} -> {report['padded_vocab']})")
    if report["zero_filled"]:
        print("zero-filled (no torch counterpart): "
              + ", ".join(report["zero_filled"]))
    if report["unmapped"]:
        print("WARNING unmapped checkpoint keys (use --rename): "
              + ", ".join(report["unmapped"]))
    print(f"report: {report_path}")


if __name__ == "__main__":
    main()
