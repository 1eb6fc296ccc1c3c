#!/usr/bin/env python
"""Train the TPU-native cyclical grounded-captioning model.

Mirrors the reference's public CLI (reference: `python main.py <flags>`
with opts.py flag names; SURVEY.md L5/L6):

    python train.py --dataset synthetic --batch_size 32 --max_epochs 10 \
        --enable_cycle 1 --checkpoint_path save/exp1
    python train.py --dataset flickr30k --feature_file feats.h5 \
        --annotation_file ann.json --vocab_file vocab.json --mGPUs 8

Resume:   --start_from save/exp1
"""

import json
import os

# Honor JAX_PLATFORMS=cpu (virtual-mesh runs) even though this sandbox's
# sitecustomize force-registers the TPU plugin over the environment — the
# config API wins if applied before backend init (same workaround as
# __graft_entry__.dryrun_multichip).
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import re

    import jax
    jax.config.update("jax_platforms", "cpu")
    m = re.search(r"xla_force_host_platform_device_count=(\d+)",
                  os.environ.get("XLA_FLAGS", ""))
    if m:
        jax.config.update("jax_num_cpu_devices", int(m.group(1)))

from cvc_tpu.config import config_from_args
from cvc_tpu.training.loop import train


def main(argv=None):
    cfg = config_from_args(argv)
    infos = train(cfg)
    print(json.dumps({"done": True, **infos}))
    return infos


if __name__ == "__main__":
    main()
