#!/usr/bin/env python
"""Measure a reference-SHAPED baseline decoder in torch (CPU).

The reference (GVD-lineage `misc/CaptionModel.py`) decodes with a
per-image Python loop around a per-step Python loop: every LSTM step of
every beam is a separate tiny torch op with host-side control flow.  The
reference never published throughput (BASELINE.md), so round 1 compared
against a documented estimate.  This script MEASURES the structural
baseline at the exact bench shapes (rnn 1024 / emb 512 / att 512 /
128 region slots / vocab 8704 / beam 5 / seq 20) on this host's CPU via
installed torch, and writes BASELINE_MEASURED.json, which bench.py folds
into its JSON line as `vs_baseline_measured`.

Honesty notes recorded in the output: this is torch-CPU (no GPU exists
here); the reference ran on V100-class GPUs where the same structure is
faster but still host-bound per step.  The number is a measured lower
anchor for the structure, not a V100 reproduction.
"""

import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, E, A, V, S, FEAT = 1024, 512, 512, 8704, 128, 2048
BEAM, SEQ = 5, 20


class RefShapedDecoder(torch.nn.Module):
    """Up-Down attention-LSTM decoder with the reference's module shapes."""

    def __init__(self):
        super().__init__()
        self.emb = torch.nn.Embedding(V, E)
        self.feat_proj = torch.nn.Linear(FEAT, H)
        self.att_lstm = torch.nn.LSTMCell(E + H + H, H)
        self.att_h = torch.nn.Linear(H, A)
        self.att_v = torch.nn.Linear(H, A)
        self.att_w = torch.nn.Linear(A, 1)
        self.lang_lstm = torch.nn.LSTMCell(H + H, H)
        self.logit = torch.nn.Linear(H, V)

    def step(self, word, state, v_enc, v_keys, v_global):
        h_att, c_att, h_lang, c_lang = state
        x = torch.cat([self.emb(word), v_global, h_lang], dim=1)
        h_att, c_att = self.att_lstm(x, (h_att, c_att))
        e = self.att_w(torch.tanh(v_keys + self.att_h(h_att)[:, None, :]))
        alpha = torch.softmax(e.squeeze(-1), dim=1)
        ctx = torch.bmm(alpha[:, None, :], v_enc).squeeze(1)
        h_lang, c_lang = self.lang_lstm(torch.cat([ctx, h_att], dim=1),
                                        (h_lang, c_lang))
        return self.logit(h_lang), (h_att, c_att, h_lang, c_lang)


@torch.no_grad()
def beam_search_one_image(model, feats):
    """The reference's per-image beam loop: beam dim as batch, Python
    step loop, topk on host between steps."""
    v_enc = model.feat_proj(feats)                       # [S, H]
    v_keys = model.att_v(v_enc)[None].expand(BEAM, S, A)
    v_enc_k = v_enc[None].expand(BEAM, S, H)
    v_global = v_enc.mean(0, keepdim=True).expand(BEAM, H)
    state = tuple(torch.zeros(BEAM, H) for _ in range(4))
    words = torch.full((BEAM,), 1, dtype=torch.long)
    logprobs = torch.zeros(BEAM, 1)
    seqs = []
    for t in range(SEQ + 1):
        logits, state = model.step(words, state, v_enc_k, v_keys, v_global)
        lp = torch.log_softmax(logits, dim=1) + logprobs
        if t == 0:
            top_lp, idx = lp[0].topk(BEAM)
            parent = torch.zeros(BEAM, dtype=torch.long)
        else:
            top_lp, flat = lp.view(-1).topk(BEAM)
            parent, idx = flat // V, flat % V
        state = tuple(s[parent] for s in state)
        words = idx
        logprobs = top_lp[:, None]
        seqs.append(idx.clone())
    return torch.stack(seqs, 1)


def main():
    torch.set_num_threads(max(1, os.cpu_count()))
    model = RefShapedDecoder().eval()
    rng = np.random.default_rng(0)
    n_warm, n_meas = 2, int(os.environ.get("CVC_BASELINE_IMAGES", "8"))
    imgs = [torch.tensor(rng.normal(size=(S, FEAT)), dtype=torch.float32)
            for _ in range(n_warm + n_meas)]
    for im in imgs[:n_warm]:
        beam_search_one_image(model, im)
    t0 = time.perf_counter()
    for im in imgs[n_warm:]:
        beam_search_one_image(model, im)
    dt = time.perf_counter() - t0
    caps_per_sec = n_meas / dt
    out = {
        "torch_cpu_caps_per_sec": round(caps_per_sec, 3),
        "structure": "per-image Python beam loop, per-step host topk "
                     "(reference CaptionModel.beam_search shape)",
        "shapes": {"rnn": H, "emb": E, "att": A, "vocab": V, "regions": S,
                   "beam": BEAM, "seq": SEQ},
        "host": f"torch-{torch.__version__} cpu x{os.cpu_count()} threads",
        "note": "reference hardware (V100) unavailable; this anchors the "
                "reference's per-step host-bound structure on this host",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    json.dump(out, open(path, "w"), indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
