"""Import reference-lineage PyTorch checkpoints into cvc_tpu params.

A user of the reference (GVD-lineage cyclical captioner — reference:
`misc/model.py` AttModel / TopDown core, checkpoints written by
`torch.save(model.state_dict(), ...)` in `main.py`; SURVEY.md §2
"Checkpointing") holds trained `.pth` files.  This module maps such a
state_dict onto the explicit param pytree built by
`cvc_tpu.models.core.init_params`, so existing torch checkpoints can be
served / fine-tuned on TPU without retraining.

The conversion is pure numpy (torch is only needed by the `.pth` loader,
and only to deserialize).  What it does, per component:

  * Linear weights transpose ([out, in] -> our [in, out]).
  * LSTMCell: `weight_ih`/`weight_hh` transpose; `bias_ih + bias_hh`
    fold into one bias.  Gate order is i,f,g,o on both sides
    (torch.nn.LSTMCell docs; `cvc_tpu.ops.primitives.lstm_cell`).
  * att_lstm input-block order: the reference concatenates
    [h_lang, v_global, emb] (GVD lineage `torch.cat([prev_h, fc_feats,
    xt])`), which is also our `_split_wx_att` order ("hge").  Other
    lineages are handled by `att_input_order`.
  * Additive attention: torch applies biases in BOTH branches of
    tanh(W_v v + b_v + W_h h + b_h); our `attention.b` is the single
    equivalent bias b_v + b_h.  The scalar score-projection bias
    (`att_w.bias`) shifts every region's logit equally — softmax
    invariant — and is dropped (recorded in the report).
  * The localizer follows the same pattern (loc_q.bias + loc_v.bias).
  * Vocab padding: our vocab is padded to a multiple of 128 for the MXU;
    a smaller checkpoint vocab is zero-padded in `embed.table` /
    `logit.w`, and padded `logit.b` entries are set to -1e9 so padding
    tokens can never be generated.
  * Components the torch checkpoint does not carry (box-geometry
    projection, detector-class embedding) are zero-filled so their
    additive contribution vanishes; each is listed in the report.

Canonical key schema (after stripping a DataParallel `module.` prefix —
the reference trained with `nn.DataParallel` under `--mGPUs`):

    embed.weight                     [V, E]
    feat_proj.{weight,bias}          [H, D], [H]
    att_lstm.{weight_ih,weight_hh,bias_ih,bias_hh}
    att_h.{weight,bias}              [A, H], [A]     (query proj)
    att_v.{weight,bias}              [A, H], [A]     (key proj)
    att_w.{weight,bias}              [1, A], [1]     (score proj)
    lang_lstm.{...}
    logit.{weight,bias}              [V, H], [V]
    loc_q.{weight,bias}              [A, E], [A]     (localizer query)
    loc_v.{weight,bias}              [A, H], [A]     (localizer key)
    loc_w.{weight,bias}              [1, A], [1]
    global_proj.{weight,bias}        [H, G]  (optional, ANet segment feat)
    frame_emb.weight                 [F, H]  (optional, ANet temporal emb)

Common GVD / self-critical.pytorch lineage names are accepted as
aliases (`embed.0.weight`, `att_embed.0.*`, `core.att_lstm.*`,
`core.attention.h2att.*`, `core.attention.alpha_net.*`, `ctx2att.*`);
anything else can be pre-renamed via the `rename` map (the CLI tool
takes a JSON file).  Unmapped checkpoint keys are reported, never
silently dropped.
"""

from __future__ import annotations

import numpy as np

# alias -> canonical (exact-match, applied after stripping "module.")
_ALIASES = {
    "embed.0.weight": "embed.weight",
    "att_embed.0.weight": "feat_proj.weight",
    "att_embed.0.bias": "feat_proj.bias",
    "vis_embed.0.weight": "feat_proj.weight",
    "vis_embed.0.bias": "feat_proj.bias",
    "core.attention.h2att.weight": "att_h.weight",
    "core.attention.h2att.bias": "att_h.bias",
    "core.attention.alpha_net.weight": "att_w.weight",
    "core.attention.alpha_net.bias": "att_w.bias",
    "ctx2att.weight": "att_v.weight",
    "ctx2att.bias": "att_v.bias",
}
_ALIAS_PREFIXES = {
    "core.att_lstm.": "att_lstm.",
    "core.lang_lstm.": "lang_lstm.",
    "localizer.q.": "loc_q.",
    "localizer.v.": "loc_v.",
    "localizer.w.": "loc_w.",
    "global_enc.": "global_proj.",
}


def _canonicalize(sd: dict, rename: dict | None) -> dict:
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if rename and k in rename:
            k = rename[k]
        k = _ALIASES.get(k, k)
        for pre, rep in _ALIAS_PREFIXES.items():
            if k.startswith(pre):
                k = rep + k[len(pre):]
                break
        out[k] = np.asarray(v, dtype=np.float32)
    return out


def _lstm(sd, prefix, block_dims, block_order, our_order, used):
    """Map a torch LSTMCell onto {"wx","wh","b"} with input-block reorder.

    block_dims: {symbol: dim} of the concatenated input blocks;
    block_order: the torch checkpoint's concat order (e.g. "hge");
    our_order:   our `_split_wx_att` order.
    """
    wih = sd[prefix + "weight_ih"]          # [4H, sum(dims)]
    whh = sd[prefix + "weight_hh"]          # [4H, H]
    used.update({prefix + "weight_ih", prefix + "weight_hh"})
    b = np.zeros(wih.shape[0], np.float32)
    for suffix in ("bias_ih", "bias_hh"):
        if prefix + suffix in sd:
            b = b + sd[prefix + suffix]
            used.add(prefix + suffix)
    # split [4H, in] columns into blocks by the checkpoint's order,
    # re-concatenate in ours, then transpose to [in, 4H]
    blocks, off = {}, 0
    for sym in block_order:
        d = block_dims[sym]
        blocks[sym] = wih[:, off:off + d]
        off += d
    if off != wih.shape[1]:
        raise ValueError(
            f"{prefix}weight_ih input dim {wih.shape[1]} != expected "
            f"{off} (blocks {block_dims}, order {block_order!r})")
    wx = np.concatenate([blocks[s] for s in our_order], axis=1).T
    return {"wx": np.ascontiguousarray(wx),
            "wh": np.ascontiguousarray(whh.T),
            "b": b}


def _pad_rows(a: np.ndarray, rows: int, fill: float = 0.0) -> np.ndarray:
    if a.shape[0] == rows:
        return a
    out = np.full((rows,) + a.shape[1:], fill, np.float32)
    out[: a.shape[0]] = a
    return out


def convert_state_dict(state_dict: dict, cfg, rename: dict | None = None,
                       att_input_order: str = "hge"):
    """Map a reference-lineage torch state_dict onto an init_params pytree.

    state_dict: {name: array-like} (torch tensors or numpy arrays).
    cfg: ModelConfig the imported params must serve.
    rename: optional {ckpt_key: canonical_key} applied before aliases.
    att_input_order: the checkpoint att-LSTM's input concat order over
        h=h_lang, g=v_global, e=word-emb (reference lineage: "hge").

    Returns (params, report) — report lists mapped / zero_filled /
    dropped (softmax-invariant) / unmapped keys.  Raises on shape
    mismatches and on cfg features the checkpoint cannot serve
    (obj_interact).
    """
    import jax
    import jax.numpy as jnp
    from cvc_tpu.models.core import init_params

    sd = _canonicalize(state_dict, rename)
    used: set = set()
    report = {"mapped": [], "zero_filled": [], "dropped": [], "unmapped": []}

    H, E, A = cfg.rnn_size, cfg.input_encoding_size, cfg.att_hid_size
    V, D = cfg.vocab_size, cfg.feat_dim

    def take(key, shape=None):
        a = sd[key]
        used.add(key)
        if shape is not None and tuple(a.shape) != tuple(shape):
            raise ValueError(f"{key}: checkpoint shape {a.shape} != "
                             f"expected {shape} for this ModelConfig")
        return a

    emb = take("embed.weight")
    if emb.shape[1] != E:
        raise ValueError(f"embed.weight dim {emb.shape[1]} != "
                         f"input_encoding_size {E}")
    ckpt_v = emb.shape[0]
    if ckpt_v > V:
        raise ValueError(f"checkpoint vocab {ckpt_v} > cfg.vocab_size {V}; "
                         f"raise vocab_size (pad to a multiple of 128)")

    logit_w = take("logit.weight", (ckpt_v, H))
    logit_b = take("logit.bias", (ckpt_v,))

    if cfg.obj_interact:
        raise ValueError("cfg.obj_interact=True but torch obj_interact "
                         "weights are not supported by the importer; "
                         "import with obj_interact=False")

    params = init_params(jax.random.PRNGKey(0), cfg)
    new = {
        "embed": {"table": _pad_rows(emb, V)},
        "att_lstm": _lstm(sd, "att_lstm.", {"h": H, "g": H, "e": E},
                          att_input_order, "hge", used),
        "lang_lstm": _lstm(sd, "lang_lstm.", {"c": H, "a": H},
                           "ca", "ca", used),
        "attention": {
            "wv": np.ascontiguousarray(take("att_v.weight", (A, H)).T),
            "wh": np.ascontiguousarray(take("att_h.weight", (A, H)).T),
            "w": take("att_w.weight", (1, A))[0],
            "b": (sd.get("att_h.bias", np.zeros(A, np.float32))
                  + sd.get("att_v.bias", np.zeros(A, np.float32))),
        },
        "logit": {"w": np.ascontiguousarray(_pad_rows(logit_w, V).T),
                  "b": _pad_rows(logit_b, V, fill=-1e9)},
        "localizer": {
            "wq": np.ascontiguousarray(take("loc_q.weight", (A, E)).T),
            "wv": np.ascontiguousarray(take("loc_v.weight", (A, H)).T),
            "w": take("loc_w.weight", (1, A))[0],
            "b": (sd.get("loc_q.bias", np.zeros(A, np.float32))
                  + sd.get("loc_v.bias", np.zeros(A, np.float32))),
        },
    }
    for opt in ("att_h.bias", "att_v.bias", "loc_q.bias", "loc_v.bias"):
        if opt in sd:
            used.add(opt)
    for drop in ("att_w.bias", "loc_w.bias"):
        if drop in sd:
            used.add(drop)
            report["dropped"].append(f"{drop} (softmax-invariant shift)")

    # region encoder: feat projection maps; geometry/class terms have no
    # torch counterpart -> zeroed so their additive contribution vanishes
    re = dict(params["region_enc"])
    re["feat_w"] = np.ascontiguousarray(take("feat_proj.weight", (H, D)).T)
    re["b"] = (take("feat_proj.bias", (H,)) if "feat_proj.bias" in sd
               else np.zeros(H, np.float32))
    for z in ("geom_w", "cls_w", "cls_emb"):
        re[z] = np.zeros_like(np.asarray(params["region_enc"][z]))
        report["zero_filled"].append(f"region_enc.{z}")
    new["region_enc"] = re

    if "global_enc" in params:
        G = cfg.global_feat_dim
        if "global_proj.weight" in sd:
            new["global_enc"] = {
                "w": np.ascontiguousarray(
                    take("global_proj.weight", (H, G)).T),
                "b": (take("global_proj.bias", (H,))
                      if "global_proj.bias" in sd
                      else np.zeros(H, np.float32)),
            }
        else:
            new["global_enc"] = {
                "w": np.zeros((G, H), np.float32),
                "b": np.zeros(H, np.float32)}
            report["zero_filled"].append("global_enc (checkpoint has no "
                                         "global_proj; v_global will be 0)")
    if "frame_emb" in params:
        if "frame_emb.weight" in sd:
            new["frame_emb"] = {
                "table": take("frame_emb.weight", (cfg.num_frames, H))}
        else:
            new["frame_emb"] = {
                "table": np.zeros((cfg.num_frames, H), np.float32)}
            report["zero_filled"].append("frame_emb")

    params.update(new)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x, np.float32)), params)
    report["mapped"] = sorted(used)
    report["unmapped"] = sorted(set(sd) - used)
    report["ckpt_vocab"] = int(ckpt_v)
    report["padded_vocab"] = int(V)
    return params, report


def load_torch_state_dict(path: str) -> dict:
    """Load a .pth/.pt checkpoint into {name: np.ndarray}.

    Accepts a bare state_dict or the common wrappers
    {"model"|"state_dict"|"model_state_dict": sd}.
    """
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("model", "state_dict", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: not a state_dict (got {type(obj)})")
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
            for k, v in obj.items()
            if hasattr(v, "shape")}


def save_params_npz(params, path: str) -> None:
    """Flatten the param pytree to an .npz ('a/b/c' keys)."""
    import jax
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(jax.device_get(node))
    walk("", params)
    np.savez(path, **flat)


def load_params_npz(path: str):
    """Inverse of save_params_npz; returns a nested dict of jnp arrays."""
    import jax.numpy as jnp
    data = np.load(path)
    params: dict = {}
    for key in data.files:
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return params


def import_params(path: str, cfg, rename: dict | None = None,
                  att_input_order: str = "hge"):
    """One-call import: .pth/.pt (torch) or .npz (already converted)."""
    if path.endswith(".npz"):
        return load_params_npz(path), {"mapped": ["<npz passthrough>"]}
    return convert_state_dict(load_torch_state_dict(path), cfg,
                              rename=rename,
                              att_input_order=att_input_order)
