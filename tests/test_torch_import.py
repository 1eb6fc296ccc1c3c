"""Torch-checkpoint import: functional parity against an independent
torch implementation of the reference architecture.

The fixture model below is written in torch with the reference's module
vocabulary (Embedding / Linear / LSTMCell, GVD-lineage state_dict names,
att-LSTM input order [h_lang, v_global, emb]) and NO shared code with
cvc_tpu.  Converting its state_dict through
`cvc_tpu.models.torch_import.convert_state_dict` and getting identical
teacher-forced logits, attention maps, localizer betas, and greedy
captions is evidence that (a) the importer's weight mapping is right and
(b) our decoder computes the same function as the reference
architecture (reference: `misc/model.py` AttModel; SURVEY.md §2).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cvc_tpu.models import core  # noqa: E402
from cvc_tpu.models.decoding import greedy_decode  # noqa: E402
from cvc_tpu.models.torch_import import (convert_state_dict,  # noqa: E402
                                         load_params_npz, save_params_npz)
from tests.conftest import random_batch, tiny_model_config  # noqa: E402

BOS_ID, EOS_ID, PAD_ID = 1, 2, 0


class RefTorchModel(torch.nn.Module):
    """Reference-shaped cyclical captioner (independent torch impl)."""

    def __init__(self, V, E, H, A, D):
        super().__init__()
        self.embed = torch.nn.Embedding(V, E)
        self.feat_proj = torch.nn.Linear(D, H)
        self.att_lstm = torch.nn.LSTMCell(2 * H + E, H)   # [h_lang, vg, emb]
        self.att_h = torch.nn.Linear(H, A)
        self.att_v = torch.nn.Linear(H, A)
        self.att_w = torch.nn.Linear(A, 1)
        self.lang_lstm = torch.nn.LSTMCell(2 * H, H)      # [ctx, h_att]
        self.logit = torch.nn.Linear(H, V)
        self.loc_q = torch.nn.Linear(E, A)
        self.loc_v = torch.nn.Linear(H, A)
        self.loc_w = torch.nn.Linear(A, 1)
        self.H = H

    def encode(self, feats, mask):
        x = torch.relu(self.feat_proj(feats)) * mask[..., None]
        v_global = (x * mask[..., None]).sum(1) / mask.sum(
            1, keepdim=True).clamp(min=1.0)
        return x, v_global

    @staticmethod
    def _masked_softmax(scores, mask):
        scores = scores.masked_fill(mask == 0, -1e30)
        return torch.softmax(scores, dim=-1) * (mask > 0)

    def step(self, word, state, v_enc, v_global, mask):
        h_att, c_att, h_lang, c_lang = state
        x1 = torch.cat([h_lang, v_global, self.embed(word)], dim=1)
        h_att, c_att = self.att_lstm(x1, (h_att, c_att))
        e = self.att_w(torch.tanh(self.att_v(v_enc)
                                  + self.att_h(h_att)[:, None, :]))
        alpha = self._masked_softmax(e.squeeze(-1), mask)
        ctx = torch.bmm(alpha[:, None, :], v_enc).squeeze(1)
        h_lang, c_lang = self.lang_lstm(torch.cat([ctx, h_att], dim=1),
                                        (h_lang, c_lang))
        return self.logit(h_lang), alpha, (h_att, c_att, h_lang, c_lang)

    @torch.no_grad()
    def teacher_forced(self, tokens_in, feats, mask):
        B = feats.shape[0]
        v_enc, v_global = self.encode(feats, mask)
        state = tuple(torch.zeros(B, self.H) for _ in range(4))
        logits, alphas = [], []
        for t in range(tokens_in.shape[1]):
            lg, al, state = self.step(tokens_in[:, t], state, v_enc,
                                      v_global, mask)
            logits.append(lg)
            alphas.append(al)
        return torch.stack(logits, 1), torch.stack(alphas, 1)

    @torch.no_grad()
    def greedy(self, feats, mask, max_len):
        B = feats.shape[0]
        v_enc, v_global = self.encode(feats, mask)
        state = tuple(torch.zeros(B, self.H) for _ in range(4))
        word = torch.full((B,), BOS_ID, dtype=torch.long)
        finished = torch.zeros(B, dtype=torch.bool)
        out = []
        for _ in range(max_len + 1):
            lg, _, state = self.step(word, state, v_enc, v_global, mask)
            nxt = lg.argmax(dim=1)
            nxt = torch.where(finished, torch.full_like(nxt, PAD_ID), nxt)
            finished = finished | (nxt == EOS_ID)
            out.append(nxt)
            word = nxt
        return torch.stack(out, 1)

    @torch.no_grad()
    def localize(self, words, feats, mask):
        v_enc, _ = self.encode(feats, mask)
        q = self.loc_q(self.embed(words))                    # [B,L,A]
        k = self.loc_v(v_enc)                                # [B,S,A]
        e = torch.tanh(k[:, None, :, :] + q[:, :, None, :])  # [B,L,S,A]
        scores = self.loc_w(e).squeeze(-1)
        return self._masked_softmax(scores, mask[:, None, :])


def _build(seed=0, V=128):
    torch.manual_seed(seed)
    cfg = tiny_model_config(vocab_size=V, use_pallas=False)
    tm = RefTorchModel(V, cfg.input_encoding_size, cfg.rnn_size,
                       cfg.att_hid_size, cfg.feat_dim).eval()
    params, report = convert_state_dict(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}, cfg)
    return cfg, tm, params, report


def _torch_inputs(cfg, batch):
    arrays = random_batch(cfg, batch=batch, seed=3)
    feats = torch.tensor(arrays["feats"])
    mask = torch.tensor(arrays["region_mask"])
    return arrays, feats, mask


def test_report_clean():
    _, _, _, report = _build()
    assert report["unmapped"] == []
    assert "att_w.bias (softmax-invariant shift)" in report["dropped"]
    assert any("geom_w" in z for z in report["zero_filled"])


def test_teacher_forced_parity():
    cfg, tm, params, _ = _build()
    arrays, feats, mask = _torch_inputs(cfg, batch=4)
    tokens_in = arrays["tokens"][:, :-1]

    t_logits, t_alphas = tm.teacher_forced(
        torch.tensor(tokens_in.astype(np.int64)), feats, mask)

    v_enc, keys, v_global = core.encode_regions(
        params, cfg, jnp.asarray(arrays["feats"]),
        jnp.asarray(arrays["box_geom"]), jnp.asarray(arrays["region_cls"]),
        jnp.asarray(arrays["region_mask"]))
    emb_seq = core.embed_tokens(params, jnp.asarray(tokens_in))
    h_seq, alphas, _ = core.decode(params, cfg, v_enc, keys, v_global,
                                   emb_seq, jnp.asarray(arrays["region_mask"]))
    j_logits = core.logits(params, h_seq)

    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(alphas), t_alphas.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_localizer_parity():
    cfg, tm, params, _ = _build()
    arrays, feats, mask = _torch_inputs(cfg, batch=4)
    words = arrays["tokens"][:, 1:]

    t_beta = tm.localize(torch.tensor(words.astype(np.int64)), feats, mask)

    v_enc, _, _ = core.encode_regions(
        params, cfg, jnp.asarray(arrays["feats"]),
        jnp.asarray(arrays["box_geom"]), jnp.asarray(arrays["region_cls"]),
        jnp.asarray(arrays["region_mask"]))
    beta, _ = core.localize(params, cfg, jnp.asarray(words), v_enc,
                            jnp.asarray(arrays["region_mask"]))
    np.testing.assert_allclose(np.asarray(beta), t_beta.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_greedy_caption_parity():
    cfg, tm, params, _ = _build(seed=1)
    arrays, feats, mask = _torch_inputs(cfg, batch=4)
    max_len = 6

    t_tokens = tm.greedy(feats, mask, max_len).numpy()
    out = greedy_decode(params, cfg,
                        {k: jnp.asarray(v) for k, v in arrays.items()},
                        max_len=max_len)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), t_tokens)


def test_vocab_padding_import():
    """A checkpoint with an unpadded vocab imports into the 128-padded
    head; padded ids can never win argmax."""
    torch.manual_seed(2)
    ckpt_v, V = 120, 128
    cfg = tiny_model_config(vocab_size=V, use_pallas=False)
    tm = RefTorchModel(ckpt_v, cfg.input_encoding_size, cfg.rnn_size,
                       cfg.att_hid_size, cfg.feat_dim).eval()
    params, report = convert_state_dict(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}, cfg)
    assert report["ckpt_vocab"] == ckpt_v and report["padded_vocab"] == V

    arrays, feats, mask = _torch_inputs(cfg, batch=3)
    # tokens drawn < ckpt_v for the torch side
    arrays["tokens"] = np.clip(arrays["tokens"], 0, ckpt_v - 1)
    t_tokens = tm.greedy(feats, mask, 6).numpy()
    out = greedy_decode(params, cfg,
                        {k: jnp.asarray(v) for k, v in arrays.items()},
                        max_len=6)
    j_tokens = np.asarray(out["tokens"])
    assert j_tokens.max() < ckpt_v
    np.testing.assert_array_equal(j_tokens, t_tokens)


def test_att_input_order_variants():
    """A checkpoint whose att-LSTM concatenated [emb, v_global, h_lang]
    (order 'egh') converts to the same params as the canonical order when
    declared."""
    cfg, tm, params_hge, _ = _build(seed=4)
    H, E = cfg.rnn_size, cfg.input_encoding_size
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    wih = sd["att_lstm.weight_ih"]
    sd["att_lstm.weight_ih"] = np.concatenate(
        [wih[:, 2 * H:2 * H + E], wih[:, H:2 * H], wih[:, :H]], axis=1)
    params_egh, _ = convert_state_dict(sd, cfg, att_input_order="egh")
    np.testing.assert_allclose(np.asarray(params_egh["att_lstm"]["wx"]),
                               np.asarray(params_hge["att_lstm"]["wx"]))


def test_alias_and_dataparallel_names():
    """GVD/self-critical lineage names + DataParallel 'module.' prefix."""
    cfg, tm, params_ref, _ = _build(seed=5)
    renames = {
        "embed.weight": "module.embed.0.weight",
        "feat_proj.weight": "module.att_embed.0.weight",
        "feat_proj.bias": "module.att_embed.0.bias",
        "att_h.weight": "module.core.attention.h2att.weight",
        "att_h.bias": "module.core.attention.h2att.bias",
        "att_w.weight": "module.core.attention.alpha_net.weight",
        "att_w.bias": "module.core.attention.alpha_net.bias",
        "att_v.weight": "module.ctx2att.weight",
        "att_v.bias": "module.ctx2att.bias",
    }
    sd = {}
    for k, v in tm.state_dict().items():
        if k.startswith(("att_lstm.", "lang_lstm.")):
            sd["module.core." + k] = v.detach().numpy()
        else:
            sd[renames.get(k, "module." + k)] = v.detach().numpy()
    params, report = convert_state_dict(sd, cfg)
    assert report["unmapped"] == []
    for top in ("embed", "att_lstm", "attention", "logit"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b)),
            params[top], params_ref[top])


def test_npz_roundtrip(tmp_path):
    cfg, _, params, _ = _build(seed=6)
    path = str(tmp_path / "params.npz")
    save_params_npz(params, path)
    restored = load_params_npz(path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored)


def test_pth_file_import(tmp_path):
    """torch.save -> import_params reproduces the in-memory conversion
    (covers the .pth loader incl. the {'model': sd} wrapper)."""
    from cvc_tpu.models.torch_import import import_params
    cfg, tm, params_ref, _ = _build(seed=8)
    path = str(tmp_path / "model-best.pth")
    torch.save({"model": tm.state_dict()}, path)
    params, report = import_params(path, cfg)
    assert report["unmapped"] == []
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, params_ref)


def test_obj_interact_rejected():
    cfg, tm, _, _ = _build(seed=7)
    import dataclasses
    cfg_oi = dataclasses.replace(cfg, obj_interact=True)
    with pytest.raises(ValueError, match="obj_interact"):
        convert_state_dict(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()},
            cfg_oi)
