"""Model core: shapes, masking invariants, scan-vs-loop equivalence,
weight-shared reconstruction, gradient-flow structure of the cycle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvc_tpu.models import core
from cvc_tpu.models.cyclical import cyclical_loss, decode_teacher_forced
from cvc_tpu.ops.primitives import masked_softmax, masked_xent, lstm_cell
from tests.conftest import random_batch, tiny_model_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config()
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 4, 0).items()}
    return cfg, params, arrays


def test_masked_softmax_zero_on_pad_and_fully_masked_safe():
    logits = jnp.array([[1.0, 2.0, 3.0], [5.0, 5.0, 5.0]])
    mask = jnp.array([[1.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
    p = masked_softmax(logits, mask)
    assert p[0, 2] == 0.0
    np.testing.assert_allclose(p[0, :2].sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(p[1], 0.0)  # fully masked row: zeros, no NaN


def test_masked_xent_matches_manual():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 7)))
    targets = jnp.array([[1, 2, 3], [4, 5, 6]])
    mask = jnp.array([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    got = masked_xent(logits, targets, mask)
    lp = jax.nn.log_softmax(logits, axis=-1)
    want = -(lp[0, 0, 1] + lp[0, 1, 2] + lp[1, 0, 4]) / 3.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_lstm_cell_matches_manual():
    rng = np.random.default_rng(1)
    H = 5
    gates = jnp.asarray(rng.normal(size=(3, 4 * H)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(3, H)), jnp.float32)
    h2, c2 = lstm_cell(gates, c)

    def sig(x):
        return 1 / (1 + np.exp(-x))
    g = np.asarray(gates)
    i, f, gg, o = g[:, :H], g[:, H:2*H], g[:, 2*H:3*H], g[:, 3*H:]
    c_want = sig(f) * np.asarray(c) + sig(i) * np.tanh(gg)
    np.testing.assert_allclose(c2, c_want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(h2, sig(o) * np.tanh(c_want), rtol=1e-4, atol=1e-5)


def test_encode_regions_shapes_and_mask(setup):
    cfg, params, arrays = setup
    v_enc, keys, v_global = core.encode_regions(
        params, cfg, arrays["feats"], arrays["box_geom"],
        arrays["region_cls"], arrays["region_mask"])
    S = cfg.total_regions
    assert v_enc.shape == (4, S, cfg.rnn_size)
    assert keys.shape == (4, S, cfg.att_hid_size)
    assert v_global.shape == (4, cfg.rnn_size)
    # padded slots contribute exactly zero
    np.testing.assert_allclose(
        np.asarray(v_enc) * (1 - np.asarray(arrays["region_mask"]))[..., None], 0.0)


def test_decode_scan_matches_python_loop(setup):
    """The lax.scan decoder must equal an unrolled per-step loop — this is
    the reference's per-timestep Python loop as the oracle."""
    cfg, params, arrays = setup
    v_enc, keys, v_global = core.encode_regions(
        params, cfg, arrays["feats"], arrays["box_geom"],
        arrays["region_cls"], arrays["region_mask"])
    emb = core.embed_tokens(params, arrays["tokens"][:, :-1])
    h_seq, alphas, _ = core.decode(params, cfg, v_enc, keys, v_global, emb,
                                   arrays["region_mask"])

    pre1 = core.precompute_pre1(params, cfg, emb, v_global)
    carry = core.initial_state(4, cfg.rnn_size)
    hs, als = [], []
    for t in range(emb.shape[1]):
        carry, (h, a) = core.decoder_step(
            params, cfg, carry,
            {"pre1": pre1[:, t], "ctx": jnp.zeros((4, cfg.rnn_size))},
            v_enc=v_enc, keys=keys, region_mask=arrays["region_mask"],
            use_attention=True)
        hs.append(h)
        als.append(a)
    np.testing.assert_allclose(h_seq, jnp.stack(hs, 1), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(alphas, jnp.stack(als, 1), rtol=2e-5, atol=1e-6)


def test_decode_scan_unroll_parity(setup):
    """scan_unroll is a pure scheduling knob: unroll=3 (non-divisor of L,
    exercising the remainder path) must match unroll=1 exactly."""
    from dataclasses import replace
    cfg, params, arrays = setup
    v_enc, keys, v_global = core.encode_regions(
        params, cfg, arrays["feats"], arrays["box_geom"],
        arrays["region_cls"], arrays["region_mask"])
    emb = core.embed_tokens(params, arrays["tokens"][:, :-1])
    h1, a1, _ = core.decode(params, cfg, v_enc, keys, v_global, emb,
                            arrays["region_mask"])
    cfg3 = replace(cfg, scan_unroll=3)
    h3, a3, _ = core.decode(params, cfg3, v_enc, keys, v_global, emb,
                            arrays["region_mask"])
    np.testing.assert_allclose(h1, h3, rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(a1, a3, rtol=2e-6, atol=1e-7)


def test_attention_ignores_padded_regions(setup):
    cfg, params, arrays = setup
    _, alphas, *_ = decode_teacher_forced(params, cfg, arrays)
    a = np.asarray(alphas)
    m = np.asarray(arrays["region_mask"])
    assert (a * (1 - m)[:, None, :]).max() == 0.0
    np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-5)


def test_localizer_shapes_and_mask(setup):
    cfg, params, arrays = setup
    v_enc, _, _ = core.encode_regions(
        params, cfg, arrays["feats"], arrays["box_geom"],
        arrays["region_cls"], arrays["region_mask"])
    words = arrays["tokens"][:, 1:]
    beta, v_hat = core.localize(params, cfg, words, v_enc,
                                arrays["region_mask"])
    assert beta.shape == (4, words.shape[1], cfg.total_regions)
    assert v_hat.shape == (4, words.shape[1], cfg.rnn_size)
    b = np.asarray(beta)
    assert (b * (1 - np.asarray(arrays["region_mask"]))[:, None, :]).max() == 0.0


def test_reconstructor_shares_decoder_weights(setup):
    """Reconstruction with context := the decoder's own attention context
    must reproduce the decode pass exactly (same params, same math)."""
    cfg, params, arrays = setup
    v_enc, keys, v_global = core.encode_regions(
        params, cfg, arrays["feats"], arrays["box_geom"],
        arrays["region_cls"], arrays["region_mask"])
    emb = core.embed_tokens(params, arrays["tokens"][:, :-1])
    h_dec, alphas, _ = core.decode(params, cfg, v_enc, keys, v_global, emb,
                                   arrays["region_mask"])
    ctx = jnp.einsum("bls,bsh->blh", alphas.astype(v_enc.dtype), v_enc)
    h_rec, _, _ = core.decode(params, cfg, v_enc, keys, v_global, emb,
                              arrays["region_mask"], context_override=ctx)
    np.testing.assert_allclose(h_rec, h_dec, rtol=2e-5, atol=1e-6)


def test_cycle_gradient_flow(setup):
    """Localizer params must receive gradient ONLY via the reconstruction
    loss; decoder argmax words must carry no gradient (SURVEY.md §3.3)."""
    cfg, params, arrays = setup

    def loss_no_cycle(p):
        return cyclical_loss(p, cfg, arrays, enable_cycle=False)[0]

    def loss_cycle(p):
        return cyclical_loss(p, cfg, arrays, enable_cycle=True)[0]

    g_no = jax.grad(loss_no_cycle)(params)
    g_yes = jax.grad(loss_cycle)(params)
    loc_no = jnp.concatenate([x.ravel() for x in
                              jax.tree_util.tree_leaves(g_no["localizer"])])
    loc_yes = jnp.concatenate([x.ravel() for x in
                               jax.tree_util.tree_leaves(g_yes["localizer"])])
    assert float(jnp.abs(loc_no).max()) == 0.0
    assert float(jnp.abs(loc_yes).max()) > 0.0
    # decoder grads change when cycle is on (reconstruction contributes)
    d_no = g_no["lang_lstm"]["wx"]
    d_yes = g_yes["lang_lstm"]["wx"]
    assert float(jnp.abs(d_yes - d_no).max()) > 0.0


def test_cyclical_loss_values_finite_and_composed(setup):
    cfg, params, arrays = setup
    loss, m = cyclical_loss(params, cfg, arrays, enable_cycle=True)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(
        float(loss),
        float(m["loss_decode"]) + cfg.cycle_weight * float(m["loss_recon"]),
        rtol=1e-6)
    # with random init both XEs should be near log(V)
    assert abs(float(m["loss_decode"]) - np.log(cfg.vocab_size)) < 1.0


def test_bfloat16_path_runs_and_is_close(setup):
    cfg, params, arrays = setup
    cfg16 = tiny_model_config(dtype="bfloat16")
    l32, _ = cyclical_loss(params, cfg, arrays, enable_cycle=True)
    l16, _ = cyclical_loss(params, cfg16, arrays, enable_cycle=True)
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)


def test_global_feature_path():
    cfg = tiny_model_config(global_feat_dim=24)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 2, 3).items()}
    assert "global_feat" in arrays
    loss, _ = cyclical_loss(params, cfg, arrays, enable_cycle=True)
    assert np.isfinite(float(loss))


def test_obj_interact_path():
    cfg = tiny_model_config(obj_interact=True, rnn_size=32,
                            obj_interact_heads=4)
    params = core.init_params(jax.random.PRNGKey(0), cfg)
    arrays = {k: jnp.asarray(v) for k, v in random_batch(cfg, 2, 4).items()}
    loss, _ = cyclical_loss(params, cfg, arrays, enable_cycle=True)
    assert np.isfinite(float(loss))


def test_cycle_localize_gt_variant(setup):
    """cycle_localize_gt=True queries the localizer with TARGET words:
    the loss changes (different v-hat), localizer still gets gradient,
    and the decode XE term is untouched."""
    import dataclasses
    cfg, params, arrays = setup
    cfg_gt = dataclasses.replace(cfg, cycle_localize_gt=True)
    l_arg, m_arg = cyclical_loss(params, cfg, arrays, enable_cycle=True)
    l_gt, m_gt = cyclical_loss(params, cfg_gt, arrays, enable_cycle=True)
    np.testing.assert_allclose(float(m_arg["loss_decode"]),
                               float(m_gt["loss_decode"]), rtol=1e-6)
    assert float(m_arg["loss_recon"]) != float(m_gt["loss_recon"])
    g = jax.grad(lambda p: cyclical_loss(p, cfg_gt, arrays,
                                         enable_cycle=True)[0])(params)
    loc = jnp.concatenate([x.ravel() for x in
                           jax.tree_util.tree_leaves(g["localizer"])])
    assert float(jnp.abs(loc).max()) > 0.0


def test_fused_gt_cycle_scan_parity(setup):
    """The merged decode+reconstruct scan (fuse_cycle_scans, engaged when
    localizer queries are GT words) must match the two-scan path exactly:
    loss terms, metrics, and gradients — including the localizer's, whose
    only gradient route is the reconstruct rows' context."""
    import dataclasses
    cfg, params, arrays = setup
    cfg_f = dataclasses.replace(cfg, cycle_localize_gt=True,
                                fuse_cycle_scans=True)
    cfg_u = dataclasses.replace(cfg, cycle_localize_gt=True,
                                fuse_cycle_scans=False)
    _, m_f = cyclical_loss(params, cfg_f, arrays, enable_cycle=True)
    _, m_u = cyclical_loss(params, cfg_u, arrays, enable_cycle=True)
    for k in m_u:
        np.testing.assert_allclose(float(m_f[k]), float(m_u[k]), rtol=2e-5,
                                   err_msg=k)
    g_f = jax.grad(lambda p: cyclical_loss(p, cfg_f, arrays,
                                           enable_cycle=True)[0])(params)
    g_u = jax.grad(lambda p: cyclical_loss(p, cfg_u, arrays,
                                           enable_cycle=True)[0])(params)
    from jax.flatten_util import ravel_pytree
    flat_f, _ = ravel_pytree(g_f)
    flat_u, _ = ravel_pytree(g_u)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_u),
                               rtol=2e-4, atol=1e-6)
